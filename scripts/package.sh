#!/bin/sh
# Build the --py-files zip for spark-submit.
set -e
cd "$(dirname "$0")/.."
rm -f ocr_inference_spark.zip
zip -qr ocr_inference_spark.zip ocr_inference_spark -x '*__pycache__*'
echo "wrote ocr_inference_spark.zip"
