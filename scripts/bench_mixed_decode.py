"""docs/sec impact of a mixed-format corpus on the OCR headline.

Measures extract_spans (broadcast-spans plan, identical to bench.py's
headline) twice on byte-identical page GEOMETRY: once all-PNG, once
with every 3rd page re-encoded as baseline JPEG and every 7th as
LZW+predictor TIFF (the realistic archive mix from the 10k-page
revalidation sweep). The delta is the measured decode surcharge — the
number BENCH/NOTES_r4.md's budget claim is built from.

Usage: python scripts/bench_mixed_decode.py [sf_dir] [cpus] [runs]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import pandas as pd
    from pyspark.sql import functions as F

    from ocr_inference_spark.pipeline import extract_spans
    from ocr_inference_spark.session import get_spark
    from ocr_inference_spark.synth import synth_corpus

    spark = get_spark(app_name="mixed_decode", master=f"local[{cpus}]")
    docs, pages, _ = synth_corpus(spark, sf_dir)
    docs = docs.cache()
    docs.count()

    def reencode(batches):
        from ocr_inference_spark.imgcodec import png_decode, tiff_encode
        from ocr_inference_spark.jpegcodec import jpeg_encode

        for pdf in batches:
            out = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                idx = int(ref.rsplit("_", 2)[-2])
                img = png_decode(bytes(content))
                if idx % 3 == 0:
                    blob = jpeg_encode(img, quality=95)
                elif idx % 7 == 0:
                    blob = tiff_encode(img, compression="lzw", predictor=2)
                else:
                    blob = bytes(content)
                out.append(blob)
            yield pd.DataFrame({"media_ref": pdf["media_ref"], "content": out})

    results = {}
    for label, pdf_pages in (
        ("png", pages),
        (
            "mixed",
            pages.select("media_ref", "content").mapInPandas(
                reencode, schema="media_ref string, content binary"
            ),
        ),
    ):
        cached = pdf_pages.repartition(cpus * 4, "media_ref").cache()
        n = cached.count()
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            extract_spans(spark, docs, cached, strategy="broadcast").write.format(
                "noop"
            ).mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        best = min(samples)
        results[label] = {
            "pages": n,
            "sec": best,
            "docs_per_sec": round(n / best, 2),
            "runs": samples,
        }
        cached.unpersist()
    results["surcharge_pct"] = round(
        100.0 * (results["mixed"]["sec"] / results["png"]["sec"] - 1.0), 1
    )
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, **results}))
    spark.stop()


if __name__ == "__main__":
    main()
