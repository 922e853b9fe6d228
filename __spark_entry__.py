"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship OCR span-extraction pipeline on an
interleaved corpus synthesized deterministically from the sf0.001
documents table (pages rendered inside executors). ``queries()`` /
``oracle_sql()`` expose the operator inventory of SURVEY.md §2 plus the
training-data operators (dedup, similarity, text analysis); see
ocr_inference_spark/queries.py for the implementations and the
column-aliasing / decimal-sum conventions that keep the Spark and
DuckDB results hash-identical.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full OCR span
    extraction — documents + rendered pages -> ordered span sequences,
    exploded to one row per span (stable flat schema)."""
    from ocr_inference_spark.queries import q30_ocr_extract_spans

    return q30_ocr_extract_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_inference_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ocr_inference_spark.queries import ORACLES

    return dict(ORACLES)
