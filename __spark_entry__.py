"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship OCR span-extraction pipeline on an
interleaved corpus synthesized deterministically from the sf0.001
documents table (pages rendered inside executors; pages carry noise /
caption furniture the pipeline must strip). ``queries()`` /
``oracle_sql()`` expose the operator inventory of SURVEY.md §2 plus the
training-data operators (dedup incl. LSH blocking and duplicate-cluster
canonicalization, ANN similarity via LSH and IVF, text analysis, layout
classes, multimodal WAV/MJPEG-AVI/animated-GIF decode, HTML
main-content extraction, PDF layout parse, fused web-doc HTML->OCR and scanned-book PDF->OCR extractions, WARC crawl-archive ingestion with
CDX capture indexing, URL canonicalization with registrable-domain
rollup, duplicate-capture crawl dedup, cross-page template removal,
HTML5 charset sniffing, RFC 9309 robots politeness filtering,
pointer-doubling redirect-chain resolution, sitemap coverage audit,
hyperlink-graph extraction with RFC 3986 reference resolution,
integer-exact PageRank over the capture set,
snapshot-diff change detection, Gopher-rule quality gating,
WET text-export with byte-exact round-trip, host-politeness
fetch scheduling, exact-substring duplication detection,
Gopher repetition rules,
composite training-set selection, DSIR
hashed-ngram importance-weight selection, PII
detection/redaction with hash-gated scrubbed digests, SemDeDup
cluster-then-prune semantic dedup, a
Structured-Streaming rollup) — 78 queries, 75 with DuckDB oracles (the remaining 3 are
approximate-by-design ANN/LSH paths, recall pinned by pytest); see
ocr_inference_spark/queries.py for the implementations and
the column-aliasing / decimal-sum conventions that keep the Spark and
DuckDB results hash-identical.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(_REPO))

_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ocr_inference_spark importable inside executor Python workers
    regardless of the driver process's CWD: zip the package once and
    addPyFile it (exactly what spark-submit --py-files does)."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    base = os.path.join(tempfile.gettempdir(), f"ocr_inference_spark_pkg_{os.getpid()}")
    zip_path = base + ".zip"
    if not os.path.exists(zip_path):
        shutil.make_archive(base, "zip", root_dir=str(_REPO), base_dir="ocr_inference_spark")
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(app_id)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full OCR span
    extraction — documents + rendered pages -> ordered span sequences,
    exploded to one row per span (stable flat schema)."""
    _ship_package(spark)
    from ocr_inference_spark.queries import q30_ocr_extract_spans

    return q30_ocr_extract_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_inference_spark.queries import QUERIES

    def wrap(fn):
        def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        runner.__name__ = fn.__name__
        runner.__doc__ = fn.__doc__
        return runner

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from ocr_inference_spark.queries import ORACLES

    return dict(ORACLES)
