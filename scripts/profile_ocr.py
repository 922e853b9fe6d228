"""Isolate ocr_extract_spans stage costs at the bench shape (guide §1.4)."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from ocr_inference_spark.pipeline import (
        extract_spans,
        media_spans,
        reassemble_spans,
        recognize_pages,
    )
    from ocr_inference_spark.session import get_spark
    from ocr_inference_spark.synth import synth_corpus

    spark = get_spark(app_name="profile_ocr", master=f"local[{CPUS}]")
    sc = spark.sparkContext

    docs, pages, _ = synth_corpus(spark, SF_DIR)
    pages = pages.repartition(int(CPUS) * 4, "media_ref").cache()
    print("pages:", pages.count())
    docs = docs.cache()
    docs.count()

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(label, fn, n=2):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{best:8.3f}  {label}", flush=True)

    sc.setJobDescription("media_spans only")
    timed("media_spans only", lambda: sink(media_spans(docs)))

    sc.setJobDescription("recognize only")
    timed(
        "recognize_pages (broadcast) only",
        lambda: sink(recognize_pages(spark, docs, pages, strategy="broadcast")),
    )

    sc.setJobDescription("reassemble from cached ocr")
    ocr = recognize_pages(spark, docs, pages, strategy="broadcast").localCheckpoint(
        eager=True
    )
    timed("reassemble only (ocr checkpointed)", lambda: sink(reassemble_spans(docs, ocr)))

    sc.setJobDescription("full extract_spans")
    timed(
        "full extract_spans",
        lambda: sink(extract_spans(spark, docs, pages, strategy="broadcast")),
        n=3,
    )

    spark.stop()


if __name__ == "__main__":
    main()
