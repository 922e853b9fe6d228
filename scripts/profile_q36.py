"""Isolate q36 sub-stage costs (guide §1.4 noop-sink discipline).

HISTORICAL: stages (a)-(d) replicate the ROUND-START formulation of
embedding_near_dup (unspread scan, dedup-before-verify, planner-chosen
joins) — this is the probe that localized the round-6 q36 findings
(single-task bucket projection, AQE-coalesced pair explosion). The
current implementation differs; stage (e) always runs the live query.
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ocr_inference_spark import dedup as dd
from ocr_inference_spark.queries import QUERIES, _parquet_row_count, _t
from ocr_inference_spark.session import get_spark
from ocr_inference_spark.similarity import _dot, _norm, table_buckets

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


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
    return best


def main():
    spark = get_spark(app_name="profile_q36", master=f"local[{CPUS}]")
    sc = spark.sparkContext

    emb = _t(spark, SF_DIR, "embeddings")
    n = _parquet_row_count(SF_DIR, "embeddings")
    n_planes = max(3, int(math.ceil(math.log2(max(n, 64) / 64))))
    n_tables = 12
    print(f"n={n} n_planes={n_planes}")

    base = (
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("nrm", _norm(F.col("v")))
        .where(F.col("nrm") > 0)
    )

    sc.setJobDescription("warm")
    sink(base)

    sc.setJobDescription("a: buckets only")
    blocked_df = base.select(
        "id", F.posexplode(table_buckets(F.col("v"), n_tables, n_planes, 64)).alias("t", "bucket")
    )
    timed("a buckets only", lambda: sink(blocked_df))

    sc.setJobDescription("b: cand pairs")

    def cand_run():
        blocked = blocked_df.localCheckpoint(eager=True)
        a, b = blocked.alias("a"), blocked.alias("b")
        cand = (
            a.join(b, ["t", "bucket"])
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        sink(cand)

    timed("b cand+dedup", cand_run)

    # count candidates once
    blocked = blocked_df.localCheckpoint(eager=True)
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(b, ["t", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    print("raw collisions:", cand.count())
    cand_d = cand.dropDuplicates(["id_a", "id_b"]).localCheckpoint(eager=True)
    print("distinct cand:", cand_d.count())

    sc.setJobDescription("c: attach joins only")
    pairs = cand_d.join(
        base.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")),
        "id_a",
    ).join(
        base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")),
        "id_b",
    )
    timed("c attach joins (from checkpointed cand)", lambda: sink(pairs.select("id_a", "id_b", "na", "nb")))

    sc.setJobDescription("d: attach + verify")
    scored = pairs.select(
        "id_a", "id_b",
        F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("cosine"),
    ).where(F.col("cosine") >= 0.4)
    timed("d attach+verify (from checkpointed cand)", lambda: sink(scored))
    print("out rows:", scored.count())

    sc.setJobDescription("e: full q36")
    timed("e full q36", lambda: sink(QUERIES["q36_embedding_near_dup_lsh"](spark, SF_DIR)))

    spark.stop()


if __name__ == "__main__":
    main()
