"""Scratch experiment: scan-split parallelism options for small files."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ocr_inference_spark.session import get_spark

SF = "/root/testdata/sf1.0"
spark = get_spark(app_name="exp_split", master="local[32]")


def nparts(df):
    return df.rdd.getNumPartitions()


def sink(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:8.3f}  {label}", flush=True)


docs = spark.read.parquet(f"{SF}/documents.parquet")
print("docs scan partitions:", nparts(docs))
docs_opt = spark.read.option("maxPartitionBytes", "1m").parquet(f"{SF}/documents.parquet")
print("docs scan partitions with read option 1m:", nparts(docs_opt))

li = spark.read.parquet(f"{SF}/lineitem.parquet")
print("lineitem scan partitions:", nparts(li))
li_opt = spark.read.option("maxPartitionBytes", "8m").parquet(f"{SF}/lineitem.parquet")
print("lineitem scan partitions with read option 8m:", nparts(li_opt))

# heavy per-row compute probe: md5 of normalized text (q23 shape)
expr = F.md5(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))).alias("k")
timed("md5 scan, stock", lambda: sink(docs.select(expr)))
timed("md5 scan, repartition(32)", lambda: sink(docs.repartition(32).select(expr)))
timed("md5 scan, repartition(64)", lambda: sink(docs.repartition(64).select(expr)))

# lineitem agg probe (q01 shape-ish)
agg = lambda d: d.groupBy("l_returnflag").agg(F.sum(F.col("l_quantity").cast("decimal(20,2)")))
timed("lineitem agg, stock", lambda: sink(agg(li)))
timed("lineitem agg, read-option 8m", lambda: sink(agg(li_opt)))
timed("lineitem agg, repartition(64)", lambda: sink(agg(li.repartition(64))))

spark.stop()
