"""Round-6 extra benchmarks: per-query noop-sink isolation (guide §1.4).

NOT the frozen driver harness (bench.py is untouched); this exists so
optimization work can time individual queries quickly:

    python bench_extra.py q36_embedding_near_dup_lsh q76_dsir_selection
    python bench_extra.py --all          # every headline query
    python bench_extra.py --repeats 5 q39_training_selection

Same methodology as bench.py: noop sink (full materialization), best-of-N
wall seconds per query, warmup query first, /proc/stat steal stamps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "q01_pricing_summary", "q02_top_orders", "q07_median_quantity",
    "q10_topk_orders_per_customer", "q11_user_sessions", "q15_brand_revenue",
    "q16_word_topk", "q23_exact_dup_keys", "q24_jaccard_pairs",
    "q25_minhash_lsh_pairs", "q27_ann_cosine_topk", "q29_tumbling_window",
    "q36_embedding_near_dup_lsh", "q39_training_selection", "q37_dup_clusters",
    "q44_html_extract_spans", "q45_pdf_extract_spans", "q48_warc_extract_spans",
    "q58_link_pagerank", "q60_gopher_quality", "q65_c4_line_filter",
    "q67_bm25_topk", "q76_dsir_selection", "q77_pii_scrub",
]


def _steal() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return sum(vals), vals[7]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from ocr_inference_spark.queries import QUERIES
    from ocr_inference_spark.session import get_spark

    names = HEADLINE if args.all else args.names
    spark = get_spark(app_name="bench_extra", master=f"local[{CPUS}]")

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    sink(QUERIES["q01_pricing_summary"](spark, SF_DIR))  # warmup

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        best, samples = None, []
        t_b, s_b = _steal()
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            sink(QUERIES[name](spark, SF_DIR))
            dt = round(time.perf_counter() - t0, 3)
            samples.append(dt)
            best = dt if best is None else min(best, dt)
        t_a, s_a = _steal()
        steal = round(100.0 * (s_a - s_b) / max(t_a - t_b, 1), 1)
        out[name] = best
        print(f"{best:8.3f}  {name}  samples={samples} steal%={steal}", flush=True)

    print(json.dumps({"sf_dir": SF_DIR, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
