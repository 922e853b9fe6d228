"""Per-round benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries":
{name: sec}, "sf", plus ocr docs/sec extras}.

Each query is forced through a noop sink (full materialization, no
column pruning shortcuts). The OCR headline is the north-star metric:
end-to-end span extraction over a corpus synthesized distributively
from the documents table (1 page, 3 lines per doc).

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
scripts/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "q01_pricing_summary",
    "q02_top_orders",
    "q07_median_quantity",
    "q10_topk_orders_per_customer",
    "q11_user_sessions",
    "q15_brand_revenue",
    "q16_word_topk",
    "q23_exact_dup_keys",
    "q24_jaccard_pairs",
    "q25_minhash_lsh_pairs",
    "q27_ann_cosine_topk",
    "q29_tumbling_window",
    # round-2 additions (new keys — r1 rows stay delta-comparable).
    "q36_embedding_near_dup_lsh",
    "q39_training_selection",
    # round-3 addition: stable now that dup_clusters materializes its
    # edge list before the CC rounds (the r2 instability was each round
    # re-executing the Jaccard shingle self-join)
    "q37_dup_clusters",
    # round-5 additions: the north rule's named main-content extraction
    # surfaces (HTML boilerplate strip + PDF layout parse)
    "q44_html_extract_spans",
    "q45_pdf_extract_spans",
    # round-5 addition: WARC container ingestion (gzip-member split +
    # record walk + HTTP transfer decode feeding the HTML extractor)
    "q48_warc_extract_spans",
    # late round-5 additions: the iterative link-graph rank (per-round
    # join+agg shuffle discipline) and the Gopher gate (zero-exchange
    # whole-table integer scan — the only new query that SCALES with
    # the corpus rather than a fixed gate slice)
    "q58_link_pagerank",
    "q60_gopher_quality",
    # final round-5 wave: C4 page cleaning (zero-exchange whole-table
    # string scan) and BM25 retrieval (explode+agg postings pass +
    # broadcast idf + TakeOrderedAndProject) — both scale with the
    # corpus, not a fixed gate slice
    "q65_c4_line_filter",
    "q67_bm25_topk",
    # last round-5 wave: DSIR importance-weight selection (feature
    # explode + B-bounded model shuffle + broadcast score-back) and
    # the PII scrub (zero-exchange whole-table regex scan) — both
    # scale with the corpus
    "q76_dsir_selection",
    "q77_pii_scrub",
]


def _sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _cpu_stat() -> tuple[int, int]:
    """(total ticks, steal ticks) from /proc/stat — same probe as
    scripts/bench_scaling.py, so BENCH_rN.json is self-certifying: a
    co-tenant phase shows up as steal%% stamped on the exact run it
    polluted instead of masquerading as a code regression (the
    round-3 lesson, BENCH/NOTES_r3.md)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return sum(vals), vals[7]


def main() -> None:
    from ocr_inference_spark.queries import QUERIES
    from ocr_inference_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    timings: dict[str, float] = {}

    # warm the JVM/Python workers once (excluded from timings)
    _sink(QUERIES["q01_pricing_summary"](spark, SF_DIR))

    for name in HEADLINE:
        best = None
        for _ in range(3):  # best-of-3: multi-tenant steal spikes double
            # sub-second queries on this VM (see BENCH/NOTES_r2.md)
            t0 = time.perf_counter()
            _sink(QUERIES[name](spark, SF_DIR))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # OCR end-to-end: synthesize + extract (the north-star metric)
    from ocr_inference_spark.pipeline import extract_spans
    from ocr_inference_spark.synth import synth_corpus

    docs, pages, _ = synth_corpus(spark, SF_DIR)
    # page-granular layout materialized outside the timing — the
    # local-mode stand-in for a pages table bucketed by media_ref;
    # the broadcast-spans plan then never shuffles page bytes
    pages = pages.repartition(int(CPUS) * 4, "media_ref").cache()
    n_docs = pages.count()
    docs = docs.cache()
    docs.count()
    ocr_runs = []
    for _ in range(4):  # best-of-4 with per-run steal stamps
        t_b, s_b = _cpu_stat()
        t0 = time.perf_counter()
        _sink(extract_spans(spark, docs, pages, strategy="broadcast"))
        dt = round(time.perf_counter() - t0, 3)
        t_a, s_a = _cpu_stat()
        ocr_runs.append(
            {
                "sec": dt,
                "steal_pct": round(100.0 * (s_a - s_b) / max(t_a - t_b, 1), 1),
            }
        )
    ocr_sec = min(r["sec"] for r in ocr_runs)
    timings["ocr_extract_spans"] = ocr_sec
    pages.unpersist()
    docs.unpersist()

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "ocr_docs": n_docs,
                "ocr_docs_per_sec": round(n_docs / ocr_sec, 2) if ocr_sec else None,
                "ocr_runs": ocr_runs,
                "cpus": int(CPUS),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
