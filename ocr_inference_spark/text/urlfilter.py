"""URL-level document filtering (the RefinedWeb / CCNet recipe).

Before a crawler even fetches a page, production corpora drop URLs by
(a) a domain blocklist matched at every registrable suffix level,
(b) a weighted soft-word score over the URL's alphanumeric tokens,
with (c) a curated allowlist overriding both.  Penedo et al. 2023
(RefinedWeb §2.2 / Appendix G.1) publish exactly this three-stage
design: 4.6M blocked domains, a banned-word list with weights, and
an allowlist that rescues misfired blocks.

Scale posture: the blocklist is millions of rows in production, so
matching is NOT a constant-folded literal — the host explodes into
its <= MAX_SUFFIX_LEVELS dot-suffixes and equi-joins a broadcast
blocklist relation (suffix matching as a join, the only shape that
survives a 10^12-URL frontier); the word score explodes distinct URL
tokens into a broadcast join against the weight relation and re-sums
per URL (the shuffle carries (doc_id, int) pairs only).  Everything
else is whole-stage-codegen'd string ops.

The synthetic frontier derives hosts/paths from doc_id arithmetic so
the DuckDB oracle reconstructs every verdict relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# curated allowlist — overrides every block rule (RefinedWeb G.1)
ALLOW_DOMAINS = ("archive.example",)
# blocked registrable domains; matching covers subdomains too
BLOCK_DOMAINS = ("casino-win.example", "tracker.net", "bad.example")
# soft banned words with severity weights; distinct-token sum >=
# SCORE_THRESHOLD blocks the URL
BANNED_WORDS = {
    "poker": 2,
    "casino": 2,
    "bet": 2,
    "adult": 2,
    "win": 1,
    "free": 1,
    "download": 1,
}
SCORE_THRESHOLD = 2
# deepest suffix level a host is matched at (a.b.c.d -> 4 candidates)
MAX_SUFFIX_LEVELS = 5


def synth_frontier_urls(docs_df: DataFrame) -> DataFrame:
    """Deterministic crawl frontier: one URL per documents row whose
    host and path exercise every rule — doc_id%7==3 sits on a
    blocklisted domain, %7==5 on a subdomain of one, %7==6 on an
    allowlisted host that carries a banned word ('poker') to prove
    the allowlist override, and doc_id%5 rotates the path through
    word-score slots (1 -> free+download = 2 blocked, 2 -> bet = 2
    blocked, 3 -> win = 1 allowed, else clean).  Pure Catalyst."""
    host = (
        "CASE doc_id % 7"
        " WHEN 3 THEN 'casino-win.example'"
        " WHEN 5 THEN 'ads.tracker.net'"
        " WHEN 6 THEN 'poker.archive.example'"
        " ELSE 'site' || (doc_id % 7) || '.example' END"
    )
    seg = (
        "CASE doc_id % 5"
        " WHEN 1 THEN '/free-download'"
        " WHEN 2 THEN '/bet-now'"
        " WHEN 3 THEN '/win-big'"
        " ELSE '/news' END"
    )
    return docs_df.select(
        "doc_id",
        F.expr(host).alias("host"),
        F.expr(
            f"'http://' || {host} || '/page/' ||"
            f" lpad(cast(doc_id as string), 6, '0') || {seg}"
        ).alias("url"),
    )


def url_filter(
    spark: SparkSession, frontier: DataFrame
) -> DataFrame:
    """Classify every frontier URL: (doc_id, url, host, score,
    reason, allowed).  reason in ('allowlist', 'domain_blocklist',
    'word_score', 'clean'); evaluation order allowlist > domain
    blocklist > word score, per the published pipeline."""
    allow_df = F.broadcast(
        spark.createDataFrame(
            [(d,) for d in ALLOW_DOMAINS], "sfx_a string"
        )
    )
    block_df = F.broadcast(
        spark.createDataFrame(
            [(d,) for d in BLOCK_DOMAINS], "sfx_b string"
        )
    )
    words_df = F.broadcast(
        spark.createDataFrame(
            sorted(BANNED_WORDS.items()), "word string, weight long"
        )
    )

    # host -> every dot-suffix that could hold a (block|allow)list
    # entry: 'a.b.c' -> ['a.b.c', 'b.c', 'c'] (bounded depth)
    sufx = frontier.withColumn(
        "sufx_",
        F.expr(
            "transform(sequence(1, least(size(split(host, '\\\\.')),"
            f" {MAX_SUFFIX_LEVELS})),"
            " i -> array_join(slice(split(host, '\\\\.'), i,"
            f" {MAX_SUFFIX_LEVELS}), '.'))"
        ),
    )
    lists = (
        sufx.select("doc_id", F.explode("sufx_").alias("s"))
        .join(allow_df, F.col("s") == F.col("sfx_a"), "left")
        .join(block_df, F.col("s") == F.col("sfx_b"), "left")
        .groupBy("doc_id")
        .agg(
            (F.count("sfx_a") > 0).alias("in_allow"),
            (F.count("sfx_b") > 0).alias("in_block"),
        )
    )

    # distinct alphanumeric URL tokens -> broadcast weight join ->
    # per-URL integer sum (shuffle rows are (doc_id, long))
    toks = frontier.select(
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct(filter(split(lower(url),"
                " '[^a-z0-9]+'), t -> t != ''))"
            )
        ).alias("tok"),
    )
    scores = (
        toks.join(words_df, F.col("tok") == F.col("word"), "left")
        .groupBy("doc_id")
        .agg(F.coalesce(F.sum("weight"), F.lit(0)).alias("score"))
    )

    out = (
        frontier.join(lists, "doc_id")
        .join(scores, "doc_id")
        .withColumn(
            "reason",
            F.expr(
                "CASE WHEN in_allow THEN 'allowlist'"
                " WHEN in_block THEN 'domain_blocklist'"
                f" WHEN score >= {SCORE_THRESHOLD} THEN 'word_score'"
                " ELSE 'clean' END"
            ),
        )
        .withColumn(
            "allowed", F.expr("reason IN ('allowlist', 'clean')")
        )
    )
    return out.select(
        "doc_id", "url", "host", "score", "reason", "allowed"
    )
