"""HTTP redirect-chain resolution over a crawl's capture index.

A crawl archives 3xx captures whose Location targets may themselves be
redirects; mapping every alias URL to its final destination is a
transitive-closure walk over the redirect graph. At 10^12 captures the
chain walk cannot be a driver loop per URL — it is POINTER DOUBLING
(the parallel list-ranking primitive, Wyllie 1979): each round joins
the partial-resolution relation with itself so every chain pointer
jumps twice as far, reaching any chain of length ``max_hops`` in
ceil(log2(max_hops)) self-join rounds. Each round is one equi-join of
the 3xx subset only (dwarfed by the 200s), so the whole resolution is
a handful of narrow shuffles regardless of corpus size — the same
log-round discipline as the large-star/small-star CC contraction in
dedup.py, applied to chains.

Cycles (A->B->A) never reach a terminal capture and exceed no-progress
detection naturally: their hop counts double past ``max_hops`` and the
rows are reported unresolved, matching how a real client gives up
after its redirect limit (RFC 9110 §15.4 recommends such a cap).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(cdx: DataFrame, max_hops: int = 16) -> DataFrame:
    """CDX capture index (url, status, redirect, ...) ->
    (src, final_url, hops, resolved): for every 3xx capture, the end
    of its redirect chain. ``resolved`` is true iff the chain lands on
    a non-3xx capture present in the index within ``max_hops`` hops;
    dead links (target never captured) and cycles report false."""
    is_redirect = (F.col("status") >= 300) & (F.col("status") < 400)
    edges = (
        cdx.where(is_redirect & F.col("redirect").isNotNull())
        .select(
            F.col("url").alias("src"),
            F.col("redirect").alias("dst"),
        )
        # a URL captured twice with the same target dedupes; conflicting
        # targets (recrawl moved the alias) keep the lexicographic min
        # for determinism
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
        .withColumn("hops", F.lit(1).cast("long"))
    )
    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    f = edges
    for _ in range(rounds):
        nxt = (
            f.alias("a")
            .join(f.alias("b"), F.col("a.dst") == F.col("b.src"), "left")
            .select(
                F.col("a.src").alias("src"),
                F.coalesce(F.col("b.dst"), F.col("a.dst")).alias("dst"),
                (
                    F.col("a.hops")
                    + F.coalesce(F.col("b.hops"), F.lit(0))
                ).alias("hops"),
            )
        )
        f = nxt
    terminals = (
        cdx.where(~is_redirect)
        .select(F.col("url").alias("dst"))
        .distinct()
        .withColumn("is_final", F.lit(True))
    )
    return (
        f.join(terminals, "dst", "left")
        .select(
            "src",
            F.col("dst").alias("final_url"),
            "hops",
            (
                F.coalesce(F.col("is_final"), F.lit(False))
                & (F.col("hops") <= F.lit(max_hops))
            ).alias("resolved"),
        )
    )
