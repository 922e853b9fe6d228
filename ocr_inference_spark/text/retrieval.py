"""Inverted-index construction and BM25 ranked retrieval.

The indexing half of a training-data engine: corpora at the 10^12-doc
scale are searched (for contamination checks, eval-set leakage scans,
targeted subset pulls) through exactly this pair — a term-partitioned
postings relation and a top-k scorer over it.  Public knowledge:
Robertson & Zaragoza 2009 (BM25), the Lucene practical variant
idf = ln(1 + (N - df + 0.5)/(df + 0.5)).

Exactness under the value-hash gate: scores are integers.  The tf
saturation term with k1 = 1.2 = 6/5 and b = 0.75 = 3/4 is an exact
integer rational —

    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  = 22*tf*L / (10*L*tf + 3*L + 9*dl*N)        with avgdl = L/N

— floored at x1000 by BIGINT division, and idf is floored at x1e6
from the double ln (Spark's Math.log and DuckDB's std::log agree
bit-for-bit with libm across a dense (N, df) sweep — probed, not
assumed — and the floor makes any residual ulp risk observable, not
silent).  Per-term contributions are ints, so the per-doc sum is
order-independent and engine-exact.  int64 audit: 22000*tf*L at
tf<=10^3, L<=4*10^11 stays under 2^63; past that the two factors
rescale (documented, not load-bearing at test SFs).

Scale posture: one explode -> (term, doc_id) hash-agg builds the
postings (the single wide shuffle an index build fundamentally is);
retrieval filters postings to the query terms FIRST (predicate on the
term column — partition-prunable when the postings relation is
bucketed by term), joins the tiny per-term df/idf relation broadcast,
and ranks with TakeOrderedAndProject.  Corpus constants (N, L) ride a
broadcast 1-row relation, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BM25 constants as exact rationals: k1 = 12/10, b = 3/4
IDF_SCALE = 1_000_000
TFC_SCALE = 1_000


def tokenize_docs(docs_df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term) exploded token stream — lowercased alphanumeric
    words, the same token rule the URL filter and the oracle use."""
    return docs_df.select(
        "doc_id",
        F.explode(
            F.expr(
                f"filter(split(lower(coalesce({text_col}, '')),"
                " '[^a-z0-9]+'), t -> t != '')"
            )
        ).alias("term"),
    )


def build_postings(docs_df: DataFrame) -> DataFrame:
    """Postings relation (term, doc_id, tf) — one hash-agg shuffle on
    (term, doc_id); at warehouse scale this relation is written
    bucketed by term so every later retrieval prunes to its query's
    buckets."""
    return tokenize_docs(docs_df).groupBy("term", "doc_id").agg(
        F.count("*").alias("tf")
    )


def index_stats(docs_df: DataFrame) -> DataFrame:
    """Per-term index statistics: df (documents containing the term),
    cf (total occurrences), top_doc / top_tf (the highest-tf posting,
    doc_id-min tiebreak — deterministic).  Two narrow shuffles over
    integer rows: the postings build and the per-term rollup."""
    p = build_postings(docs_df)
    return p.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
        F.max(F.struct(F.col("tf"), (-F.col("doc_id")).alias("nd"))).alias(
            "m_"
        ),
    ).select(
        "term",
        "df",
        "cf",
        F.expr("-m_.nd").alias("top_doc"),
        F.col("m_.tf").alias("top_tf"),
    )


def bm25_topk(
    docs_df: DataFrame, query_terms: tuple[str, ...], k: int = 20
) -> DataFrame:
    """Top-k documents for a bag-of-words query under integer-exact
    BM25: (doc_id, score, n_hits), score desc / doc_id asc.  score =
    sum over matched terms of idf_micro * tfc_milli (see module
    docstring)."""
    # Round 6 single-pass shape (guide §1.2/§2.3): the old plan
    # tokenized the corpus TWICE (doc lengths, then query-term hits)
    # and ran three shuffles plus two joins. For a bag-of-words query
    # the per-(term, doc) tfs pivot into one column per query term, so
    # ONE tokenize pass and ONE per-doc aggregate produce (dl, tf_0..)
    # directly; df/idf collapse to a one-row broadcast relation and
    # the score is a map-side integer expression. Semantics unchanged:
    # tf per (term, doc), Lucene idf from df, x1000 exact-rational tf
    # saturation, per-term int contributions, docs with zero matched
    # terms excluded — identical output under the value-hash gate
    # (parity-verified). A pivot column per term suits bag-of-words
    # queries (a handful of terms); a very wide query should rank
    # against the build_postings relation instead.
    terms = sorted(query_terms)
    toks = tokenize_docs(docs_df)
    per_doc = toks.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.count(F.when(F.col("term") == t, F.lit(1))).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    consts = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("n_toks"),
        *[
            F.count(F.when(F.col(f"tf_{i}") > 0, F.lit(1))).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    ).select(
        "n_docs",
        "n_toks",
        *[
            F.expr(
                f"cast(floor({IDF_SCALE} * ln(1.0 +"
                f" (2.0 * n_docs - 2 * df_{i} + 1) / (2 * df_{i} + 1)))"
                " as bigint)"
            ).alias(f"idf_{i}")
            for i in range(len(terms))
        ],
    )
    contrib = [
        F.when(
            F.col(f"tf_{i}") > 0,
            F.col(f"idf_{i}")
            * F.expr(
                f"({TFC_SCALE} * 22 * tf_{i} * n_toks) div"
                f" (10 * n_toks * tf_{i} + 3 * n_toks + 9 * dl * n_docs)"
            ),
        ).otherwise(F.lit(0).cast("bigint"))
        for i in range(len(terms))
    ]
    n_hits = None
    for i in range(len(terms)):
        hit = F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)
        n_hits = hit if n_hits is None else n_hits + hit
    scored = (
        per_doc.crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            sum(contrib[1:], contrib[0]).alias("score"),
            n_hits.cast("long").alias("n_hits"),
        )
        .where(F.col("n_hits") > 0)
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
