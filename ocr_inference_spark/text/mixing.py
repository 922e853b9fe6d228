"""Training-mix assembly: deterministic stratified sampling and
concat-and-chunk sequence packing.

After extraction (q44/q48), cleaning (q60/q64/q65) and dedup
(q23-q26/q37/q63), a training pipeline still has to (a) draw a
per-stratum quota — the language/source mix weights every published
LLM data card lists — and (b) pack variable-length documents into
fixed token windows (the GPT-style "concatenate then split at the
context length" packing).  Both are implemented as exact integer /
hash-rank relational plans so they sit under the value-hash gate.

Scale posture, sampling: rank-within-stratum is a window sort, which
at 10^12 docs would sort every stratum end-to-end; the production
path is the hash-THRESHOLD preselect the IVF sampler established
(similarity.py:297-331 — a WHERE hash < t predicate sized from table
stats cuts the sort input to ~quota-sized candidate sets, then the
exact rank runs on the survivors).  The sampling key is md5 of the
doc id — a keyed uniform hash both engines compute identically —
so the draw is reproducible across engines and runs.

Scale posture, packing: the window definition is inherently
sequential per stream (a running token offset), so production packs
per (stratum, shard) — doc_id ranges pre-split the corpus into
independent streams and each shard's offsets are a narrow
partition-local window, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    docs_df: DataFrame,
    quota: int,
    stratum_col: str = "lang",
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic per-stratum sample: the ``quota`` docs with the
    smallest md5(salt || ':' || doc_id) per stratum (doc_id
    tiebreak).  Changing the salt redraws the whole sample; keeping
    it fixed makes the draw reproducible — both properties the
    training-mix ablation workflow needs."""
    key = F.md5(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(
        key.asc(), F.col("doc_id").asc()
    )
    return (
        docs_df.select(
            stratum_col, "doc_id", key.alias("sample_key")
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= quota)
        .select(stratum_col, "doc_id", "rnk")
    )


def pack_sequences(
    docs_df: DataFrame,
    budget: int,
    stream_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing: per stream, documents are laid out
    in doc_id order and the resulting token tape is cut every
    ``budget`` tokens.  Emits (stream, doc_id, n_tokens, tok_end,
    bin_start, bin_end) where bin_start/bin_end are the first/last
    window the document lands in (a long document legitimately spans
    several).  Exact integers: a running-sum window and two floor
    divisions."""
    toks = F.expr(
        f"cast(size(filter(split(coalesce({text_col}, ''), '\\\\s+'),"
        " w -> w != '')) as bigint)"
    )
    w = (
        Window.partitionBy(stream_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = (
        docs_df.select(
            stream_col, "doc_id", toks.alias("n_tokens")
        )
        .where(F.col("n_tokens") > 0)
        .withColumn("tok_end", F.sum("n_tokens").over(w))
    )
    return staged.select(
        stream_col,
        "doc_id",
        "n_tokens",
        "tok_end",
        F.expr(f"(tok_end - n_tokens) div {budget}").alias("bin_start"),
        F.expr(f"(tok_end - 1) div {budget}").alias("bin_end"),
    )


# ---------------------------------------------------------------------------
# DSIR — data selection by importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

# feature dimension of the hashed n-gram bag (the paper uses 10k; a
# smaller power of two keeps the sf0.001 test corpus from being
# all-singleton buckets while the plan shape is identical)
DSIR_BUCKETS = 1024
# fixed-point scale for floor(ln(.)) micro-units (same discipline as
# decontam.NLL_SCALE / retrieval's BM25 idf: flooring each ln to an
# integer makes every per-feature contribution an int and the per-doc
# sum order-free, so the result sits under the value-hash gate)
DSIR_SCALE = 1_000_000


def dsir_weights(
    docs_df: DataFrame,
    target_mod: int = 7,
    target_at: int = 3,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Hashed n-gram importance weights for data selection (DSIR,
    Xie et al. 2023): fit two bag-of-hashed-ngram unigram models —
    p over a deterministic in-corpus "target domain" slice
    (doc_id % target_mod == target_at), q over the full raw corpus —
    and score every document by the log importance weight
    sum_f [ln p(b(f)) - ln q(b(f))] over its unigram+bigram features,
    each token/bigram hashed into ``buckets`` buckets by
    md5-prefix % buckets (an engine-portable stand-in for the
    paper's feature hash).  Add-one smoothing over the bucket space.

    Integer-exact: per-bucket contribution is
    floor(1e6*ln((p_cnt+1)/(p_tot+B))) - floor(1e6*ln((q_cnt+1)/(q_tot+B))),
    a constant int per occurrence, so document scores are order-free
    BIGINT sums (the q67/q74 floor-of-ln discipline; engine-pair ln
    agreement probed in text/retrieval.py).

    Returns (doc_id, n_features, weight_micro); docs with zero
    alphanumeric tokens have no features and drop out, mirroring the
    paper's practice of excluding empty documents from resampling.

    Scale posture: feature extraction is a map-only explode; the
    model shuffle carries at most ``buckets`` (b, int, int) rows;
    the bucket->weight relation (~buckets rows) broadcasts back onto
    the feature stream; the only wide shuffle is the per-doc int sum.
    Nothing in the plan is corpus-cardinality-shaped except that
    narrow (doc_id, int) aggregate — 10^12-doc safe.

    Reference anchor: the selection objective is the published DSIR
    estimator; the reference repo has no analogue (it is an OCR
    engine), this is part of the training-data layer the brief adds.
    """
    from .decontam import _tok_expr

    bigrams = (
        "zip_with(slice(w_, 1, greatest(size(w_) - 1, 0)),"
        " slice(w_, 2, greatest(size(w_) - 1, 0)),"
        " (a, b) -> concat(a, ' ', b))"
    )
    bucket_of = (
        f"f -> cast(conv(substring(md5(f), 1, 8), 16, 10) as bigint)"
        f" % {buckets}"
    )
    feats = docs_df.select(
        "doc_id", F.expr(_tok_expr("text")).alias("w_")
    ).select(
        "doc_id",
        F.explode(
            F.expr(f"transform(concat(w_, {bigrams}), {bucket_of})")
        ).alias("b"),
    )
    # Materialize the feature stream ONCE (round 6, guide §1.2/§5): it
    # feeds both the bucket-count model AND the score-back join, and
    # without a lineage cut each consumer re-runs the tokenize + per-
    # feature md5 pass — the single most expensive map work in the
    # query (measured 13.2s -> ~7s at sf1.0). The checkpointed rows are
    # only (doc_id, long); at corpus scale this is the same "write the
    # fingerprints once" discipline as guide §8 step 1 (a persisted
    # intermediate table in production; executor-local blocks here).
    feats = feats.localCheckpoint(eager=True)
    counts = feats.groupBy("b").agg(
        F.count("*").alias("q_cnt"),
        F.sum(
            F.when(
                F.col("doc_id") % target_mod == target_at, 1
            ).otherwise(0)
        ).alias("p_cnt"),
    )
    totals = counts.agg(
        F.sum("q_cnt").alias("q_tot"), F.sum("p_cnt").alias("p_tot")
    )
    lm = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.expr(
            # pure double division on both engines (no decimal
            # intermediate), so the floor-ln boundary behavior is
            # identical by construction
            f"cast(floor({DSIR_SCALE} * ln(cast(p_cnt + 1 as double)"
            f" / cast(p_tot + {buckets} as double))) as bigint)"
            f" - cast(floor({DSIR_SCALE} * ln(cast(q_cnt + 1 as double)"
            f" / cast(q_tot + {buckets} as double))) as bigint)"
        ).alias("w_micro"),
    )
    return (
        feats.join(F.broadcast(lm), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_features"),
            F.sum("w_micro").alias("weight_micro"),
        )
    )


def dsir_select(
    docs_df: DataFrame,
    top_k: int,
    target_mod: int = 7,
    target_at: int = 3,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Top-``top_k`` documents by DSIR importance weight (weight
    desc, doc_id asc tiebreak — a total order, so the selected SET is
    deterministic and hash-gateable).  The paper resamples from the
    weight distribution; the deterministic top-k is the reproducible
    variant a production mix draw wants (q71's salt-redraw pattern
    covers the stochastic ablation axis).  The cut itself is a
    TakeOrderedAndProject — top-k over (doc_id, int) rows, never a
    full sort materialization."""
    return (
        dsir_weights(docs_df, target_mod, target_at, buckets)
        .orderBy(F.desc("weight_micro"), F.asc("doc_id"))
        .limit(top_k)
    )
