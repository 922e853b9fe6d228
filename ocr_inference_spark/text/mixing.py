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
