"""Benchmark decontamination and LM-perplexity quality bucketing.

Two published corpus-hygiene operators that complete the cleaning
stack:

* **Decontamination** (Brown et al. 2020 §C "documents with 13-gram
  overlap against the benchmarks"; Chowdhery et al. 2022 similar):
  every training document sharing a 13-token shingle with an eval-set
  item is flagged.  Corpus side explodes token shingles to 16-byte
  hashes map-side; the eval side is tiny by definition, so its
  shingle relation BROADCASTS and the only shuffle carries
  (doc_id, eval_id) int pairs into a count agg — at 10^12 docs this
  is the same banded-join discipline as MinHash-LSH (dedup.py).

* **Perplexity bucketing** (Wenzek et al. 2020, CCNet §4.3): score
  each document under a language model trained on a reference slice,
  then split the corpus into head/middle/tail quality buckets.  The
  LM here is add-one-smoothed unigram (the published method uses a
  5-gram KenLM; the bucket MECHANICS — reference-slice training,
  per-token NLL, tertile split — are identical and the repo's
  Katz-backoff LM in kernels/ctc.py shows the higher-order path).
  Exactness: per-token NLL is floored at x1e6 from the double ln
  (the engine-pair ln agreement is probed in text/retrieval.py's
  design note), so per-doc sums are integer-exact; buckets are an
  ntile-3 over (nll, doc_id) — a total order, hence deterministic.
  Scale: LM counts come from one groupBy over the slice and
  broadcast (vocab-sized); scoring is explode + broadcast join +
  sum (one narrow int shuffle); the tertile split is the one global
  sort — at 10^12 docs the published systems replace it with
  approximate quantile thresholds broadcast from a sample, which
  this module's ntile window degrades to gracefully (documented,
  same output contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# decontamination shingle width (the published 13-gram rule)
NGRAM_N = 13
# tokens per synthetic eval item (> NGRAM_N so items span several
# shingles and shared_ngrams is a real count, not a constant)
EVAL_LEN = 20
NLL_SCALE = 1_000_000


def _tok_expr(text_col: str) -> str:
    return (
        f"filter(split(lower(coalesce({text_col}, '')),"
        " '[^a-z0-9]+'), t -> t != '')"
    )


def synth_eval_set(docs_df: DataFrame, every: int = 31, at: int = 4) -> DataFrame:
    """Deterministic 'benchmark' items leaked from the corpus itself:
    for every doc with doc_id %% every == at, the eval item is that
    document's tokens [5, 5+EVAL_LEN) — the realistic contamination
    shape (a benchmark passage verbatim inside a training page).
    Items shorter than EVAL_LEN tokens are dropped."""
    return (
        docs_df.where(F.col("doc_id") % every == at)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.expr(
                f"array_join(slice({_tok_expr('text')}, 6, {EVAL_LEN}), ' ')"
            ).alias("eval_text"),
        )
        .where(
            F.expr(f"size(split(eval_text, ' ')) = {EVAL_LEN}")
        )
    )


def contamination_scan(
    docs_df: DataFrame, eval_df: DataFrame
) -> DataFrame:
    """(doc_id, eval_id, shared_ngrams) for every training document
    sharing >= 1 NGRAM_N-token shingle with an eval item."""
    corpus = docs_df.select(
        "doc_id", F.expr(_tok_expr("text")).alias("w_")
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(w_) >= {NGRAM_N} THEN"
                f" transform(sequence(0, size(w_) - {NGRAM_N}),"
                f"  i -> md5(array_join(slice(w_, i + 1, {NGRAM_N}), ' ')))"
                " ELSE array() END"
            )
        ).alias("g"),
    ).dropDuplicates(["doc_id", "g"])
    evals = eval_df.select(
        "eval_id", F.expr(f"split(eval_text, ' ')").alias("w_")
    ).select(
        "eval_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(w_) >= {NGRAM_N} THEN"
                f" transform(sequence(0, size(w_) - {NGRAM_N}),"
                f"  i -> md5(array_join(slice(w_, i + 1, {NGRAM_N}), ' ')))"
                " ELSE array() END"
            )
        ).alias("g"),
    ).dropDuplicates(["eval_id", "g"])
    return (
        corpus.join(F.broadcast(evals), "g")
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").alias("shared_ngrams"))
    )


def perplexity_buckets(
    docs_df: DataFrame, slice_mod: int = 10, slice_at: int = 0
) -> DataFrame:
    """CCNet-style quality split: (doc_id, n_tokens, nll_micro_per_tok,
    bucket) with bucket in head/middle/tail by ascending per-token
    NLL tertiles (head = most reference-like).  The LM is add-one
    unigram trained on docs with doc_id %% slice_mod == slice_at;
    out-of-vocabulary tokens score ln((total+V)/1) — the add-one
    floor."""
    toks = docs_df.select(
        "doc_id", F.explode(F.expr(_tok_expr("text"))).alias("term")
    )
    ref = toks.where(F.col("doc_id") % slice_mod == slice_at)
    counts = ref.groupBy("term").agg(F.count("*").alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("vocab")
    )
    # per-term NLL_micro = floor(1e6 * ln((total + V) / (cnt + 1)))
    lm = counts.crossJoin(F.broadcast(stats)).select(
        "term",
        F.expr(
            f"cast(floor({NLL_SCALE} * ln((1.0 * total + vocab)"
            " / (cnt + 1))) as bigint)"
        ).alias("nll_micro"),
    )
    scored = (
        toks.join(F.broadcast(lm), "term", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.coalesce(
                F.col("nll_micro"),
                F.expr(
                    f"cast(floor({NLL_SCALE} *"
                    " ln(1.0 * total + vocab)) as bigint)"
                ),
            ).alias("nll_micro"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("nll_micro").alias("nll_sum"),
        )
        .withColumn(
            "nll_micro_per_tok", F.expr("nll_sum div n_tokens")
        )
    )
    w = Window.orderBy(F.asc("nll_micro_per_tok"), F.asc("doc_id"))
    return scored.withColumn("t_", F.ntile(3).over(w)).select(
        "doc_id",
        "n_tokens",
        "nll_micro_per_tok",
        F.expr(
            "CASE t_ WHEN 1 THEN 'head' WHEN 2 THEN 'middle'"
            " ELSE 'tail' END"
        ).alias("bucket"),
    )
