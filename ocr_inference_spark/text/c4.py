"""C4-style line-level page filtering (Raffel et al. 2020, §2.2).

The published cleaning pass LLM training pipelines run on raw web
extractions before dedup: keep only lines ending in terminal
punctuation and holding >= 5 words, drop policy/boilerplate lines
("cookie", "javascript", ...), and kill whole pages that carry the
"lorem ipsum" placeholder, a curly brace (code), or fewer than 3
surviving sentences.  Everything here is pure Catalyst (higher-order
functions over a split-lines array, whole-stage codegen'd, zero
Python) so the verdicts are engine-exact under the value-hash gate
and the 100-TB posture is a map-only scan — same design as the
Gopher gates in analysis.py.

The synthetic page builder derives a deterministic multi-line page
per `documents` row from doc_id arithmetic alone (the q50/q44
recipe), so the DuckDB oracle can reconstruct the expected verdicts
relationally and a drifted rule on either side breaks the hash.

Public knowledge: "Exploring the Limits of Transfer Learning with a
Unified Text-to-Text Transformer" (C4 corpus construction rules).
Relation to the reference: this is the quality-gate analogue of the
reference's post-OCR text cleanup stage (BDRC/exporter.py trims and
drops empty/garbage lines before export); C4's published rule set is
the web-corpus generalization of that gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# page-kill minimum of surviving sentences (the paper's value)
MIN_SENTENCES = 3
# line-keep minimum word count (the paper's value)
MIN_LINE_WORDS = 5
# policy phrases whose presence drops a line (paper: the cookie /
# javascript boilerplate family)
POLICY_PHRASES = ("cookie", "terms of use", "privacy policy")
# maximum body lines materialized per synthetic page
MAX_BODY_LINES = 8


def synth_c4_pages(docs_df: DataFrame, keep_text: bool = False) -> DataFrame:
    """Deterministic raw web page per documents row: body lines are
    5-word windows of the document text (every (doc_id+i)%3==0 line
    loses its last word so the >=5-words rule has both outcomes, and
    every (doc_id+i)%4==1 line loses its terminal period so the
    punctuation rule does too), then rule-triggering boilerplate is
    appended by doc_id arithmetic: a cookie notice (%9==2), a
    javascript nag (%7==0), the lorem-ipsum placeholder (%11==3) and
    a code fragment with a curly brace (%13==5).  Pure Catalyst."""
    body = (
        "CASE WHEN n_body_ >= 1 THEN"
        " transform(sequence(0, n_body_ - 1), i -> CASE"
        "  WHEN (doc_id + i) % 4 = 1 THEN array_join(slice(w_, i*5 + 1,"
        "   CASE WHEN (doc_id + i) % 3 = 0 THEN 4 ELSE 5 END), ' ')"
        "  ELSE array_join(slice(w_, i*5 + 1,"
        "   CASE WHEN (doc_id + i) % 3 = 0 THEN 4 ELSE 5 END), ' ') || '.'"
        " END)"
        " ELSE array() END"
    )
    extras = (
        "concat("
        " CASE WHEN doc_id % 9 = 2 THEN array('this website uses cookies"
        " to improve your experience.') ELSE array() END,"
        " CASE WHEN doc_id % 7 = 0 THEN array('please enable javascript"
        " to view this page.') ELSE array() END,"
        " CASE WHEN doc_id % 11 = 3 THEN array('lorem ipsum dolor sit"
        " amet.') ELSE array() END,"
        " CASE WHEN doc_id % 13 = 5 THEN array('function parse() {')"
        " ELSE array() END)"
    )
    carried = ["doc_id"] + (["text"] if keep_text else [])
    return (
        docs_df.select(
            *carried,
            F.expr(
                "filter(split(coalesce(text, ''), '\\\\s+'), w -> w != '')"
            ).alias("w_"),
        )
        .withColumn(
            "n_body_",
            F.expr(f"least(size(w_) div 5, {MAX_BODY_LINES})"),
        )
        .select(
            *carried,
            F.expr(f"array_join(concat({body}, {extras}), '\\n')").alias(
                "page"
            ),
        )
    )


def c4_filter(df: DataFrame, text_col: str = "page") -> DataFrame:
    """Append the C4 verdict columns: n_lines (raw), kept_lines
    (lines surviving the line rules), page_kept (page-level verdict),
    and clean_md5 (md5 of the newline-joined retained text, NULL for
    dropped pages).  Line rules: terminal punctuation ('.', '!', '?',
    '\"'), >= MIN_LINE_WORDS words, no 'javascript', no policy
    phrase.  Page rules: no 'lorem ipsum', no '{', and >=
    MIN_SENTENCES surviving lines.  All string predicates — no
    floats, no Python, no shuffle."""
    policy = " OR ".join(
        f"contains(lower(l), '{p}')" for p in POLICY_PHRASES
    )
    kept = (
        f"filter(split(coalesce({text_col}, ''), '\\n'), l ->"
        " right(l, 1) IN ('.', '!', '?', '\"')"
        f" AND size(filter(split(l, '\\\\s+'), w -> w != ''))"
        f" >= {MIN_LINE_WORDS}"
        " AND NOT contains(lower(l), 'javascript')"
        f" AND NOT ({policy}))"
    )
    staged = df.withColumn(
        "n_lines",
        F.expr(
            f"cast(size(split(coalesce({text_col}, ''), '\\n')) as bigint)"
        ),
    ).withColumn("kept_", F.expr(kept))
    staged = staged.withColumn(
        "kept_lines", F.expr("cast(size(kept_) as bigint)")
    ).withColumn(
        "page_kept",
        F.expr(
            f"NOT contains(lower(coalesce({text_col}, '')), 'lorem ipsum')"
            f" AND NOT contains(coalesce({text_col}, ''), '{{')"
            f" AND size(kept_) >= {MIN_SENTENCES}"
        ),
    )
    return staged.withColumn(
        "clean_md5",
        F.expr(
            "CASE WHEN page_kept THEN md5(array_join(kept_, '\\n'))"
            " ELSE NULL END"
        ),
    ).drop("kept_")
