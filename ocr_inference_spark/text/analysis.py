"""Text analysis as pure Catalyst expressions (whole-stage codegen'd).

Each builder returns a Column usable over any string column — applied
to the `documents` testdata table in the driver contract and to
extracted span text in the OCR pipeline. No Python UDFs anywhere
(SURVEY.md §2.11 "never per-row Python").

The cleanup functions are the relational analogues of the reference's
label/prediction post-processing: preprocess_unicode strips control
characters and normalizes separators via regex
(BDRC/label_encoder.py:10-32); prediction cleanup trims and remaps a
sentinel to space (BDRC/inference.py:634-638).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# a small deterministic English stopword list (public knowledge)
STOPWORDS = (
    "the of and a to in is it you that he was for on are as with his they i".split()
)


def clean_text(col) -> Column:
    """Collapse whitespace runs, trim, lowercase (C1-C3 analogue)."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def strip_brackets(col) -> Column:
    """Remove [...] and (...) groups (cf. bracket removal,
    BDRC/label_encoder.py:10-32)."""
    return F.regexp_replace(col, r"[\[\(][^\]\)]*[\]\)]", "")


def token_count(col) -> Column:
    """Whitespace token count; empty string counts 0."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token count: split on word/number/punct boundaries
    with a BPE-flavored regex (letter runs, digit runs, punctuation
    each count separately)."""
    arr = F.regexp_extract_all(col, F.lit(r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])"), 1)
    return F.size(arr)


def char_count(col) -> Column:
    return F.length(col)


def word_lengths_avg(col) -> Column:
    words = F.split(F.trim(col), r"\s+")
    return F.aggregate(
        words, F.lit(0.0), lambda acc, w: acc + F.length(w)
    ) / F.greatest(F.size(words), F.lit(1))


def punct_ratio(col) -> Column:
    n_punct = F.length(F.regexp_replace(col, r"[^.,;:!?'\-]", ""))
    return n_punct / F.greatest(F.length(col), F.lit(1))


def digit_ratio(col) -> Column:
    n_digit = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    return n_digit / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col) -> Column:
    """Fraction of tokens that are English stopwords."""
    words = F.split(F.lower(F.trim(col)), r"\s+")
    n_stop = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    return n_stop / F.greatest(F.size(words), F.lit(1))


def quality_score(col) -> Column:
    """Composite quality in [0,1]: long enough, not punct/digit-heavy,
    has stopwords (an English-prose prior). Deterministic arithmetic —
    identical formula is expressible in the DuckDB oracle."""
    len_term = F.least(F.length(col) / F.lit(200.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    digit_term = F.lit(1.0) - F.least(digit_ratio(col) * 4.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 3.0, F.lit(1.0))
    return (len_term + punct_term + digit_term + stop_term) / 4.0


def lang_id(col) -> Column:
    """N-gram-free heuristic language ID: 'en' when stopword evidence is
    present, 'und' otherwise; ASCII share gates non-Latin scripts."""
    ascii_share = F.length(F.regexp_replace(col, r"[^\x00-\x7F]", "")) / F.greatest(
        F.length(col), F.lit(1)
    )
    return (
        F.when(ascii_share < 0.5, F.lit("xx"))
        .when(stopword_ratio(col) > 0.08, F.lit("en"))
        .otherwise(F.lit("und"))
    )


def fingerprint(col, modulus: int = 2_147_483_647, base: int = 31) -> Column:
    """Polynomial rolling hash over character code points, mod a Mersenne
    prime — a deterministic document fingerprint computable identically
    in ANSI SQL (the DuckDB oracle uses the same recurrence)."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % modulus,
    )
