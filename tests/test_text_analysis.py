from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        Row(id=1, text="The quick brown fox jumps over the lazy dog and it is fine"),
        Row(id=2, text="1234 5678 9012"),
        Row(id=3, text="  spaced    out   words  "),
        Row(id=4, text=""),
    ]
    return spark.createDataFrame(rows)


def _one(df, col, id_):
    return df.where(F.col("id") == id_).select(col.alias("v")).collect()[0]["v"]


def test_clean_text(df):
    from ocr_inference_spark.text.analysis import clean_text

    assert _one(df, clean_text(F.col("text")), 3) == "spaced out words"


def test_token_count(df):
    from ocr_inference_spark.text.analysis import token_count

    assert _one(df, token_count(F.col("text")), 3) == 3
    assert _one(df, token_count(F.col("text")), 4) == 0


def test_bpe_ish_token_count(spark):
    from ocr_inference_spark.text.analysis import bpe_ish_token_count

    df = spark.createDataFrame([Row(id=1, text="abc123, def!")])
    # tokens: abc | 123 | , | def | !
    assert _one(df, bpe_ish_token_count(F.col("text")), 1) == 5


def test_stopword_and_langid(df):
    from ocr_inference_spark.text.analysis import lang_id, stopword_ratio

    assert _one(df, stopword_ratio(F.col("text")), 1) > 0.2
    assert _one(df, lang_id(F.col("text")), 1) == "en"
    assert _one(df, lang_id(F.col("text")), 2) == "und"


def test_quality_ordering(df):
    from ocr_inference_spark.text.analysis import quality_score

    prose = _one(df, quality_score(F.col("text")), 1)
    digits = _one(df, quality_score(F.col("text")), 2)
    assert prose > digits


def test_fingerprint_deterministic(df):
    from ocr_inference_spark.text.analysis import fingerprint

    a = _one(df, fingerprint(F.col("text")), 1)
    b = _one(df, fingerprint(F.col("text")), 1)
    assert a == b
    assert a != _one(df, fingerprint(F.col("text")), 2)
    # matches the documented recurrence
    text = "The quick brown fox jumps over the lazy dog and it is fine"
    h = 0
    for ch in text:
        h = (h * 31 + ord(ch)) % 2_147_483_647
    assert a == h
