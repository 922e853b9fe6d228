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


class TestGopherQuality:
    """Gopher-rule integer quality gate (analysis.gopher_quality)."""

    def _metrics(self, spark, text):
        from ocr_inference_spark.text.analysis import gopher_quality

        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        return gopher_quality(df).collect()[0].asDict()

    def test_good_prose_passes(self, spark):
        text = ("the quick brown fox jumps over a lazy dog and then " * 5).strip()
        m = self._metrics(spark, text)
        assert m["passes"] is True
        assert m["word_count"] == 55
        assert m["stop_hits"] >= 2

    def test_too_short_fails(self, spark):
        m = self._metrics(spark, "the cat sat on a mat")
        assert m["word_count"] == 6 and m["passes"] is False

    def test_mean_word_length_band(self, spark):
        # single-char soup: mean 100 < 300 -> fail
        m = self._metrics(spark, " ".join(["a"] * 40))
        assert m["mean_word_len_x100"] == 100 and m["passes"] is False
        # very long tokens: mean > 1000 -> fail
        m = self._metrics(spark, " ".join(["the", "a"] + ["x" * 30] * 38))
        assert m["mean_word_len_x100"] > 1000 and m["passes"] is False

    def test_stopword_rule(self, spark):
        words = " ".join(["alpha beta gamma delta"] * 10)
        m = self._metrics(spark, words)
        assert m["stop_hits"] == 0 and m["passes"] is False

    def test_symbol_word_cap(self, spark):
        base = "the quick brown fox and a dog ran far away today "
        text = base * 3 + " ".join(["#tag"] * 10)
        m = self._metrics(spark, text)
        assert m["symbol_words"] == 10
        assert 10 * m["symbol_words"] >= m["word_count"]
        assert m["passes"] is False

    def test_bullet_and_ellipsis_lines(self, spark):
        prose = "the quick brown fox jumps over a lazy dog again and again"
        bullets = "\n".join(f"- item {i}" for i in range(20))
        m = self._metrics(spark, prose + "\n" + bullets)
        assert m["bullet_lines"] == 20 and m["n_lines"] == 21
        assert m["passes"] is False  # 20/21 > 90% bullet lines
        trailing = "\n".join(
            [prose] * 2 + ["the story continues..." for _ in range(3)]
        )
        m = self._metrics(spark, trailing)
        assert m["ellipsis_lines"] == 3 and m["n_lines"] == 5
        assert m["passes"] is False  # 3/5 > 30% ellipsis lines

    def test_empty_and_null(self, spark):
        from ocr_inference_spark.text.analysis import gopher_quality

        df = spark.createDataFrame(
            [(0, ""), (1, None)], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}
        for d in (0, 1):
            assert rows[d]["word_count"] == 0
            assert rows[d]["mean_word_len_x100"] == 0
            assert rows[d]["passes"] is False

    def test_unicode_bullet_and_ellipsis(self, spark):
        text = "• bullet line\nthe end comes soon…"
        m = self._metrics(spark, text)
        assert m["bullet_lines"] == 1 and m["ellipsis_lines"] == 1


class TestGopherRepetition:
    def _m(self, spark, text):
        from ocr_inference_spark.text.analysis import gopher_repetition

        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        return gopher_repetition(df).collect()[0].asDict()

    def test_no_repetition_passes(self, spark):
        m = self._m(spark, "each word appears exactly once here today")
        assert m["top_word_cnt"] == 1 and m["top_bigram_cnt"] == 1
        assert m["passes_repetition"] is True

    def test_repeated_word_fails(self, spark):
        text = "spam " * 30 + "alpha beta gamma delta epsilon"
        m = self._m(spark, text)
        assert m["top_word_cnt"] == 30
        assert m["top_word_frac_x1000"] > 150
        assert m["passes_repetition"] is False

    def test_repeated_bigram_counted(self, spark):
        text = ("one two " * 5).strip()  # bigram 'one two' x5, 'two one' x4
        m = self._m(spark, text)
        assert m["top_bigram_cnt"] == 5

    def test_empty_and_single_word(self, spark):
        m = self._m(spark, "")
        assert m["top_word_cnt"] == 0 and m["top_bigram_cnt"] == 0
        assert m["passes_repetition"] is True  # nothing repeats
        m = self._m(spark, "solo")
        assert m["top_word_cnt"] == 1 and m["top_word_frac_x1000"] == 1000
        assert m["passes_repetition"] is True  # count 1 = no repetition

    def test_substring_windows_cross_doc_only(self, spark):
        """q63 semantics on a planted corpus: a 32-char phrase shared by
        two docs is reported; a phrase inside only one doc is not."""
        from pyspark.sql import functions as F

        shared = "x" * 32
        docs = spark.createDataFrame(
            [(0, "aa " + shared + " bb"), (1, "cc " + shared), (2, "y" * 40)],
            "doc_id long, text string",
        )
        W = 32
        wins = (
            docs.where(F.length("text") >= W)
            .select(
                "doc_id",
                F.explode(F.sequence(F.lit(0), F.length("text") - W)).alias("p"),
                "text",
            )
            .select("doc_id", F.expr(f"substring(text, p + 1, {W})").alias("win"))
        )
        out = (
            wins.groupBy("win")
            .agg(F.countDistinct("doc_id").alias("n_docs"))
            .where(F.col("n_docs") >= 2)
            .collect()
        )
        # both docs contain the space-prefixed 31-x window too ("aa " /
        # "cc " precede the run) — the x-run shifted by one char
        assert {r["win"] for r in out} == {shared, " " + "x" * 31}
