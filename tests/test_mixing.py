"""Training-mix assembly (text/mixing.py): stratified sampling and
sequence packing pinned against independent pure-Python references,
plus the funnel query's cross-stage consistency."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row


def _docs(spark):
    rows = []
    for i in range(60):
        lang = ["en", "es", "zh"][i % 3]
        text = " ".join(f"w{j}" for j in range((i * 7) % 40 + 1))
        rows.append(Row(doc_id=i, lang=lang, text=text))
    rows.append(Row(doc_id=60, lang="en", text=""))  # token-free doc
    return spark.createDataFrame(rows)


def test_stratified_sample_matches_python(spark):
    from ocr_inference_spark.text.mixing import stratified_sample

    df = _docs(spark)
    got = {
        (r["lang"], r["doc_id"]): r["rnk"]
        for r in stratified_sample(df, quota=5).collect()
    }
    # independent reference draw
    by_lang: dict[str, list[tuple[str, int]]] = {}
    for i in range(61):
        lang = ["en", "es", "zh"][i % 3] if i < 60 else "en"
        key = hashlib.md5(f"mix-v1:{i}".encode()).hexdigest()
        by_lang.setdefault(lang, []).append((key, i))
    want = {}
    for lang, entries in by_lang.items():
        for rnk, (_, d) in enumerate(sorted(entries)[:5], start=1):
            want[(lang, d)] = rnk
    assert got == want


def test_stratified_sample_salt_redraws(spark):
    from ocr_inference_spark.text.mixing import stratified_sample

    df = _docs(spark)
    a = {
        (r["lang"], r["doc_id"])
        for r in stratified_sample(df, quota=5, salt="mix-v1").collect()
    }
    b = {
        (r["lang"], r["doc_id"])
        for r in stratified_sample(df, quota=5, salt="mix-v2").collect()
    }
    assert a != b  # a salt change redraws
    assert len(a) == len(b) == 15  # but quotas hold


def test_pack_sequences_matches_python(spark):
    from ocr_inference_spark.text.mixing import pack_sequences

    df = _docs(spark)
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["tok_end"], r["bin_start"], r["bin_end"]
        )
        for r in pack_sequences(df, budget=16).collect()
    }
    cum: dict[str, int] = {}
    want = {}
    for i in range(60):  # doc 60 is token-free: excluded
        lang = ["en", "es", "zh"][i % 3]
        n = (i * 7) % 40 + 1
        start = cum.get(lang, 0)
        end = start + n
        cum[lang] = end
        want[i] = (n, end, start // 16, (end - 1) // 16)
    assert got == want
    assert 60 not in got


def test_pack_long_doc_spans_bins(spark):
    from ocr_inference_spark.text.mixing import pack_sequences

    df = spark.createDataFrame(
        [
            Row(doc_id=0, lang="en", text="a b c"),  # ends at 3
            Row(doc_id=1, lang="en", text=" ".join(["t"] * 20)),  # 3..23
        ]
    )
    rows = {r["doc_id"]: r for r in pack_sequences(df, budget=8).collect()}
    assert rows[0]["bin_start"] == 0 and rows[0]["bin_end"] == 0
    assert rows[1]["bin_start"] == 0 and rows[1]["bin_end"] == 2


def test_quality_funnel_is_monotone_and_consistent(spark, tmp_path):
    """Funnel counts must be monotone non-increasing, start at the
    corpus size, and agree with recomputing the verdicts directly."""
    from ocr_inference_spark.queries import q70_quality_funnel

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        q70_quality_funnel(spark, sf).collect(), key=lambda r: r["stage"]
    )
    names = [r["stage_name"] for r in rows]
    counts = [r["survivors"] for r in rows]
    assert names == [
        "extracted",
        "c4_clean",
        "gopher_quality",
        "gopher_repetition",
        "exact_dedup",
    ]
    assert counts[0] == 500
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[-1] > 0


def test_bpe_pair_counting_semantics(spark, monkeypatch, tmp_path):
    """BPE pair counts: repeated pairs inside one word count per
    occurrence, weighted by word frequency (the published algorithm's
    counting rule)."""
    import ocr_inference_spark.queries as Q

    docs = spark.createDataFrame(
        [Row(doc_id=0, text="aaa aaa ab"), Row(doc_id=1, text="aaa Ab!")]
    )
    real_t = Q._t
    monkeypatch.setattr(
        Q, "_t", lambda spark, sf, name: docs if name == "documents"
        else real_t(spark, sf, name)
    )
    got = {
        (r["left"], r["right"]): r["pair_count"]
        for r in Q.q75_bpe_pair_stats(spark, "unused").collect()
    }
    # 'aaa' freq 3 -> ('a','a') twice per word = 6; 'ab' freq 2 -> 2
    assert got == {("a", "a"): 6, ("a", "b"): 2}
