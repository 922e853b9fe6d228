"""C4 line-level filtering (text/c4.py) and URL frontier filtering
(text/urlfilter.py) — rule-by-rule semantics pinned against hand
inputs plus an independent pure-Python reference for the md5 path."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row


def _c4(spark, pages):
    from ocr_inference_spark.text.c4 import c4_filter

    df = spark.createDataFrame(
        [Row(doc_id=i, page=p) for i, p in enumerate(pages)]
    )
    out = {
        r["doc_id"]: r
        for r in c4_filter(df).collect()
    }
    return [out[i] for i in range(len(pages))]


def test_c4_line_rules(spark):
    page = "\n".join(
        [
            "alpha beta gamma delta epsilon.",  # kept
            "alpha beta gamma delta epsilon",  # no terminal punct
            "alpha beta gamma delta.",  # only 4 words
            "please enable javascript to view this.",  # javascript
            "we updated our privacy policy today folks.",  # policy
            "is this a question with words?",  # kept (?)
            'he said "quoted line with five words"',  # kept (")
        ]
    )
    (r,) = _c4(spark, [page])
    assert r["n_lines"] == 7
    assert r["kept_lines"] == 3
    assert r["page_kept"] is True
    kept = "\n".join(
        [
            "alpha beta gamma delta epsilon.",
            "is this a question with words?",
            'he said "quoted line with five words"',
        ]
    )
    assert r["clean_md5"] == hashlib.md5(kept.encode()).hexdigest()


def test_c4_page_kills(spark):
    good = "one two three four five.\nsix seven eight nine ten.\n" \
        "ten nine eight seven six."
    rows = _c4(
        spark,
        [
            good,
            good + "\nLorem Ipsum dolor sit amet.",  # placeholder page
            good + "\nvar f = function() {",  # code page
            "one two three four five.\nsix seven eight nine ten.",  # <3
            good,  # control
        ],
    )
    assert [r["page_kept"] for r in rows] == [
        True,
        False,
        False,
        False,
        True,
    ]
    assert rows[3]["kept_lines"] == 2
    assert rows[1]["clean_md5"] is None


def test_c4_empty_and_null(spark):
    from ocr_inference_spark.text.c4 import c4_filter

    df = spark.createDataFrame(
        [Row(doc_id=0, page=""), Row(doc_id=1, page=None)]
    )
    rows = c4_filter(df).orderBy("doc_id").collect()
    for r in rows:
        assert r["page_kept"] is False
        assert r["kept_lines"] == 0


def test_synth_pages_trigger_every_rule(spark):
    """The deterministic corpus must exercise both outcomes of every
    rule within the first 64 docs."""
    from ocr_inference_spark.text.c4 import c4_filter, synth_c4_pages

    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=" ".join(f"w{j}" for j in range(45)))
            for i in range(64)
        ]
    )
    out = c4_filter(synth_c4_pages(docs)).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert not by_id[3]["page_kept"]  # 3 % 11 == 3 -> lorem ipsum
    assert not by_id[5]["page_kept"]  # 5 % 13 == 5 -> curly brace
    kept = [r for r in out if r["page_kept"]]
    dropped = [r for r in out if not r["page_kept"]]
    assert kept and dropped
    # line rules bite on kept pages too: fewer kept than raw lines
    assert all(r["kept_lines"] < r["n_lines"] for r in kept)


def test_url_filter_rules(spark):
    from ocr_inference_spark.text.urlfilter import url_filter

    frontier = spark.createDataFrame(
        [
            # allowlist overrides both banned word and blocklist roots
            Row(doc_id=0, host="poker.archive.example",
                url="http://poker.archive.example/casino-bet"),
            # exact blocklisted domain
            Row(doc_id=1, host="casino-win.example",
                url="http://casino-win.example/news"),
            # deep subdomain of a blocklisted domain
            Row(doc_id=2, host="a.b.ads.tracker.net",
                url="http://a.b.ads.tracker.net/x"),
            # word score at threshold (free+download = 2)
            Row(doc_id=3, host="ok.example",
                url="http://ok.example/free-download"),
            # word score below threshold (win = 1)
            Row(doc_id=4, host="ok.example",
                url="http://ok.example/win-big"),
            # repeated token counted once (bet once, distinct)
            Row(doc_id=5, host="ok.example",
                url="http://ok.example/bet/bet/bet"),
            # clean
            Row(doc_id=6, host="ok.example",
                url="http://ok.example/news/today"),
        ]
    )
    rows = {
        r["doc_id"]: r
        for r in url_filter(spark, frontier).collect()
    }
    assert rows[0]["reason"] == "allowlist" and rows[0]["allowed"]
    assert rows[1]["reason"] == "domain_blocklist"
    assert not rows[1]["allowed"]
    assert rows[2]["reason"] == "domain_blocklist"
    assert rows[3]["reason"] == "word_score" and rows[3]["score"] == 2
    assert rows[4]["reason"] == "clean" and rows[4]["score"] == 1
    assert rows[4]["allowed"]
    assert rows[5]["reason"] == "word_score" and rows[5]["score"] == 2
    assert rows[6]["reason"] == "clean" and rows[6]["score"] == 0


def test_url_filter_plan_is_broadcast(spark):
    """The list joins must be broadcast — a shuffled join over the
    frontier would be the 10^12-URL bottleneck."""
    from ocr_inference_spark.text.urlfilter import (
        synth_frontier_urls,
        url_filter,
    )

    docs = spark.range(0, 64).selectExpr("id as doc_id")
    plan = url_filter(spark, synth_frontier_urls(docs))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoop" not in plan
