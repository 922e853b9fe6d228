"""URL canonicalization: RFC 3986 syntax-based normalization rules,
crawl conventions (fragment drop, tracking strip, query sort),
registrable-domain extraction, idempotence, and the Spark operator."""

from __future__ import annotations

import pytest

from ocr_inference_spark.text.urlnorm import (
    normalize_url,
    registered_domain,
    synth_messy_urls,
)


@pytest.mark.parametrize(
    "raw,expect",
    [
        # case + default port + fragment
        ("HTTP://Example.COM:80/Path#frag", "http://example.com/Path"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com:8443/", "https://example.com:8443/"),
        # dot segments
        ("http://h/a/../b/./c", "http://h/b/c"),
        ("http://h/a/..", "http://h/"),
        ("http://h/a/b/..", "http://h/a/"),
        ("http://h/./", "http://h/"),
        ("http://h", "http://h/"),
        # percent normalization: unreserved decoded, others uppercased
        ("http://h/%64%6f%63", "http://h/doc"),
        ("http://h/a%2fb", "http://h/a%2Fb"),
        ("http://h/%7Euser", "http://h/~user"),
        # tracking strip + sort + empty-query drop
        ("http://h/p?utm_source=x&utm_medium=y", "http://h/p"),
        ("http://h/p?b=2&a=1&gclid=zz", "http://h/p?a=1&b=2"),
        ("http://h/p?b=2&a=1&fbclid=zz#f", "http://h/p?a=1&b=2"),
        ("http://h/p?flag&a=1", "http://h/p?a=1&flag"),
        # host trailing dot, userinfo preserved
        ("http://example.com./x", "http://example.com/x"),
        ("http://u@example.com/x", "http://u@example.com/x"),
    ],
)
def test_normalize_rules(raw, expect):
    assert normalize_url(raw) == expect


@pytest.mark.parametrize(
    "raw",
    ["ftp://h/x", "not a url", "http://", "mailto:a@b", "", "http://h:bad/x"],
)
def test_unparseable_or_non_http_is_none(raw):
    assert normalize_url(raw) is None


@pytest.mark.parametrize(
    "raw",
    [
        "HTTP://A.B.Example.COM:80/a/../%64?b=2&a=1&utm_x=0#f",
        "https://h:8443/x%2Fy?z",
        "http://u@example.com./p/./q",
    ],
)
def test_normalization_is_idempotent(raw):
    once = normalize_url(raw)
    assert normalize_url(once) == once


@pytest.mark.parametrize(
    "host,expect",
    [
        ("example.com", "example.com"),
        ("www.example.com", "example.com"),
        ("a.b.c.example.com", "example.com"),
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("www.media.site3.co.uk", "site3.co.uk"),
        ("co.uk", "co.uk"),
        ("localhost", "localhost"),
    ],
)
def test_registered_domain(host, expect):
    assert registered_domain(host) == expect


def test_messy_corpus_collapses_per_spec(spark):
    from pyspark.sql import functions as F

    from ocr_inference_spark.text.urlnorm import normalize_urls

    docs = spark.range(16).withColumnRenamed("id", "doc_id")
    out = normalize_urls(synth_messy_urls(spark, docs, n_docs=16))
    rolled = {
        (r.url_norm, r.domain): r.n
        for r in out.groupBy("url_norm", "domain").agg(F.count("*").alias("n")).collect()
    }
    for d in range(16):
        k = d % 7
        host = f"media.site{k}.co.uk" if d % 5 == 0 else f"site{k}.example"
        dom = f"site{k}.co.uk" if d % 5 == 0 else f"site{k}.example"
        base = f"http://{host}/doc/{d:08d}"
        assert rolled[(base, dom)] == 3
        assert rolled[(base + "?a=1&b=2", dom)] == 1
    assert len(rolled) == 32


def test_null_and_bad_urls_pass_through_as_nulls(spark):
    import pandas as pd

    from ocr_inference_spark.text.urlnorm import normalize_urls

    df = spark.createDataFrame(
        pd.DataFrame({"url": ["http://OK.example/x", "junk", None]})
    )
    rows = sorted(
        normalize_urls(df).collect(), key=lambda r: (r.url_norm is None, str(r.url))
    )
    assert rows[0].url_norm == "http://ok.example/x"
    assert rows[0].domain == "ok.example"
    assert all(r.url_norm is None and r.domain is None for r in rows[1:])


def test_politeness_schedule_invariants(spark):
    """q62: slots are dense 0..n-1 per domain; fetch_ts = slot * delay
    with delay = 1 + site-digit % 5; deterministic across runs."""
    from ocr_inference_spark.queries import q62_politeness_schedule

    rows = q62_politeness_schedule(spark, "/root/testdata/sf0.001").collect()
    by_domain = {}
    for r in rows:
        by_domain.setdefault(r["domain"], []).append(r)
    for dom, rs in by_domain.items():
        rs.sort(key=lambda r: r["slot"])
        assert [r["slot"] for r in rs] == list(range(len(rs)))
        digit = next(c for c in dom if c.isdigit())
        delay = 1 + int(digit) % 5
        for r in rs:
            assert r["fetch_ts_s"] == r["slot"] * delay
        # within-domain order is by canonical URL
        urls = [r["url_norm"] for r in rs]
        assert urls == sorted(urls)
