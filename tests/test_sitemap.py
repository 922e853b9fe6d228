"""Sitemap parsing and crawl-coverage audit: tolerant XML scan, entity
decode, sitemapindex recognition, and the full-outer coverage join."""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_inference_spark.text.sitemap import (
    crawl_coverage,
    parse_sitemap,
    warc_extract_sitemaps,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> http://a.example/p?x=1&amp;y=2 </loc>
    <lastmod>2024-03-05</lastmod>
  </url>
  <url><loc>http://a.example/q</loc></url>
  <url><priority>0.5</priority></url>
  <URL><LOC>http://a.example/upper</LOC></URL>
</urlset>
"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<sitemap><loc>http://a.example/sitemap-1.xml</loc>
<lastmod>2024-01-01</lastmod></sitemap>
</sitemapindex>
"""


def test_parse_urlset_tolerant():
    rows = parse_sitemap(URLSET)
    assert rows == [
        ("http://a.example/p?x=1&y=2", "2024-03-05", False),  # entity + trim
        ("http://a.example/q", None, False),  # lastmod optional
        ("http://a.example/upper", None, False),  # case-insensitive tags
    ]


def test_parse_sitemapindex():
    assert parse_sitemap(INDEX) == [
        ("http://a.example/sitemap-1.xml", "2024-01-01", True)
    ]


def test_parse_garbage_yields_nothing():
    assert parse_sitemap("") == []
    assert parse_sitemap("<html><p>not a sitemap</p></html>") == []
    assert parse_sitemap("<urlset><url><loc></loc></url></urlset>") == []


def test_crawl_coverage_three_classes(spark):
    listed = spark.createDataFrame(
        pd.DataFrame(
            {
                "loc": ["http://h/both", "http://h/gap", "http://h/nested.xml"],
                "lastmod": ["2024-01-01", None, None],
                "is_index": [False, False, True],  # index rows excluded
            }
        ),
        schema="loc string, lastmod string, is_index boolean",
    )
    captured = spark.createDataFrame(
        pd.DataFrame({"url": ["http://h/both", "http://h/found", "http://h/both"]}),
        schema="url string",
    )
    got = {r.url: r for r in crawl_coverage(listed, captured).collect()}
    assert set(got) == {"http://h/both", "http://h/gap", "http://h/found"}
    assert (got["http://h/both"].listed, got["http://h/both"].captured) == (True, True)
    assert got["http://h/both"].lastmod == "2024-01-01"
    assert (got["http://h/gap"].listed, got["http://h/gap"].captured) == (True, False)
    assert (got["http://h/found"].listed, got["http://h/found"].captured) == (
        False,
        True,
    )


def test_warc_sitemap_extraction(spark):
    from ocr_inference_spark.text.warc import build_warc_file

    docs = [(i, f"text {i} " * 20) for i in range(0, 16)]
    data = build_warc_file(0, docs, sitemap_n_docs=16)
    pdf = pd.DataFrame({"warc_name": ["a.warc"], "data": [data]})
    rows = warc_extract_sitemaps(spark.createDataFrame(pdf)).collect()
    # per site: listed docs (id%5 != 4) + one phantom
    listed = {r.loc for r in rows if "/doc/" in r.loc}
    expected = {
        f"http://site{i % 7}.example/doc/{i:08d}"
        for i in range(16)
        if i % 5 != 4
    }
    assert listed == expected
    phantoms = sorted(r.loc for r in rows if "list?" in r.loc)
    assert phantoms == [
        f"http://site{k}.example/list?page=1&limit={k}" for k in range(7)
    ]
    assert all(not r.is_index for r in rows)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_q56_coverage_classes(spark, sf_dir):
    from ocr_inference_spark.queries import QUERIES

    rows = QUERIES["q56_sitemap_coverage"](spark, sf_dir).collect()
    assert len(rows) == 71
    both = [r for r in rows if r.listed and r.captured]
    gaps = [r for r in rows if r.listed and not r.captured]
    found = [r for r in rows if not r.listed and r.captured]
    assert len(both) == sum(1 for d in range(64) if d % 5 != 4)
    assert len(gaps) == 7 and all(r.lastmod == "2024-02-01" for r in gaps)
    assert len(found) == sum(1 for d in range(64) if d % 5 == 4)
    assert all(r.lastmod is None for r in found)
