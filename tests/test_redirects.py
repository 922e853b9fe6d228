"""Redirect-chain resolution: pointer doubling reaches long chains in
log rounds, cycles and dead links report unresolved, relative Location
targets are absolutized by the CDX layer, hop counts are exact."""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_inference_spark.text.redirects import resolve_redirects

CDX_SCHEMA = (
    "url string, status int, mime string, length long, "
    "digest string, redirect string"
)


def cdx_df(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["url", "status", "mime", "length", "digest", "redirect"]
    )
    return spark.createDataFrame(pdf, schema=CDX_SCHEMA)


def r(url, target):
    return (url, 301, "", 0, "d41d8cd98f00b204e9800998ecf8427e", target)


def page(url):
    return (url, 200, "text/html", 10, "x", None)


def test_long_chain_resolves_with_exact_hops(spark):
    # 9 hops > 2^3: needs the full ceil(log2(16)) = 4 doubling rounds
    rows = [r(f"http://h/{i}", f"http://h/{i + 1}") for i in range(9)]
    rows.append(page("http://h/9"))
    out = {x.src: x for x in resolve_redirects(cdx_df(spark, rows)).collect()}
    assert len(out) == 9
    for i in range(9):
        row = out[f"http://h/{i}"]
        assert (row.final_url, row.hops, row.resolved) == ("http://h/9", 9 - i, True)


def test_cycle_reports_unresolved(spark):
    rows = [r("http://h/a", "http://h/b"), r("http://h/b", "http://h/a")]
    out = resolve_redirects(cdx_df(spark, rows)).collect()
    assert len(out) == 2 and all(not x.resolved for x in out)


def test_dead_link_reports_unresolved(spark):
    rows = [r("http://h/a", "http://h/never-captured")]
    (row,) = resolve_redirects(cdx_df(spark, rows)).collect()
    assert row.final_url == "http://h/never-captured" and not row.resolved


def test_chain_longer_than_max_hops_is_capped(spark):
    rows = [r(f"http://h/{i}", f"http://h/{i + 1}") for i in range(6)]
    rows.append(page("http://h/6"))
    out = {
        x.src: x
        for x in resolve_redirects(cdx_df(spark, rows), max_hops=4).collect()
    }
    assert out["http://h/5"].resolved  # 1 hop
    assert out["http://h/2"].resolved  # 4 hops, at the cap
    assert not out["http://h/0"].resolved  # 6 hops > cap


def test_conflicting_recrawl_targets_pick_deterministic_min(spark):
    rows = [
        r("http://h/a", "http://h/z2"),
        r("http://h/a", "http://h/z1"),
        page("http://h/z1"),
        page("http://h/z2"),
    ]
    (row,) = resolve_redirects(cdx_df(spark, rows)).collect()
    assert (row.final_url, row.resolved) == ("http://h/z1", True)


def test_duplicate_identical_captures_dedupe(spark):
    rows = [
        r("http://h/a", "http://h/b"),
        r("http://h/a", "http://h/b"),
        page("http://h/b"),
    ]
    out = resolve_redirects(cdx_df(spark, rows)).collect()
    assert len(out) == 1 and out[0].hops == 1 and out[0].resolved


def test_cdx_absolutizes_relative_location(spark):
    from ocr_inference_spark.text.warc import (
        build_warc_file,
        warc_cdx_index,
    )

    docs = [(13, "body " * 30)]
    pdf = pd.DataFrame(
        {"warc_name": ["a.warc"], "data": [build_warc_file(1, docs, redirects=True)]}
    )
    cdx = warc_cdx_index(spark.createDataFrame(pdf)).collect()
    by_url = {c.url: c for c in cdx}
    hop1 = by_url["http://site6.example/r1/00000013"]
    hop2 = by_url["http://site6.example/r2/00000013"]
    # the 301's wire Location is the relative '/doc/00000013'
    assert hop1.redirect == "http://site6.example/doc/00000013"
    assert hop1.status == 301 and hop2.status == 302
    assert hop2.redirect == "http://site6.example/r1/00000013"
    assert by_url["http://site6.example/doc/00000013"].redirect is None


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_q55_every_alias_lands_on_its_page(spark, sf_dir):
    from ocr_inference_spark.queries import QUERIES

    out = QUERIES["q55_redirect_resolution"](spark, sf_dir).collect()
    assert len(out) == 128 and all(x.resolved for x in out)
    for x in out:
        assert x.final_url.rsplit("/", 1)[-1] == x.src.rsplit("/", 1)[-1]
        assert x.hops == (2 if "/r2/" in x.src else 1)
