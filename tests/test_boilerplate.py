"""Cross-page template removal: the injected blocks are invisible to
single-page heuristics by construction, only the domain-frequency rule
removes them, thresholds and edge domains behave, and the q52 chain
restores the clean q44 span derivation."""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_inference_spark.text.boilerplate import (
    strip_template_blocks,
    synth_boiler_corpus,
    template_blocks_for,
)
from ocr_inference_spark.text.html_extract import (
    parse_html_spans,
    synth_html_for,
)

TEXT = "the quick brown fox jumps over the lazy dog near the river bank " * 4


SPAN_SCHEMA = (
    "doc_id string, kind string, text string, media_ref string, "
    "offset int, domain string"
)


def make_df(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "kind", "text", "media_ref", "offset", "domain"]
    )
    return spark.createDataFrame(pdf, schema=SPAN_SCHEMA)


# ---------------------------------------------------------- page synthesis


def test_template_blocks_survive_single_page_heuristics():
    top, bottom = template_blocks_for(3)
    doc = synth_html_for(10, TEXT, (top, bottom))
    spans = parse_html_spans(doc)
    texts = [t for k, t, _ in spans if k == "text"]
    # the single-page extractor KEEPS the planted blocks (no class/id
    # hint, no links) — that blindness is what q52 exists to fix
    assert texts[0] == top and texts[-1] == bottom
    # and the clean page is byte-identical to the no-blocks render
    clean = synth_html_for(10, TEXT)
    assert clean == doc.replace(f"<p>{top}</p>\n", "").replace(
        f"\n<p>{bottom}</p>", ""
    )


def test_template_blocks_positions():
    top, bottom = template_blocks_for(0)
    spans = parse_html_spans(synth_html_for(7, TEXT, (top, bottom)))
    assert spans[0] == ("text", top, None)
    assert spans[-1] == ("text", bottom, None)
    mids = spans[1:-1]
    assert all(k in ("text", "media") for k, _, _ in mids) and len(mids) >= 1


# ------------------------------------------------------------- strip rule


def test_strip_removes_frequent_blocks_and_reranks(spark):
    rows = []
    for d in range(5):
        rows += [
            (str(d), "text", "SHARED header blurb", None, 0, "a.example"),
            (str(d), "text", f"unique body {d}", None, 1, "a.example"),
            (str(d), "media", None, f"img_{d}.png", 2, "a.example"),
            (str(d), "text", "shared   header blurb", None, 3, "a.example"),
        ]
    out = strip_template_blocks(make_df(spark, rows)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.offset, r.kind, r.text))
    for d in range(5):
        got = sorted(by_doc[str(d)])
        # both variants are independently frequent (each on 5/5 pages
        # under its own key) so both are removed
        assert (0, "text", f"unique body {d}") in got
        assert all("SHARED" not in (t or "") for _, _, t in got)
        offs = [o for o, _, _ in got]
        assert offs == list(range(len(offs)))  # dense re-rank


def test_strip_whitespace_variant_is_a_different_block(spark):
    # 'shared   header blurb' (multi-space) hashes differently from
    # 'SHARED header blurb' -> it is its own block, also on 5/5 pages,
    # also removed. Pin that both go.
    rows = []
    for d in range(5):
        rows += [
            (str(d), "text", "SHARED header blurb", None, 0, "a.example"),
            (str(d), "text", "shared   header blurb", None, 1, "a.example"),
            (str(d), "text", f"unique {d}", None, 2, "a.example"),
        ]
    out = strip_template_blocks(make_df(spark, rows)).collect()
    assert sorted((r.doc_id, r.text) for r in out) == [
        (str(d), f"unique {d}") for d in range(5)
    ]


def test_threshold_and_small_domain_floor(spark):
    rows = []
    # domain a: 10 pages, block on 5 (50% < 60%) -> kept
    for d in range(10):
        rows.append((f"a{d}", "text", f"body a{d}", None, 0, "a.example"))
        if d < 5:
            rows.append(("a%d" % d, "text", "half-frequent", None, 1, "a.example"))
    # domain b: 1 page, its block repeated WITHIN the page -> kept
    # (countDistinct pages = 1 < min_pages floor of 2)
    rows += [
        ("b0", "text", "solo block", None, 0, "b.example"),
        ("b0", "text", "solo block", None, 1, "b.example"),
    ]
    # domain c: 3 pages, block on all 3 (>= ceil(0.6*3)=2) -> removed
    for d in range(3):
        rows += [
            (f"c{d}", "text", "promo line", None, 0, "c.example"),
            (f"c{d}", "text", f"body c{d}", None, 1, "c.example"),
        ]
    out = strip_template_blocks(make_df(spark, rows)).collect()
    texts = sorted((r.doc_id, r.offset, r.text) for r in out)
    assert ("a0", 1, "half-frequent") in texts
    assert ("b0", 0, "solo block") in texts and ("b0", 1, "solo block") in texts
    assert all(t != "promo line" for _, _, t in texts)
    assert ("c0", 0, "body c0") in texts  # re-ranked to 0 after removal


def test_null_domain_rows_kept(spark):
    rows = [
        (str(d), "text", "would-be template", None, 0, None) for d in range(6)
    ]
    out = strip_template_blocks(make_df(spark, rows)).collect()
    assert len(out) == 6  # no frequency evidence without a domain


def test_media_spans_never_candidates(spark):
    rows = []
    for d in range(4):
        rows += [
            (str(d), "media", None, "logo.png", 0, "a.example"),
            (str(d), "text", f"body {d}", None, 1, "a.example"),
        ]
    out = strip_template_blocks(make_df(spark, rows)).collect()
    assert sum(1 for r in out if r.kind == "media") == 4  # same ref on all pages


# ----------------------------------------------------------------- e2e


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_q52_restores_clean_q44_spans(spark, sf_dir):
    from ocr_inference_spark.queries import QUERIES

    got = QUERIES["q52_template_removal"](spark, sf_dir)
    clean = QUERIES["q44_html_extract_spans"](spark, sf_dir)
    g = sorted(
        (r.doc_id, r.offset, r.kind, r.text, r.media_ref) for r in got.collect()
    )
    c = sorted(
        (r.doc_id, r.offset, r.kind, r.text, r.media_ref) for r in clean.collect()
    )
    assert g == c
    doms = {r.domain for r in got.select("domain").distinct().collect()}
    assert doms == {f"site{k}.example" for k in range(7)}


def test_boiler_corpus_pages_carry_their_site_blocks(spark, sf_dir="/root/testdata/sf0.001"):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = synth_boiler_corpus(spark, docs, n_docs=14).collect()
    assert len(pages) == 14
    for r in pages:
        top, bottom = template_blocks_for(r.doc_id % 7)
        assert f"<p>{top}</p>" in r.html and f"<p>{bottom}</p>" in r.html
        assert r.url.endswith(f"/doc/{r.doc_id:08d}")
