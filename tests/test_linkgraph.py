"""Link extraction, RFC 3986 resolution, and integer PageRank."""

import pandas as pd
import pytest

from ocr_inference_spark.text.linkgraph import (
    DAMP_DEN,
    DAMP_NUM,
    RANK_SCALE,
    edge_list,
    extract_links,
    pagerank,
    parse_html_links,
    resolve_href,
    synth_link_corpus,
)


class TestParseLinks:
    def test_basic_and_order(self):
        doc = '<p><a href="/a">one</a> text <a href="/b">two</a></p>'
        assert parse_html_links(doc) == [
            ("/a", "one", False),
            ("/b", "two", False),
        ]

    def test_nofollow_multi_token_rel(self):
        doc = '<a rel="nofollow sponsored ugc" href="/x">x</a>'
        assert parse_html_links(doc) == [("/x", "x", True)]
        doc2 = '<a rel="noopener" href="/x">x</a>'
        assert parse_html_links(doc2) == [("/x", "x", False)]

    def test_fragment_and_empty_dropped(self):
        doc = '<a href="#top">t</a><a href="">e</a><a href=" ">s</a>'
        assert parse_html_links(doc) == []

    def test_script_rawtext_never_yields_links(self):
        doc = "<script>var a = '<a href=\"/no\">x</a>';</script><a href='/y'>y</a>"
        assert parse_html_links(doc) == [("/y", "y", False)]

    def test_nested_a_implicitly_closes(self):
        doc = '<a href="/outer">out <a href="/inner">in</a></a>'
        assert parse_html_links(doc) == [
            ("/outer", "out", False),
            ("/inner", "in", False),
        ]

    def test_unclosed_trailing_a_tolerated(self):
        doc = '<p><a href="/tail">dangling text'
        assert parse_html_links(doc) == [("/tail", "dangling text", False)]

    def test_anchor_entity_decode_and_ws_normalize(self):
        doc = '<a href="/x">a &amp;\n   b</a>'
        assert parse_html_links(doc) == [("/x", "a & b", False)]


class TestResolve:
    BASE = "http://site1.example/doc/00000008"

    def test_relative_dot_segments(self):
        assert (
            resolve_href(self.BASE, "../doc/./00000042")
            == "http://site1.example/doc/00000042"
        )

    def test_scheme_relative(self):
        assert (
            resolve_href(self.BASE, "//site3.example/doc/00000017")
            == "http://site3.example/doc/00000017"
        )

    def test_messy_absolute_canonicalized(self):
        assert (
            resolve_href(self.BASE, "HTTP://SITE2.EXAMPLE:80/doc/00000004?utm_source=x#f")
            == "http://site2.example/doc/00000004"
        )

    def test_non_web_schemes_dropped(self):
        for href in ("mailto:a@b.example", "javascript:void(0)", "data:,x"):
            assert resolve_href(self.BASE, href) is None

    def test_absolute_path(self):
        assert (
            resolve_href(self.BASE, "/about")
            == "http://site1.example/about"
        )


def _py_pagerank(nodes, wedges, iterations):
    """Independent pure-python reference of the integer semantics."""
    base = (RANK_SCALE * DAMP_DEN - RANK_SCALE * DAMP_NUM) // DAMP_DEN
    node_set = set(nodes)
    kept = [(s, d, w) for s, d, w in wedges if d in node_set]
    od = {}
    for s, _, w in kept:
        od[s] = od.get(s, 0) + w
    r = {u: RANK_SCALE for u in nodes}
    for _ in range(iterations):
        nxt = {u: base for u in nodes}
        for s, d, w in kept:
            nxt[d] += (DAMP_NUM * r[s] * w) // (DAMP_DEN * od[s])
        r = nxt
    return r


class TestPagerank:
    def _run(self, spark, nodes, wedges, iterations):
        nodes_df = spark.createDataFrame([(u,) for u in nodes], "url string")
        edges_df = spark.createDataFrame(
            wedges, "src string, dst string, n long"
        )
        got = {
            r["url"]: r["rank_micro"]
            for r in pagerank(edges_df, nodes_df, iterations).collect()
        }
        assert got == _py_pagerank(nodes, wedges, iterations)
        return got

    def test_triangle_with_dangling(self, spark):
        nodes = ["A", "B", "C"]
        wedges = [("A", "B", 1), ("A", "C", 1), ("B", "C", 1)]
        got = self._run(spark, nodes, wedges, 2)
        # C is dangling: its mass is dropped, its own rank floors at base
        # after the in-flow; A receives nothing.
        base = (RANK_SCALE * DAMP_DEN - RANK_SCALE * DAMP_NUM) // DAMP_DEN
        assert got["A"] == base
        assert got["C"] > got["B"] > got["A"]

    def test_closed_world_outdeg_after_filter(self, spark):
        # A links to B (captured) and X (not captured): after the filter
        # A's outdeg is 1, so B gets A's FULL damped rank, not half.
        nodes = ["A", "B"]
        wedges = [("A", "B", 1), ("A", "X", 5)]
        got = self._run(spark, nodes, wedges, 1)
        base = (RANK_SCALE * DAMP_DEN - RANK_SCALE * DAMP_NUM) // DAMP_DEN
        assert got["B"] == base + (DAMP_NUM * RANK_SCALE) // DAMP_DEN

    def test_parallel_edge_weight(self, spark):
        # weight-2 edge out of A alongside a weight-1 edge: 2/3 vs 1/3
        nodes = ["A", "B", "C"]
        wedges = [("A", "B", 2), ("A", "C", 1)]
        got = self._run(spark, nodes, wedges, 1)
        base = (RANK_SCALE * DAMP_DEN - RANK_SCALE * DAMP_NUM) // DAMP_DEN
        assert got["B"] - base == 2 * (got["C"] - base)

    def test_mass_bound(self, spark):
        # total rank never exceeds N * RANK_SCALE (floor drops mass)
        nodes = ["A", "B", "C", "D"]
        wedges = [("A", "B", 1), ("B", "C", 1), ("C", "D", 1), ("D", "A", 1)]
        got = self._run(spark, nodes, wedges, 3)
        assert sum(got.values()) <= len(nodes) * RANK_SCALE

    def test_large_k_bounded_plan(self, spark):
        # round-6 lineage cut: 20 iterations must stay exact vs the
        # pure-python reference AND complete with a bounded plan (the
        # pre-cut formulation built a 20-join-deep tree re-running the
        # edge extraction per round)
        nodes = ["A", "B", "C", "D", "E"]
        wedges = [
            ("A", "B", 1), ("B", "C", 2), ("C", "A", 1),
            ("C", "D", 1), ("D", "E", 1), ("E", "A", 3),
        ]
        self._run(spark, nodes, wedges, 20)


@pytest.fixture()
def docs_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


class TestCorpusExtraction:
    def test_edges_match_construction_rule(self, spark, docs_df):
        pages = synth_link_corpus(spark, docs_df, n_docs=64)
        edges = {
            (r["src"], r["dst"], r["anchor"], r["nofollow"]): r["n"]
            for r in edge_list(extract_links(pages)).collect()
        }
        expected = {}
        for d in range(64):
            if d % 13 == 0:
                continue
            src = f"http://site{d % 7}.example/doc/{d:08d}"
            t0 = (3 * d + 1) % 64
            expected[
                (src, f"http://site{t0 % 7}.example/doc/{t0:08d}",
                 f"study {t0}", False)
            ] = 2 if d % 11 == 0 else 1
            if d % 3 >= 1:
                t1 = (5 * d + 2) % 64
                expected[
                    (src, f"http://site{d % 7}.example/doc/{t1:08d}",
                     f"note & appendix {t1}", False)
                ] = 1
            if d % 3 == 2:
                t2 = (7 * d + 3) % 64
                expected[
                    (src, f"http://site{t2 % 7}.example/doc/{t2:08d}",
                     f"sponsor {t2}", True)
                ] = 1
        assert edges == expected

    def test_dangling_pages_have_no_edges(self, spark, docs_df):
        pages = synth_link_corpus(spark, docs_df, n_docs=64)
        srcs = {
            r["src"]
            for r in extract_links(pages).select("src").distinct().collect()
        }
        for d in (0, 13, 26, 39, 52):
            assert f"http://site{d % 7}.example/doc/{d:08d}" not in srcs
