"""Inverted index + BM25 retrieval (text/retrieval.py): integer
scoring pinned against an independent pure-Python reference, ranking
cross-checked against textbook float BM25, and edge cases (absent
terms, empty docs, deterministic tie cut)."""

from __future__ import annotations

import math
import re

from pyspark.sql import Row

K1, B = 1.2, 0.75


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _py_bm25_int(docs, terms):
    """Independent integer-semantics reference (floors via //).
    Token-free docs don't posting anywhere, so (like the engine and
    the oracle, whose doc lengths come from the token stream) they
    are outside N and avgdl."""
    dl = {d: len(_toks(t)) for d, t in docs.items() if _toks(t)}
    n_docs, n_toks = len(dl), sum(dl.values())
    out = {}
    for term in terms:
        tfs = {d: _toks(t).count(term) for d, t in docs.items()}
        tfs = {d: tf for d, tf in tfs.items() if tf}
        if not tfs:
            continue
        df = len(tfs)
        idf = math.floor(
            1_000_000
            * math.log(1.0 + (2.0 * n_docs - 2 * df + 1) / (2 * df + 1))
        )
        for d, tf in tfs.items():
            tfc = (1000 * 22 * tf * n_toks) // (
                10 * n_toks * tf + 3 * n_toks + 9 * dl[d] * n_docs
            )
            s, h = out.get(d, (0, 0))
            out[d] = (s + idf * tfc, h + 1)
    return out


def _py_bm25_float(docs, terms):
    dl = {d: len(_toks(t)) for d, t in docs.items() if _toks(t)}
    n, avg = len(dl), sum(dl.values()) / len(dl)
    out = {}
    for term in terms:
        tfs = {d: _toks(t).count(term) for d, t in docs.items()}
        tfs = {d: tf for d, tf in tfs.items() if tf}
        if not tfs:
            continue
        df = len(tfs)
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, tf in tfs.items():
            out[d] = out.get(d, 0.0) + idf * tf * (K1 + 1) / (
                tf + K1 * (1 - B + B * dl[d] / avg)
            )
    return out


DOCS = {
    0: "spark table join spark spark",
    1: "vector join table window",
    2: "spark vector vector customer the quick brown fox",
    3: "customer customer customer order order",
    4: "the a of and in",
    5: "",
    6: "spark",
}


def _spark_docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in DOCS.items()]
    )


def test_bm25_matches_python_reference(spark):
    from ocr_inference_spark.text.retrieval import bm25_topk

    terms = ("spark", "customer", "missingterm")
    got = {
        r["doc_id"]: (r["score"], r["n_hits"])
        for r in bm25_topk(_spark_docs(spark), terms, k=10).collect()
    }
    assert got == _py_bm25_int(DOCS, terms)


def test_bm25_ranking_matches_float_bm25(spark):
    """The integer fixed-point must preserve the textbook float
    ranking on a fixture with well-separated scores."""
    from ocr_inference_spark.text.retrieval import bm25_topk

    terms = ("spark", "vector")
    rows = bm25_topk(_spark_docs(spark), terms, k=10).collect()
    got_order = [r["doc_id"] for r in rows]
    ref = _py_bm25_float(DOCS, terms)
    ref_order = sorted(ref, key=lambda d: (-ref[d], d))
    assert got_order == ref_order


def test_bm25_k_cut_deterministic_on_ties(spark):
    """Identical docs tie exactly; the cut keeps the lowest doc_ids."""
    from ocr_inference_spark.text.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="spark alpha beta") for i in range(10)]
    )
    rows = bm25_topk(docs, ("spark",), k=4).collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3]
    assert len({r["score"] for r in rows}) == 1


def test_index_stats(spark):
    from ocr_inference_spark.text.retrieval import index_stats

    got = {
        r["term"]: (r["df"], r["cf"], r["top_doc"], r["top_tf"])
        for r in index_stats(_spark_docs(spark)).collect()
    }
    # spark: docs 0(tf3), 2(tf1), 6(tf1) -> df 3, cf 5, top (0,3)
    assert got["spark"] == (3, 5, 0, 3)
    # vector: 1(tf1), 2(tf2) -> top doc 2
    assert got["vector"] == (2, 3, 2, 2)
    # tie on tf picks the min doc_id: 'table' in 0(tf1), 1(tf1)
    assert got["table"] == (2, 2, 0, 1)
    assert "missingterm" not in got


def test_bm25_plan_shape(spark):
    """Corpus constants and the idf relation must ride broadcasts;
    the cut must be TakeOrderedAndProject, not a global sort."""
    from ocr_inference_spark.text.retrieval import bm25_topk

    plan = (
        bm25_topk(_spark_docs(spark), ("spark",), k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoop" in plan or "BroadcastExchange" in plan
