"""Synthesized-corpus end-to-end: the distributed renderer + full OCR
pipeline reproduce the golden span sequences exactly (the flagship
``entry`` path)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _key(rows):
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in rows
    }


def test_synth_corpus_span_equality(spark):
    from ocr_inference_spark.pipeline import extract_spans
    from ocr_inference_spark.synth import synth_corpus

    docs, pages, expected = synth_corpus(spark, SF_DIR, n_docs=10)
    got = _key(extract_spans(spark, docs, pages).collect())
    want = _key(expected.collect())
    assert got == want


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.columns == ["doc_id", "kind", "text", "media_ref", "offset"]
    n = df.count()
    assert n > 0
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles).issubset(set(qs))
    assert len(qs) >= 30
