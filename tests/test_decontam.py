"""Decontamination + perplexity bucketing (text/decontam.py):
planted-overlap fixtures and an independent pure-Python NLL
reference."""

from __future__ import annotations

import math
import re

from pyspark.sql import Row


def test_contamination_planted_overlap(spark):
    from ocr_inference_spark.text.decontam import contamination_scan

    passage = " ".join(f"p{i}" for i in range(15))  # 15 tokens
    docs = spark.createDataFrame(
        [
            # carries the full passage -> shares all 3 of its shingles
            Row(doc_id=0, text="intro words " + passage + " outro"),
            # carries only the first 13 tokens -> exactly 1 shingle
            Row(doc_id=1, text=" ".join(f"p{i}" for i in range(13))),
            # clean control
            Row(doc_id=2, text="completely unrelated text " * 10),
        ]
    )
    evals = spark.createDataFrame([Row(eval_id=100, eval_text=passage)])
    got = {
        (r["doc_id"], r["eval_id"]): r["shared_ngrams"]
        for r in contamination_scan(docs, evals).collect()
    }
    assert got == {(0, 100): 3, (1, 100): 1}


def test_contamination_repeated_shingle_counts_once(spark):
    from ocr_inference_spark.text.decontam import contamination_scan

    run = " ".join(f"x{i}" for i in range(13))
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=run + " filler " + run)]
    )
    evals = spark.createDataFrame([Row(eval_id=9, eval_text=run)])
    rows = contamination_scan(docs, evals).collect()
    assert len(rows) == 1 and rows[0]["shared_ngrams"] == 1


def test_synth_eval_set_rules(spark):
    from ocr_inference_spark.text.decontam import (
        EVAL_LEN,
        synth_eval_set,
    )

    long_text = " ".join(f"t{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            Row(doc_id=4, text=long_text),  # 4 % 31 == 4 -> eval item
            Row(doc_id=35, text="short one two"),  # selected but short
            Row(doc_id=5, text=long_text),  # not selected
        ]
    )
    rows = synth_eval_set(docs).collect()
    assert [r["eval_id"] for r in rows] == [4]
    assert rows[0]["eval_text"] == " ".join(
        f"t{i}" for i in range(5, 5 + EVAL_LEN)
    )


def test_perplexity_matches_python_reference(spark):
    from ocr_inference_spark.text.decontam import perplexity_buckets

    texts = {
        0: "a a a b c",  # reference slice (doc 0 % 10 == 0)
        1: "a b",
        2: "c c zzz",  # zzz is OOV
        3: "a a a a",
        10: "b c a",  # reference slice too
    }
    docs = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in texts.items()]
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["nll_micro_per_tok"], r["bucket"]
        )
        for r in perplexity_buckets(docs).collect()
    }

    # independent reference
    ref_toks = [
        w for d in (0, 10)
        for w in re.split(r"[^a-z0-9]+", texts[d].lower()) if w
    ]
    counts: dict[str, int] = {}
    for w in ref_toks:
        counts[w] = counts.get(w, 0) + 1
    total, vocab = len(ref_toks), len(counts)

    def nll(w):
        return math.floor(
            1_000_000 * math.log((1.0 * total + vocab) / (counts.get(w, 0) + 1))
        )

    per_tok = {}
    for d, t in texts.items():
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        per_tok[d] = (len(ws), sum(nll(w) for w in ws) // len(ws))
    order = sorted(per_tok, key=lambda d: (per_tok[d][1], d))
    # 5 docs -> ntile(3) sizes 2/2/1
    buckets = {}
    for i, d in enumerate(order):
        buckets[d] = "head" if i < 2 else ("middle" if i < 4 else "tail")
    want = {
        d: (per_tok[d][0], per_tok[d][1], buckets[d]) for d in per_tok
    }
    assert got == want
    # the all-high-frequency doc must be more reference-like than the
    # OOV-carrying doc
    assert got[3][1] < got[2][1]
