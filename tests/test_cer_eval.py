"""QA metric path (EP4 analogue — OCREvaluator.evaluate_distribution,
BDRC/inference.py:1013-1040): join predictions to labels, per-line CER
via built-in levenshtein, aggregate per distribution. On our exact
pipeline the CER must be exactly 0."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cer_zero_on_synth_corpus(spark):
    from ocr_inference_spark.pipeline import recognize_pages
    from ocr_inference_spark.synth import synth_corpus

    docs, pages, expected = synth_corpus(spark, "/root/testdata/sf0.001", n_docs=16)

    # labels: golden line texts in reading order per page
    labels = (
        expected.select("doc_id", F.explode("spans").alias("s"))
        .where((F.col("s.kind") == "text") & F.col("s.media_ref").isNotNull())
        .groupBy(F.col("s.media_ref").alias("media_ref"))
        .agg(F.collect_list(F.struct("s.offset", "s.text")).alias("ls"))
        .select(
            "media_ref",
            F.transform(F.array_sort("ls"), lambda x: x["text"]).alias("label_lines"),
        )
        .select("media_ref", F.posexplode("label_lines").alias("line_rank", "label"))
    )

    preds = recognize_pages(spark, docs, pages).select(
        "media_ref", "line_rank", F.col("text").alias("prediction")
    )
    joined = preds.join(labels, ["media_ref", "line_rank"], "full_outer")
    cer = joined.select(
        (
            F.levenshtein(
                F.coalesce("prediction", F.lit("")), F.coalesce("label", F.lit(""))
            )
            / F.greatest(F.length(F.coalesce("label", F.lit(""))), F.lit(1))
        ).alias("cer")
    )
    stats = cer.agg(
        F.round(F.avg("cer"), 9).alias("avg_cer"), F.count("*").alias("n")
    ).collect()[0]
    assert stats["n"] > 0
    assert stats["avg_cer"] == 0.0
