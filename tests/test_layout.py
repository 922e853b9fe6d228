"""LAYOUT mode region classification (F4/F5, LineMode.LAYOUT)."""

from __future__ import annotations

from ocr_inference_spark.imgcodec import png_encode
from ocr_inference_spark.render import render_page

LINES = ["hello world again", "the quick brown fox"]


def test_classify_regions_names_furniture():
    from ocr_inference_spark.imgcodec import png_decode
    from ocr_inference_spark.kernels.binarize import binarize, to_gray
    from ocr_inference_spark.layout import classify_regions
    from ocr_inference_spark.page import _detect

    img = png_encode(render_page(LINES, noise=True, caption=True))
    ink = binarize(to_gray(png_decode(img)))
    mask, comps = _detect(ink)
    classes = sorted(cls for cls, _ in classify_regions(comps, mask.shape, ink.shape[1]))
    assert classes.count("line") == len(LINES)
    assert "caption" in classes
    assert "margin" in classes
    assert "header" in classes
    assert "pagenr" in classes


def test_detect_layout_filter_classes(spark):
    from pyspark.sql import Row

    from ocr_inference_spark.layout import detect_layout
    from ocr_inference_spark.schemas import PAGES_SCHEMA

    img = png_encode(render_page(LINES, noise=True, caption=True))
    pages = spark.createDataFrame(
        [Row(media_ref="p0", content=img, width=0, height=0)], schema=PAGES_SCHEMA
    )
    all_rows = detect_layout(spark, pages).collect()
    assert {r["cls"] for r in all_rows} >= {"line", "caption", "margin", "header", "pagenr"}
    only_lines = detect_layout(spark, pages, filter_classes=["line"]).collect()
    assert len(only_lines) == len(LINES)
    assert all(r["cls"] == "line" for r in only_lines)
