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


def test_furniture_geometry_has_classifier_slack():
    """Drift guard: the synthetic furniture must sit WELL INSIDE the
    classifier's acceptance regions (>=20% slack on each bound), so a
    renderer tweak cannot silently flip a class."""
    import numpy as np

    from ocr_inference_spark import layout as L
    from ocr_inference_spark.imgcodec import png_decode
    from ocr_inference_spark.kernels.morphology import V_RADIUS
    from ocr_inference_spark.kernels.binarize import binarize, to_gray
    from ocr_inference_spark.layout import classify_regions
    from ocr_inference_spark.page import _detect

    # realistic page width: short fixture pages leave the pagenr blob at
    # ~9% of width vs the 10% bound — real scans are wider, so the slack
    # contract is stated against a full-width page
    wide_lines = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a second full width text line for realistic page geometry here",
    ]
    img = png_encode(render_page(wide_lines, noise=True, caption=True))
    ink = binarize(to_gray(png_decode(img)))
    mask, comps = _detect(ink)
    h_img, w_img = mask.shape
    by_cls = {}
    for cls, c in classify_regions(comps, mask.shape, ink.shape[1]):
        by_cls.setdefault(cls, []).append(c)

    (m,) = by_cls["margin"]
    assert m.h > 1.2 * L.MARGIN_MIN_H_FRAC * h_img
    assert m.w < 0.8 * L.MARGIN_MAX_W_FRAC * w_img
    assert m.x < 0.8 * L.MARGIN_EDGE_FRAC * w_img

    (hd,) = by_cls["header"]
    assert hd.y < 0.8 * L.HEADER_MAX_Y_FRAC * h_img
    assert hd.w > 1.2 * L.HEADER_MIN_W_FRAC * w_img

    (p,) = by_cls["pagenr"]
    assert p.y + p.h > h_img - 0.8 * (1 - L.PAGENR_MIN_Y_FRAC) * h_img
    assert p.w < 0.8 * L.PAGENR_MAX_W_FRAC * w_img
    assert (p.h - 2 * V_RADIUS) < 0.8 * L.PAGENR_MAX_H_FRAC_W * w_img


def test_jpeg_slots_geometry_invariant():
    """The two lossy driver-gate rotation slots (baseline q95 and
    progressive q95 JPEG) must recover the IDENTICAL region inventory
    as lossless PNG for every spec page shape, and the worst-case
    pixel error must sit far inside the ink/paper margin — the
    quantization-invariance proof that lets JPEG join the q34/q38
    hash-green rotation."""
    import itertools

    import numpy as np

    import ocr_inference_spark.layout as L
    from ocr_inference_spark.imgcodec import decode_image
    from ocr_inference_spark.jpegcodec import jpeg_encode, jpeg_encode_progressive
    from ocr_inference_spark.kernels.binarize import binarize, to_gray
    from ocr_inference_spark.page import _detect
    from ocr_inference_spark.render import INK, PAPER

    def regions(content):
        ink = binarize(to_gray(decode_image(content)))
        mask, comps = _detect(ink)
        return sorted(
            (cls, c.x, c.y, c.w, c.h)
            for cls, c in L.classify_regions(comps, mask.shape, ink.shape[1])
        )

    sep = PAPER - INK  # 210 levels of ink/paper separation
    worst = 0
    for n_lines, caption, noise in itertools.product((1, 2, 3), (False, True), (False, True)):
        img = render_page(list(L._SPEC_LINE_POOL[:n_lines]), caption=caption, noise=noise)
        ref = regions(png_encode(img))
        for enc in (lambda im: jpeg_encode(im, quality=95),
                    lambda im: jpeg_encode_progressive(im, quality=95)):
            blob = enc(img)
            worst = max(worst, int(np.abs(
                decode_image(blob).astype(int) - img.astype(int)).max()))
            assert regions(blob) == ref
    # worst-case block: error must stay under a quarter of the margin
    assert worst < sep // 4, worst
