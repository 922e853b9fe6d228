"""Main-content extraction / boilerplate strip (north rule): pages with
non-content furniture — margin rule, header rule, page-number blob (the
reference's non-line layout classes, Config.py:37-48) — must yield
exactly the content lines, with the furniture stripped."""

import pytest

from ocr_inference_spark.imgcodec import png_encode
from ocr_inference_spark.model import RecognitionSession, serialize_weights
from ocr_inference_spark.page import detect_page, process_page
from ocr_inference_spark.render import render_page

SESSION = RecognitionSession(serialize_weights())
LINES = ["hello world again", "the quick brown fox", "final content line"]

CASES = [
    ("noise_plain", {"noise": True}),
    ("noise_skew", {"noise": True, "skew_deg": 2.2}),
    ("noise_warp", {"noise": True, "warp_amp": 40}),
    ("noise_skew_warp", {"noise": True, "skew_deg": -1.8, "warp_amp": 38}),
]


@pytest.mark.parametrize("name,kw", CASES, ids=[c[0] for c in CASES])
def test_furniture_is_stripped(name, kw):
    res = process_page(png_encode(render_page(LINES, **kw)), SESSION)
    assert res.status == "success"
    assert res.texts == LINES  # content only — no furniture leakage


def test_detection_excludes_furniture():
    d = detect_page(png_encode(render_page(LINES, noise=True)))
    assert d["status"] == "success"
    assert len(d["bboxes"]) == len(LINES)


CAPTION_CASES = [
    ("caption_plain", {"caption": True}),
    ("caption_noise", {"caption": True, "noise": True}),
    ("caption_skew", {"caption": True, "skew_deg": 2.4}),
    ("caption_warp", {"caption": True, "warp_amp": 44}),
    ("caption_skew_warp", {"caption": True, "skew_deg": -2.0, "warp_amp": 40}),
]


@pytest.mark.parametrize("name,kw", CAPTION_CASES, ids=[c[0] for c in CAPTION_CASES])
def test_line_shaped_furniture_outside_block_is_stripped(name, kw):
    """A caption-like band below the text block is LINE-shaped (passes
    the size filter) — only the text-area spatial filter (I36/F3,
    reference BDRC/utils.py:576-608,661-681) strips it."""
    res = process_page(png_encode(render_page(LINES, **kw)), SESSION)
    assert res.status == "success"
    assert res.texts == LINES


def test_detection_excludes_caption():
    d = detect_page(png_encode(render_page(LINES, caption=True, noise=True)))
    assert d["status"] == "success"
    assert len(d["bboxes"]) == len(LINES)
