"""Contour extraction + Douglas-Peucker simplification (I12/K4/K2)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_inference_spark.kernels.components import connected_components
from ocr_inference_spark.kernels.contours import (
    _perp_dist,
    component_contour,
    contour_points,
    simplify_contour,
)


def test_component_contour_rectangle():
    mask = np.zeros((20, 30), dtype=np.uint8)
    mask[5:10, 4:14] = 1
    c = connected_components(mask)[0]
    pts = component_contour(c)
    xs, ys = pts[:, 0], pts[:, 1]
    assert xs.min() == 4 and xs.max() == 13
    assert ys.min() == 5 and ys.max() == 9
    # left edge first (top to bottom), then right edge (bottom to top)
    assert tuple(pts[0]) == (4, 5)
    assert tuple(pts[-1]) == (13, 5)


def test_simplify_rectangle_collapses_to_corners():
    mask = np.zeros((60, 80), dtype=np.uint8)
    mask[10:50, 5:75] = 1
    c = connected_components(mask)[0]
    pts = component_contour(c)  # 80 points (40 per edge)
    simp = simplify_contour(pts)
    assert len(simp) <= 6  # straight edges collapse to their endpoints
    # corners survive
    corner_set = {tuple(p) for p in simp}
    assert (5, 10) in corner_set and (5, 49) in corner_set


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_simplify_stays_within_epsilon(seed):
    """Property (verdict item 4): every original point lies within eps of
    the simplified polyline."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(8, 60))
    xs = np.sort(rng.integers(0, 500, n))
    ys = rng.integers(0, 80, n)
    pts = np.stack([xs, ys], axis=1).astype(np.int64)
    closed = np.vstack([pts, pts[:1]])
    eps = 0.001 * float(np.hypot(*np.diff(closed, axis=0).T).sum())
    simp = simplify_contour(pts)
    # max distance from each original point to the nearest simplified segment
    poly = np.vstack([simp, simp[:1]])
    for p in pts:
        d = min(
            float(_perp_dist(p[None, :].astype(float), poly[i], poly[i + 1])[0])
            if not np.array_equal(poly[i], poly[i + 1])
            else float(np.hypot(*(p - poly[i])))
            for i in range(len(poly) - 1)
        )
        assert d <= eps + 1.0  # +1 px slack: perp distance vs segment clamp


def test_contour_points_on_rendered_page():
    from ocr_inference_spark.imgcodec import png_encode
    from ocr_inference_spark.page import detect_page
    from ocr_inference_spark.render import render_page

    lines = ["hello world", "second line here"]
    d = detect_page(png_encode(render_page(lines)))
    assert d["status"] == "success"
    assert len(d["contours"]) == len(lines) == len(d["bboxes"])
    for contour, bbox in zip(d["contours"], d["bboxes"]):
        assert len(contour) >= 4
        xs = [p["x"] for p in contour]
        ys = [p["y"] for p in contour]
        assert min(xs) == bbox["x"] and max(xs) == bbox["x"] + bbox["w"] - 1
        assert min(ys) == bbox["y"] and max(ys) >= bbox["y"] + bbox["h"] - 2


def test_pagexml_includes_polygon_coords(spark, tmp_path):
    from pyspark.sql import Row

    from ocr_inference_spark.exporters import ocr_lines_to_pagexml
    from ocr_inference_spark.pipeline import DETECTION_OUT_SCHEMA

    ocr_df = spark.createDataFrame(
        [
            Row(doc_id="d1", media_offset=0, media_ref="p1", line_rank=0,
                text="first", ctc_conf=1.0, page_angle=0.0,
                dewarp_applied=False, n_lines=2, status="success"),
            Row(doc_id="d1", media_offset=0, media_ref="p1", line_rank=1,
                text="second", ctc_conf=1.0, page_angle=0.0,
                dewarp_applied=False, n_lines=2, status="success"),
        ]
    )
    det_df = spark.createDataFrame(
        [
            (
                "p1", 100, 50, 2,
                [
                    [{"x": 1, "y": 2}, {"x": 9, "y": 2}, {"x": 9, "y": 6}],
                    [{"x": 1, "y": 20}, {"x": 9, "y": 20}, {"x": 9, "y": 26}],
                ],
                [
                    {"x": 1, "y": 2, "w": 9, "h": 5},
                    {"x": 1, "y": 20, "w": 9, "h": 7},
                ],
                [
                    {"cx": 5.0, "cy": 4.0, "w": 9.0, "h": 5.0, "angle": 0.0,
                     "points": [{"x": 1, "y": 2}, {"x": 9, "y": 2},
                                {"x": 9, "y": 6}, {"x": 1, "y": 6}]},
                    {"cx": 5.0, "cy": 23.0, "w": 9.0, "h": 7.0, "angle": 0.0,
                     "points": [{"x": 1, "y": 20}, {"x": 9, "y": 20},
                                {"x": 9, "y": 26}, {"x": 1, "y": 26}]},
                ],
                "success",
            )
        ],
        schema=DETECTION_OUT_SCHEMA,
    )
    out = str(tmp_path / "xml")
    ocr_lines_to_pagexml(ocr_df, out, det_df=det_df)
    body = "\n".join(r.value for r in spark.read.text(out).collect())
    assert '<Coords points="1,2 9,2 9,6"/>' in body
    assert '<Coords points="1,20 9,20 9,26"/>' in body
    assert body.index('index="0"') < body.index('index="1"')
