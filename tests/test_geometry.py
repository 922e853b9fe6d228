"""min_area_rect / rotated bbox (A8 — reference get_union_bbox's
RotatedBBox, BDRC/utils.py:1081-1097)."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_inference_spark.kernels.components import Component
from ocr_inference_spark.kernels.geometry import (
    component_rotated_bbox,
    convex_hull,
    min_area_rect,
)


def _rot(deg):
    t = np.radians(deg)
    return np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])


def _rect_corners(cx, cy, w, h, deg):
    base = np.array(
        [[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]]
    )
    return base @ _rot(deg).T + np.array([cx, cy])


def test_axis_aligned_rect_exact():
    pts = _rect_corners(50, 30, 40, 10, 0)
    (cx, cy), w, h, ang, corners = min_area_rect(pts)
    assert (round(cx), round(cy)) == (50, 30)
    assert abs(w - 40) < 1e-9 and abs(h - 10) < 1e-9
    assert abs(ang) < 1e-9
    assert corners.shape == (4, 2)


@pytest.mark.parametrize("deg", [3.0, -3.0, 12.5, 45.0, 80.0, -80.0])
def test_rotated_rect_recovers_angle(deg):
    pts = _rect_corners(100, 60, 200, 24, deg)
    (cx, cy), w, h, ang, _ = min_area_rect(pts)
    assert abs(cx - 100) < 1e-6 and abs(cy - 60) < 1e-6
    assert abs(w - 200) < 1e-6 and abs(h - 24) < 1e-6
    expect = deg
    if expect <= -90:
        expect += 180
    assert abs(ang - expect) < 1e-6


def test_interior_points_do_not_change_rect():
    rng = np.random.default_rng(1)
    corners = _rect_corners(10, 10, 30, 12, 20)
    # random convex combinations of the corners = interior points
    lam = rng.dirichlet(np.ones(4), size=200)
    interior = lam @ corners
    (_, _), w, h, ang, _ = min_area_rect(np.vstack([corners, interior]))
    assert abs(w - 30) < 1e-6 and abs(h - 12) < 1e-6
    assert abs(ang - 20) < 1e-6


def test_degenerate_point_and_segment():
    (cx, cy), w, h, ang, _ = min_area_rect(np.array([[5.0, 7.0]]))
    assert (cx, cy, w, h, ang) == (5.0, 7.0, 0.0, 0.0, 0.0)
    (cx, cy), w, h, ang, _ = min_area_rect(np.array([[0.0, 0.0], [10.0, 10.0]]))
    assert abs(w - np.hypot(10, 10)) < 1e-9 and h == 0.0
    assert abs(ang - 45.0) < 1e-9


def test_convex_hull_is_subset_and_convex():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(100, 2))
    hull = convex_hull(pts)
    as_set = {tuple(p) for p in pts}
    assert all(tuple(p) in as_set for p in hull)
    # every input point inside (or on) the hull: cross products one-signed
    for i in range(len(hull)):
        a, b = hull[i], hull[(i + 1) % len(hull)]
        cr = (b[0] - a[0]) * (pts[:, 1] - a[1]) - (b[1] - a[1]) * (pts[:, 0] - a[0])
        assert (cr >= -1e-9).all()


def test_component_rotated_bbox_sheared_bar():
    """A thin bar sheared by ~3° (the rasterized analogue of a skewed
    text line) reports its angle within 0.5°."""
    deg = 3.0
    shear = np.tan(np.radians(deg))
    runs = []
    length, thickness = 400, 8
    for row in range(thickness + int(shear * length) + 1):
        # each row's ink span: the bar's cross-section at this y
        x_lo = max(0, int(round((row - thickness) / shear))) if shear > 0 else 0
        x_hi = min(length, int(round(row / shear))) if shear > 0 else length
        if x_hi > x_lo:
            runs.append((row, x_lo, x_hi))
    comp = Component(
        runs=runs,
        x=0,
        y=0,
        w=length,
        h=runs[-1][0] + 1,
        area=sum(r[2] - r[1] for r in runs),
    )
    rb = component_rotated_bbox(comp)
    assert abs(rb["angle"] - deg) < 0.5
    assert rb["w"] > rb["h"]
    assert len(rb["points"]) == 4
