import numpy as np

from ocr_inference_spark.kernels.binarize import binarize
from ocr_inference_spark.kernels.components import (
    connected_components,
    filter_line_contours,
)
from ocr_inference_spark.kernels.morphology import line_segmentation_mask
from ocr_inference_spark.kernels.reading_order import (
    merge_row,
    sort_bbox_centers,
    sort_lines_by_threshold,
)
from ocr_inference_spark.render import render_page


def test_sort_bbox_centers_groups_and_reverses():
    # discovery order bottom-to-top (y desc), as connected_components emits
    centers = [(10, 100), (50, 102), (10, 50), (60, 48), (5, 10)]
    rows = sort_bbox_centers(centers, line_threshold=20)
    # reversed -> top row first
    assert rows == [[(5, 10)], [(10, 50), (60, 48)], [(10, 100), (50, 102)]]


def test_sort_bbox_centers_x_sorted_within_row():
    centers = [(90, 10), (10, 12), (50, 11)]
    rows = sort_bbox_centers(centers, line_threshold=20)
    assert rows == [[(10, 12), (50, 11), (90, 10)]]


def test_sort_bbox_centers_empty():
    assert sort_bbox_centers([], 20) == []


def test_running_mean_splits_on_gap():
    centers = [(0, 0), (0, 5), (0, 100)]
    rows = sort_bbox_centers(centers, line_threshold=30)
    assert len(rows) == 2


def test_full_page_reading_order():
    lines = ["top line", "middle line", "bottom line"]
    ink = binarize(render_page(lines))
    mask = line_segmentation_mask(ink)
    comps = filter_line_contours(connected_components(mask), ink.shape[1])
    ordered, thr = sort_lines_by_threshold(comps, mask.shape)
    assert len(ordered) == 3
    ys = [c.y for c in ordered]
    assert ys == sorted(ys)  # top-to-bottom
    assert thr > 0


def test_merge_row_unions():
    ink = binarize(render_page(["ab ab"]))
    mask = line_segmentation_mask(ink)
    comps = connected_components(mask)
    merged = merge_row(comps)
    assert merged.area == sum(c.area for c in comps)
    assert merged.w >= max(c.w for c in comps)


def test_sort_bbox_centers_properties():
    """Property: output is a permutation of the input; within a row the
    x-order is ascending."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 500), st.integers(0, 500)),
            min_size=0,
            max_size=25,
        ),
        st.integers(1, 60),
    )
    def prop(centers, thr):
        rows = sort_bbox_centers(centers, line_threshold=float(thr))
        flat = [c for row in rows for c in row]
        assert sorted(flat) == sorted(centers)  # permutation
        for row in rows:
            xs = [c[0] for c in row]
            assert xs == sorted(xs)

    prop()


def test_duplicate_centers_stay_distinct():
    """Two components with identical bbox centers must both be emitted
    (a center-keyed dict would emit one twice and drop the other)."""
    from ocr_inference_spark.kernels.components import Component
    from ocr_inference_spark.kernels.reading_order import sort_lines_by_threshold

    # same center (5, 5): one 11-wide flat box, one 1x11 tall box
    c1 = Component(runs=[(5, 0, 11)], x=0, y=5, w=11, h=1, area=11)
    c2 = Component(runs=[(r, 5, 6) for r in range(11)], x=5, y=0, w=1, h=11, area=11)
    assert c1.center == c2.center
    ordered, _ = sort_lines_by_threshold([c1, c2], (20, 20), threshold=1.0, group_lines=False)
    assert len(ordered) == 2
    assert {id(o) for o in ordered} == {id(c1), id(c2)}
