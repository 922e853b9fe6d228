import numpy as np

from ocr_inference_spark.kernels.components import (
    connected_components,
    filter_area,
    filter_line_contours,
)


def test_single_blob():
    mask = np.zeros((10, 10), dtype=np.uint8)
    mask[2:5, 3:8] = 1
    comps = connected_components(mask)
    assert len(comps) == 1
    c = comps[0]
    assert c.bbox == (3, 2, 5, 3)
    assert c.area == 15
    assert c.center == (3 + 5 // 2, 2 + 3 // 2)


def test_two_blobs_bottom_first():
    mask = np.zeros((20, 10), dtype=np.uint8)
    mask[1:3, 1:4] = 1   # top blob
    mask[10:14, 2:9] = 1  # bottom blob
    comps = connected_components(mask)
    assert len(comps) == 2
    # discovery order normalized bottom-to-top (OpenCV-like)
    assert comps[0].y == 10
    assert comps[1].y == 1


def test_diagonal_8_connectivity():
    mask = np.zeros((4, 4), dtype=np.uint8)
    mask[0, 0] = 1
    mask[1, 1] = 1
    comps = connected_components(mask)
    assert len(comps) == 1


def test_disjoint_same_row():
    mask = np.zeros((3, 12), dtype=np.uint8)
    mask[1, 1:4] = 1
    mask[1, 7:11] = 1
    comps = connected_components(mask)
    assert len(comps) == 2


def test_u_shape_merges():
    # two verticals joined at the bottom -> one component (union-find path)
    mask = np.zeros((6, 7), dtype=np.uint8)
    mask[0:5, 1] = 1
    mask[0:5, 5] = 1
    mask[5, 1:6] = 1
    comps = connected_components(mask)
    assert len(comps) == 1
    assert comps[0].area == 5 + 5 + 5


def test_top_profile():
    mask = np.zeros((8, 6), dtype=np.uint8)
    mask[3, 0:6] = 1
    mask[2, 2:4] = 1
    mask[4, 0:6] = 1
    c = connected_components(mask)[0]
    prof = c.top_profile()
    assert prof.tolist() == [3, 3, 2, 2, 3, 3]


def test_filters():
    mask = np.zeros((100, 200), dtype=np.uint8)
    mask[10:13, 0:150] = 1  # wide line, h=3 (fails min_h)
    mask[50:70, 0:150] = 1  # proper line
    mask[90, 0] = 1         # dust
    comps = connected_components(mask)
    assert len(filter_area(comps, 5)) == 2
    lines = filter_line_contours(comps, 200, min_h=10)
    assert len(lines) == 1
    assert lines[0].y == 50


def test_get_text_area_picks_biggest_cluster():
    import numpy as np

    from ocr_inference_spark.kernels.components import (
        connected_components,
        filter_in_text_area,
        get_text_area,
    )

    mask = np.zeros((400, 300), dtype=np.uint8)
    # main block: three "lines" 40 px apart (merge under ±55 reach)
    for y in (50, 110, 170):
        mask[y : y + 20, 40:260] = 1
    # far caption: line-shaped, 180 px below the block (no merge)
    mask[370:390, 40:180] = 1
    comps = connected_components(mask)
    rect = get_text_area(comps)
    assert rect is not None
    xmin, ymin, xmax, ymax = rect
    assert ymin <= 50 and ymax >= 189 and ymax < 370  # block only
    kept = filter_in_text_area(comps, rect)
    assert len(kept) == 3
    assert all(c.center[1] < 200 for c in kept)


def test_get_text_area_empty_and_passthrough():
    from ocr_inference_spark.kernels.components import (
        filter_in_text_area,
        get_text_area,
    )

    assert get_text_area([]) is None
    assert filter_in_text_area([], None) == []
