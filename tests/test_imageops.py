import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_inference_spark.kernels.imageops import (
    bbox_to_original,
    cart2pol,
    contour_to_original,
    crop_padding,
    get_paddings,
    normalize_image,
    pad_to_multiple,
    pol2cart,
    resize_clamp,
    resize_image,
    rotate_contour,
    sigmoid,
    stitch_tiles,
    tile_image,
)


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 300), w=st.integers(1, 300), seed=st.integers(0, 10**6))
def test_tile_stitch_roundtrip(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    padded = pad_to_multiple(img, multiple=64, value=255)
    tiles = tile_image(padded, patch=64)
    back = stitch_tiles(tiles, padded.shape[0], padded.shape[1], patch=64)
    assert np.array_equal(crop_padding(back, h, w), img)


def test_tile_requires_padding():
    with pytest.raises(ValueError):
        tile_image(np.zeros((100, 100), dtype=np.uint8), patch=64)


def test_get_paddings():
    assert get_paddings(512, 512, 512) == (0, 0)
    assert get_paddings(513, 1, 512) == (511, 511)


def test_sigmoid_matches_definition_and_is_safe():
    x = np.array([-1000.0, -1.0, 0.0, 1.0, 1000.0])
    s = sigmoid(x)
    assert s[0] == 0.0 or s[0] < 1e-300
    assert abs(s[2] - 0.5) < 1e-12
    assert s[4] == 1.0
    assert np.all(np.diff(s) >= 0)


def test_normalize():
    img = np.array([[0, 255]], dtype=np.uint8)
    n = normalize_image(img)
    assert n.dtype == np.float32
    assert n[0, 0] == 0.0 and n[0, 1] == 1.0


def test_resize_identity_and_shape():
    img = np.random.default_rng(0).integers(0, 256, (40, 60), dtype=np.uint8)
    assert np.array_equal(resize_image(img, 40, 60), img)
    out = resize_image(img, 20, 30)
    assert out.shape == (20, 30)


def test_resize_constant_preserved():
    img = np.full((33, 47), 77, dtype=np.uint8)
    assert np.all(resize_image(img, 12, 90) == 77)


def test_resize_clamp():
    img = np.zeros((4096, 8192), dtype=np.uint8)
    out, scale = resize_clamp(img)
    assert out.shape[1] <= 4096 and out.shape[0] <= 2048
    assert scale < 1.0
    small = np.zeros((10, 10), dtype=np.uint8)
    out2, scale2 = resize_clamp(small)
    assert scale2 == 1.0 and out2.shape == (10, 10)


def test_polar_roundtrip():
    x = np.array([3.0, -1.0, 0.0])
    y = np.array([4.0, 2.0, -5.0])
    rho, phi = cart2pol(x, y)
    x2, y2 = pol2cart(rho, phi)
    assert np.allclose(x, x2) and np.allclose(y, y2)


def test_rotate_contour_360_identity():
    pts = np.array([[10.0, 0.0], [0.0, 5.0], [-3.0, -4.0]])
    out = rotate_contour(rotate_contour(pts, (1.0, 2.0), 180.0), (1.0, 2.0), 180.0)
    assert np.allclose(out, pts, atol=1e-9)


def test_coordinate_rescale():
    pts = np.array([[100, 200], [50, 60]], dtype=np.int64)
    assert np.array_equal(contour_to_original(pts, 0.5), pts * 2)
    assert bbox_to_original((10, 20, 30, 40), 0.5) == (20, 40, 60, 80)
    assert bbox_to_original((10, 20, 30, 40), 1.0) == (10, 20, 30, 40)
