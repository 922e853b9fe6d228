import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_inference_spark.imgcodec import png_decode, png_encode


def test_roundtrip_gray():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_roundtrip_rgb():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (20, 31, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 64),
    w=st.integers(1, 64),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_property(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
