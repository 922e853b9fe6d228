"""BMP + PNM codec tests: round-trips, Java ImageIO interop fixtures,
the exotic container variants (RLE, BITFIELDS, OS/2 core header,
top-down rows), netpbm conventions, and malformed-stream guards.

The reference's single-image path accepts these containers through
cv2.imread (reference: cli.py:114, BDRC/utils.py:283)."""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np
import pytest

from ocr_inference_spark.bmpcodec import (
    bmp_decode,
    bmp_encode,
    pnm_decode,
    pnm_encode,
)
from ocr_inference_spark.imgcodec import decode_image, sniff_format

DATA = Path(__file__).parent / "data"


def _gray(h=48, w=64):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 7 + y * 13 + (x * y) % 31) % 256).astype(np.uint8)


def _rgb(h=24, w=32):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [((x * 5 + y * 11 + c * 77 + (x ^ y)) % 256).astype(np.uint8) for c in range(3)],
        axis=2,
    )


# ---------------------------------------------------------------- round trips


def test_bmp_gray_roundtrip():
    img = _gray()
    assert np.array_equal(bmp_decode(bmp_encode(img)), img)


def test_bmp_rgb_roundtrip():
    img = _rgb()
    assert np.array_equal(bmp_decode(bmp_encode(img)), img)


def test_pnm_roundtrips():
    g, c = _gray(), _rgb()
    for ascii_format in (False, True):
        assert np.array_equal(pnm_decode(pnm_encode(g, ascii_format)), g)
        assert np.array_equal(pnm_decode(pnm_encode(c, ascii_format)), c)


def test_decode_image_dispatch():
    g = _gray(9, 17)
    for blob, fmt in ((bmp_encode(g), "bmp"), (pnm_encode(g), "pnm")):
        assert sniff_format(blob[:8]) == fmt
        assert np.array_equal(decode_image(blob), g)


# ------------------------------------------------------------- Java fixtures


def test_java_bmp_gray_fixture():
    """Java ImageIO's 8bpp gray-palette BMP decodes bit-exact (raster
    sample truth — getRGB on TYPE_BYTE_GRAY would apply sRGB)."""
    out = bmp_decode((DATA / "java_bmp_gray_64x48.bmp").read_bytes())
    truth = np.frombuffer(
        (DATA / "java_bmp_gray_64x48.truth.bin").read_bytes(), np.uint8
    ).reshape(48, 64)
    assert out.ndim == 2  # pure-gray palette -> grayscale container
    assert np.array_equal(out, truth)


def test_java_bmp_rgb_fixture():
    out = bmp_decode((DATA / "java_bmp_rgb_32x24.bmp").read_bytes())
    truth = np.frombuffer(
        (DATA / "java_bmp_rgb_32x24.truth.bin").read_bytes(), np.uint8
    ).reshape(24, 32, 3)
    assert np.array_equal(out, truth)


# ------------------------------------------------------------- BMP variants


def _bmp_wrap(info: bytes, palette: bytes, pixels: bytes) -> bytes:
    pix_off = 14 + len(info) + len(palette)
    head = struct.pack("<2sIHHI", b"BM", pix_off + len(pixels), 0, 0, pix_off)
    return head + info + palette + pixels


def _info40(w, h, bpp, comp, colors=0):
    return struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp, 0, 2835, 2835, colors, 0)


def test_bmp_topdown():
    img = _gray(6, 5)
    blob = bytearray(bmp_encode(img))
    # flip the height sign and un-reverse the stored rows
    (h,) = struct.unpack("<i", blob[22:26])
    blob[22:26] = struct.pack("<i", -h)
    stride = (5 + 3) & ~3
    pix_off = 14 + 40 + 256 * 4
    rows = np.frombuffer(bytes(blob[pix_off:]), np.uint8).reshape(h, stride)
    blob[pix_off:] = rows[::-1].tobytes()
    assert np.array_equal(bmp_decode(bytes(blob)), img)


def test_bmp_1bit_and_4bit_palette():
    # 1bpp: MSB-first, non-gray palette -> RGB output
    pal = np.array([[0, 0, 255, 0], [255, 0, 0, 0]], np.uint8)  # BGR0: red, blue
    bits = np.array([[1, 0, 1, 0, 1, 1, 0, 0, 1]], np.uint8)
    stride_bytes = ((9 + 31) // 32) * 4
    row = np.zeros(stride_bytes, np.uint8)
    row[: (9 + 7) // 8] = np.packbits(bits[0])
    blob = _bmp_wrap(_info40(9, 1, 1, 0, 2), pal.tobytes(), row.tobytes())
    out = bmp_decode(blob)
    red, blue = [255, 0, 0], [0, 0, 255]
    exp = [blue, red, blue, red, blue, blue, red, red, blue]
    assert out.tolist() == [exp]
    # 4bpp: two pixels per byte, high nibble first
    pal16 = np.zeros((16, 4), np.uint8)
    pal16[:, 0] = pal16[:, 1] = pal16[:, 2] = np.arange(16) * 17  # gray
    px = bytes([0x51, 0x23, 0xAB, 0x00])  # 3 px wide -> nibbles 5,1,2 + pad
    blob = _bmp_wrap(_info40(3, 1, 4, 0, 16), pal16.tobytes(), px)
    assert bmp_decode(blob).tolist() == [[5 * 17, 1 * 17, 2 * 17]]


def test_bmp_os2_core_header():
    # BITMAPCOREHEADER: u16 dims, RGB-triple palette
    pal = bytes([10, 20, 30, 200, 150, 100])  # BGR triples
    info = struct.pack("<IHHHH", 12, 3, 1, 1, 8)
    pixels = bytes([0, 1, 0, 0])  # stride 4
    blob = _bmp_wrap(info, pal, pixels)
    assert bmp_decode(blob).tolist() == [[[30, 20, 10], [100, 150, 200], [30, 20, 10]]]


def test_bmp_16bit_555_and_bitfields_565():
    # BI_RGB 16bpp defaults to 555
    val555 = (31 << 10) | (0 << 5) | 15  # r=31 g=0 b=15
    pix = struct.pack("<HH", val555, 0)
    blob = _bmp_wrap(_info40(1, 1, 16, 0), b"", pix)
    assert bmp_decode(blob).tolist() == [[[255, 0, (15 * 255) // 31]]]
    # BITFIELDS 565
    val565 = (31 << 11) | (63 << 5) | 0
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    pix = struct.pack("<HH", val565, 0)
    blob = _bmp_wrap(_info40(1, 1, 16, 3), masks, pix)
    assert bmp_decode(blob).tolist() == [[[255, 255, 0]]]


def test_bmp_rle8():
    pal = np.zeros((256, 4), np.uint8)
    pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(256)
    # row0: run of 4x7, absolute 3 (1,2,3) + pad, EOL; row1: delta(2,0), 2x9, EOF
    rle = bytes(
        [4, 7, 0, 3, 1, 2, 3, 0, 0, 0, 0, 2, 2, 0, 2, 9, 0, 1]
    )
    blob = _bmp_wrap(_info40(7, 2, 8, 1, 0), pal.tobytes(), rle)
    out = bmp_decode(blob)
    # RLE streams start at the BOTTOM row: the first encoded row is
    # output row 1, the post-EOL row is output row 0
    assert out.tolist() == [
        [0, 0, 9, 9, 0, 0, 0],
        [7, 7, 7, 7, 1, 2, 3],
    ]


def test_bmp_rle4():
    pal16 = np.zeros((16, 4), np.uint8)
    pal16[:, 0] = pal16[:, 1] = pal16[:, 2] = np.arange(16)
    # run of 5 alternating nibbles A,B then EOL/EOF
    rle = bytes([5, 0xAB, 0, 0, 0, 1])
    blob = _bmp_wrap(_info40(5, 1, 4, 2, 0), pal16.tobytes(), rle)
    assert bmp_decode(blob).tolist() == [[10, 11, 10, 11, 10]]


# ----------------------------------------------------------- PNM conventions


def test_p1_p4_black_is_one():
    out = pnm_decode(b"P1\n# comment\n4 2\n0110\n1001\n")
    assert out.tolist() == [[255, 0, 0, 255], [0, 255, 255, 0]]
    bits = np.array([[1, 0, 1, 0, 1], [0, 1, 0, 1, 0]], np.uint8)
    p4 = b"P4\n5 2\n" + np.packbits(bits, axis=1).tobytes()
    assert np.array_equal(pnm_decode(p4), (1 - bits) * 255)


def test_pnm_maxval_scaling_and_16bit():
    assert pnm_decode(b"P2\n2 1\n15\n15 7\n").tolist() == [[255, 119]]
    v = np.array([[0x1234, 0xFF00]], dtype=">u2")
    assert pnm_decode(b"P5\n2 1\n65535\n" + v.tobytes()).tolist() == [[0x12, 0xFF]]


def test_pnm_header_comments_everywhere():
    # comments may appear between any header tokens; the raster starts
    # after the SINGLE whitespace byte that terminates maxval
    out = pnm_decode(b"P5 # c1\n# c2\n3 # c3\n1 # c4\n255\n\x09\x08\x07")
    assert out.tolist() == [[9, 8, 7]]


# ------------------------------------------------------------- fuzz guards


@pytest.mark.parametrize(
    "blob",
    [
        b"BM",  # truncated header
        b"BM" + b"\x00" * 24,  # zero dims
        bmp_encode(_gray(4, 4))[:40],  # truncated pixel data
        b"P5\n3 1\n255\n\x01",  # truncated PNM raster
        b"P2\n2 1\n255\n1\n",  # too few ASCII samples
        b"P5\n-3 1\n255\nxxx",  # negative width
        b"P7\n3 1\n255\nabc",  # unknown magic
    ],
)
def test_malformed_raises(blob):
    with pytest.raises(ValueError):
        if blob[:1] == b"P":
            pnm_decode(blob)
        else:
            bmp_decode(blob)


def test_truncated_palette_raises():
    blob = _bmp_wrap(_info40(2, 1, 8, 0, 256), b"\x00" * 64, b"\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        bmp_decode(blob)
