"""Minimal pure-NumPy PNG codec for media-span payloads.

The reference loads page images from disk with ``cv2.imread``
(reference: cli.py:114); our engine carries the encoded bytes in the
table's ``content:binary`` column and decodes them *inside* the Arrow
batch, so the executor never touches a filesystem. The container has no
OpenCV/Pillow, so we implement the tiny slice of PNG we need ourselves:
8-bit grayscale or RGB, zlib-compressed, filter type 0 on every row
(what our encoder writes) plus filters 1/2 on decode for robustness.

Public knowledge only: the PNG format is an ISO standard (ISO/IEC
15948); this is a from-scratch implementation of its container layout.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode a (H,W) grayscale or (H,W,3) RGB uint8 array as PNG bytes."""
    if img.dtype != np.uint8:
        raise ValueError(f"png_encode expects uint8, got {img.dtype}")
    if img.ndim == 2:
        color_type, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = img.reshape(h, w * channels)
    # filter byte 0 prepended to every scanline
    raw = np.empty((h, w * channels + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = flat
    idat = zlib.compress(raw.tobytes(), compress_level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes -> (H,W) or (H,W,3) uint8 array.

    Supports 8-bit grayscale/RGB with row filters 0 (None), 1 (Sub),
    2 (Up). Raises on anything else.
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bit_depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG variant")
            if color_type not in (0, 2):
                raise ValueError(f"unsupported color type {color_type}")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    channels = 1 if color_type == 0 else 3
    stride = width * channels
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int16)
    if np.all(filters == 0):
        out = rows.astype(np.uint8)
    else:
        out = np.zeros((height, stride), dtype=np.uint8)
        for y in range(height):
            f = filters[y]
            line = rows[y]
            if f == 0:
                out[y] = line.astype(np.uint8)
            elif f == 1:  # Sub: left neighbour (per channel)
                acc = line.copy()
                for x in range(channels, stride):
                    acc[x] = (acc[x] + acc[x - channels]) & 0xFF
                out[y] = acc.astype(np.uint8)
            elif f == 2:  # Up
                prev = out[y - 1].astype(np.int16) if y else 0
                out[y] = ((line + prev) & 0xFF).astype(np.uint8)
            else:
                raise ValueError(f"unsupported row filter {f}")
    if channels == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, 3)
