"""Minimal pure-NumPy image codecs for media-span payloads.

The reference loads page images from disk with ``cv2.imread`` and
accepts ``jpg/jpeg/png/tif`` scans (reference: cli.py:16, cli.py:114);
our engine carries the encoded bytes in the table's ``content:binary``
column and decodes them *inside* the Arrow batch, so the executor never
touches a filesystem. The container has no OpenCV/Pillow, so we
implement the slices we need ourselves:

- PNG (this module): 8-bit grayscale or RGB, zlib-compressed, filter
  type 0 on every row (what our encoder writes) plus filters 1/2 on
  decode for robustness.
- JPEG (:mod:`.jpegcodec`): baseline sequential DCT per ITU-T T.81.
- TIFF (this module): uncompressed 8-bit grayscale/RGB, both byte
  orders, strip layout.
- :func:`decode_image` sniffs the container magic and dispatches — the
  page kernel's single entry point for any supported scan format.

Public knowledge only: PNG is ISO/IEC 15948, JPEG is ITU-T T.81 /
ISO 10918-1, TIFF 6.0 is a published Adobe specification; these are
from-scratch implementations of the container layouts.
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


# ---------------------------------------------------------------------------
# TIFF (6.0 baseline: uncompressed strips, 8-bit gray/RGB, II or MM)
# ---------------------------------------------------------------------------

_TIFF_TAGS = {
    256: "width", 257: "height", 258: "bits_per_sample",
    259: "compression", 262: "photometric", 273: "strip_offsets",
    277: "samples_per_pixel", 278: "rows_per_strip", 279: "strip_byte_counts",
}
_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}


def tiff_encode(img: np.ndarray) -> bytes:
    """Encode (H,W) gray or (H,W,3) RGB uint8 as little-endian
    uncompressed TIFF (single strip)."""
    if img.dtype != np.uint8:
        raise ValueError(f"tiff_encode expects uint8, got {img.dtype}")
    if img.ndim == 2:
        spp, photometric = 1, 1  # BlackIsZero
    elif img.ndim == 3 and img.shape[2] == 3:
        spp, photometric = 3, 2  # RGB
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    h, w = img.shape[:2]
    pixels = img.tobytes()
    # layout: header(8) | pixel data | IFD
    data_off = 8
    ifd_off = data_off + len(pixels)
    entries = []

    def entry(tag, typ, count, value):
        entries.append(struct.pack("<HHI4s", tag, typ, count, value))

    def short_val(v):
        return struct.pack("<HH", v, 0)

    def long_val(v):
        return struct.pack("<I", v)

    # bits_per_sample for RGB needs 3 SHORTs -> stash after the IFD
    n_entries = 8 if spp == 1 else 8
    tail = b""
    bps_value = short_val(8)
    if spp == 3:
        bps_extra_off = ifd_off + 2 + n_entries * 12 + 4
        bps_value = long_val(bps_extra_off)
        tail = struct.pack("<HHH", 8, 8, 8)
    entry(256, 4, 1, long_val(w))
    entry(257, 4, 1, long_val(h))
    entry(258, 3, spp, bps_value)
    entry(259, 3, 1, short_val(1))  # no compression
    entry(262, 3, 1, short_val(photometric))
    entry(273, 4, 1, long_val(data_off))
    entry(277, 3, 1, short_val(spp))
    entry(279, 4, 1, long_val(len(pixels)))
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)
    header = b"II*\x00" + struct.pack("<I", ifd_off)
    return header + pixels + ifd + tail


def tiff_decode(data: bytes) -> np.ndarray:
    """Decode uncompressed 8-bit grayscale/RGB TIFF -> uint8 array."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    (magic,) = struct.unpack(bo + "H", data[2:4])
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    (n,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    fields: dict[str, list[int]] = {}
    for i in range(n):
        off = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack(bo + "HHI", data[off : off + 8])
        if tag not in _TIFF_TAGS or typ not in _TIFF_TYPE_SIZE:
            continue
        size = _TIFF_TYPE_SIZE[typ] * count
        if size <= 4:
            raw = data[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", data[off + 8 : off + 12])
            raw = data[voff : voff + size]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        fields[_TIFF_TAGS[tag]] = list(struct.unpack(bo + fmt * count, raw))
    w = fields["width"][0]
    h = fields["height"][0]
    comp = fields.get("compression", [1])[0]
    if comp != 1:
        raise ValueError(f"unsupported TIFF compression {comp}")
    bps = fields.get("bits_per_sample", [8])
    if any(b != 8 for b in bps):
        raise ValueError(f"unsupported TIFF bit depth {bps}")
    spp = fields.get("samples_per_pixel", [len(bps)])[0]
    if spp not in (1, 3):
        raise ValueError(f"unsupported samples_per_pixel {spp}")
    offsets = fields["strip_offsets"]
    counts = fields.get("strip_byte_counts", [w * h * spp])
    raw = b"".join(data[o : o + c] for o, c in zip(offsets, counts))
    arr = np.frombuffer(raw[: w * h * spp], dtype=np.uint8)
    if spp == 1:
        img = arr.reshape(h, w)
        if fields.get("photometric", [1])[0] == 0:  # WhiteIsZero
            img = 255 - img
        return img
    return arr.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Format sniffing dispatcher — the page kernel's decode entry point
# ---------------------------------------------------------------------------


def sniff_format(data: bytes) -> str:
    """'png' | 'jpeg' | 'tiff' | 'unknown' from container magic bytes."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:2] in (b"II", b"MM") and len(data) >= 4:
        try:
            bo = "<" if data[:2] == b"II" else ">"
            if struct.unpack(bo + "H", data[2:4])[0] == 42:
                return "tiff"
        except struct.error:
            pass
    return "unknown"


def decode_image(data: bytes) -> np.ndarray:
    """Decode PNG/JPEG/TIFF bytes by magic-byte sniffing — the formats
    the reference's cv2.imread path accepts (reference: cli.py:16)."""
    fmt = sniff_format(bytes(data[:8]))
    if fmt == "png":
        return png_decode(data)
    if fmt == "jpeg":
        from .jpegcodec import jpeg_decode

        return jpeg_decode(data)
    if fmt == "tiff":
        return tiff_decode(data)
    raise ValueError("unrecognized image container (not PNG/JPEG/TIFF)")
