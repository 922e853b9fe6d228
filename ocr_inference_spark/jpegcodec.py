"""Minimal pure-NumPy baseline JPEG (JFIF) codec for media-span payloads.

The reference ingests ``jpg/jpeg/png/tif`` page scans from disk
(reference: cli.py:16, BDRC/data.py:163 via cv2.imread); our engine
carries encoded bytes in the table's ``content:binary`` column and
decodes them inside the Arrow batch. The container has no
OpenCV/Pillow, so — like :mod:`.imgcodec`'s PNG support — this is a
from-scratch implementation of the public ITU-T T.81 / ISO 10918-1
baseline sequential DCT process:

- decoder: 8-bit baseline (SOF0), grayscale or YCbCr with 4:4:4 /
  4:2:0 / 4:2:2 sampling, restart markers, multiple DQT/DHT segments.
  Progressive (SOF2) and arithmetic coding raise a clear error.
- encoder: grayscale or RGB->YCbCr 4:4:4, Annex-K quantization tables
  scaled by a libjpeg-style quality factor, Annex-K Huffman tables,
  optional restart interval.

Performance posture: entropy (Huffman) decode is inherently bit-serial
so it runs in Python with a 16-bit lookup table per Huffman code; the
numeric heavy lifting (IDCT/FDCT over all blocks, color transform,
upsampling) is batched NumPy einsum over (n_blocks, 8, 8) arrays. The
synthetic bench corpus stays PNG — JPEG is the ingestion-compat path a
real scan archive needs, not the hot loop.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared constants (ITU-T T.81 Annex K — public spec tables)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order
# here is zigzag order, as they appear in the spec / DQT payloads).
Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# 8x8 DCT-II basis matrix: spatial = C.T @ coeff @ C (with orthonormal C)
_k = np.arange(8)
_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.where(
    _k[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
)


def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficient blocks -> spatial samples."""
    return np.einsum("ki,nkl,lj->nij", _C, coeffs, _C, optimize=True)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted spatial blocks -> DCT coefficients."""
    return np.einsum("ik,nkl,jl->nij", _C, blocks, _C, optimize=True)


# ---------------------------------------------------------------------------
# Huffman table machinery
# ---------------------------------------------------------------------------


def _canonical_codes(bits, vals):
    """(symbol -> (code, length)) per the canonical JPEG assignment."""
    codes = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return codes


class _DecodeTable:
    """16-bit-lookahead LUT: lut[next16] = (symbol, code_length)."""

    __slots__ = ("sym", "length")

    def __init__(self, bits, vals):
        self.sym = np.zeros(1 << 16, dtype=np.int32) - 1
        self.length = np.zeros(1 << 16, dtype=np.int32)
        code = 0
        idx = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                self.sym[lo:hi] = vals[idx]
                self.length[lo:hi] = length
                code += 1
                idx += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing already applied."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, want: int) -> None:
        while self.nbits < want:
            if self.pos < len(self.data):
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.acc <<= 8  # pad with zeros past the end (spec behavior)
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.skip(n)
        return out


def _extend(value: int, size: int) -> int:
    """T.81 F.12 EXTEND: map a `size`-bit magnitude to its signed value."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes -> (H,W) grayscale or (H,W,3) RGB uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _DecodeTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker sync lost at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(payload[p : p + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    p += 64
                else:
                    tbl = np.frombuffer(
                        payload[p : p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                qtables[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(tc, th)] = _DecodeTable(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            comps = []
            for i in range(ncomp):
                cid, sampling, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": sampling >> 4, "v": sampling & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (marker 0xFF{marker:02X}); "
                "only baseline sequential DCT is implemented"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tables = payload[1 + 2 * i], payload[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tables >> 4, tables & 0x0F))
            return _decode_scan(
                data, pos, frame, scan, qtables, htables, restart_interval
            )
        # APPn/COM and anything else: skipped
    raise ValueError("no SOS marker found")


def _entropy_segment(data: bytes, pos: int) -> tuple[bytes, int]:
    """Unstuff entropy-coded bytes from ``pos`` up to the next
    non-restart marker; returns (unstuffed bytes, marker position)."""
    buf = bytearray()
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                buf.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn — segment boundary
                return bytes(buf), i
            return bytes(buf), i
        buf.append(b)
        i += 1
    return bytes(buf), n


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    # per-component coefficient storage (blocks in MCU raster order)
    comp_state = []
    for comp, dc_id, ac_id in scan:
        bw = mcus_x * comp["h"]  # blocks per row
        bh = mcus_y * comp["v"]
        comp_state.append(
            {
                "comp": comp,
                "dc": htables[(0, dc_id)],
                "ac": htables[(1, ac_id)],
                "q": qtables[comp["tq"]][UNZIGZAG].reshape(8, 8),
                "coef": np.zeros((bh * bw, 64), dtype=np.int32),
                "bw": bw,
                "bh": bh,
                "pred": 0,
            }
        )

    reader = _BitReader(b"")
    seg, next_pos = _entropy_segment(data, pos)
    reader = _BitReader(seg)
    mcu = 0
    while mcu < n_mcus:
        if restart_interval and mcu and mcu % restart_interval == 0:
            # expect RSTn at next_pos; reset predictors + bit buffer
            if next_pos + 1 < len(data) and 0xD0 <= data[next_pos + 1] <= 0xD7:
                seg, next_pos = _entropy_segment(data, next_pos + 2)
                reader = _BitReader(seg)
                for st in comp_state:
                    st["pred"] = 0
        my, mx = divmod(mcu, mcus_x)
        for st in comp_state:
            ch, cv = st["comp"]["h"], st["comp"]["v"]
            for by in range(cv):
                for bx in range(ch):
                    block = _decode_block(reader, st)
                    row = my * cv + by
                    col = mx * ch + bx
                    st["coef"][row * st["bw"] + col] = block
        mcu += 1

    # reconstruct each component: dequantize + batched IDCT + +128
    planes = []
    for st in comp_state:
        coefs = st["coef"][:, UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        coefs *= st["q"][None, :, :]
        spatial = _idct_blocks(coefs) + 128.0
        bh, bw = st["bh"], st["bw"]
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution (sample replication)
        ry, rx = vmax // st["comp"]["v"], hmax // st["comp"]["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(reader: _BitReader, st) -> np.ndarray:
    block = np.zeros(64, dtype=np.int32)
    dc_tbl, ac_tbl = st["dc"], st["ac"]
    look = reader.peek16()
    size = int(dc_tbl.sym[look])
    if size < 0:
        raise ValueError("invalid DC Huffman code")
    reader.skip(int(dc_tbl.length[look]))
    diff = _extend(reader.read(size), size)
    st["pred"] += diff
    block[0] = st["pred"]
    k = 1
    while k < 64:
        look = reader.peek16()
        rs = int(ac_tbl.sym[look])
        if rs < 0:
            raise ValueError("invalid AC Huffman code")
        reader.skip(int(ac_tbl.length[look]))
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run overflows block")
        block[k] = _extend(reader.read(size), size)
        k += 1
    return block


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of a base table (public
    behavior of jpeg_set_quality / jpeg_quality_scaling)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    out = (tbl * scale + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _quantized_zigzag(plane: np.ndarray, qtbl_zz: np.ndarray) -> np.ndarray:
    """(H,W) float plane (padded to 8s) -> (n_blocks, 64) quantized
    zigzag coefficients, blocks in raster order."""
    ph, pw = plane.shape
    bh, bw = ph // 8, pw // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
    q = qtbl_zz[UNZIGZAG].reshape(8, 8).astype(np.float64)
    quant = np.round(_fdct_blocks(blocks) / q[None, :, :]).astype(np.int32)
    return quant.reshape(-1, 64)[:, ZIGZAG]


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if (ph, pw) == (h, w):
        return plane
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -(-h // mult) * mult, -(-w // mult) * mult
    if (ph, pw) == (h, w):
        return plane
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def jpeg_encode(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (H,W) grayscale or (H,W,3) RGB uint8 as baseline JFIF.

    ``subsampling``: '444' (one block of each component per MCU) or
    '420' (16x16 MCU: 4 Y blocks + 2x2-averaged Cb, Cr — the common
    camera/scanner layout). ``restart_interval`` > 0 emits a DRI
    segment and an RSTn marker every that many MCUs (predictors reset,
    bitstream byte-aligned) — the error-resilience feature real scan
    archives carry."""
    if img.dtype != np.uint8:
        raise ValueError(f"jpeg_encode expects uint8, got {img.dtype}")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"unsupported shape {img.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub420 = (not gray) and subsampling == "420"
    h, w = img.shape[:2]
    qy = _quality_scale(Q_LUMA, quality)
    qc = _quality_scale(Q_CHROMA, quality)

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    # DQT
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(qy.tolist())
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(qc.tolist())
    # SOF0
    ncomp = 1 if gray else 3
    y_sampling = 0x22 if sub420 else 0x11
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes([1, y_sampling, 0])
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT (Annex K standard tables)
    for tc, th, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
    ) + (
        ()
        if gray
        else (
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
        )
    ):
        payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    if restart_interval > 0:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_y = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    writer = _BitWriter()

    # component planes + per-MCU block layout
    if gray:
        yp = _pad8(img.astype(np.float64))
        comps = [(_quantized_zigzag(yp, qy), yp.shape[1] // 8, 1, 1, dc_y, ac_y)]
        mcus_x = yp.shape[1] // 8
        mcus_y = yp.shape[0] // 8
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
        if sub420:
            yp = _pad_to(y, 16)
            ph, pw = yp.shape
            # chroma: pad to the same 16-multiple extent, then 2x2 mean
            # (half-res planes land exactly on 8x8 block boundaries)
            cbp = _pad_to(cb, 16).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            crp = _pad_to(cr, 16).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            mcus_x, mcus_y = pw // 16, ph // 16
            comps = [
                (_quantized_zigzag(yp, qy), pw // 8, 2, 2, dc_y, ac_y),
                (_quantized_zigzag(cbp, qc), pw // 16, 1, 1, dc_c, ac_c),
                (_quantized_zigzag(crp, qc), pw // 16, 1, 1, dc_c, ac_c),
            ]
        else:
            yp, cbp, crp = (_pad8(p) for p in (y, cb, cr))
            mcus_x = yp.shape[1] // 8
            mcus_y = yp.shape[0] // 8
            comps = [
                (_quantized_zigzag(yp, qy), mcus_x, 1, 1, dc_y, ac_y),
                (_quantized_zigzag(cbp, qc), mcus_x, 1, 1, dc_c, ac_c),
                (_quantized_zigzag(crp, qc), mcus_x, 1, 1, dc_c, ac_c),
            ]

    preds = [0] * len(comps)
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()  # byte-align before the marker
            writer.buf += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, (zz, bw, ch, cv, dc_t, ac_t) in enumerate(comps):
            for by in range(cv):
                for bx in range(ch):
                    idx = (my * cv + by) * bw + (mx * ch + bx)
                    preds[ci] = _write_block(zz[idx], writer, dc_t, ac_t, preds[ci])
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _write_block(blk, writer, dc_codes, ac_codes, pred):
    dc = int(blk[0])
    diff = dc - pred
    size = abs(diff).bit_length()
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        v = diff if diff > 0 else diff + (1 << size) - 1
        writer.write(v, size)
    run = 0
    last_nz = 63
    while last_nz > 0 and blk[last_nz] == 0:
        last_nz -= 1
    for k in range(1, 64):
        v = int(blk[k])
        if v == 0:
            if k > last_nz:
                code, length = ac_codes[0x00]
                writer.write(code, length)
                break
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        size = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        vv = v if v > 0 else v + (1 << size) - 1
        writer.write(vv, size)
        run = 0
    # (no EOB when the final coefficient k=63 is non-zero, per spec)
    return dc
