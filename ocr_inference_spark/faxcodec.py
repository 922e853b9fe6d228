"""CCITT Group 3/4 bilevel fax codecs (TIFF compressions 2 and 4).

Book-scan archives — the reference's own domain (its cli globs `.tif`
decoded by cv2's libtiff) — overwhelmingly ship bilevel pages as CCITT
Group 4 (ITU-T T.6 two-dimensional MMR) or Modified-Huffman RLE (TIFF
compression 2, one T.4 1-D row per byte-aligned row). Public specs:
ITU-T T.4 (MH run-length code tables), ITU-T T.6 (2-D vertical /
horizontal / pass modes against the previous row).

The T.4 code tables in :mod:`._t4_tables` were derived EMPIRICALLY
from Java ImageIO's independent CCITT encoder by anchor-free
longest-common-prefix extraction (scripts/derive_t4_tables.py) — no
hand-typed table entries to mistrust — and both codecs here are
cross-validated against Java ImageIO in both directions
(tests/test_imgcodec_formats.py fixtures).

Convention: a row is a uint8 {0,1} array where **1 = white** (fax codes
start with a white run); TIFF photometric mapping happens in
imgcodec.tiff_decode.
"""

from __future__ import annotations

import numpy as np

from ._t4_tables import BLACK_CODES, WHITE_CODES

# T.6 vertical/horizontal/pass mode words
_MODE_V0 = "1"
_MODE_VR = {1: "011", 2: "000011", 3: "0000011"}
_MODE_VL = {1: "010", 2: "000010", 3: "0000010"}
_MODE_H = "001"
_MODE_P = "0001"

_MAX_MAKEUP = 2560


def _mh_bits(run: int, codes: dict[int, str]) -> str:
    """Run length -> MH bitstring (makeup chain + terminating code)."""
    out = []
    while run >= 64:
        m = min((run // 64) * 64, _MAX_MAKEUP)
        out.append(codes[m])
        run -= m
    out.append(codes[run])
    return "".join(out)


def _build_decode_tree(codes: dict[int, str]) -> dict[str, int]:
    return {bits: run for run, bits in codes.items()}


_WHITE_DEC = None
_BLACK_DEC = None


def _decoders():
    global _WHITE_DEC, _BLACK_DEC
    if _WHITE_DEC is None:
        _WHITE_DEC = _build_decode_tree(WHITE_CODES)
        _BLACK_DEC = _build_decode_tree(BLACK_CODES)
    return _WHITE_DEC, _BLACK_DEC


class _Bits:
    """MSB-first reader over bytes with prefix-code matching."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read_code(self, table: dict[str, int], max_len: int = 14) -> int:
        """Match the next prefix code in ``table`` (bitstring keys)."""
        data = self.data
        n = len(data) * 8
        bits = []
        p = self.pos
        for _ in range(max_len):
            if p >= n:
                raise ValueError("fax stream exhausted inside a code")
            bits.append("1" if data[p >> 3] & (0x80 >> (p & 7)) else "0")
            p += 1
            run = table.get("".join(bits))
            if run is not None:
                self.pos = p
                return run
        raise ValueError(f"invalid fax code {''.join(bits)!r}")

    def peek(self, k: int) -> str:
        data = self.data
        n = len(data) * 8
        out = []
        for p in range(self.pos, min(self.pos + k, n)):
            out.append("1" if data[p >> 3] & (0x80 >> (p & 7)) else "0")
        return "".join(out)

    def skip(self, k: int) -> None:
        self.pos += k

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _mh_run(bits: _Bits, white: bool) -> int:
    """Full MH run: makeup chain (>=64) then terminating (<64)."""
    wd, bd = _decoders()
    table = wd if white else bd
    total = 0
    while True:
        run = bits.read_code(table)
        total += run
        if run < 64:
            return total
        # makeup code: a terminating code must follow


def _transitions(row: np.ndarray) -> list[int]:
    """Changing-element positions relative to the imaginary WHITE pixel
    before the row (T.4/T.6 convention: a black first pixel is itself a
    changing element at 0), terminated by two sentinels at ``width``.
    Even indices change to black, odd indices back to white."""
    w = len(row)
    d = (np.nonzero(np.diff(row))[0] + 1).tolist()
    if w and row[0] == 0:
        d = [0] + d
    return d + [w, w]


# ---------------------------------------------------------------------------
# MH / RLE (TIFF compression 2): each row an independent T.4 1-D code,
# starting at a byte boundary (EncodedByteAlign per TIFF 6.0 §10)
# ---------------------------------------------------------------------------


def mh_encode(img: np.ndarray) -> bytes:
    """(h, w) {0,1} uint8 (1 = white) -> TIFF compression-2 stream."""
    w = img.shape[1]
    out = []
    for row in img:
        real = _transitions(row)[:-2]  # strip sentinels
        edges = [0] + real + [w]
        bits = []
        for i in range(len(edges) - 1):
            run = edges[i + 1] - edges[i]
            bits.append(_mh_bits(run, WHITE_CODES if i % 2 == 0 else BLACK_CODES))
        s = "".join(bits)
        s += "0" * (-len(s) % 8)
        out.append(int(s, 2).to_bytes(len(s) // 8, "big") if s else b"")
    return b"".join(out)


def mh_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """TIFF compression-2 stream -> (h, w) {0,1} uint8 (1 = white)."""
    bits = _Bits(data)
    img = np.zeros((height, width), dtype=np.uint8)
    for y in range(height):
        bits.align()
        img[y] = _decode_1d_row(bits, width)
    return img


# ---------------------------------------------------------------------------
# Group 4 (T.6 MMR, TIFF compression 4): every row coded 2-D against
# the previous row; the imaginary row above the first is all white
# ---------------------------------------------------------------------------


def _row_transitions_for_ref(ref_trans: list[int], a0: int, colour_white: bool):
    """(b1, b2) per T.6 §2.2.2: b1 = first changing element on the
    reference row strictly right of a0 whose NEW colour is opposite to
    a0's run colour; b2 = the next changing element after b1. Sentinels
    at ``width`` cover the no-such-element cases. Even indices in
    ``ref_trans`` change to black, odd to white (see _transitions)."""
    n = len(ref_trans)
    for i in range(n - 2):  # real transitions only; sentinels handled below
        t = ref_trans[i]
        if t <= a0:
            continue
        if (i % 2 == 0) == colour_white:  # changes to the opposite colour
            b2 = ref_trans[i + 1]
            return t, b2
    w = ref_trans[-1]
    return w, w


def g4_encode(img: np.ndarray) -> bytes:
    """(h, w) {0,1} uint8 (1 = white) -> T.6 stream (no EOFB — TIFF
    readers stop at the declared row count; spec's EOFB is optional in
    TIFF and Java's writer omits it)."""
    h, w = img.shape
    ref = np.ones(w, dtype=np.uint8)
    bits: list[str] = []
    for y in range(h):
        row = img[y]
        row_trans = _transitions(row)  # sentinels guarantee lookups land
        ref_trans = _transitions(ref)
        a0 = -1
        colour_white = True
        ti = 0  # index of the first transition > a0
        while a0 < w:
            while row_trans[ti] <= a0:
                ti += 1  # sentinels at w stop this while a0 < w... unless a0 >= w
            a1 = row_trans[ti]
            b1, b2 = _row_transitions_for_ref(ref_trans, a0, colour_white)
            if b2 < a1:
                bits.append(_MODE_P)
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                if d == 0:
                    bits.append(_MODE_V0)
                elif d > 0:
                    bits.append(_MODE_VR[d])
                else:
                    bits.append(_MODE_VL[-d])
                a0 = a1
                colour_white = not colour_white
                continue
            # horizontal mode: two runs from a0 (row start counts from 0)
            a2 = row_trans[ti + 1] if a1 < w else w
            start = 0 if a0 < 0 else a0
            bits.append(_MODE_H)
            first = WHITE_CODES if colour_white else BLACK_CODES
            second = BLACK_CODES if colour_white else WHITE_CODES
            bits.append(_mh_bits(a1 - start, first))
            bits.append(_mh_bits(a2 - a1, second))
            a0 = a2
        ref = row
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


def g4_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """T.6 stream -> (h, w) {0,1} uint8 (1 = white)."""
    bits = _Bits(data)
    img = np.ones((height, width), dtype=np.uint8)
    ref_trans: list[int] = [width, width]
    for y in range(height):
        row = _decode_2d_row(bits, ref_trans, width)
        img[y] = row
        ref_trans = _transitions(row)
    return img


def _decode_2d_row(bits: _Bits, ref_trans: list[int], width: int) -> np.ndarray:
    """Decode one 2-D-coded row (shared by T.6/G4 and T.4 2-D rows)
    against the reference row's transitions; returns the {0,1} row."""
    if True:  # keep the original loop indentation
        cur_trans: list[int] = []
        a0 = -1
        colour_white = True
        while a0 < width:
            look = bits.peek(7)
            if look.startswith("1"):
                mode, d = "V", 0
                bits.skip(1)
            elif look.startswith("011"):
                mode, d = "V", 1
                bits.skip(3)
            elif look.startswith("010"):
                mode, d = "V", -1
                bits.skip(3)
            elif look.startswith("001"):
                mode, d = "H", 0
                bits.skip(3)
            elif look.startswith("0001"):
                mode, d = "P", 0
                bits.skip(4)
            elif look.startswith("000011"):
                mode, d = "V", 2
                bits.skip(6)
            elif look.startswith("000010"):
                mode, d = "V", -2
                bits.skip(6)
            elif look.startswith("0000011"):
                mode, d = "V", 3
                bits.skip(7)
            elif look.startswith("0000010"):
                mode, d = "V", -3
                bits.skip(7)
            else:
                raise ValueError(f"invalid T.6 mode word {look!r}")
            b1, b2 = _row_transitions_for_ref(ref_trans, a0, colour_white)
            if mode == "P":
                a0 = b2
                continue
            if mode == "V":
                a1 = b1 + d
                if a1 <= a0:  # malformed: coding position must advance
                    raise ValueError("T.6 vertical mode does not advance")
                cur_trans.append(a1)
                a0 = a1
                colour_white = not colour_white
                continue
            # horizontal: two MH runs from max(a0, 0)
            start = 0 if a0 < 0 else a0
            r1 = _mh_run(bits, colour_white)
            r2 = _mh_run(bits, not colour_white)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > width:
                raise ValueError("T.6 horizontal runs overflow row")
            if a2 <= a0:  # malformed zero-length run pair: no progress
                raise ValueError("T.6 horizontal mode does not advance")
            cur_trans.append(a1)
            cur_trans.append(a2)
            a0 = a2
        # materialize the row from its transitions (clip the final
        # "imaginary" transition at width)
        row = np.ones(width, dtype=np.uint8)
        white = True
        prev = 0
        for t in cur_trans:
            t = min(t, width)
            if not white:
                row[prev:t] = 0
            prev = t
            white = not white
        if not white:
            row[prev:width] = 0
        return row


def _decode_1d_row(bits: _Bits, width: int) -> np.ndarray:
    """One T.4 1-D (MH) row -> {0,1} array (no alignment handling).
    The run count is bounded so malformed streams of repeated
    zero-length codes terminate instead of spinning."""
    row = np.zeros(width, dtype=np.uint8)
    x = 0
    white = True
    for _ in range(2 * width + 4):
        if x >= width:
            return row
        run = _mh_run(bits, white)
        if x + run > width:
            raise ValueError("fax run overflows row")
        if white:
            row[x : x + run] = 1
        x += run
        white = not white
    raise ValueError("malformed T.4 row: run count exceeds bound")


_EOL = "000000000001"


def _expect_eol(bits: _Bits) -> None:
    """Consume fill 0-bits then the 12-bit EOL word (T.4 §4.1.2)."""
    zeros = 0
    while True:
        look = bits.peek(1)
        if look == "":
            raise ValueError("T.4 stream ended while seeking EOL")
        bits.skip(1)
        if look == "0":
            zeros += 1
            continue
        if zeros >= 11:
            return  # 0{>=11}1 = EOL (leading zeros beyond 11 are fill)
        raise ValueError("malformed T.4 EOL")


def g3_encode(img: np.ndarray, two_d: bool = False) -> bytes:
    """(h, w) {0,1} uint8 -> T.4/G3 stream: every row preceded by EOL;
    with ``two_d`` the 1-bit tag follows each EOL (all rows still coded
    1-D here — legal under T4Options bit 0, K-factor 1)."""
    bits: list[str] = []
    w = img.shape[1]
    for row in img:
        bits.append(_EOL)
        if two_d:
            bits.append("1")  # this row is 1-D coded
        real = _transitions(row)[:-2]
        edges = [0] + real + [w]
        for i in range(len(edges) - 1):
            bits.append(
                _mh_bits(edges[i + 1] - edges[i], WHITE_CODES if i % 2 == 0 else BLACK_CODES)
            )
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


def g3_decode(data: bytes, width: int, height: int, two_d: bool = True) -> np.ndarray:
    """T.4/G3 stream -> (h, w) {0,1} uint8. Each row is preceded by an
    EOL (fill bits tolerated); with ``two_d`` (T4Options bit 0) a tag
    bit selects 1-D (MH) or 2-D (T.6-mode) coding per row."""
    bits = _Bits(data)
    img = np.ones((height, width), dtype=np.uint8)
    ref_trans: list[int] = [width, width]
    for y in range(height):
        _expect_eol(bits)
        one_d = True
        if two_d:
            tag = bits.peek(1)
            if tag == "":
                raise ValueError("T.4 stream ended at row tag")
            bits.skip(1)
            one_d = tag == "1"
        row = (
            _decode_1d_row(bits, width)
            if one_d
            else _decode_2d_row(bits, ref_trans, width)
        )
        img[y] = row
        ref_trans = _transitions(row)
    return img
