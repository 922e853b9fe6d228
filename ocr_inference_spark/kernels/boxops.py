"""Shared integral-image box primitives (int32, bandwidth-lean).

Every windowed operation in the page kernel — adaptive threshold,
morphological closing — reduces to a box sum over a 2D array; computing
them all from one int32 integral image halves the memory traffic of the
hot path (the kernels are DRAM-bound at high core counts, which is what
limits N->4N scaling efficiency)."""

from __future__ import annotations

import numpy as np


def integral(img: np.ndarray, pad: int, pad_mode: str = "edge") -> np.ndarray:
    """Zero-row/col-prefixed integral image of ``img`` padded by ``pad``.

    int32 is safe up to ~8.4 MPix of uint8 (the reference clamps pages
    to 4096x2048 = 8.4 MPix, BDRC/utils.py:744-745 — max sum 2^31*0.999);
    int64 is used beyond that.
    """
    padded = np.pad(img, pad, mode=pad_mode) if pad else img
    dtype = np.int32 if padded.size < 8_400_000 else np.int64
    ph, pw = padded.shape
    out = np.zeros((ph + 1, pw + 1), dtype=dtype)
    np.cumsum(padded, axis=0, dtype=dtype, out=out[1:, 1:])
    np.cumsum(out[1:, 1:], axis=1, out=out[1:, 1:])
    return out


def box_sum_from_integral(integ: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Sliding-window sum with window (bh, bw) over the padded source."""
    return (
        integ[bh:, bw:]
        - integ[:-bh, bw:]
        - integ[bh:, :-bw]
        + integ[:-bh, :-bw]
    )
