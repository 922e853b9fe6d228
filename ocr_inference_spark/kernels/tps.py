"""True 2-D thin-plate-spline warping (I21).

Re-expresses the reference's ``run_tps`` (BDRC/image_dewarping.py:22-74:
ThinPlateSpline(alpha=0.5) fit on control points + corner anchors, grid
transformed and sampled per channel with map_coordinates) in pure
NumPy: the classic TPS system (Bookstein 1989) with kernel
U(r) = r^2 log r^2, regularization ``alpha`` on the kernel diagonal,
solved once for both output coordinates; the image is warped BACKWARD
(spline fitted dst->src, evaluated on the output grid, bilinear
sample) so every output pixel is defined.

Unlike the column-shift rectification in dewarp.py (vertical-only — the
dominant page-curl family), this kernel corrects arbitrary smooth 2-D
distortions, e.g. horizontal shear.
"""

from __future__ import annotations

import numpy as np


def _tps_kernel(r2: np.ndarray) -> np.ndarray:
    """U(r) = r^2 * log(r^2), with U(0) = 0."""
    out = np.zeros_like(r2, dtype=np.float64)
    nz = r2 > 0
    out[nz] = r2[nz] * np.log(r2[nz])
    return out


def tps_fit(src: np.ndarray, dst: np.ndarray, alpha: float = 0.5):
    """Fit a TPS mapping src (N,2) -> dst (N,2).

    Returns (src_pts, weights, affine): dst ~= affine-part + sum_i w_i *
    U(|p - src_i|). ``alpha`` adds Tikhonov regularization to the kernel
    block (the reference's ThinPlateSpline(0.5))."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    n = len(src)
    d2 = ((src[:, None, :] - src[None, :, :]) ** 2).sum(axis=2)
    K = _tps_kernel(d2) + alpha * np.eye(n)
    P = np.hstack([np.ones((n, 1)), src])
    A = np.zeros((n + 3, n + 3))
    A[:n, :n] = K
    A[:n, n:] = P
    A[n:, :n] = P.T
    b = np.zeros((n + 3, 2))
    b[:n] = dst
    sol = np.linalg.solve(A, b)
    return src, sol[:n], sol[n:]


def tps_transform(params, pts: np.ndarray) -> np.ndarray:
    """Evaluate a fitted TPS at pts (M,2) -> (M,2)."""
    src, w, a = params
    pts = np.asarray(pts, dtype=np.float64)
    d2 = ((pts[:, None, :] - src[None, :, :]) ** 2).sum(axis=2)
    return _tps_kernel(d2) @ w + np.hstack([np.ones((len(pts), 1)), pts]) @ a


def _bilinear(img: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Sample img at float coords (out-of-range -> 0)."""
    h, w = img.shape
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    fx = xs - x0
    fy = ys - y0
    out = np.zeros(xs.shape, dtype=np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            vals = np.zeros(xs.shape, dtype=np.float64)
            vals[inside] = img[yi[inside], xi[inside]]
            out += wgt * vals
    return out


def tps_warp(
    img: np.ndarray,
    input_pts: np.ndarray,
    output_pts: np.ndarray,
    alpha: float = 0.5,
    add_corners: bool = True,
) -> np.ndarray:
    """Warp img so input_pts land on output_pts ((x, y) pairs).

    Backward mapping: fit output->input, evaluate on the output grid,
    bilinear-sample. ``add_corners`` anchors the four image corners
    (identity) like the reference, keeping borders in place. Binary
    {0,1} inputs come back binary (>=0.5 threshold)."""
    h, w = img.shape
    input_pts = np.asarray(input_pts, dtype=np.float64)
    output_pts = np.asarray(output_pts, dtype=np.float64)
    if add_corners:
        corners = np.array(
            [[0.0, 0.0], [w - 1.0, 0.0], [0.0, h - 1.0], [w - 1.0, h - 1.0]]
        )
        input_pts = np.vstack([input_pts, corners])
        output_pts = np.vstack([output_pts, corners])
    params = tps_fit(output_pts, input_pts, alpha)
    gy, gx = np.mgrid[0:h, 0:w]
    grid = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float64)
    src = tps_transform(params, grid)
    sampled = _bilinear(img.astype(np.float64), src[:, 0], src[:, 1]).reshape(h, w)
    binary = img.max() <= 1 and img.min() >= 0 and np.issubdtype(img.dtype, np.integer)
    if binary:
        return (sampled >= 0.5).astype(img.dtype)
    return np.clip(np.rint(sampled), 0, 255).astype(img.dtype)
