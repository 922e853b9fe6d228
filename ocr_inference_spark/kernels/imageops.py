"""Image-prep utilities: tiling, padding, resizing, normalization,
coordinate transforms (SURVEY.md I2-I7, C8-C12).

These mirror the reference's model-input plumbing — patch tiling for
the segmentation net (BDRC/utils.py:713-729), pad-to-multiple
(:540-560,1002-1010), aspect-preserving resize with the 4096x2048
memory clamp (:438-494,741-778), float normalization (:781-793),
sigmoid (:563-573), polar/cartesian contour rotation (:624-658), and
coordinate rescale back to original resolution (:1062-1079). The
morphological stand-in model doesn't strictly need tiling, but the
kernels are part of the engine's contract (a real ONNX model plugs in
over exactly these primitives) and each is pinned by a property test
(stitch(tile(x)) == x, etc.).
"""

from __future__ import annotations

import math

import numpy as np

MAX_WIDTH = 4096  # reference: BDRC/utils.py:744-745
MAX_HEIGHT = 2048
PATCH = 512  # reference: cli.py:57


def sigmoid(x: np.ndarray) -> np.ndarray:
    """1/(1+exp(-x)), overflow-safe (reference: BDRC/utils.py:563-573)."""
    out = np.empty_like(x, dtype=np.float64)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [0,1] (reference: BDRC/utils.py:781-793)."""
    return (img.astype(np.float32)) / 255.0


def resize_image(img: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    """Aspect-free bilinear resize, pure NumPy (reference resize family,
    BDRC/utils.py:438-494)."""
    h, w = img.shape[:2]
    if (h, w) == (new_h, new_w):
        return img.copy()
    ys = np.linspace(0, h - 1, new_h)
    xs = np.linspace(0, w - 1, new_w)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    a = img[np.ix_(y0, x0)].astype(np.float64)
    b = img[np.ix_(y0, x1)].astype(np.float64)
    c = img[np.ix_(y1, x0)].astype(np.float64)
    d = img[np.ix_(y1, x1)].astype(np.float64)
    out = a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx
    if np.issubdtype(img.dtype, np.integer):
        return np.rint(out).astype(img.dtype)
    return out.astype(img.dtype)


def resize_clamp(img: np.ndarray, max_h: int = MAX_HEIGHT, max_w: int = MAX_WIDTH):
    """Aspect-preserving downscale when beyond the memory clamp
    (reference: preprocess_image, BDRC/utils.py:741-778). Returns
    (image, scale) with scale <= 1.0."""
    h, w = img.shape[:2]
    scale = min(max_h / h, max_w / w, 1.0)
    if scale >= 1.0:
        return img, 1.0
    return resize_image(img, int(h * scale), int(w * scale)), scale


def get_paddings(h: int, w: int, multiple: int = PATCH) -> tuple[int, int]:
    """Bottom/right padding to the next multiple (reference:
    BDRC/utils.py:732-738)."""
    pad_h = (multiple - h % multiple) % multiple
    pad_w = (multiple - w % multiple) % multiple
    return pad_h, pad_w


def pad_to_multiple(
    img: np.ndarray, multiple: int = PATCH, value: int = 0
) -> np.ndarray:
    """Right/bottom pad to a patch multiple (reference:
    BDRC/utils.py:540-560,1002-1010; pad value 255 for white pages)."""
    pad_h, pad_w = get_paddings(img.shape[0], img.shape[1], multiple)
    if pad_h == 0 and pad_w == 0:
        return img
    return np.pad(img, ((0, pad_h), (0, pad_w)), constant_values=value)


def tile_image(img: np.ndarray, patch: int = PATCH) -> np.ndarray:
    """Split a (H,W) padded image into (N, patch, patch) tiles, row-major
    (reference: tile_image, BDRC/utils.py:713-721)."""
    h, w = img.shape
    if h % patch or w % patch:
        raise ValueError("tile_image requires pad_to_multiple first")
    rows = h // patch
    cols = w // patch
    return (
        img.reshape(rows, patch, cols, patch)
        .swapaxes(1, 2)
        .reshape(rows * cols, patch, patch)
    )


def stitch_tiles(tiles: np.ndarray, h: int, w: int, patch: int = PATCH) -> np.ndarray:
    """Inverse of tile_image for the padded (h, w) canvas (reference:
    stitch_predictions, BDRC/utils.py:724-729,1026-1051)."""
    rows = h // patch
    cols = w // patch
    return (
        tiles.reshape(rows, cols, patch, patch)
        .swapaxes(1, 2)
        .reshape(h, w)
    )


def crop_padding(img: np.ndarray, orig_h: int, orig_w: int) -> np.ndarray:
    """Remove the pad added by pad_to_multiple (reference:
    crop_padding, BDRC/utils.py:1100-1108)."""
    return img[:orig_h, :orig_w]


def cart2pol(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(reference: BDRC/utils.py:624-658)"""
    return np.hypot(x, y), np.arctan2(y, x)


def pol2cart(rho: np.ndarray, phi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return rho * np.cos(phi), rho * np.sin(phi)


def rotate_contour(points: np.ndarray, center: tuple[float, float], angle_deg: float) -> np.ndarray:
    """Rotate (N,2) contour points about center via polar coordinates
    (reference: rotate_contour, BDRC/utils.py:624-658)."""
    cx, cy = center
    rho, phi = cart2pol(points[:, 0] - cx, points[:, 1] - cy)
    phi = phi + math.radians(angle_deg)
    x, y = pol2cart(rho, phi)
    return np.stack([x + cx, y + cy], axis=1)


def contour_to_original(points: np.ndarray, scale: float) -> np.ndarray:
    """Rescale contour points back to original resolution (reference:
    contour_to_original, BDRC/utils.py:1062-1079)."""
    if scale == 1.0:
        return points
    return np.rint(points / scale).astype(points.dtype)


def bbox_to_original(bbox: tuple[int, int, int, int], scale: float) -> tuple[int, int, int, int]:
    """(reference: bbox_to_original, BDRC/utils.py:1062-1079)"""
    x, y, w, h = bbox
    if scale == 1.0:
        return bbox
    return (
        int(round(x / scale)),
        int(round(y / scale)),
        int(round(w / scale)),
        int(round(h / scale)),
    )
