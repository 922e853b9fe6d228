"""Binary morphology: the deterministic "line segmentation model".

The reference obtains a per-line mask from an ONNX semantic-segmentation
network (sigmoid > 0.9 — reference: BDRC/inference.py:170-183). Our
engine's stand-in produces the same *shape* of output — a solid band per
text line — by closing the ink bitmap morphologically: horizontal
dilation bridges inter-character gaps, vertical dilation bridges the
strut-to-glyph gap. Like the reference's network, the output is a
binary mask consumed by connected-component analysis.
"""

from __future__ import annotations

import numpy as np

# structuring-element radii of the line "segmentation model" — exported
# so the line-size filter can deflate mask components back to ink extent
H_RADIUS = 8
V_RADIUS = 5


def dilate_h(mask: np.ndarray, radius: int) -> np.ndarray:
    """Horizontal binary dilation by ``radius`` (window 2r+1).

    Logarithmic shift-OR: after OR-ing with shifts 1, 2, 4, ... the
    reach doubles each pass, so a radius-r dilation costs O(log r)
    passes instead of r."""
    if radius <= 0:
        return mask
    out = mask.copy()
    done = 0
    while done < radius:
        s = min(max(done, 1), radius - done)
        tmp = out.copy()
        out[:, s:] |= tmp[:, :-s]
        out[:, :-s] |= tmp[:, s:]
        done += s  # reach doubles each pass
    return out


def dilate_v(mask: np.ndarray, radius: int) -> np.ndarray:
    """Vertical binary dilation by ``radius`` (window 2r+1), log shift-OR."""
    if radius <= 0:
        return mask
    out = mask.copy()
    done = 0
    while done < radius:
        s = min(max(done, 1), radius - done)
        tmp = out.copy()
        out[s:, :] |= tmp[:-s, :]
        out[:-s, :] |= tmp[s:, :]
        done += s
    return out


def line_segmentation_mask(
    ink: np.ndarray, h_radius: int = H_RADIUS, v_radius: int = V_RADIUS
) -> np.ndarray:
    """Ink bitmap {0,1} -> line mask {0,1}: one solid component per text line.

    Defaults bridge the fixture geometry (GLYPH_GAP=4 between characters,
    4 blank rows between strut and glyph strip) with margin to spare;
    real deployments would swap in an ONNX session here (the pipeline
    treats this function as the stage-1 model forward, cf.
    BDRC/inference.py:488-506).

    Shift-OR dilation: pages clamp to a few hundred KB, so the uint8
    working set stays cache-resident and beats integral-image variants.
    """
    return dilate_v(dilate_h(ink, h_radius), v_radius)
