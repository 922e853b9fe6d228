"""Single-core micro-profile of the per-page kernel's hot stages.

Breaks the NOTES_r4 §1 stage profile one level deeper: inside
detect (binarize / segmentation mask / CC labeling / filters) and
inside dewarp (fit + shift + re-detect), on the same styled-page
corpus the stage profile used.  Usage:

    python scripts/profile_kernel.py [n_pages]
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

import numpy as np

from ocr_inference_spark.imgcodec import decode_image, png_encode
from ocr_inference_spark.render import render_page
from ocr_inference_spark.synth import _style_for, page_lines_for
from ocr_inference_spark.kernels.binarize import binarize, to_gray
from ocr_inference_spark.kernels.components import (
    connected_components,
    filter_area,
    filter_in_text_area,
    filter_line_contours,
    get_text_area,
)
from ocr_inference_spark.kernels.components import _all_runs
from ocr_inference_spark.kernels.morphology import (
    H_RADIUS,
    V_RADIUS,
    line_segmentation_mask,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    pages = []
    for doc_id in range(n):
        ref = f"page_{doc_id:08d}_00"
        lines = page_lines_for(f"the quick brown fox {doc_id} jumps over the lazy dog " * 3, 3)
        pages.append(png_encode(render_page(lines, **_style_for(ref))))

    t = defaultdict(float)
    counts = defaultdict(int)

    for content in pages:
        a = time.perf_counter()
        gray = to_gray(decode_image(content))
        b = time.perf_counter()
        t["decode"] += b - a

        a = time.perf_counter()
        ink = binarize(gray)
        b = time.perf_counter()
        t["binarize"] += b - a

        a = time.perf_counter()
        mask = line_segmentation_mask(ink)
        b = time.perf_counter()
        t["seg_mask"] += b - a

        a = time.perf_counter()
        rr, rs, re = _all_runs(mask)
        b = time.perf_counter()
        t["cc_runs"] += b - a
        counts["n_runs"] += len(rr)

        a = time.perf_counter()
        comps = connected_components(mask)
        b = time.perf_counter()
        t["cc_total"] += b - a
        counts["n_comps"] += len(comps)

        a = time.perf_counter()
        comps2 = filter_area(comps, mask.shape[0] * mask.shape[1] * 0.001)
        b = time.perf_counter()
        t["filter_area"] += b - a

        a = time.perf_counter()
        area = get_text_area(comps2)
        b = time.perf_counter()
        t["text_area"] += b - a

        a = time.perf_counter()
        sized = filter_line_contours(
            comps2, ink.shape[1], deflate_w=H_RADIUS, deflate_h=V_RADIUS
        )
        filter_in_text_area(sized, area)
        b = time.perf_counter()
        t["filter_line"] += b - a

    print(f"pages={n}")
    for k in sorted(t, key=lambda k: -t[k]):
        print(f"{k:14s} {1000*t[k]/n:8.3f} ms/page")
    for k, v in counts.items():
        print(f"{k:14s} {v/n:8.1f} /page")

    # full-pipeline stage_ms breakdown (the NOTES_r4 §1 table)
    from ocr_inference_spark.model import RecognitionSession, serialize_weights
    from ocr_inference_spark.page import process_page

    session = RecognitionSession(serialize_weights())
    stages = defaultdict(float)
    a = time.perf_counter()
    for content in pages:
        res = process_page(content, session)
        for k, v in res.stage_ms.items():
            stages[k] += v
    wall = time.perf_counter() - a
    print("\nprocess_page stages:")
    for k in sorted(stages, key=lambda k: -stages[k]):
        print(f"{k:14s} {stages[k]/n:8.3f} ms/page")
    print(f"{'total':14s} {1000*wall/n:8.3f} ms/page")


if __name__ == "__main__":
    main()
