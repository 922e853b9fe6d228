"""Per-format decode cost at the bench page size.

The page kernel's decode step is the one pure-Python scale constant
(JPEG entropy decode is bit-serial; LZW is byte-serial): at 100 TB it
decides the CPU budget of ingestion, so it must be a measured number,
not a guess (VERDICT r3 "What's wrong" #2). Decode parallelizes
perfectly inside mapInPandas — no shuffle, no driver — so cost scales
linearly with cores; this script measures single-core ms/page for every
container the engine accepts, on the SAME rendered bench page.

Usage: python scripts/bench_decode_formats.py [n_reps]
Prints one JSON line; NOTES_r4 carries the table.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from ocr_inference_spark.imgcodec import (  # noqa: E402
    decode_image,
    png_encode,
    tiff_encode,
)
from ocr_inference_spark.gifcodec import gif_encode  # noqa: E402
from ocr_inference_spark.webpcodec import webp_encode  # noqa: E402
from ocr_inference_spark.jpegcodec import (  # noqa: E402
    jpeg_encode,
    jpeg_encode_progressive,
)
from ocr_inference_spark.render import render_page  # noqa: E402
from ocr_inference_spark.synth import page_lines_for  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    # the same page shape bench.py's corpus renders (3 lines, style 0)
    img = render_page(page_lines_for("a spark native analytics engine " * 4, 3))
    variants = {
        "png": png_encode(img),
        "jpeg_baseline": jpeg_encode(img, quality=95),
        "jpeg_progressive": jpeg_encode_progressive(img, quality=95),
        "tiff_none": tiff_encode(img),
        "tiff_lzw_pred2": tiff_encode(img, compression="lzw", predictor=2),
        "tiff_deflate_pred2": tiff_encode(img, compression="deflate", predictor=2),
        "gif": gif_encode(img),
        "webp_lossless": webp_encode(img),
    }
    out = {"page_px": list(img.shape), "reps": reps, "formats": {}}
    for name, blob in variants.items():
        decode_image(blob)  # warm (imports, LUT builds)
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            res = decode_image(blob)
            samples.append(time.perf_counter() - t0)
        assert res.shape[:2] == img.shape[:2]
        exact = bool(np.array_equal(np.atleast_3d(res)[..., 0], img)) if name.startswith(
            ("png", "tiff", "gif", "webp")
        ) else None
        out["formats"][name] = {
            "bytes": len(blob),
            "ms_per_page": round(1000.0 * min(samples), 3),
            "ms_per_page_median": round(1000.0 * sorted(samples)[len(samples) // 2], 3),
            "exact": exact,
        }
    png_ms = out["formats"]["png"]["ms_per_page"]
    for name, f in out["formats"].items():
        f["vs_png"] = round(f["ms_per_page"] / png_ms, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
