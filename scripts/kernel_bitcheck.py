"""Bit-equality gate for kernel micro-optimization (round 6).

Hashes EVERY field process_page emits (texts, confs, contours, angle,
dewarp flag, n_lines, status) over N real bench-corpus pages plus the
detect_page surface (q34's output shape). Usage:

    python scripts/kernel_bitcheck.py [n_pages]    # prints one md5

Run before and after a kernel edit; the md5 must not move.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 400


def main() -> None:
    from ocr_inference_spark.model import get_session, serialize_weights
    from ocr_inference_spark.page import detect_page, process_page
    from ocr_inference_spark.session import get_spark
    from ocr_inference_spark.synth import synth_corpus

    spark = get_spark(app_name="bitcheck", master="local[8]")
    docs, pages, _ = synth_corpus(spark, SF_DIR)
    sample = pages.limit(N).collect()
    spark.stop()

    session = get_session(serialize_weights())
    h = hashlib.md5()
    t0 = time.perf_counter()
    for row in sample:
        content = bytes(row.content)
        res = process_page(content, session)
        h.update(
            repr(
                (
                    res.status,
                    res.texts,
                    [f"{c:.9e}" for c in res.confs],
                    f"{res.angle:.9e}",
                    res.dewarp_applied,
                    res.n_lines,
                    res.contours,
                )
            ).encode()
        )
        d = detect_page(content)
        h.update(
            repr(
                (
                    d["status"], d["width"], d["height"],
                    d["bboxes"], d["contours"], d["rbboxes"],
                )
            ).encode()
        )
    dt = time.perf_counter() - t0
    print(f"pages={len(sample)} md5={h.hexdigest()} ms/page={1000*dt/len(sample):.3f}")


if __name__ == "__main__":
    main()
