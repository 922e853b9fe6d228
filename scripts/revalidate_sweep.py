"""Large-corpus span-equality revalidation sweep across EVERY supported
media container.

Synthesizes an interleaved corpus from the testdata documents table
(pages carry skew/warp/caption/noise furniture), re-encodes each page
round-robin across all twelve ingestion formats INSIDE executors, runs
full extraction, and compares against the golden expected spans. The
tuple invariant is exact: (kind, text, media_ref, order) per document.

Usage: python scripts/revalidate_sweep.py [sf_dir] [pages_per_doc] [cpus]
Prints one JSON line; BENCH/NOTES_r4.md records the result.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FORMATS = [
    "png",
    "jpeg",
    "jpeg_progressive",
    "tiff_raw",
    "tiff_lzw",
    "tiff_deflate",
    "tiff_packbits",
    "tiff_g4",
    "tiff_ccitt_rle",
    "png_adaptive",
    "bmp",
    "pnm",
    "gif",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ppd = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import pandas as pd
    from pyspark.sql import functions as F

    from ocr_inference_spark.pipeline import extract_spans
    from ocr_inference_spark.session import get_spark
    from ocr_inference_spark.synth import synth_corpus

    spark = get_spark(app_name="revalidate_sweep", master=f"local[{cpus}]")
    docs, pages, expected = synth_corpus(spark, sf_dir, pages_per_doc=ppd)

    def reencode(batches):
        from ocr_inference_spark.bmpcodec import bmp_encode, pnm_encode
        from ocr_inference_spark.gifcodec import gif_encode
        from ocr_inference_spark.imgcodec import png_decode, png_encode, tiff_encode
        from ocr_inference_spark.jpegcodec import jpeg_encode, jpeg_encode_progressive

        enc = {
            "png": lambda im: png_encode(im),
            "jpeg": lambda im: jpeg_encode(im, quality=95),
            "jpeg_progressive": lambda im: jpeg_encode_progressive(im, quality=95),
            "tiff_raw": lambda im: tiff_encode(im),
            "tiff_lzw": lambda im: tiff_encode(im, compression="lzw", predictor=2),
            "tiff_deflate": lambda im: tiff_encode(
                im, compression="deflate", predictor=2
            ),
            "tiff_packbits": lambda im: tiff_encode(im, compression="packbits"),
            "tiff_g4": lambda im: tiff_encode(im, compression="g4"),
            "tiff_ccitt_rle": lambda im: tiff_encode(im, compression="ccitt-rle"),
            "png_adaptive": lambda im: png_encode(im, filter_mode="adaptive"),
            "bmp": lambda im: bmp_encode(im),
            "pnm": lambda im: pnm_encode(im),
            "gif": lambda im: gif_encode(im),
        }
        for pdf in batches:
            out = []
            fmts = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                src_id = int(ref.rsplit("_", 2)[-2])
                page_no = int(ref.rsplit("_", 1)[-1])
                fmt = FORMATS[(src_id * 3 + page_no) % len(FORMATS)]
                out.append(enc[fmt](png_decode(bytes(content))))
                fmts.append(fmt)
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"], "content": out, "fmt": fmts}
            )

    mixed = pages.select("media_ref", "content").mapInPandas(
        reencode, schema="media_ref string, content binary, fmt string"
    )
    mixed = mixed.repartition(cpus * 4, "media_ref").cache()
    fmt_counts = {
        r["fmt"]: r["n"]
        for r in mixed.groupBy("fmt").agg(F.count("*").alias("n")).collect()
    }
    n_pages = sum(fmt_counts.values())

    t0 = time.perf_counter()
    got = extract_spans(spark, docs, mixed.drop("fmt"), strategy="broadcast")
    flat = lambda df: df.select(  # noqa: E731
        "doc_id", F.posexplode("spans").alias("i", "s")
    ).select(
        "doc_id", "i", "s.kind", "s.text", "s.media_ref", "s.offset"
    )
    mismatch = (
        flat(got)
        .exceptAll(flat(expected))
        .unionByName(flat(expected).exceptAll(flat(got)))
        .count()
    )
    wall = round(time.perf_counter() - t0, 1)
    n_docs = expected.count()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "pages": n_pages,
                "docs": n_docs,
                "format_counts": fmt_counts,
                "mismatched_span_rows": mismatch,
                "wall_sec": wall,
            }
        )
    )
    spark.stop()
    if mismatch:
        sys.exit(1)


if __name__ == "__main__":
    main()
