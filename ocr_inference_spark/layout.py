"""LAYOUT mode: per-region class detection (LineMode.LAYOUT,
reference: BDRC/data.py:46-50; LayoutDetection, BDRC/inference.py:186-276).

The reference's layout model segments a page into class planes
(``line``, ``margin``, ``caption``, ``pagenr``, ``header``, ... —
Config.py COLOR_DICT) and ``filter_classes`` keeps the requested ones
(BDRC/inference.py:868-888). Without a trained net, the classes the
synthetic corpus can produce are recovered GEOMETRICALLY from the same
component analysis the line path uses — each rule names the layout
semantics it stands in for:

- ``line``:   line-sized component whose center lies in the text area
- ``caption``: line-sized component OUTSIDE the text area
- ``margin``: tall thin rule hugging a vertical page edge
- ``header``: wide thin rule at the very top
- ``pagenr``: small isolated blob in the bottom page band
- ``text``:   anything else inside the text area (fallback)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kernels.components import (
    Component,
    filter_in_text_area,
    filter_line_contours,
    get_text_area,
)
from .kernels.morphology import H_RADIUS, V_RADIUS

LAYOUT_CLASSES = ("line", "caption", "margin", "header", "pagenr", "text")

LAYOUT_OUT_SCHEMA = (
    "image_name string, cls string, x int, y int, w int, h int, status string"
)


def classify_regions(
    comps: list[Component], shape: tuple[int, int], width: int
) -> list[tuple[str, Component]]:
    """(class, component) per region under the rules above."""
    h_img, w_img = shape
    area = get_text_area(comps)
    line_sized = set(
        id(c)
        for c in filter_line_contours(comps, width, deflate_w=H_RADIUS, deflate_h=V_RADIUS)
    )
    in_area = set(id(c) for c in filter_in_text_area(comps, area))
    out: list[tuple[str, Component]] = []
    for c in comps:
        thin = (c.median_thickness() - 2 * V_RADIUS) <= 10
        if id(c) in line_sized:
            out.append(("line" if id(c) in in_area else "caption", c))
        elif c.h > 0.5 * h_img and c.w < 0.05 * w_img and (
            c.x < 0.08 * w_img or c.x + c.w > 0.92 * w_img
        ):
            # a vertical rule is thin HORIZONTALLY (its column thickness
            # is its height) — width bound is the thinness test here
            out.append(("margin", c))
        elif thin and c.y < 0.05 * h_img and c.w > 0.3 * w_img:
            out.append(("header", c))
        elif (
            c.y + c.h > 0.8 * h_img
            and c.w < 0.1 * w_img
            and c.h < 0.05 * h_img
            and id(c) not in in_area
        ):
            out.append(("pagenr", c))
        else:
            out.append(("text", c))
    return out


def detect_layout(
    spark: SparkSession, pages_df: DataFrame, filter_classes: list[str] | None = None
) -> DataFrame:
    """Pages -> one row per region (image_name, cls, bbox). The F5
    class filter (``filter_classes``, BDRC/inference.py:868-888) is a
    relational ``isin`` AFTER the kernel so Catalyst can prune it."""
    import pandas as pd

    def kernel(batches):
        from .imgcodec import png_decode
        from .kernels.binarize import binarize, to_gray
        from .page import _detect

        for pdf in batches:
            rows = {k: [] for k in ("image_name", "cls", "x", "y", "w", "h", "status")}
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    ink = binarize(to_gray(png_decode(bytes(content))))
                except Exception:
                    rows["image_name"].append(ref)
                    rows["cls"].append(None)
                    rows["x"].append(0); rows["y"].append(0)
                    rows["w"].append(0); rows["h"].append(0)
                    rows["status"].append("decode_failed")
                    continue
                mask, comps = _detect(ink)
                for cls, c in classify_regions(comps, mask.shape, ink.shape[1]):
                    rows["image_name"].append(ref)
                    rows["cls"].append(cls)
                    rows["x"].append(c.x); rows["y"].append(c.y)
                    rows["w"].append(c.w); rows["h"].append(c.h)
                    rows["status"].append("success")
            yield pd.DataFrame(rows)

    n = spark.sparkContext.defaultParallelism * 4
    out = (
        pages_df.select("media_ref", "content")
        .repartition(n, "media_ref")
        .mapInPandas(kernel, schema=LAYOUT_OUT_SCHEMA)
    )
    if filter_classes:
        out = out.where(F.col("cls").isin(filter_classes))
    return out
