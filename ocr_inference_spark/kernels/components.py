"""Connected-component analysis on binary masks.

The reference uses ``cv2.findContours(RETR_LIST, CHAIN_APPROX_SIMPLE)``
(reference: BDRC/line_detection.py:33-44). Without OpenCV we use the
classic run-length two-pass labeling with union-find: extract horizontal
ink runs per row (vectorized), union runs that touch between adjacent
rows (8-connectivity). Components carry their runs, so bbox / area /
center / per-column top-edge profiles all derive without re-scanning
pixels.

Component discovery order is normalized to bottom-to-top (descending
bbox y) to mirror OpenCV's contour enumeration order, which the
reference's reading-order sort implicitly depends on
(BDRC/line_detection.py:424-486 groups in discovery order and reverses
at the end).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Component:
    """One connected component: runs are (row, x0, x1_exclusive)."""

    runs: list
    x: int
    y: int
    w: int
    h: int
    area: int

    @property
    def bbox(self) -> tuple[int, int, int, int]:
        return (self.x, self.y, self.w, self.h)

    @property
    def center(self) -> tuple[int, int]:
        # bbox-center with floor division, matching build_line_data
        # (reference: BDRC/line_detection.py:188-209)
        return (self.x + self.w // 2, self.y + self.h // 2)

    def top_profile(self) -> np.ndarray:
        """For each column in [x, x+w): smallest row holding ink (int32);
        columns with no ink hold -1."""
        top = np.full(self.w, np.iinfo(np.int32).max, dtype=np.int64)
        for row, x0, x1 in self.runs:
            seg = top[x0 - self.x : x1 - self.x]
            np.minimum(seg, row, out=seg)
        top[top == np.iinfo(np.int32).max] = -1
        return top.astype(np.int32)

    def column_ys(self, x_abs: int) -> np.ndarray:
        """All ink rows of this component at absolute column ``x_abs``."""
        return np.array(
            sorted(row for row, x0, x1 in self.runs if x0 <= x_abs < x1),
            dtype=np.int32,
        )


def _all_runs(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All ink runs of a {0,1} mask in one vectorized pass.

    Returns (rows, starts, ends) sorted by (row, start); ends exclusive.
    One np.diff over the zero-padded mask replaces a per-row Python
    loop — the CC hot path at page scale.
    """
    h, w = mask.shape
    padded = np.zeros((h, w + 2), dtype=np.int8)
    padded[:, 1:-1] = mask
    d = np.diff(padded, axis=1)
    sr, sc = np.nonzero(d == 1)
    er, ec = np.nonzero(d == -1)
    # np.nonzero is row-major: starts and ends align pairwise per row
    return sr, sc, ec


def connected_components(mask: np.ndarray) -> list[Component]:
    """Label a {0,1} mask; returns components sorted bottom-to-top."""
    h, _w = mask.shape
    parent: list[int] = []

    def find(a: int) -> int:
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    rrows, rstarts, rends = _all_runs(mask)
    # slice boundaries per row in the (row-major sorted) run arrays
    row_break = np.searchsorted(rrows, np.arange(h + 1))
    rstarts_l = rstarts.tolist()
    rends_l = rends.tolist()

    all_runs: list[tuple[int, int, int, int]] = []  # (row, x0, x1, label)
    prev: list[tuple[int, int, int]] = []  # (x0, x1, label) of previous row
    prev_y = -2
    for y in range(h):
        lo, hi = row_break[y], row_break[y + 1]
        if lo == hi:
            prev = []
            prev_y = -2
            continue
        if prev_y != y - 1:
            prev = []
        cur: list[tuple[int, int, int]] = []
        pi = 0
        for ri in range(lo, hi):
            x0, x1 = rstarts_l[ri], rends_l[ri]
            label = -1
            while pi < len(prev) and prev[pi][1] < x0:  # prev entirely left (8-conn allows touch)
                pi += 1
            pj = pi
            while pj < len(prev) and prev[pj][0] <= x1:
                # 8-connectivity: [x0,x1) touches [px0,px1) incl. diagonal
                if label == -1:
                    label = prev[pj][2]
                else:
                    union(label, prev[pj][2])
                pj += 1
            if label == -1:
                label = len(parent)
                parent.append(label)
            cur.append((x0, x1, label))
            all_runs.append((y, x0, x1, label))
        prev = cur
        prev_y = y

    groups: dict[int, list[tuple[int, int, int]]] = {}
    for y, x0, x1, label in all_runs:
        groups.setdefault(find(label), []).append((y, x0, x1))

    comps: list[Component] = []
    for runs in groups.values():
        ys = [r[0] for r in runs]
        xmin = min(r[1] for r in runs)
        xmax = max(r[2] for r in runs)
        ymin, ymax = min(ys), max(ys)
        area = sum(r[2] - r[1] for r in runs)
        comps.append(
            Component(
                runs=runs,
                x=int(xmin),
                y=int(ymin),
                w=int(xmax - xmin),
                h=int(ymax - ymin + 1),
                area=int(area),
            )
        )
    # bottom-to-top, then left-to-right — OpenCV-like discovery order
    comps.sort(key=lambda c: (-c.y, c.x))
    return comps


def filter_area(comps: list[Component], min_area: float) -> list[Component]:
    """Area filter (reference: BDRC/line_detection.py:124-125,233)."""
    return [c for c in comps if c.area > min_area]


def filter_line_contours(
    comps: list[Component],
    image_width: int,
    min_h: int = 10,
    deflate_w: int = 0,
    deflate_h: int = 0,
) -> list[Component]:
    """Keep components with w > 1% image width and h > min_h
    (reference: filter_line_contours, BDRC/line_detection.py:247-264).

    ``deflate_w``/``deflate_h`` subtract the segmentation model's
    dilation margins so the size test applies to the underlying *ink*
    extent — this is what strips non-content page furniture (margin
    rules, header rules, page-number blobs: the reference's non-line
    layout classes, Config.py:37-48) whose mask components would
    otherwise be inflated past the thresholds by the closing operation.
    """
    return [
        c
        for c in comps
        if (c.w - 2 * deflate_w) > image_width * 0.01
        and (c.h - 2 * deflate_h) > min_h
    ]
