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

    def median_thickness(self) -> float:
        """Median per-column ink row count over columns holding ink — a
        warp-INVARIANT height measure: a thin rule bent by page curl has
        an inflated bbox height but its columns stay ~rule-thin, while a
        text line's columns stay ~band-tall."""
        t = np.zeros(self.w, dtype=np.int32)
        for row, x0, x1 in self.runs:
            t[x0 - self.x : x1 - self.x] += 1
        inked = t[t > 0]
        return float(np.median(inked)) if inked.size else 0.0

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


def get_text_area(
    comps: list[Component], grow_x: int = 5, grow_y: int = 55
) -> tuple[int, int, int, int] | None:
    """Main-content (text-area) bbox — I36 analogue of ``get_text_area``
    (reference: BDRC/utils.py:576-608): the reference dilates the line
    mask with a 12x2 kernel x10 iterations (~±55 px vertical, ~±5 px
    horizontal reach) and takes the biggest resulting contour's bounding
    rect. Equivalent on run-based components: inflate each bbox by
    (grow_x, grow_y), union-find transitively overlapping boxes into
    clusters (what the dilation merges), pick the cluster with the
    biggest merged-bbox area, return its UN-inflated bbox as
    (xmin, ymin, xmax, ymax) inclusive. None when there are no
    components (reference returns None on no contours)."""
    if not comps:
        return None
    n = len(comps)
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    boxes = [
        (c.x - grow_x, c.y - grow_y, c.x + c.w + grow_x, c.y + c.h + grow_y)
        for c in comps
    ]
    # x-sorted sweep: only pairs whose x-intervals overlap are compared
    # (near-linear on real pages vs the naive O(n²) — this runs up to 3x
    # per page inside the hot OCR kernel, and a noisy scan can carry
    # thousands of small components)
    order = sorted(range(n), key=lambda i: boxes[i][0])
    for oi, i in enumerate(order):
        ax0, ay0, ax1, ay1 = boxes[i]
        for j in order[oi + 1 :]:
            bx0, by0, bx1, by1 = boxes[j]
            if bx0 >= ax1:
                break  # sorted by x0: no later box can overlap i in x
            if ay0 < by1 and by0 < ay1:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)

    clusters: dict[int, list[Component]] = {}
    for i, c in enumerate(comps):
        clusters.setdefault(find(i), []).append(c)

    def bbox_of(cs: list[Component]) -> tuple[int, int, int, int]:
        return (
            min(c.x for c in cs),
            min(c.y for c in cs),
            max(c.x + c.w for c in cs),
            max(c.y + c.h for c in cs),
        )

    best = max(
        clusters.values(),
        key=lambda cs: (
            (bbox_of(cs)[2] - bbox_of(cs)[0]) * (bbox_of(cs)[3] - bbox_of(cs)[1])
        ),
    )
    x0, y0, x1, y1 = bbox_of(best)
    return (x0, y0, x1 - 1, y1 - 1)


def filter_in_text_area(
    comps: list[Component], rect: tuple[int, int, int, int] | None
) -> list[Component]:
    """F3 spatial predicate — keep components whose bbox CENTER lies
    inside the text-area rect, bounds inclusive (reference:
    filter_contours + is_inside_rectangle, BDRC/utils.py:661-681). This
    is the reference's actual boilerplate-strip mechanism: line-shaped
    furniture outside the main block (captions, marginal rules) passes
    the size filter but fails this one."""
    if rect is None:
        return comps
    xmin, ymin, xmax, ymax = rect
    return [
        c
        for c in comps
        if xmin <= c.center[0] <= xmax and ymin <= c.center[1] <= ymax
    ]


def filter_line_contours(
    comps: list[Component],
    image_width: int,
    min_h: int = 10,
    deflate_w: int = 0,
    deflate_h: int = 0,
) -> list[Component]:
    """Keep components with w > 1% image width and line-height > min_h
    (reference: filter_line_contours, BDRC/line_detection.py:247-264).

    The height test uses the median per-column ink thickness rather than
    the bbox height: the reference measures bbox h on geometry that is
    already deskewed/dewarped (flat bboxes), whereas this filter also
    runs on pre-rectification geometry where page curl inflates a thin
    furniture rule's bbox far past min_h — column thickness is the
    warp-invariant restatement of the same criterion.

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
        and (c.median_thickness() - 2 * deflate_h) > min_h
    ]
