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

    @property
    def runs_arr(self) -> np.ndarray:
        """Runs as an int64 (m, 3) array [row, x0, x1), cached — runs are
        never mutated after construction, so the two views stay in sync.
        The vectorized consumers (slice stats, profiles, thickness) pull
        this instead of looping Python tuples."""
        a = getattr(self, "_runs_arr", None)
        if a is None:
            a = np.asarray(self.runs, dtype=np.int64).reshape(-1, 3)
            object.__setattr__(self, "_runs_arr", a)
        return a

    def top_profile(self) -> np.ndarray:
        """For each column in [x, x+w): smallest row holding ink (int32);
        columns with no ink hold -1."""
        # runs are row-major (rows ascending): writing rows DESCENDING
        # leaves the smallest row in each column — plain slice stores,
        # no per-run np.minimum temporaries
        top = np.full(self.w, -1, dtype=np.int32)
        x = self.x
        for row, x0, x1 in reversed(self.runs):
            top[x0 - x : x1 - x] = row
        return top

    def median_thickness(self) -> float:
        """Median per-column ink row count over columns holding ink — a
        warp-INVARIANT height measure: a thin rule bent by page curl has
        an inflated bbox height but its columns stay ~rule-thin, while a
        text line's columns stay ~band-tall."""
        a = self.runs_arr
        if not a.size:
            return 0.0
        # +1/-1 boundary marks, cumsum -> per-column run count
        d = np.zeros(self.w + 1, dtype=np.int64)
        np.add.at(d, a[:, 1] - self.x, 1)
        np.add.at(d, a[:, 2] - self.x, -1)
        t = np.cumsum(d[:-1])
        inked = t[t > 0]
        return float(np.median(inked)) if inked.size else 0.0

    def column_ys(self, x_abs: int) -> np.ndarray:
        """All ink rows of this component at absolute column ``x_abs``."""
        a = self.runs_arr
        sel = (a[:, 1] <= x_abs) & (x_abs < a[:, 2])
        return np.sort(a[sel, 0]).astype(np.int32)


def _all_runs(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All ink runs of a {0,1} mask in one vectorized pass.

    Returns (rows, starts, ends) sorted by (row, start); ends exclusive.
    One np.diff over the zero-padded mask replaces a per-row Python
    loop — the CC hot path at page scale.
    """
    h, w = mask.shape
    W = w + 2
    padded = np.zeros((h, W), dtype=np.int8)
    padded[:, 1:-1] = mask
    # one flattened diff + ONE nonzero scan (the zero pad columns keep
    # row boundaries transition-free); start at (r, x) appears at flat
    # index r*W + x with value +1, exclusive end at r*W + x1 with -1
    d = np.diff(padded.ravel())
    nz = np.flatnonzero(d)
    vals = d[nz]
    starts = nz[vals == 1]
    ends = nz[vals == -1]
    # starts/ends align pairwise in flat (row-major) order
    return starts // W, starts % W, ends % W


def connected_components(mask: np.ndarray) -> list[Component]:
    """Label a {0,1} mask; returns components sorted bottom-to-top.

    Fully vectorized run-based labeling: runs from one flattened
    diff/nonzero pass; the run adjacency graph from two batched
    ``searchsorted`` calls over composite (row, x) keys (within a row
    both starts and exclusive ends are strictly increasing, so the
    prev-row runs touching a given run — 8-connectivity, diagonal touch
    included — form a contiguous index window); components from
    min-label propagation with pointer doubling (O(log n) rounds);
    per-component bbox/area via grouped reductions. The partition is
    identical to the classic two-pass union-find this replaces.
    """
    h, w = mask.shape
    rr, rs, re = _all_runs(mask)
    n = rr.size
    if n == 0:
        return []
    W = w + 2
    start_key = rr * W + rs
    end_key = rr * W + re
    # run i (row y, [x0,x1)) touches prev-row run j iff re[j] >= x0 and
    # rs[j] <= x1  ==  end_key[j] >= start_key[i]-W  and
    # start_key[j] <= end_key[i]-W  (keys of other rows fall outside)
    jlo = np.searchsorted(end_key, start_key - W, side="left")
    jhi = np.searchsorted(start_key, end_key - W, side="right")
    cnt = np.maximum(jhi - jlo, 0)
    total = int(cnt.sum())
    label = np.arange(n)
    if total:
        ii = np.repeat(np.arange(n), cnt)
        jj = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt) + np.repeat(jlo, cnt)
        while True:
            m = label.copy()
            np.minimum.at(m, ii, label[jj])
            np.minimum.at(m, jj, label[ii])
            while True:  # pointer doubling to the round's fixpoint
                mm = m[m]
                if np.array_equal(mm, m):
                    break
                m = mm
            if np.array_equal(m, label):
                break
            label = m

    uniq, inv = np.unique(label, return_inverse=True)
    k = uniq.size
    xmin = np.full(k, W, dtype=np.int64)
    np.minimum.at(xmin, inv, rs)
    xmax = np.zeros(k, dtype=np.int64)
    np.maximum.at(xmax, inv, re)
    ymin = np.full(k, h, dtype=np.int64)
    np.minimum.at(ymin, inv, rr)
    ymax = np.full(k, -1, dtype=np.int64)
    np.maximum.at(ymax, inv, rr)
    area = np.bincount(inv, weights=(re - rs).astype(np.float64)).astype(np.int64)

    # stable group-by keeps each component's runs row-major, matching the
    # insertion order of the two-pass labeling
    order = np.argsort(inv, kind="stable")
    bounds = np.concatenate(([0], np.cumsum(np.bincount(inv))))
    run_tuples = list(zip(rr.tolist(), rs.tolist(), re.tolist()))
    ol = order.tolist()
    comps: list[Component] = []
    for ci in range(k):
        idxs = ol[bounds[ci] : bounds[ci + 1]]
        comps.append(
            Component(
                runs=[run_tuples[t] for t in idxs],
                x=int(xmin[ci]),
                y=int(ymin[ci]),
                w=int(xmax[ci] - xmin[ci]),
                h=int(ymax[ci] - ymin[ci] + 1),
                area=int(area[ci]),
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
