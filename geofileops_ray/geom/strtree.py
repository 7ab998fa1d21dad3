"""Bounding-box join / query structures used inside per-cell workers.

Replaces the reference's persistent per-layer R-tree (geofileops
fileops.py:621-708 create_spatial_index + manual rtree_<layer> bbox joins
in every two-layer SQL template, _geoops_sql.py:997-1028) with an
ephemeral in-worker structure built per cell group — cheap (O(group)) and
rebuilt on demand, as planned in SURVEY.md §2.6.

`bbox_join` is a numpy sort-sweep over x-intervals with y-interval
filtering — fully vectorized candidate generation, O((m+k) log(m+k) + out).
"""

from __future__ import annotations

import numpy as np


def bbox_join(boxes_a: np.ndarray, boxes_b: np.ndarray,
              expand: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """All pairs (i, j) with boxes_a[i] ∩ boxes_b[j] ≠ ∅ (boxes: (n,4)
    minx,miny,maxx,maxy). `expand` grows A's boxes (for dwithin joins).

    Returns (ia, ib) index arrays.
    """
    m, k = len(boxes_a), len(boxes_b)
    if m == 0 or k == 0:
        return (np.empty(0, dtype=np.int64),) * 2
    a = boxes_a.astype(np.float64, copy=True)
    if expand:
        a[:, :2] -= expand
        a[:, 2:] += expand
    b = boxes_b.astype(np.float64, copy=False)

    # sort b by minx; for a box a, any intersecting b has
    # b.minx ∈ [a.minx − max_b_width, a.maxx] — a two-sided window whose
    # size tracks LOCAL density, not the global prefix. Candidates are
    # enumerated by fully vectorized repeat/arange expansion of those
    # windows, processed in chunks CAPPED by candidate count so a skewed
    # window never materializes an unbounded pair array.
    order_b = np.argsort(b[:, 0], kind="stable")
    bs = b[order_b]
    blo = np.ascontiguousarray(bs[:, 0])
    bminy = np.ascontiguousarray(bs[:, 1])
    bhix = np.ascontiguousarray(bs[:, 2])
    bmaxy = np.ascontiguousarray(bs[:, 3])
    max_bw = float((b[:, 2] - b[:, 0]).max())
    lo_idx = np.searchsorted(blo, a[:, 0] - max_bw, side="left")
    hi_idx = np.searchsorted(blo, a[:, 2], side="right")
    counts = np.maximum(hi_idx - lo_idx, 0)
    total = int(counts.sum())
    if total == 0:
        return (np.empty(0, dtype=np.int64),) * 2
    csum = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(counts, out=csum[1:])
    # small chunks keep the candidate temporaries cache-resident — on
    # bandwidth-throttled hosts a multi-megabyte expansion is ~10× slower
    # than the same work in L2-sized slices (measured: dense 10k self-join
    # 1.67s at 4M-chunk vs 0.13s at 8-32k)
    CHUNK = 16_384
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    row = 0
    while row < m:
        end = int(np.searchsorted(csum, csum[row] + CHUNK, side="left"))
        end = min(max(end, row + 1), m)
        cc = counts[row:end]
        P = int(cc.sum())
        if P:
            ii = np.repeat(np.arange(row, end, dtype=np.int64), cc)
            base = csum[row:end] - csum[row]
            jj = np.repeat(lo_idx[row:end], cc) + (
                np.arange(P, dtype=np.int64) - np.repeat(base, cc)
            )
            mask = (
                (bhix[jj] >= a[ii, 0])
                & (blo[jj] <= a[ii, 2])
                & (bminy[jj] <= a[ii, 3])
                & (bmaxy[jj] >= a[ii, 1])
            )
            if mask.any():
                out_a.append(ii[mask])
                out_b.append(order_b[jj[mask]])
        row = end
    if not out_a:
        return (np.empty(0, dtype=np.int64),) * 2
    return np.concatenate(out_a), np.concatenate(out_b)


class PackedRTree:
    """Static packed R-tree over boxes (STR packing by Morton order of
    centers); supports bbox queries and nearest-neighbour search. Built
    per actor / per cell group for kNN joins (join_nearest,
    _geoops_sql.py:2652-2671 knn2 analogue)."""

    NODE_SIZE = 16

    def __init__(self, boxes: np.ndarray):
        self.boxes = boxes.astype(np.float64, copy=False)
        n = len(boxes)
        if n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels = []
            return
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        self.order = np.lexsort((cy, cx))  # simple spatial sort
        sorted_boxes = self.boxes[self.order]
        self.levels = [sorted_boxes]
        cur = sorted_boxes
        while len(cur) > 1:
            ng = (len(cur) + self.NODE_SIZE - 1) // self.NODE_SIZE
            nxt = np.empty((ng, 4))
            for g in range(ng):
                blk = cur[g * self.NODE_SIZE : (g + 1) * self.NODE_SIZE]
                nxt[g] = (
                    blk[:, 0].min(),
                    blk[:, 1].min(),
                    blk[:, 2].max(),
                    blk[:, 3].max(),
                )
            self.levels.append(nxt)
            cur = nxt

    def query(self, box: np.ndarray) -> np.ndarray:
        """Indices (into original boxes) whose bbox intersects `box`."""
        if len(self.order) == 0:
            return np.empty(0, dtype=np.int64)
        hits = []
        stack = [(len(self.levels) - 1, 0)]
        while stack:
            lvl, idx = stack.pop()
            node = self.levels[lvl][idx]
            if (
                node[0] > box[2]
                or node[2] < box[0]
                or node[1] > box[3]
                or node[3] < box[1]
            ):
                continue
            if lvl == 0:
                hits.append(self.order[idx])
            else:
                lo = idx * self.NODE_SIZE
                hi = min(lo + self.NODE_SIZE, len(self.levels[lvl - 1]))
                stack.extend((lvl - 1, k) for k in range(lo, hi))
        return np.asarray(hits, dtype=np.int64)

    def box_distance(self, pt: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        dx = np.maximum(np.maximum(boxes[:, 0] - pt[0], pt[0] - boxes[:, 2]), 0)
        dy = np.maximum(np.maximum(boxes[:, 1] - pt[1], pt[1] - boxes[:, 3]), 0)
        return np.hypot(dx, dy)

    def nearest(self, pt: np.ndarray, k: int = 1) -> tuple[np.ndarray, np.ndarray]:
        """k nearest boxes by bbox distance: (indices, distances). Callers
        refine with exact geometry distances."""
        import heapq

        if len(self.order) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        heap = [(0.0, len(self.levels) - 1, 0)]
        out_i: list[int] = []
        out_d: list[float] = []
        while heap and len(out_i) < k:
            d, lvl, idx = heapq.heappop(heap)
            if lvl == 0:
                out_i.append(int(self.order[idx]))
                out_d.append(d)
                continue
            lo = idx * self.NODE_SIZE
            hi = min(lo + self.NODE_SIZE, len(self.levels[lvl - 1]))
            child = self.levels[lvl - 1][lo:hi]
            dists = self.box_distance(pt, child)
            for off, dd in enumerate(dists):
                heapq.heappush(heap, (float(dd), lvl - 1, lo + off))
        return np.asarray(out_i, dtype=np.int64), np.asarray(out_d)
