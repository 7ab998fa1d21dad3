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

import math

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


class BoxGrid:
    """Static uniform-grid index over boxes for repeated bbox joins
    against the SAME (large, e.g. broadcast) side.

    ``bbox_join`` re-sorts its b side per call and prunes on x only — a
    dense 500k-row broadcast side makes every 8k-row batch expand ~10^7
    x-window candidates to keep ~10^4 real pairs. This grid bins the b
    boxes once (cell edge ≥ median box size, ~4 boxes/cell), and each
    query expands only the cells the query box covers, so per-batch cost
    tracks the TRUE pair count. Pairs discovered through several cells
    are deduped with the ref-cell rule (emit only from the cell holding
    the overlap region's min corner) — no sort/unique pass."""

    __slots__ = (
        "boxes", "cell", "ox", "oy", "nx", "ny", "keys", "items", "big",
    )

    # boxes covering more than this many cells (cell size is keyed to
    # the MEDIAN box edge, so a few extent-spanning boxes in an
    # otherwise small-box layer would each replicate O(n/target) grid
    # entries) skip insertion and are checked linearly per query
    BIG_CELL_CAP = 64

    def __init__(self, boxes: np.ndarray, target_per_cell: float = 4.0):
        self.boxes = boxes.astype(np.float64, copy=False)
        # empty/missing geometries carry (inf, inf, -inf, -inf) bounds —
        # exclude them from the grid (they can never match)
        valid = np.flatnonzero(
            np.isfinite(self.boxes).all(axis=1) if len(self.boxes) else
            np.zeros(0, dtype=bool)
        )
        b = self.boxes[valid]
        n = len(b)
        if n == 0:
            self.cell, self.ox, self.oy, self.nx, self.ny = 1.0, 0.0, 0.0, 1, 1
            self.keys = np.empty(0, dtype=np.int64)
            self.items = np.empty(0, dtype=np.int64)
            self.big = np.empty(0, dtype=np.int64)
            return
        ox, oy = float(b[:, 0].min()), float(b[:, 1].min())
        x1, y1 = float(b[:, 2].max()), float(b[:, 3].max())
        area = max((x1 - ox) * (y1 - oy), 1e-12)
        cell = math.sqrt(area * target_per_cell / n)
        # cell at least the median box edge keeps per-box replication O(1)
        bw = float(np.median(b[:, 2] - b[:, 0]))
        bh = float(np.median(b[:, 3] - b[:, 1]))
        cell = max(cell, bw, bh, 1e-9)
        self.cell, self.ox, self.oy = cell, ox, oy
        cx0 = np.floor((b[:, 0] - ox) / cell).astype(np.int64)
        cx1 = np.floor((b[:, 2] - ox) / cell).astype(np.int64)
        cy0 = np.floor((b[:, 1] - oy) / cell).astype(np.int64)
        cy1 = np.floor((b[:, 3] - oy) / cell).astype(np.int64)
        self.nx = int(cx1.max()) + 1
        self.ny = int(cy1.max()) + 1
        counts = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
        big = counts > self.BIG_CELL_CAP
        self.big = valid[big]
        if big.any():
            keep = ~big
            valid, counts = valid[keep], counts[keep]
            cx0, cx1, cy0, cy1 = cx0[keep], cx1[keep], cy0[keep], cy1[keep]
            n = len(valid)
            if n == 0:
                self.keys = np.empty(0, dtype=np.int64)
                self.items = np.empty(0, dtype=np.int64)
                return
        total = int(counts.sum())
        rep = np.repeat(valid, counts)
        csum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=csum[1:])
        ordn = np.arange(total, dtype=np.int64) - np.repeat(csum[:-1], counts)
        w = np.repeat(cx1 - cx0 + 1, counts)
        cx = np.repeat(cx0, counts) + ordn % w
        cy = np.repeat(cy0, counts) + ordn // w
        key = cx * self.ny + cy
        order = np.argsort(key, kind="stable")
        self.items = rep[order]
        self.keys = key[order]

    def query(
        self, qboxes: np.ndarray, expand: float = 0.0
    ) -> tuple[np.ndarray, np.ndarray]:
        """All pairs (i, j) with qboxes[i] (grown by ``expand``) touching
        self.boxes[j] — the same inclusive predicate as ``bbox_join``."""
        m = len(qboxes)
        if m == 0 or (len(self.items) == 0 and len(self.big) == 0):
            return (np.empty(0, dtype=np.int64),) * 2
        q = qboxes.astype(np.float64, copy=bool(expand))
        if expand:
            q[:, :2] -= expand
            q[:, 2:] += expand
        out_i: list[np.ndarray] = []
        out_j: list[np.ndarray] = []
        # extent-spanning boxes bypassed the grid: brute-check them,
        # chunked over q rows so the (chunk × nbig) temporary is bounded
        if len(self.big):
            bb = self.boxes[self.big]
            step = max(1, (1 << 22) // len(self.big))
            for s0 in range(0, m, step):
                qc = q[s0 : s0 + step]
                hit = (
                    (qc[:, None, 0] <= bb[None, :, 2])
                    & (qc[:, None, 2] >= bb[None, :, 0])
                    & (qc[:, None, 1] <= bb[None, :, 3])
                    & (qc[:, None, 3] >= bb[None, :, 1])
                )
                qi, bj = np.nonzero(hit)
                if len(qi):
                    out_i.append(qi + s0)
                    out_j.append(self.big[bj])
        if len(self.items) == 0:
            if not out_i:
                return (np.empty(0, dtype=np.int64),) * 2
            return np.concatenate(out_i), np.concatenate(out_j)
        cell, ox, oy = self.cell, self.ox, self.oy
        # clip BEFORE floor/astype so ±inf (empty rows) stays finite
        qx0 = np.floor(np.clip((q[:, 0] - ox) / cell, 0, self.nx - 1)).astype(np.int64)
        qx1 = np.floor(np.clip((q[:, 2] - ox) / cell, 0, self.nx - 1)).astype(np.int64)
        qy0 = np.floor(np.clip((q[:, 1] - oy) / cell, 0, self.ny - 1)).astype(np.int64)
        qy1 = np.floor(np.clip((q[:, 3] - oy) / cell, 0, self.ny - 1)).astype(np.int64)
        # boxes entirely off-grid have empty cell ranges after this mask
        off = (
            (q[:, 2] < ox)
            | (q[:, 3] < oy)
            | (q[:, 0] > ox + self.nx * cell)
            | (q[:, 1] > oy + self.ny * cell)
        )
        ncell = np.where(off, 0, (qx1 - qx0 + 1) * (qy1 - qy0 + 1))
        total = int(ncell.sum())
        if total == 0:
            if not out_i:
                return (np.empty(0, dtype=np.int64),) * 2
            return np.concatenate(out_i), np.concatenate(out_j)
        rep_q = np.repeat(np.arange(m, dtype=np.int64), ncell)
        csum = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(ncell, out=csum[1:])
        ordn = np.arange(total, dtype=np.int64) - np.repeat(csum[:-1], ncell)
        w = np.repeat(np.where(off, 1, qx1 - qx0 + 1), ncell)
        cx = np.repeat(qx0, ncell) + ordn % w
        cy = np.repeat(qy0, ncell) + ordn // w
        key = cx * self.ny + cy
        s = np.searchsorted(self.keys, key, side="left")
        e = np.searchsorted(self.keys, key, side="right")
        cnt = e - s
        ctot = int(cnt.sum())
        if ctot == 0:
            if not out_i:
                return (np.empty(0, dtype=np.int64),) * 2
            return np.concatenate(out_i), np.concatenate(out_j)
        ccs = np.zeros(len(cnt) + 1, dtype=np.int64)
        np.cumsum(cnt, out=ccs[1:])
        # chunk the candidate expansion (same L2-resident rationale as
        # bbox_join): dense cells — a deliberately skewed urban pile puts
        # thousands of boxes in one cell — would otherwise materialize
        # multi-10M-row temporaries for one query batch
        CHUNK = 65_536
        nseg = len(cnt)
        seg = 0
        while seg < nseg:
            seg_end = int(np.searchsorted(ccs, ccs[seg] + CHUNK, side="left"))
            seg_end = min(max(seg_end, seg + 1), nseg)
            cc = cnt[seg:seg_end]
            P = int(cc.sum())
            if P:
                ii = np.repeat(rep_q[seg:seg_end], cc)
                qcx = np.repeat(cx[seg:seg_end], cc)
                qcy = np.repeat(cy[seg:seg_end], cc)
                jj_pos = np.repeat(s[seg:seg_end], cc) + (
                    np.arange(P, dtype=np.int64)
                    - np.repeat(ccs[seg:seg_end] - ccs[seg], cc)
                )
                jj = self.items[jj_pos]
                bq = q[ii]
                bb = self.boxes[jj]
                hit = (
                    (bq[:, 0] <= bb[:, 2])
                    & (bq[:, 2] >= bb[:, 0])
                    & (bq[:, 1] <= bb[:, 3])
                    & (bq[:, 3] >= bb[:, 1])
                )
                # ref-cell dedup: a pair found via several shared cells
                # is kept only in the cell of the overlap region's min
                # corner. For an overlapping pair that corner always lies
                # inside BOTH covered cell ranges (b boxes define the
                # grid extent; the hit mask bounds the corner by both
                # boxes), so exactly one emission survives — no
                # sort/unique pass.
                rx = np.floor(
                    (np.maximum(bq[:, 0], bb[:, 0]) - ox) / cell
                ).astype(np.int64)
                ry = np.floor(
                    (np.maximum(bq[:, 1], bb[:, 1]) - oy) / cell
                ).astype(np.int64)
                keep = hit & (rx == qcx) & (ry == qcy)
                if keep.any():
                    out_i.append(ii[keep])
                    out_j.append(jj[keep])
            seg = seg_end
        if not out_i:
            return (np.empty(0, dtype=np.int64),) * 2
        return np.concatenate(out_i), np.concatenate(out_j)


def bbox_join_auto(
    qboxes: np.ndarray, garr, expand: float = 0.0, threshold: int = 20_000
) -> tuple[np.ndarray, np.ndarray]:
    """bbox join of query boxes against a GeometryArray's bounds, via the
    array's memoized BoxGrid when it is large (the broadcast side cached
    per worker — the grid builds once, every batch reuses it), else the
    plain sort-sweep ``bbox_join`` (per-cell groups, used once)."""
    if len(garr) >= threshold:
        return garr.box_grid().query(qboxes, expand=expand)
    return bbox_join(qboxes, garr.bounds(), expand=expand)


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
