"""Vectorized geometry measures over GeometryArray.

Equivalents of the Spatialite scalar functions the reference exposes
(ST_Area, ST_Length, ST_Perimeter, ST_Centroid, ST_NPoints, ST_MinX/Y,
ST_MaxX/Y — see SURVEY.md §2.7 / geofileops _geoops_sql.py templates),
implemented as numpy reductions over the ragged layout.
"""

from __future__ import annotations

import numpy as np

from .array import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOLYGON,
    POLYGON,
    GeometryArray,
)


def _segment_sums(vals: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Sum ``vals[starts[k]:ends[k]]`` per segment via ``np.add.reduceat``.

    Each segment is summed independently — unlike a global cumsum-and-
    difference, per-segment results do not lose low bits to a batch-wide
    accumulator, so results are identical whether a ring is measured
    alone or inside a million-row batch (the oracle comparisons round at
    fixed decimals and exercise exact .5 halfway values, which any
    batch-size-dependent error flips)."""
    out = np.zeros(len(starts))
    valid = ends > starts
    if not valid.any():
        return out
    s, e = starts[valid], ends[valid]
    idx = np.empty(2 * len(s), dtype=np.intp)
    idx[0::2] = s
    idx[1::2] = e
    # reduceat segment i spans idx[i]:idx[i+1] (last one runs to the end
    # of the truncated array == e[-1]); odd slots are inter-ring gaps
    sums = np.add.reduceat(vals[: e[-1]], idx[:-1])
    out[valid] = sums[0::2]
    return out


def _ring_signed_areas(arr: GeometryArray) -> np.ndarray:
    """Signed shoelace area per ring (float64[nrings]).

    Coordinates are anchored to each ring's first vertex before the
    cross products (translation-invariant), keeping the terms small:
    exact for the dyadic-rational coordinates the synthetic oracles
    produce, and far less cancellation on real-world offsets."""
    nrings = len(arr.ring_offsets) - 1
    if nrings == 0:
        return np.zeros(0)
    x = arr.coords[:, 0]
    y = arr.coords[:, 1]
    starts = arr.ring_offsets[:-1]
    ends = arr.ring_offsets[1:]
    nper = ends - starts
    safe = np.minimum(starts, max(len(x) - 1, 0))
    x0 = np.repeat(x[safe], nper)
    y0 = np.repeat(y[safe], nper)
    dx = x - x0
    dy = y - y0
    cross = dx[:-1] * dy[1:] - dx[1:] * dy[:-1]
    return 0.5 * _segment_sums(cross, starts, np.maximum(ends - 1, starts))


def _ring_lengths(arr: GeometryArray) -> np.ndarray:
    """Total segment length per ring."""
    nrings = len(arr.ring_offsets) - 1
    if nrings == 0:
        return np.zeros(0)
    d = np.diff(arr.coords, axis=0)
    seg = np.hypot(d[:, 0], d[:, 1])
    starts = arr.ring_offsets[:-1]
    ends = arr.ring_offsets[1:]
    return _segment_sums(seg, starts, np.maximum(ends - 1, starts))


def _rings_to_geoms(arr: GeometryArray) -> tuple[np.ndarray, np.ndarray]:
    """(geom_index_per_ring, is_outer_ring) mapping arrays."""
    nparts = len(arr.part_offsets) - 1
    nrings = len(arr.ring_offsets) - 1
    part_of_ring = (
        np.searchsorted(arr.part_offsets, np.arange(nrings), side="right") - 1
    )
    geom_of_part = (
        np.searchsorted(arr.geom_offsets, np.arange(nparts), side="right") - 1
    )
    geom_of_ring = (
        geom_of_part[part_of_ring] if nrings else np.zeros(0, dtype=np.int64)
    )
    is_outer = (
        np.arange(nrings) == arr.part_offsets[part_of_ring]
        if nrings
        else np.zeros(0, dtype=bool)
    )
    return geom_of_ring, is_outer


def area(arr: GeometryArray) -> np.ndarray:
    """Polygon area per geometry (0 for points/lines/empty).

    Outer ring = first ring of each part; holes subtract. Uses |signed| per
    ring so input ring orientation does not matter.
    """
    out = np.zeros(len(arr))
    sa = np.abs(_ring_signed_areas(arr))
    geom_of_ring, is_outer = _rings_to_geoms(arr)
    is_poly = np.isin(arr.types, (POLYGON, MULTIPOLYGON))
    if len(sa):
        contrib = np.where(is_outer, sa, -sa)
        mask = is_poly[geom_of_ring]
        np.add.at(out, geom_of_ring[mask], contrib[mask])
    return np.maximum(out, 0.0)


def length(arr: GeometryArray) -> np.ndarray:
    """Line length per geometry (0 for points/polygons)."""
    out = np.zeros(len(arr))
    rl = _ring_lengths(arr)
    geom_of_ring, _ = _rings_to_geoms(arr)
    is_line = np.isin(arr.types, (LINESTRING, MULTILINESTRING))
    if len(rl):
        mask = is_line[geom_of_ring]
        np.add.at(out, geom_of_ring[mask], rl[mask])
    return out


def perimeter(arr: GeometryArray) -> np.ndarray:
    """Ring perimeter per geometry (polygons only; includes holes)."""
    out = np.zeros(len(arr))
    rl = _ring_lengths(arr)
    geom_of_ring, _ = _rings_to_geoms(arr)
    is_poly = np.isin(arr.types, (POLYGON, MULTIPOLYGON))
    if len(rl):
        mask = is_poly[geom_of_ring]
        np.add.at(out, geom_of_ring[mask], rl[mask])
    return out


def centroid(arr: GeometryArray) -> np.ndarray:
    """(n,2) centroid; polygons area-weighted, lines length-weighted,
    points mean. Empty -> nan."""
    n = len(arr)
    out = np.full((n, 2), np.nan)
    # hoisted: geom_coord_ranges is O(n) — calling it per point row made
    # point-batch centroids quadratic
    lo_c, hi_c = arr.geom_coord_ranges()
    for i in range(n):
        lo_p, hi_p = arr.geom_offsets[i], arr.geom_offsets[i + 1]
        if lo_p == hi_p:
            continue
        t = arr.part_types(i)
        if t == POLYGON:
            cx = cy = a_tot = 0.0
            for p in range(lo_p, hi_p):
                for ri, r in enumerate(
                    range(arr.part_offsets[p], arr.part_offsets[p + 1])
                ):
                    ring = arr.coords[arr.ring_offsets[r] : arr.ring_offsets[r + 1]]
                    if len(ring) < 4:
                        continue
                    x, y = ring[:, 0], ring[:, 1]
                    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
                    a_signed = 0.5 * cross.sum()
                    if a_signed == 0:
                        continue
                    sgn = 1.0 if ri == 0 else -1.0
                    a = abs(a_signed) * sgn
                    # centroid of the ring: (1/6A) * sum((x_i+x_j)*cross)
                    ax = ((x[:-1] + x[1:]) * cross).sum() / (6 * a_signed)
                    ay = ((y[:-1] + y[1:]) * cross).sum() / (6 * a_signed)
                    cx += a * ax
                    cy += a * ay
                    a_tot += a
            if a_tot != 0:
                out[i] = (cx / a_tot, cy / a_tot)
        elif t == LINESTRING:
            cx = cy = l_tot = 0.0
            for p in range(lo_p, hi_p):
                r0 = arr.part_offsets[p]
                ring = arr.coords[
                    arr.ring_offsets[r0] : arr.ring_offsets[r0 + 1]
                ]
                if len(ring) < 2:
                    continue
                d = np.diff(ring, axis=0)
                seg = np.hypot(d[:, 0], d[:, 1])
                mid = 0.5 * (ring[:-1] + ring[1:])
                cx += (mid[:, 0] * seg).sum()
                cy += (mid[:, 1] * seg).sum()
                l_tot += seg.sum()
            if l_tot != 0:
                out[i] = (cx / l_tot, cy / l_tot)
        else:  # POINT
            pts = arr.coords[lo_c[i] : hi_c[i]]
            if len(pts):
                out[i] = pts.mean(axis=0)
    return out
