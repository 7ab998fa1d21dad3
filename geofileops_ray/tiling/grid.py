"""Squarish tile grids + per-tile assignment emission (raster↔vector
tiling on one shared grid).

``create_squarish_grid`` mirrors the grid construction dissolve uses
(geofileops _geoops_gpd.py:1312-1337 via pygeoops.create_grid2: bounds →
~nb squarish tiles): pick the column count whose cells are closest to
square, split rows to cover the bounds. Deterministic — tile ids are
``row * ncols + col`` in row-major order, so the same (bounds, nb) always
produces identical tile ids (the north rule's "tile assignments must
match" invariant).

``tile_assignments`` is the zonal-tiling stage: every geometry → the list
of tiles its bbox overlaps (vector tile cut) and the tile containing its
bbox center (zonal assignment), emitted as plain rows — the engine-side
product the raster side consumes.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data


def hilbert_distance(
    x: "np.ndarray", y: "np.ndarray",
    bounds: tuple[float, float, float, float], order: int = 16,
) -> "np.ndarray":
    """Vectorized Hilbert-curve index of points over ``bounds`` (the
    geopandas ``hilbert_distance`` analogue used by the reference for
    dissolve output ordering, _geoops_gpd.py:2138-2152). Standard
    bit-twiddling xy→d walk, vectorized over all points."""
    import numpy as np

    minx, miny, maxx, maxy = bounds
    n = 1 << order
    sx = max(maxx - minx, 1e-300)
    sy = max(maxy - miny, 1e-300)
    X = np.clip(((x - minx) / sx * (n - 1)).astype(np.int64), 0, n - 1)
    Y = np.clip(((y - miny) / sy * (n - 1)).astype(np.int64), 0, n - 1)
    d = np.zeros(len(X), dtype=np.int64)
    s = n >> 1
    while s > 0:
        rx = ((X & s) > 0).astype(np.int64)
        ry = ((Y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        Xf = np.where(flip, s - 1 - X, X)
        Yf = np.where(flip, s - 1 - Y, Y)
        Xn = np.where(swap, Yf, Xf)
        Yn = np.where(swap, Xf, Yf)
        X, Y = Xn, Yn
        s >>= 1
    return d


def create_squarish_grid(
    bounds: tuple[float, float, float, float], nb_tiles: int
) -> list[tuple[int, float, float, float, float]]:
    """(tile_id, minx, miny, maxx, maxy) list covering ``bounds`` with
    ~``nb_tiles`` squarish tiles (row-major ids)."""
    minx, miny, maxx, maxy = bounds
    w = max(maxx - minx, 1e-9)
    h = max(maxy - miny, 1e-9)
    if nb_tiles <= 1:
        return [(0, minx, miny, maxx, maxy)]
    # FLOOR(x+0.5) instead of python round(): mirrors SQL ROUND (half
    # away from zero), keeping tile ids reproducible by the DuckDB oracle
    ncols = max(1, int(math.floor(math.sqrt(nb_tiles * w / h) + 0.5)))
    nrows = max(1, math.ceil(nb_tiles / ncols))
    dx, dy = w / ncols, h / nrows
    tiles = []
    for r in range(nrows):
        for c in range(ncols):
            tiles.append(
                (
                    r * ncols + c,
                    minx + c * dx,
                    miny + r * dy,
                    minx + (c + 1) * dx,
                    miny + (r + 1) * dy,
                )
            )
    return tiles


def _grid_params(bounds, nb_tiles):
    minx, miny, maxx, maxy = bounds
    w = max(maxx - minx, 1e-9)
    h = max(maxy - miny, 1e-9)
    if nb_tiles <= 1:
        return minx, miny, w, h, 1, 1
    ncols = max(1, int(math.floor(math.sqrt(nb_tiles * w / h) + 0.5)))
    nrows = max(1, math.ceil(nb_tiles / ncols))
    return minx, miny, w / ncols, h / nrows, ncols, nrows


def tile_assignments(
    ds: ray.data.Dataset,
    bounds: tuple[float, float, float, float],
    nb_tiles: int,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-geometry tile assignment rows: (id, tile_id of bbox-center
    [zonal], n_tiles covered, covered tile_id [one row per covered tile —
    vector cut]). Stateless vectorized map_batches; grid params are a
    closure constant (broadcast once per task)."""
    from ..stages.geometry_batch import decode_geometry

    ox, oy, dx, dy, ncols, nrows = _grid_params(bounds, nb_tiles)

    def fn(batch: pa.Table) -> pa.Table:
        ga = decode_geometry(batch)
        b = ga.bounds()
        ids = batch.column(id_col).to_numpy()
        cx = (b[:, 0] + b[:, 2]) * 0.5
        cy = (b[:, 1] + b[:, 3]) * 0.5
        ccol = np.clip(((cx - ox) / dx).astype(np.int64), 0, ncols - 1)
        crow = np.clip(((cy - oy) / dy).astype(np.int64), 0, nrows - 1)
        center_tile = crow * ncols + ccol
        c0 = np.clip(((b[:, 0] - ox) / dx).astype(np.int64), 0, ncols - 1)
        c1 = np.clip(((b[:, 2] - ox) / dx).astype(np.int64), 0, ncols - 1)
        r0 = np.clip(((b[:, 1] - oy) / dy).astype(np.int64), 0, nrows - 1)
        r1 = np.clip(((b[:, 3] - oy) / dy).astype(np.int64), 0, nrows - 1)
        counts = (c1 - c0 + 1) * (r1 - r0 + 1)
        rows = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        local = np.arange(len(rows), dtype=np.int64) - np.repeat(starts, counts)
        ncr = np.repeat(c1 - c0 + 1, counts)
        drow = local // ncr
        dcol = local % ncr
        tile = (np.repeat(r0, counts) + drow) * ncols + np.repeat(c0, counts) + dcol
        return pa.table(
            {
                id_col: pa.array(ids[rows]),
                "tile_id": pa.array(tile, pa.int64()),
                "center_tile": pa.array(center_tile[rows], pa.int64()),
                "n_tiles": pa.array(counts[rows].astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
