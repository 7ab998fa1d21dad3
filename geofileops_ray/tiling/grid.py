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


def zonal_rasterize(
    ds: ray.data.Dataset,
    bounds: tuple[float, float, float, float],
    nb_tiles: int,
    pixels_per_tile: int = 8,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Zonal rasterize: burn geometries onto the shared squarish tile
    grid refined to ``pixels_per_tile`` × ``pixels_per_tile`` pixels per
    tile; output one row per NONZERO pixel with the count of geometries
    covering the pixel center (the raster half of the reference's
    raster↔vector tiling; grid identical to ``tile_assignments``).

    Scale shape: per-batch partial histograms (np.unique combiner over
    the batch's covered-pixel ids) → one small ``groupby(pixel).sum`` —
    the shuffle is bounded by the raster resolution, never by the input
    row count. Rect geometries take a fully vectorized center-in-bbox
    path; general polygons test candidate centers with the crossing-
    number kernel (vectorized over pixels per geometry)."""
    from ..geom.array import POLYGON, MULTIPOLYGON
    from ..geom.predicates import points_in_polygon
    from ..stages.geometry_batch import decode_geometry
    from ..stages.relation import detect_rects

    ox, oy, dx, dy, ncols, nrows = _grid_params(bounds, nb_tiles)
    P = pixels_per_tile
    pw, ph = dx / P, dy / P
    npx, npy = ncols * P, nrows * P

    def _cand_window(b: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        # candidate pixel index window from the bbox, ±1 margin; the
        # exact inclusive center-in-geometry test below decides
        c0 = np.clip(np.floor((b[:, 0] - ox) / pw - 0.5).astype(np.int64) - 1, 0, npx - 1)
        c1 = np.clip(np.ceil((b[:, 2] - ox) / pw - 0.5).astype(np.int64) + 1, 0, npx - 1)
        r0 = np.clip(np.floor((b[:, 1] - oy) / ph - 0.5).astype(np.int64) - 1, 0, npy - 1)
        r1 = np.clip(np.ceil((b[:, 3] - oy) / ph - 0.5).astype(np.int64) + 1, 0, npy - 1)
        return c0, c1, r0, r1

    def fn(batch: pa.Table) -> pa.Table:
        ga = decode_geometry(batch)
        b = ga.bounds()
        rects = detect_rects(ga)
        c0, c1, r0, r1 = _cand_window(b)
        covered: list[np.ndarray] = []
        # rect fast path: the covered pixels form an index box — keep
        # centers inclusively inside the bbox (covers semantics)
        for i in np.flatnonzero(rects):
            ci = np.arange(c0[i], c1[i] + 1)
            cx = ox + (ci + 0.5) * pw
            ci = ci[(cx >= b[i, 0]) & (cx <= b[i, 2])]
            ri = np.arange(r0[i], r1[i] + 1)
            cy = oy + (ri + 0.5) * ph
            ri = ri[(cy >= b[i, 1]) & (cy <= b[i, 3])]
            if len(ci) and len(ri):
                covered.append((ri[:, None] * npx + ci[None, :]).ravel())
        for i in np.flatnonzero(~rects):
            if ga.types[i] not in (POLYGON, MULTIPOLYGON):
                continue  # raster burn is a polygon-coverage op
            ci = np.arange(c0[i], c1[i] + 1)
            ri = np.arange(r0[i], r1[i] + 1)
            if not (len(ci) and len(ri)):
                continue
            cx = ox + (ci + 0.5) * pw
            cy = oy + (ri + 0.5) * ph
            pts = np.column_stack(
                [np.tile(cx, len(ri)), np.repeat(cy, len(ci))]
            )
            inside = points_in_polygon(pts, ga, int(i), boundary_counts=True)
            if inside.any():
                pix = np.repeat(ri, len(ci)) * npx + np.tile(ci, len(ri))
                covered.append(pix[inside])
        if covered:
            pix, cnt = np.unique(np.concatenate(covered), return_counts=True)
        else:
            pix = np.empty(0, dtype=np.int64)
            cnt = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "pixel_id": pa.array(pix, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    # combiner-first vectorized sum: the pixel-id domain is npx² (a fine
    # raster is millions of keys), so Ray's per-key aggregate Python
    # would dominate; fn above already combines per batch
    from ..stages.agg import bucket_aggregate

    agg = bucket_aggregate(
        ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True),
        ["pixel_id"],
        [("n", "sum", "sum_n")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        pix = batch.column("pixel_id").to_numpy()
        pcol = pix % npx
        prow = pix // npx
        tile = (prow // P) * ncols + (pcol // P)
        return pa.table(
            {
                "tile_id": pa.array(tile, pa.int64()),
                "pcol": pa.array(pcol, pa.int64()),
                "prow": pa.array(prow, pa.int64()),
                "n_covered": batch.column("sum_n").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def polygonize_covered(
    ds: ray.data.Dataset,
    bounds: tuple[float, float, float, float],
    nb_tiles: int,
    pixels_per_tile: int = 8,
) -> ray.data.Dataset:
    """Raster→vector: polygonize the binary coverage mask of
    ``zonal_rasterize`` (the gdal_polygonize analogue for a mask) —
    covered pixels become unit squares and dissolve's n-ary sweep
    unions them into polygons, merging adjacent pixels and carving
    interior holes.

    Output: ONE summary row (covered_area, boundary_len) rounded 1e-4 —
    the two SQL-checkable invariants of a correct polygonization (area =
    npix·pw·ph; perimeter = unshared pixel-edge sum, both exact in rect
    algebra). The polygon stream itself is the dissolve output; callers
    wanting geometries use ``dissolve`` on the squares directly.

    Pixel corners are built with the same float expressions on both
    sides (ox + pc·pw), so shared edges cancel exactly in the sweep."""
    import numpy as np

    from ..geom.measure import area as _area
    from ..geom.measure import perimeter as _perimeter
    from ..io.synth import rect_wkb
    from ..stages.dissolve import dissolve
    from ..stages.geometry_batch import decode_geometry

    ox, oy, dx, dy, ncols, nrows = _grid_params(bounds, nb_tiles)
    P = pixels_per_tile
    pw, ph = dx / P, dy / P

    px = zonal_rasterize(ds, bounds, nb_tiles, P)

    def to_squares(batch: pa.Table) -> pa.Table:
        pc_ = batch.column("pcol").to_numpy()
        pr = batch.column("prow").to_numpy()
        return pa.table(
            {
                "geometry": rect_wkb(
                    ox + pc_ * pw, oy + pr * ph,
                    ox + (pc_ + 1) * pw, oy + (pr + 1) * ph,
                ),
            }
        )

    merged = dissolve(px.map_batches(to_squares, batch_format="pyarrow"))

    def measure_fn(batch: pa.Table) -> pa.Table:
        ga = decode_geometry(batch)
        return pa.table(
            {
                "covered_area": pa.array(
                    np.round(_area(ga), 4), pa.float64()
                ),
                "boundary_len": pa.array(
                    np.round(_perimeter(ga), 4), pa.float64()
                ),
            }
        )

    return merged.map_batches(measure_fn, batch_format="pyarrow")


def vector_tile_cut(
    ds: ray.data.Dataset,
    bounds: tuple[float, float, float, float],
    nb_tiles: int,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Vector tile cut: clip every polygon to each tile of the shared
    squarish grid its bbox interior-overlaps, emitting one piece row
    (id, tile_id, geometry) per non-empty intersection — the vector half
    of the raster↔vector tiling pair (reference's dissolve clip-to-tile,
    _geoops_gpd.py:2070-2083, generalized to a standalone stage).

    Stateless vectorized-per-batch map; no shuffle. Rect inputs take the
    closed-form bbox∩tile path; CONVEX single-ring polygons run
    Sutherland–Hodgman ring clipping (exact for convex subjects);
    concave or holed polygons run the exact overlay sweep — SH on a
    concave ring whose tile intersection is disconnected emits one
    self-touching ring with zero-width bridges (invalid geometry)."""
    from ..geom.algorithms import _is_convex
    from ..geom.array import GeometryArray, POLYGON, MULTIPOLYGON
    from ..geom.overlay import clip_ring_rect, polygon_overlay, ring_signed_area
    from ..geom.wkb import to_wkb
    from ..stages.geometry_batch import decode_geometry
    from ..stages.relation import detect_rects

    ox, oy, dx, dy, ncols, nrows = _grid_params(bounds, nb_tiles)

    def fn(batch: pa.Table) -> pa.Table:
        ga = decode_geometry(batch)
        b = ga.bounds()
        ids = batch.column(id_col).to_numpy()
        rects = detect_rects(ga)
        # tiles whose INTERIOR the bbox overlaps (strict: a piece must
        # have area, so edge-touching tiles are excluded)
        c0 = np.clip(np.floor((b[:, 0] - ox) / dx).astype(np.int64), 0, ncols - 1)
        c1 = np.clip(np.ceil((b[:, 2] - ox) / dx).astype(np.int64) - 1, 0, ncols - 1)
        r0 = np.clip(np.floor((b[:, 1] - oy) / dy).astype(np.int64), 0, nrows - 1)
        r1 = np.clip(np.ceil((b[:, 3] - oy) / dy).astype(np.int64) - 1, 0, nrows - 1)
        out_id: list[int] = []
        out_tile: list[int] = []
        out_geom: list[tuple[int, list[list[np.ndarray]]]] = []
        for i in range(len(ga)):
            if ga.types[i] not in (POLYGON, MULTIPOLYGON):
                continue
            parts = None
            for r in range(r0[i], r1[i] + 1):
                for c in range(c0[i], c1[i] + 1):
                    rect = (
                        ox + c * dx, oy + r * dy,
                        ox + (c + 1) * dx, oy + (r + 1) * dy,
                    )
                    if rects[i]:
                        x0 = max(b[i, 0], rect[0]); y0 = max(b[i, 1], rect[1])
                        x1 = min(b[i, 2], rect[2]); y1 = min(b[i, 3], rect[3])
                        if x1 <= x0 or y1 <= y0:
                            continue
                        piece = [[np.array(
                            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
                        )]]
                    else:
                        if parts is None:
                            parts = ga._parts_of(i)
                        piece = []
                        for part in parts:
                            if len(part) == 1 and _is_convex(part[0]):
                                rr = clip_ring_rect(part[0], rect)
                                if len(rr) >= 4 and abs(
                                    ring_signed_area(rr)
                                ) > 0:
                                    piece.append([rr])
                                continue
                            # concave or holed: exact overlay sweep
                            tile_ring = np.array(
                                [[rect[0], rect[1]], [rect[2], rect[1]],
                                 [rect[2], rect[3]], [rect[0], rect[3]],
                                 [rect[0], rect[1]]]
                            )
                            piece.extend(
                                polygon_overlay(
                                    [part], [[tile_ring]], "intersection"
                                )
                            )
                        if not piece:
                            continue
                    out_id.append(int(ids[i]))
                    out_tile.append(r * ncols + c)
                    out_geom.append(
                        (POLYGON if len(piece) == 1 else MULTIPOLYGON, piece)
                    )
        wkbs = to_wkb(GeometryArray.from_parts(out_geom))
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "tile_id": pa.array(out_tile, pa.int64()),
                "geometry": pa.array(wkbs, pa.binary()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
