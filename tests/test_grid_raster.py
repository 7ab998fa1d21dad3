"""Raster↔vector tiling stages (tiling/grid.py): zonal_rasterize and
vector_tile_cut, on both the rect fast path and the general-polygon
path (triangles), checked against independent brute-force kernels.

Reference analogue: dissolve clip-to-tile (_geoops_gpd.py:2070-2083)
and the squarish-grid math of pygeoops.create_grid2.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geofileops_ray.geom import from_wkb
from geofileops_ray.geom.measure import area as geom_area
from geofileops_ray.geom.overlay import polygon_overlay, ring_signed_area
from geofileops_ray.geom.predicates import points_in_polygon
from geofileops_ray.io.synth import rect_wkb, tri_wkb
from geofileops_ray.tiling.grid import (
    _grid_params,
    vector_tile_cut,
    zonal_rasterize,
)

BOUNDS = (0.0, 0.0, 40.0, 40.0)
NB_TILES = 16


def _mixed_layer() -> tuple[ray.data.Dataset, pa.Table]:
    rng = np.random.default_rng(7)
    n = 24
    x0 = rng.uniform(0, 32, n)
    y0 = rng.uniform(0, 32, n)
    w = rng.uniform(2, 8, n)
    h = rng.uniform(2, 8, n)
    rects = rect_wkb(x0, y0, x0 + w, y0 + h)
    tris = tri_wkb(x0, y0, x0 + w, y0, x0 + w, y0 + h)
    wkbs = pa.concat_arrays([rects.combine_chunks() if isinstance(rects, pa.ChunkedArray) else rects,
                             tris.combine_chunks() if isinstance(tris, pa.ChunkedArray) else tris])
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(2 * n, dtype=np.int64), pa.int64()),
            "geometry": wkbs,
        }
    )
    return ray.data.from_arrow(tbl), tbl


def test_zonal_rasterize_matches_bruteforce(ray_session):
    ds, tbl = _mixed_layer()
    out = pa.Table.from_pylist(
        zonal_rasterize(ds, BOUNDS, NB_TILES, pixels_per_tile=4).take_all()
    )
    got = {
        (r["pcol"], r["prow"]): r["n_covered"] for r in out.to_pylist()
    }
    # brute force: every pixel center against every geometry (covers)
    ox, oy, dx, dy, nc, nr = _grid_params(BOUNDS, NB_TILES)
    P = 4
    pw, ph = dx / P, dy / P
    ga = from_wkb(tbl.column("geometry").to_pylist())
    want: dict[tuple[int, int], int] = {}
    for pc in range(nc * P):
        for pr in range(nr * P):
            pt = np.array([[ox + (pc + 0.5) * pw, oy + (pr + 0.5) * ph]])
            cnt = sum(
                int(points_in_polygon(pt, ga, i, boundary_counts=True)[0])
                for i in range(len(ga))
            )
            if cnt:
                want[(pc, pr)] = cnt
    assert got == want
    # tile_id derivation consistent with the shared grid
    for r in out.to_pylist():
        assert r["tile_id"] == (r["prow"] // P) * nc + (r["pcol"] // P)


def test_vector_tile_cut_partition_of_input(ray_session):
    ds, tbl = _mixed_layer()
    out = pa.Table.from_pylist(
        vector_tile_cut(ds, BOUNDS, NB_TILES).take_all()
    )
    ga_in = from_wkb(tbl.column("geometry").to_pylist())
    in_area = geom_area(ga_in)
    ga_out = from_wkb(out.column("geometry").to_pylist())
    piece_area = geom_area(ga_out)
    ids = out.column("doc_id").to_numpy()
    tiles = out.column("tile_id").to_numpy()
    # pieces of one doc tile the doc: areas sum back exactly
    per_doc = np.zeros(len(ga_in))
    np.add.at(per_doc, ids, piece_area)
    np.testing.assert_allclose(per_doc, in_area, rtol=1e-9)
    # each (doc, tile) piece area equals the independent sweep-kernel
    # intersection of the doc with the tile rectangle
    ox, oy, dx, dy, nc, nr = _grid_params(BOUNDS, NB_TILES)
    for k in range(len(ids)):
        t = int(tiles[k])
        c, r = t % nc, t // nc
        rect = np.array(
            [
                [ox + c * dx, oy + r * dy],
                [ox + (c + 1) * dx, oy + r * dy],
                [ox + (c + 1) * dx, oy + (r + 1) * dy],
                [ox + c * dx, oy + (r + 1) * dy],
                [ox + c * dx, oy + r * dy],
            ]
        )
        parts = polygon_overlay(
            ga_in._parts_of(int(ids[k])), [[rect]], "intersection"
        )
        want = sum(abs(ring_signed_area(rr)) for p in parts for rr in p[:1]) - sum(
            abs(ring_signed_area(rr)) for p in parts for rr in p[1:]
        )
        assert piece_area[k] == pytest.approx(want, rel=1e-9, abs=1e-9)
    # no duplicate (doc, tile) rows
    keys = list(zip(ids.tolist(), tiles.tolist()))
    assert len(keys) == len(set(keys))


def test_vector_tile_cut_concave_disconnected(ray_session):
    """A concave polygon whose tile intersection is two disconnected
    components must emit a 2-part MULTIPOLYGON, not one self-touching
    Sutherland-Hodgman ring with zero-width bridges."""
    import ray.data

    from geofileops_ray.geom import GeometryArray
    from geofileops_ray.geom.measure import area
    from geofileops_ray.geom.predicates import points_in_polygon
    from geofileops_ray.geom.wkb import from_wkb, to_wkb
    from geofileops_ray.tiling.grid import vector_tile_cut
    from geofileops_ray.util import collect

    U = np.array(
        [[0, 0], [10, 0], [10, 8], [7, 8], [7, 2], [3, 2], [3, 8],
         [0, 8], [0, 0]], float
    )
    ga = GeometryArray.from_parts([(3, [[U]])])
    t = pa.table(
        {"doc_id": pa.array([1], pa.int64()),
         "geometry": pa.array(to_wkb(ga), pa.binary())}
    )
    # 1 col x 2 rows: the top tile (y in 5..10) holds both arms of the U
    out = collect(vector_tile_cut(ray.data.from_arrow(t), (0, 0, 10, 10), 2))
    gout = from_wkb(out.column("geometry"))
    by_tile = dict(zip(out.column("tile_id").to_pylist(), range(len(gout))))
    assert area(gout).sum() == pytest.approx(56.0)  # U area preserved
    top = by_tile[1]
    nparts = int(gout.geom_offsets[top + 1] - gout.geom_offsets[top])
    assert nparts == 2
    assert area(gout)[top] == pytest.approx(18.0)
    # the gap between the arms is outside every piece
    for i in range(len(gout)):
        assert not points_in_polygon(
            np.array([[5.0, 6.0]]), gout, i, boundary_counts=True
        ).any()
