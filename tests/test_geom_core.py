"""Unit tests for the from-scratch geometry kernel (no Ray needed)."""

import math

import numpy as np
import pytest

from geofileops_ray import geom as G


def sq(x0, y0, x1, y1):
    """Closed CCW rectangle ring."""
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float
    )


def poly_arr(*rings_lists):
    """GeometryArray of single polygons, each from one or more rings."""
    return G.GeometryArray.from_parts(
        [(G.POLYGON, [list(rings)]) for rings in rings_lists]
    )


class TestWkbRoundtrip:
    def test_point(self):
        arr = G.GeometryArray.from_parts([(G.POINT, [[np.array([[1.5, 2.5]])]])])
        wkb = G.to_wkb(arr)
        back = G.from_wkb(wkb)
        assert back.types[0] == G.POINT
        np.testing.assert_allclose(back.coords, [[1.5, 2.5]])

    def test_polygon_with_hole(self):
        outer = sq(0, 0, 10, 10)
        hole = sq(2, 2, 4, 4)[::-1].copy()
        arr = poly_arr([outer, hole])
        back = G.from_wkb(G.to_wkb(arr))
        assert back.types[0] == G.POLYGON
        assert len(back._parts_of(0)[0]) == 2
        np.testing.assert_allclose(G.area(back), [100 - 4])

    def test_multipolygon(self):
        arr = G.GeometryArray.from_parts(
            [(G.MULTIPOLYGON, [[sq(0, 0, 1, 1)], [sq(5, 5, 6, 6)]])]
        )
        back = G.from_wkb(G.to_wkb(arr))
        assert back.types[0] == G.MULTIPOLYGON
        np.testing.assert_allclose(G.area(back), [2.0])

    def test_linestring_multipoint(self):
        line = np.array([[0, 0], [3, 4], [3, 8]], dtype=float)
        arr = G.GeometryArray.from_parts(
            [
                (G.LINESTRING, [[line]]),
                (G.MULTIPOINT, [[np.array([[0.0, 0.0]])], [np.array([[1.0, 1.0]])]]),
            ]
        )
        back = G.from_wkb(G.to_wkb(arr))
        np.testing.assert_allclose(G.length(back), [9.0, 0.0])
        assert back.types[1] == G.MULTIPOINT

    def test_missing_and_empty(self):
        arr = G.GeometryArray.from_parts([(G.MISSING, []), (G.POLYGON, [])])
        wkb = G.to_wkb(arr)
        assert wkb[0] is None
        back = G.from_wkb(wkb)
        assert back.is_missing()[0]
        assert back.is_empty().all()

    def test_big_endian_read(self):
        import struct

        # big-endian point (2.0, 3.0)
        buf = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 2.0, 3.0)
        back = G.from_wkb([buf])
        np.testing.assert_allclose(back.coords, [[2.0, 3.0]])


class TestMeasures:
    def test_area_perimeter(self):
        arr = poly_arr([sq(0, 0, 4, 3)])
        np.testing.assert_allclose(G.area(arr), [12.0])
        np.testing.assert_allclose(G.perimeter(arr), [14.0])

    def test_area_orientation_invariant(self):
        cw = sq(0, 0, 2, 2)[::-1].copy()
        arr = poly_arr([cw])
        np.testing.assert_allclose(G.area(arr), [4.0])

    def test_centroid_rect(self):
        arr = poly_arr([sq(0, 0, 4, 2)])
        np.testing.assert_allclose(G.centroid(arr), [[2.0, 1.0]])

    def test_centroid_line(self):
        line = np.array([[0, 0], [2, 0]], dtype=float)
        arr = G.GeometryArray.from_parts([(G.LINESTRING, [[line]])])
        np.testing.assert_allclose(G.centroid(arr), [[1.0, 0.0]])

    def test_bounds(self):
        arr = G.GeometryArray.from_parts(
            [
                (G.POLYGON, [[sq(1, 2, 3, 5)]]),
                (G.POLYGON, []),
                (G.POINT, [[np.array([[7.0, 8.0]])]]),
            ]
        )
        b = arr.bounds()
        np.testing.assert_allclose(b[0], [1, 2, 3, 5])
        assert b[1][0] == np.inf
        np.testing.assert_allclose(b[2], [7, 8, 7, 8])


class TestPredicates:
    def test_rect_intersects(self):
        a = poly_arr([sq(0, 0, 2, 2)])
        b = poly_arr([sq(1, 1, 3, 3)], [sq(5, 5, 6, 6)])
        assert G.pair_intersects(a, 0, b, 0)
        assert not G.pair_intersects(a, 0, b, 1)

    def test_touching_rects(self):
        a = poly_arr([sq(0, 0, 2, 2)])
        b = poly_arr([sq(2, 0, 4, 2)])
        assert G.pair_intersects(a, 0, b, 0)
        assert G.PREDICATES["touches"](a, 0, b, 0)
        assert not G.PREDICATES["overlaps"](a, 0, b, 0)

    def test_contains(self):
        a = poly_arr([sq(0, 0, 10, 10)])
        b = poly_arr([sq(2, 2, 4, 4)])
        assert G.PREDICATES["contains"](a, 0, b, 0)
        assert G.PREDICATES["within"](b, 0, a, 0)
        assert not G.PREDICATES["contains"](b, 0, a, 0)

    def test_contained_rect_not_crossing(self):
        a = poly_arr([sq(0, 0, 10, 10)])
        b = poly_arr([sq(8, 8, 12, 12)])  # overlaps corner
        assert G.PREDICATES["overlaps"](a, 0, b, 0)
        assert not G.PREDICATES["contains"](a, 0, b, 0)

    def test_point_in_polygon(self):
        a = poly_arr([sq(0, 0, 4, 4)])
        pts = G.GeometryArray.from_parts(
            [
                (G.POINT, [[np.array([[2.0, 2.0]])]]),
                (G.POINT, [[np.array([[5.0, 2.0]])]]),
                (G.POINT, [[np.array([[4.0, 2.0]])]]),  # on boundary
            ]
        )
        assert G.pair_intersects(a, 0, pts, 0)
        assert not G.pair_intersects(a, 0, pts, 1)
        assert G.pair_intersects(a, 0, pts, 2)
        assert G.PREDICATES["covers"](a, 0, pts, 2)
        assert not G.PREDICATES["contains"](a, 0, pts, 2)

    def test_distance(self):
        a = poly_arr([sq(0, 0, 1, 1)])
        b = poly_arr([sq(4, 0, 5, 1)])
        assert G.pair_distance(a, 0, b, 0) == pytest.approx(3.0)
        c = poly_arr([sq(4, 5, 5, 6)])
        assert G.pair_distance(a, 0, c, 0) == pytest.approx(5.0)

    def test_equals(self):
        a = poly_arr([sq(0, 0, 2, 2)])
        rolled = np.array(
            [[2, 0], [2, 2], [0, 2], [0, 0], [2, 0]], dtype=float
        )
        b = poly_arr([rolled])
        assert G.PREDICATES["equals"](a, 0, b, 0)

    def test_line_crosses(self):
        line1 = np.array([[0, 0], [2, 2]], dtype=float)
        line2 = np.array([[0, 2], [2, 0]], dtype=float)
        la = G.GeometryArray.from_parts([(G.LINESTRING, [[line1]])])
        lb = G.GeometryArray.from_parts([(G.LINESTRING, [[line2]])])
        assert G.PREDICATES["crosses"](la, 0, lb, 0)


class TestBboxJoin:
    def test_basic(self):
        a = np.array([[0, 0, 2, 2], [5, 5, 6, 6]], dtype=float)
        b = np.array([[1, 1, 3, 3], [10, 10, 11, 11], [5.5, 5.5, 7, 7]], dtype=float)
        ia, ib = G.bbox_join(a, b)
        pairs = set(zip(ia.tolist(), ib.tolist()))
        assert pairs == {(0, 0), (1, 2)}

    def test_expand(self):
        a = np.array([[0, 0, 1, 1]], dtype=float)
        b = np.array([[3, 0, 4, 1]], dtype=float)
        ia, _ = G.bbox_join(a, b)
        assert len(ia) == 0
        ia, _ = G.bbox_join(a, b, expand=2.5)
        assert len(ia) == 1

    def test_rtree_query_nearest(self):
        rng = np.random.RandomState(0)
        pts = rng.uniform(0, 100, (200, 2))
        boxes = np.concatenate([pts, pts], axis=1)
        tree = G.PackedRTree(boxes)
        hits = tree.query(np.array([10, 10, 20, 20]))
        expect = np.flatnonzero(
            (pts[:, 0] >= 10) & (pts[:, 0] <= 20) & (pts[:, 1] >= 10) & (pts[:, 1] <= 20)
        )
        assert set(hits.tolist()) == set(expect.tolist())
        q = np.array([50.0, 50.0])
        idx, d = tree.nearest(q, k=5)
        brute = np.hypot(pts[:, 0] - 50, pts[:, 1] - 50)
        np.testing.assert_allclose(np.sort(d), np.sort(brute)[:5], atol=1e-9)


class TestOverlay:
    def test_rect_intersection(self):
        res = G.polygon_overlay([[sq(0, 0, 4, 4)]], [[sq(2, 2, 6, 6)]], "intersection")
        code, parts = G.parts_to_geom(res)
        arr = G.GeometryArray.from_parts([(code, parts)])
        np.testing.assert_allclose(G.area(arr), [4.0], atol=1e-6)

    def test_rect_union(self):
        res = G.polygon_overlay([[sq(0, 0, 4, 4)]], [[sq(2, 2, 6, 6)]], "union")
        arr = G.GeometryArray.from_parts([G.parts_to_geom(res)])
        np.testing.assert_allclose(G.area(arr), [16 + 16 - 4], atol=1e-5)

    def test_rect_difference(self):
        res = G.polygon_overlay([[sq(0, 0, 4, 4)]], [[sq(2, 2, 6, 6)]], "difference")
        arr = G.GeometryArray.from_parts([G.parts_to_geom(res)])
        np.testing.assert_allclose(G.area(arr), [12.0], atol=1e-5)

    def test_disjoint_cases(self):
        a, b = [[sq(0, 0, 1, 1)]], [[sq(5, 5, 6, 6)]]
        assert G.polygon_overlay(a, b, "intersection") == []
        arr = G.GeometryArray.from_parts([G.parts_to_geom(G.polygon_overlay(a, b, "union"))])
        np.testing.assert_allclose(G.area(arr), [2.0])
        arr = G.GeometryArray.from_parts(
            [G.parts_to_geom(G.polygon_overlay(a, b, "difference"))]
        )
        np.testing.assert_allclose(G.area(arr), [1.0])

    def test_contained_difference_makes_hole(self):
        res = G.polygon_overlay([[sq(0, 0, 10, 10)]], [[sq(4, 4, 6, 6)]], "difference")
        arr = G.GeometryArray.from_parts([G.parts_to_geom(res)])
        np.testing.assert_allclose(G.area(arr), [96.0], atol=1e-6)

    def test_union_with_hole_in_middle(self):
        # U-shape union closing a loop: 4 rects forming a frame
        frame = [
            [[sq(0, 0, 10, 2)]],
            [[sq(8, 0, 10, 10)]],
            [[sq(0, 8, 10, 10)]],
            [[sq(0, 0, 2, 10)]],
        ]
        res = G.union_all_parts(frame)
        arr = G.GeometryArray.from_parts([G.parts_to_geom(res)])
        # frame area = 100 - 36 (inner 6x6 hole)
        np.testing.assert_allclose(G.area(arr), [64.0], atol=1e-4)

    def test_triangle_rect_intersection(self):
        tri = np.array([[0, 0], [6, 0], [0, 6], [0, 0]], dtype=float)
        res = G.polygon_overlay([[tri]], [[sq(0, 0, 4, 4)]], "intersection")
        arr = G.GeometryArray.from_parts([G.parts_to_geom(res)])
        # hypotenuse x+y=6 cuts the 4x4 square corner: 16 - 0.5*2*2 = 14
        np.testing.assert_allclose(G.area(arr), [14.0], atol=1e-5)

    def test_union_all_chain(self):
        parts = [[[sq(i, 0, i + 1.5, 1)]] for i in range(5)]
        res = G.union_all_parts(parts)
        arr = G.GeometryArray.from_parts([G.parts_to_geom(res)])
        # overlapping chain spans [0, 5.5], height 1 => area 5.5
        np.testing.assert_allclose(G.area(arr), [5.5], atol=1e-5)

    def test_clip_ring_rect(self):
        ring = sq(0, 0, 10, 10)
        out = G.clip_ring_rect(ring, (5, 5, 20, 20))
        arr = poly_arr([out])
        np.testing.assert_allclose(G.area(arr), [25.0])
        assert len(G.clip_ring_rect(ring, (20, 20, 30, 30))) == 0


class TestAlgorithms:
    def test_convex_hull(self):
        pts = [
            (G.MULTIPOINT, [[np.array([[0.0, 0]])], [np.array([[2.0, 0]])],
                            [np.array([[1.0, 1]])], [np.array([[1.0, 0.2]])]])
        ]
        arr = G.GeometryArray.from_parts(pts)
        hull = G.convex_hull(arr)
        np.testing.assert_allclose(G.area(hull), [1.0], atol=1e-9)

    def test_simplify(self):
        line = np.array([[0, 0], [1, 0.001], [2, 0], [3, 0.001], [4, 0]], dtype=float)
        arr = G.GeometryArray.from_parts([(G.LINESTRING, [[line]])])
        s = G.simplify(arr, 0.01)
        assert s.num_coords()[0] == 2

    def test_simplify_polygon_keeps_ring(self):
        ring = sq(0, 0, 4, 4)
        dense = np.array(
            [[0, 0], [1, 0.0001], [2, 0], [4, 0], [4, 4], [0, 4], [0, 0]]
        )
        arr = poly_arr([dense])
        s = G.simplify(arr, 0.01)
        np.testing.assert_allclose(G.area(s), [16.0], atol=1e-3)

    def test_buffer_point(self):
        arr = G.GeometryArray.from_parts([(G.POINT, [[np.array([[0.0, 0.0]])]])])
        buf = G.buffer(arr, 2.0, quad_segs=8)
        n = 32
        expect = 0.5 * n * 4.0 * math.sin(2 * math.pi / n)
        np.testing.assert_allclose(G.area(buf), [expect], rtol=1e-9)

    def test_buffer_square_cap_point(self):
        arr = G.GeometryArray.from_parts([(G.POINT, [[np.array([[1.0, 1.0]])]])])
        buf = G.buffer(arr, 1.0, cap_style="square")
        np.testing.assert_allclose(G.area(buf), [4.0])

    def test_buffer_convex_polygon_round(self):
        arr = poly_arr([sq(0, 0, 4, 2)])
        buf = G.buffer(arr, 1.0, quad_segs=8)
        # rect + perimeter*d + disc area (n-gon approx)
        n = 32
        disc = 0.5 * n * 1.0 * math.sin(2 * math.pi / n)
        expect = 8 + 12 * 1.0 + disc
        np.testing.assert_allclose(G.area(buf), [expect], rtol=1e-6)

    def test_buffer_negative_convex(self):
        arr = poly_arr([sq(0, 0, 4, 4)])
        buf = G.buffer(arr, -1.0)
        np.testing.assert_allclose(G.area(buf), [4.0], atol=1e-9)

    def test_buffer_negative_collapse(self):
        arr = poly_arr([sq(0, 0, 1, 1)])
        buf = G.buffer(arr, -2.0)
        np.testing.assert_allclose(G.area(buf), [0.0])
        assert buf.is_empty()[0]

    def test_buffer_line(self):
        line = np.array([[0, 0], [10, 0]], dtype=float)
        arr = G.GeometryArray.from_parts([(G.LINESTRING, [[line]])])
        buf = G.buffer(arr, 1.0, quad_segs=8)
        n = 32
        disc = 0.5 * n * math.sin(2 * math.pi / n)
        np.testing.assert_allclose(G.area(buf), [20 + disc], rtol=1e-6)

    def test_buffer_nonconvex_polygon(self):
        # L-shape
        ring = np.array(
            [[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]], dtype=float
        )
        arr = poly_arr([ring])
        buf = G.buffer(arr, 0.5, quad_segs=8)
        a = G.area(buf)[0]
        # area must exceed original (12) + perimeter*0.5 minus reflex correction
        assert 12 + 0.5 * 16 - 1 < a < 12 + 0.5 * 16 + 1

    def test_makevalid_bowtie(self):
        bowtie = np.array(
            [[0, 0], [4, 4], [4, 0], [0, 4], [0, 0]], dtype=float
        )
        arr = poly_arr([bowtie])
        valid, reasons = G.is_valid_detail(arr)
        assert not valid[0]
        assert "Self-intersection" in reasons[0]
        fixed = G.make_valid(arr)
        v2, _ = G.is_valid_detail(fixed)
        assert v2[0]
        # two triangles, each area 4 => total 8... bowtie (0,0)-(4,4)-(4,0)-(0,4):
        # crossing at (2,2); triangles (0,0),(2,2),(0,4) and (4,4),(4,0),(2,2)
        np.testing.assert_allclose(G.area(fixed), [8.0], atol=1e-6)

    def test_set_precision(self):
        ring = sq(0.04, 0.04, 3.96, 3.96)
        arr = poly_arr([ring])
        out = G.set_precision(arr, 0.1)
        np.testing.assert_allclose(G.area(out), [(4 - 0) ** 2], atol=0.5)
        scaled = out.coords / 0.1
        assert np.allclose(scaled, np.round(scaled), atol=1e-9)

    def test_set_precision_collapse(self):
        ring = sq(0, 0, 0.001, 0.001)
        arr = poly_arr([ring])
        out = G.set_precision(arr, 1.0)
        assert out.is_empty()[0]

    def test_explode(self):
        arr = G.GeometryArray.from_parts(
            [
                (G.MULTIPOLYGON, [[sq(0, 0, 1, 1)], [sq(5, 5, 6, 6)]]),
                (G.POLYGON, [[sq(2, 2, 3, 3)]]),
            ]
        )
        ex, src = G.explode(arr)
        assert len(ex) == 3
        assert src.tolist() == [0, 0, 1]
        assert (ex.types[:2] == G.POLYGON).all()


def test_simplify_vw_kernel():
    import numpy as np

    from geofileops_ray.geom.algorithms import _vw

    x = np.arange(10.0)
    y = np.where(np.arange(10) % 2 == 0, 0.0, 0.25)
    zig = np.column_stack([x, y])
    # effective area of every interior zigzag point is 0.25: below that
    # nothing moves, far above it everything interior cascades away
    assert len(_vw(zig, 0.1)) == 10
    assert len(_vw(zig, 1e9)) == 2
    # square ring: corners have area 0.5 each -> preserved at small tol
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    assert len(_vw(sq, 0.01)) == 5


def test_from_wkb_arrow_zero_copy_paths():
    import numpy as np
    import pyarrow as pa

    from geofileops_ray.geom import from_wkb, to_wkb, to_wkb_arrow
    from geofileops_ray.io.synth import rect_wkb, point_wkb

    rects = rect_wkb(
        np.array([0.0, 5.0]), np.array([0.0, 5.0]),
        np.array([2.0, 9.0]), np.array([3.0, 7.0]),
    )
    pts = point_wkb(np.array([1.5]), np.array([2.5]))
    mixed = pa.concat_arrays([rects, pts])
    ga = from_wkb(mixed)
    assert len(ga) == 3 and ga.num_coords().tolist() == [5, 5, 1]
    # sliced array (non-zero offset) must decode the right rows
    ga_s = from_wkb(mixed.slice(1, 2))
    assert len(ga_s) == 2
    assert ga_s.bounds()[0].tolist() == [5.0, 5.0, 9.0, 7.0]
    # chunked input
    ch = pa.chunked_array([rects, pts])
    assert len(from_wkb(ch)) == 3
    # round-trip through the Arrow encoder
    back = to_wkb_arrow(ga)
    assert back.to_pylist() == to_wkb(ga)
    # all-degenerate batch (empty blobs) falls back safely
    empty = pa.array([b"", b""], pa.binary())
    assert len(from_wkb(empty)) == 2


def test_box_grid_matches_sweep_join():
    """BoxGrid.query must return exactly bbox_join's pair set (inclusive
    touch predicate, no duplicates) on random dense/sparse box soups,
    incl. empty-geometry sentinel rows and expand>0 (dwithin)."""
    import numpy as np

    from geofileops_ray.geom.strtree import BoxGrid, bbox_join

    rng = np.random.default_rng(42)
    for trial in range(25):
        n, m = int(rng.integers(1, 400)), int(rng.integers(1, 400))

        def boxes(k, scale):
            c = rng.uniform(0, 100, (k, 2))
            w = rng.uniform(0, scale, (k, 2))
            return np.concatenate([c - w, c + w], axis=1)

        B = boxes(n, float(rng.uniform(0.5, 20)))
        Q = boxes(m, float(rng.uniform(0.5, 20)))
        if n > 3:
            B[rng.integers(0, n, 2)] = [np.inf, np.inf, -np.inf, -np.inf]
        if m > 3:
            Q[rng.integers(0, m, 2)] = [np.inf, np.inf, -np.inf, -np.inf]
        expand = float(rng.choice([0.0, 0.0, 3.0]))
        ia, ib = bbox_join(Q, B, expand=expand)
        ga, gb = BoxGrid(B).query(Q, expand=expand)
        want = set(zip(ia.tolist(), ib.tolist()))
        got = set(zip(ga.tolist(), gb.tolist()))
        assert len(got) == len(ga), f"trial {trial}: duplicate pairs"
        assert got == want, f"trial {trial}: pair set mismatch"


def test_box_grid_stacked_duplicates():
    """A pile of identical boxes (the urban-cluster shape) must not blow
    up the grid: every query still gets the exact pair set."""
    import numpy as np

    from geofileops_ray.geom.strtree import BoxGrid, bbox_join

    B = np.tile(np.array([[10.0, 10.0, 18.0, 17.0]]), (5000, 1))
    Q = np.array([[9.0, 9.0, 11.0, 11.0], [50.0, 50.0, 60.0, 60.0]])
    ia, ib = bbox_join(Q, B)
    ga, gb = BoxGrid(B).query(Q)
    assert set(zip(ia.tolist(), ib.tolist())) == set(zip(ga.tolist(), gb.tolist()))
    assert len(ga) == 5000


def test_box_grid_extent_spanning_boxes():
    """A few extent-spanning boxes in an otherwise small-box layer must
    not replicate into O(n) grid cells (ADVICE r2): they take the linear
    big-box path. Pair sets stay exact, and the grid's insertion count
    stays bounded."""
    import numpy as np

    from geofileops_ray.geom.strtree import BoxGrid, bbox_join

    rng = np.random.default_rng(7)
    n = 3000
    c = rng.uniform(0, 1000, (n, 2))
    w = rng.uniform(0.1, 2.0, (n, 2))
    B = np.concatenate([c - w, c + w], axis=1)
    # three giant boxes spanning (almost) the whole extent
    B[0] = [0.0, 0.0, 990.0, 995.0]
    B[1] = [-5.0, 100.0, 1000.0, 120.0]  # full-width band
    B[2] = [200.0, -5.0, 230.0, 1005.0]  # full-height band
    g = BoxGrid(B)
    # the extent-covering box must take the linear path; the thin bands
    # may stay in the grid if the cell size keeps their replication small
    assert 0 in g.big.tolist()
    # replication stays bounded: no grid box inserts > BIG_CELL_CAP cells
    assert len(g.items) <= (n - len(g.big)) * BoxGrid.BIG_CELL_CAP
    cq = rng.uniform(0, 1000, (200, 2))
    wq = rng.uniform(0.1, 5.0, (200, 2))
    Q = np.concatenate([cq - wq, cq + wq], axis=1)
    for expand in (0.0, 3.0):
        ia, ib = bbox_join(Q, B, expand=expand)
        ga, gb = g.query(Q, expand=expand)
        got = set(zip(ga.tolist(), gb.tolist()))
        assert len(got) == len(ga)
        assert got == set(zip(ia.tolist(), ib.tolist()))
    # all-big degenerate layer still answers exactly
    Ball = np.tile(np.array([[0.0, 0.0, 990.0, 995.0]]), (5, 1))
    Ball[2] = [100.0, 100.0, 101.0, 101.0]
    # force bigness: tiny median edge would normally make these span all
    g2 = BoxGrid(np.concatenate([Ball, B[3:50]], axis=0))
    ia, ib = bbox_join(Q, np.concatenate([Ball, B[3:50]], axis=0))
    ga, gb = g2.query(Q)
    assert set(zip(ga.tolist(), gb.tolist())) == set(zip(ia.tolist(), ib.tolist()))


# ---------------------------------------------------------------------------
# regressions from the round-3 geometry-kernel review


def _sq(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float
    )


def test_union_island_in_lake_hole_assignment():
    """A hole must attach to its true (larger) container, not to an
    island sitting inside the hole whose ring happens to contain the
    hole's vertex-mean probe."""
    from geofileops_ray.geom.boolops import union_many
    from geofileops_ray.geom.measure import area
    from geofileops_ray.geom.predicates import points_in_polygon

    big = [_sq(0, 0, 10, 10), _sq(3, 3, 7, 7)[::-1].copy()]
    island = [_sq(4.5, 4.5, 5.5, 5.5)]
    out = union_many([[big], [island]])
    ga = G.GeometryArray.from_parts([(3, out)])
    assert area(ga)[0] == pytest.approx(100 - 16 + 1)
    # lake interior (inside hole, outside island) is OUTSIDE the union
    assert not points_in_polygon(
        np.array([[4.0, 4.0]]), ga, 0, boundary_counts=True
    ).any()
    assert points_in_polygon(np.array([[5.0, 5.0]]), ga, 0).any()
    assert points_in_polygon(np.array([[1.0, 1.0]]), ga, 0).any()


def test_buffer_preserves_holes():
    """Positive buffer of a holed polygon shrinks the hole instead of
    silently dropping it."""
    from geofileops_ray.geom.algorithms import buffer as gbuf
    from geofileops_ray.geom.measure import area
    from geofileops_ray.geom.predicates import points_in_polygon

    gb = G.GeometryArray.from_parts(
        [(3, [[_sq(0, 0, 10, 10), _sq(3, 3, 7, 7)[::-1].copy()]])]
    )
    out = gbuf(gb, 0.5, quad_segs=8, cap_style="square", join_style="mitre")
    assert area(out)[0] == pytest.approx(11 * 11 - 3 * 3)
    assert not points_in_polygon(
        np.array([[5.0, 5.0]]), out, 0, boundary_counts=True
    ).any()
    # non-convex (L-shape) outer with a hole takes the capsule path
    L = np.array(
        [[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10], [0, 0]], float
    )
    ga = G.GeometryArray.from_parts([(3, [[L, _sq(1, 1, 3, 3)[::-1].copy()]])])
    out2 = gbuf(ga, 0.1, quad_segs=8)
    assert not points_in_polygon(
        np.array([[2.0, 2.0]]), out2, 0, boundary_counts=True
    ).any()
    assert points_in_polygon(np.array([[1.05, 2.0]]), out2, 0).any()


def test_single_sided_buffer():
    """GEOS semantics: +d buffers the left of the travel direction, -d
    the right, flat ends; joints filled on the outside of turns."""
    from geofileops_ray.geom.algorithms import buffer as gbuf
    from geofileops_ray.geom.measure import area
    from geofileops_ray.geom.predicates import points_in_polygon

    g = G.GeometryArray.from_parts(
        [(2, [[np.array([[0.0, 0.0], [10.0, 0.0]])]])]
    )
    left = gbuf(g, 1.0, single_sided=True)
    assert area(left)[0] == pytest.approx(10.0)
    assert points_in_polygon(np.array([[5.0, 0.5]]), left, 0).any()
    assert not points_in_polygon(np.array([[5.0, -0.5]]), left, 0).any()
    right = gbuf(g, -1.0, single_sided=True)
    assert area(right)[0] == pytest.approx(10.0)
    assert points_in_polygon(np.array([[5.0, -0.5]]), right, 0).any()
    # right-angle turn: outside gets a joint wedge, inside unions exactly
    g2 = G.GeometryArray.from_parts(
        [(2, [[np.array([[0.0, 0.0], [5.0, 0.0], [5.0, -5.0]])]])]
    )
    out = gbuf(g2, 1.0, single_sided=True, quad_segs=64)
    assert area(out)[0] == pytest.approx(10 + math.pi / 4, abs=1e-3)
    inside = gbuf(g2, -1.0, single_sided=True)
    assert area(inside)[0] == pytest.approx(9.0)
    bevel = gbuf(g2, 1.0, single_sided=True, join_style="mitre")
    assert area(bevel)[0] == pytest.approx(10.5)


def test_point_empty_fast_decode():
    """POINT EMPTY (all-NaN coords) must decode as EMPTY on the
    vectorized fast paths too, not leak NaN coords batch-dependently."""
    import struct

    from geofileops_ray.geom import wkb as gwkb

    pt_empty = struct.pack("<BI2d", 1, 1, float("nan"), float("nan"))
    pt = struct.pack("<BI2d", 1, 1, 3.0, 4.0)
    line = struct.pack("<BII4d", 1, 2, 2, 0.0, 0.0, 1.0, 1.0)
    fast = gwkb.from_wkb([pt_empty, pt])  # all-point batch → fast path
    general = gwkb.from_wkb([pt_empty, pt, line])  # mixed → general
    assert fast.is_empty().tolist() == [True, False]
    assert general.is_empty().tolist()[:2] == [True, False]
    assert not np.isnan(fast.coords).any()
    blob = pt_empty + pt
    offs = np.array([0, len(pt_empty), len(blob)], dtype=np.int64)
    packed = gwkb.from_wkb_packed(blob, offs)
    assert packed.is_empty().tolist() == [True, False]
    assert packed.coords.tolist() == [[3.0, 4.0]]


def test_covers_points_and_lines():
    """covers/contains must work for point-on-point and
    line-contains-subline pairs (previously always False)."""
    from geofileops_ray.geom.predicates import pair_contains, pair_equals

    def pt(*pts):
        return G.GeometryArray.from_parts(
            [(1, [[np.array([p], float)] for p in pts])]
        )

    def ln(*pts):
        return G.GeometryArray.from_parts([(2, [[np.array(pts, float)]])])

    assert pair_contains(pt((3, 4)), 0, pt((3, 4)), 0)
    assert not pair_contains(pt((3, 4)), 0, pt((3, 5)), 0)
    assert pair_contains(ln((0, 0), (10, 0)), 0, ln((2, 0), (5, 0)), 0)
    assert not pair_contains(ln((0, 0), (10, 0)), 0, ln((2, 0), (5, 1)), 0)
    # multi-segment line covers a point on its SECOND segment (the old
    # all-pairs test required the point to be near every segment)
    assert pair_contains(ln((0, 0), (5, 0), (5, 5)), 0, pt((5, 3)), 0)
    # equals: reversal and collinear subdivision are equal; same vertex
    # set traversed in a different order is NOT
    assert pair_equals(ln((0, 0), (2, 0)), 0, ln((2, 0), (0, 0)), 0)
    assert pair_equals(ln((0, 0), (2, 0)), 0, ln((0, 0), (1, 0), (2, 0)), 0)
    assert not pair_equals(
        ln((0, 0), (1, 0), (0.5, 1)), 0, ln((0, 0), (0.5, 1), (1, 0)), 0
    )
