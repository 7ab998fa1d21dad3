"""Vectorized convex×rect clip kernel vs the general sweep — same areas,
valid WKB, correct convexity detection."""

import numpy as np

from geofileops_ray.geom import GeometryArray, from_wkb
from geofileops_ray.geom.convexclip import (
    clip_areas,
    clip_convex_by_rects,
    convex_single_ring,
    padded_to_wkb,
)
from geofileops_ray.geom.measure import area as ga_area
from geofileops_ray.geom.overlay import polygon_overlay, ring_signed_area


def _random_convex(rng, n):
    polys = []
    for i in range(n):
        k = rng.integers(3, 9)
        ang = np.sort(rng.random(k) * 2 * np.pi)
        cx, cy = rng.random(2) * 100
        rad = 1 + rng.random() * 4
        ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        if i % 3 == 0:
            ring = ring[::-1]  # mix CW input orientation
        polys.append((3, [[np.concatenate([ring, ring[:1]], axis=0)]]))
    return GeometryArray.from_parts(polys)


def test_convex_detection():
    rng = np.random.default_rng(3)
    ga = _random_convex(rng, 50)
    assert convex_single_ring(ga).all()
    # a bowtie and a poly with a hole are NOT convex-single-ring
    bow = np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], dtype=float)
    sq = np.array([[0, 0], [9, 0], [9, 9], [0, 9], [0, 0]], dtype=float)
    hole = np.array([[3, 3], [3, 4], [4, 4], [4, 3], [3, 3]], dtype=float)
    g2 = GeometryArray.from_parts([(3, [[bow]]), (3, [[sq, hole]])])
    assert not convex_single_ring(g2).any()


def test_clip_matches_sweep():
    rng = np.random.default_rng(11)
    N = 400
    ga = _random_convex(rng, N)
    b = ga.bounds()
    x0 = b[:, 0] + rng.random(N) * 4 - 2
    y0 = b[:, 1] + rng.random(N) * 4 - 2
    rects = np.stack(
        [x0, y0, x0 + rng.random(N) * 6, y0 + rng.random(N) * 6], axis=1
    )
    P, cnt = clip_convex_by_rects(ga, np.arange(N), rects)
    got = clip_areas(P, cnt)
    for k in range(N):
        rr = rects[k]
        ring = np.array(
            [
                [rr[0], rr[1]],
                [rr[2], rr[1]],
                [rr[2], rr[3]],
                [rr[0], rr[3]],
                [rr[0], rr[1]],
            ]
        )
        parts = polygon_overlay(ga._parts_of(k), [[ring]], "intersection")
        want = sum(abs(ring_signed_area(r)) for p in parts for r in p[:1])
        assert abs(got[k] - want) < 1e-8, k

    # WKB output decodes to polygons with the same areas
    blobs = padded_to_wkb(P, cnt)
    nz = [i for i in range(N) if blobs[i] is not None]
    assert set(nz) == set(np.flatnonzero(cnt > 0).tolist())
    dec = from_wkb([blobs[i] for i in nz])
    assert np.allclose(ga_area(dec), got[nz], atol=1e-9)


def test_clip_exact_on_lattice():
    # integer-lattice triangle × rect: exact closed-form area
    tri = np.array([[0, 0], [4, 0], [0, 4], [0, 0]], dtype=float)
    ga = GeometryArray.from_parts([(3, [[tri]])])
    rects = np.array([[1.0, 1.0, 10.0, 10.0]])
    P, cnt = clip_convex_by_rects(ga, np.array([0]), rects)
    # clip of the right triangle to x>=1,y>=1: triangle (1,1)(3,1)(1,3)
    assert clip_areas(P, cnt)[0] == 2.0
    # disjoint rect -> empty
    P, cnt = clip_convex_by_rects(ga, np.array([0]), np.array([[9, 9, 10, 10.0]]))
    assert cnt[0] == 0 and padded_to_wkb(P, cnt) == [None]


def test_sat_predicates_match_generic():
    from geofileops_ray.geom.predicates import PREDICATES
    from geofileops_ray.geom.convexclip import convex_rect_predicates
    from geofileops_ray.io.synth import rect_wkb
    from geofileops_ray.geom.wkb import from_wkb
    from geofileops_ray.stages.relation import NAMED_PREDICATES

    rng = np.random.default_rng(19)
    polys = []
    for i in range(120):
        k = rng.integers(3, 8)
        ang = np.sort(rng.random(k) * 2 * np.pi)
        cx, cy = rng.random(2) * 40
        rad = 1 + rng.random() * 4
        ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        polys.append((3, [[np.concatenate([ring, ring[:1]])]]))
    tri = np.array([[0, 0], [4, 0], [0, 4], [0, 0]], float)
    for off in ((0, 0), (10, 10), (20, 0)):
        polys.append((3, [[tri + np.array(off)]]))
    ga = GeometryArray.from_parts(polys)
    n = len(ga.types)
    x0 = rng.random(n) * 40 - 2
    y0 = rng.random(n) * 40 - 2
    rects = np.stack([x0, y0, x0 + rng.random(n) * 6, y0 + rng.random(n) * 6], axis=1)
    rects[-3] = [4, 0, 8, 4]    # vertex touch on the lattice
    rects[-2] = [10, 6, 30, 8]  # disjoint
    rects[-1] = [20, 0, 24, 4]  # triangle coveredby rect, shared edges
    gr = from_wkb(rect_wkb(rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]).to_pylist())
    preds = set(NAMED_PREDICATES)
    got = convex_rect_predicates(ga, np.arange(n), rects, preds)
    got_s = convex_rect_predicates(ga, np.arange(n), rects, preds, swapped=True)
    for k in range(n):
        for p in preds:
            assert bool(got[p][k]) == bool(PREDICATES[p](ga, k, gr, k)), (k, p)
            assert bool(got_s[p][k]) == bool(PREDICATES[p](gr, k, ga, k)), (k, p)


def test_sat_predicates_tolerate_sweep_noise():
    """Sweep-produced vertices sit O(1e-14) off the lattice; the SAT fast
    path must agree with the eps-tolerant generic predicates there
    (regression: union_full_self nb_covering undercount)."""
    from geofileops_ray.geom.convexclip import convex_rect_predicates

    ring = np.array(
        [[197.0 + 2.9e-14, 43.0], [197.0, 47.0], [191.0, 47.0],
         [191.0, 43.0], [197.0 + 2.9e-14, 43.0]]
    )
    ga = GeometryArray.from_parts([(3, [[ring]])])
    rects = np.array([[190.0, 42.0, 197.0, 47.0]])
    got = convex_rect_predicates(
        ga, np.array([0]), rects, {"coveredby", "intersects", "within"}
    )
    # must agree with the generic eps-tolerant path (predicates._EPS)
    from geofileops_ray.geom.predicates import PREDICATES
    from geofileops_ray.io.synth import rect_wkb

    gr = from_wkb(
        rect_wkb(
            np.array([190.0]), np.array([42.0]),
            np.array([197.0]), np.array([47.0]),
        ).to_pylist()
    )
    for p in ("coveredby", "intersects", "within"):
        assert bool(got[p][0]) is bool(PREDICATES[p](ga, 0, gr, 0)), p
    assert bool(got["coveredby"][0]) is True


def test_convex_convex_interiors_matches_generic():
    """The two-sided convex SAT interior test (candidate pruning for
    difference/clip/union_full_self) must agree exactly with the generic
    pair predicates ('intersects and not touches') on random lattice
    triangles — including edge-touching tilings, the case the prune
    exists for."""
    import numpy as np

    from geofileops_ray.geom import GeometryArray
    from geofileops_ray.geom.convexclip import (
        convex_convex_interiors,
        convex_single_ring,
    )
    from geofileops_ray.stages.relation import RelationQuery, evaluate_pairs

    rng = np.random.default_rng(3)

    def make_tri(n):
        geoms = []
        while len(geoms) < n:
            pts = rng.integers(0, 12, (3, 2)).astype(float)
            a = (pts[1, 0] - pts[0, 0]) * (pts[2, 1] - pts[0, 1]) - (
                pts[2, 0] - pts[0, 0]
            ) * (pts[1, 1] - pts[0, 1])
            if abs(a) > 0.5:
                if a < 0:
                    pts = pts[::-1]
                ring = np.concatenate([pts, pts[:1]], axis=0)
                geoms.append((3, [[ring]]))
        return GeometryArray.from_parts(geoms)

    ga1, ga2 = make_tri(150), make_tri(150)
    assert convex_single_ring(ga1).all() and convex_single_ring(ga2).all()
    ia = rng.integers(0, 150, 800).astype(np.int64)
    ib = rng.integers(0, 150, 800).astype(np.int64)
    got = convex_convex_interiors(ga1, ia, ga2, ib)
    want = evaluate_pairs(
        RelationQuery("intersects is True and touches is False"),
        ga1, ia, ga2, ib,
    )
    assert (got == want).all()


def test_degenerate_edge_not_separating():
    """A duplicate consecutive vertex (accepted by convex_single_ring —
    its cross products are 0) yields a zero-length edge with a (0,0)
    normal; that edge must not vote in the SAT separation tests, or
    overlapping pairs are falsely declared separated and difference/clip
    and the fused overlays silently leave rows uncut (ADVICE r2, high)."""
    from geofileops_ray.geom.convexclip import (
        convex_convex_interiors,
        convex_rect_predicates,
        convex_single_ring,
    )

    # unit squares overlapping 2x2 on [2,4]x[2,4]; A carries a duplicate
    # consecutive vertex
    dup_sq = np.array(
        [[0, 0], [4, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float
    )
    sq = np.array([[2, 2], [6, 2], [6, 6], [2, 6], [2, 2]], dtype=float)
    ga1 = GeometryArray.from_parts([(3, [[dup_sq]])])
    ga2 = GeometryArray.from_parts([(3, [[sq]])])
    assert convex_single_ring(ga1).all()
    got = convex_convex_interiors(
        ga1, np.array([0]), ga2, np.array([0])
    )
    assert bool(got[0]) is True
    got_r = convex_convex_interiors(
        ga2, np.array([0]), ga1, np.array([0])
    )
    assert bool(got_r[0]) is True
    # same for the convex x rect SAT predicates
    preds = convex_rect_predicates(
        ga1, np.array([0]), np.array([[2.0, 2.0, 6.0, 6.0]]),
        {"intersects", "touches", "overlaps"},
    )
    assert bool(preds["intersects"][0]) is True
    assert bool(preds["touches"][0]) is False
    assert bool(preds["overlaps"][0]) is True
