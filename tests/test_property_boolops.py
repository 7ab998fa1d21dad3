"""Property-based cross-validation of the general boolean sweep kernel
(geom/boolops.py) against an INDEPENDENT algorithm implemented here:
half-plane Sutherland–Hodgman clipping of convex lattice polygons.

Rationale (VERDICT round 1, "benchmark diet" finding): the sweep kernel
is the engine's hardest-to-trust component; the driver oracles cover it
on triangles/rects, this covers it on arbitrary random convex polygons —
including shared edges, vertex touches and containment — with areas
checked to 1e-7 absolute.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geofileops_ray.geom.boolops import boolean_op, union_many


# ---------------------------------------------------------------- helpers
# All helpers below are written from scratch for this test (monotone
# chain + Sutherland–Hodgman + shoelace) — no engine code — so a bug in
# boolops can't cancel itself out.


def _hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns CCW hull without repeated last pt."""
    pts = np.unique(points, axis=0)
    if len(pts) < 3:
        return np.empty((0, 2))
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out = []
        for p in seq:
            while (
                len(out) >= 2
                and np.cross(out[-1] - out[-2], p - out[-2]) <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1], dtype=float)
    return hull if len(hull) >= 3 else np.empty((0, 2))


def _sh_clip(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip CCW polygon by CCW convex polygon."""
    out = list(subject)
    m = len(clip)
    for k in range(m):
        a, b = clip[k], clip[(k + 1) % m]
        inp, out = out, []
        if not inp:
            break
        d = b - a
        prev = inp[-1]
        prev_in = np.cross(d, prev - a) >= -1e-12
        for cur in inp:
            cur_in = np.cross(d, cur - a) >= -1e-12
            if cur_in:
                if not prev_in:
                    out.append(_isect(prev, cur, a, b))
                out.append(cur)
            elif prev_in:
                out.append(_isect(prev, cur, a, b))
            prev, prev_in = cur, cur_in
    return np.array(out) if len(out) >= 3 else np.empty((0, 2))


def _isect(p, q, a, b):
    d1, d2 = q - p, b - a
    t = np.cross(a - p, d2) / np.cross(d1, d2)
    return p + t * d1


def _shoelace(ring: np.ndarray) -> float:
    if len(ring) < 3:
        return 0.0
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _parts_area(parts) -> float:
    """Engine Parts → area (outer + holes carry their signed area)."""
    total = 0.0
    for part in parts:
        for ring in part:
            r = np.asarray(ring)
            if len(r) and np.array_equal(r[0], r[-1]):
                r = r[:-1]
            total += abs(_shoelace(r)) if _is_outer(part, ring) else -abs(
                _shoelace(r)
            )
    return total


def _is_outer(part, ring):
    return ring is part[0]


lattice_pts = st.lists(
    st.tuples(st.integers(0, 16), st.integers(0, 16)),
    min_size=3,
    max_size=10,
)


@settings(max_examples=150, deadline=None)
@given(lattice_pts, lattice_pts)
def test_convex_overlay_areas_match_independent_clip(pts_a, pts_b):
    a = _hull(np.array(pts_a, dtype=float))
    b = _hull(np.array(pts_b, dtype=float))
    if len(a) == 0 or len(b) == 0:
        return
    area_a, area_b = _shoelace(a), _shoelace(b)
    inter_ref = abs(_shoelace(_sh_clip(a, b)))

    pa_, pb_ = [[a]], [[b]]
    got_i = _parts_area(boolean_op(pa_, pb_, "intersection"))
    got_u = _parts_area(boolean_op(pa_, pb_, "union"))
    got_d = _parts_area(boolean_op(pa_, pb_, "difference"))
    got_s = _parts_area(boolean_op(pa_, pb_, "symmetric_difference"))

    tol = 1e-7
    assert abs(got_i - inter_ref) < tol
    assert abs(got_u - (area_a + area_b - inter_ref)) < tol
    assert abs(got_d - (area_a - inter_ref)) < tol
    assert abs(got_s - (area_a + area_b - 2 * inter_ref)) < tol


@settings(max_examples=60, deadline=None)
@given(st.lists(lattice_pts, min_size=2, max_size=5))
def test_union_many_matches_inclusion_exclusion_pairwise(all_pts):
    hulls = [h for h in (_hull(np.array(p, dtype=float)) for p in all_pts)
             if len(h)]
    if len(hulls) < 2:
        return
    got = _parts_area(union_many([[[h]] for h in hulls]))
    # reference: fold pairwise union through boolean_op is NOT independent;
    # instead Monte-Carlo-free exact check via lattice super-sampling:
    # union area equals the integral of the indicator on a fine grid only
    # approximately, so use inclusion-exclusion with S-H (exact for convex)
    n = len(hulls)
    total = 0.0
    # inclusion-exclusion over subsets (n <= 5): intersection of convex
    # sets via chained S-H clips — still fully independent of the engine
    from itertools import combinations

    for k in range(1, n + 1):
        for idx in combinations(range(n), k):
            cur = hulls[idx[0]]
            for j in idx[1:]:
                cur = _sh_clip(cur, hulls[j])
                if len(cur) == 0:
                    break
            term = abs(_shoelace(cur)) if len(cur) else 0.0
            total += term if k % 2 == 1 else -term
    assert abs(got - total) < 1e-6


def _rect_ring(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float
    )


def _ov(a, b):
    return max(0.0, min(a[2], b[2]) - max(a[0], b[0])) * max(
        0.0, min(a[3], b[3]) - max(a[1], b[1])
    )


frame_strategy = st.tuples(
    st.integers(0, 10), st.integers(0, 10),  # outer origin
    st.integers(4, 8), st.integers(4, 8),    # outer size
    st.integers(1, 2), st.integers(1, 2),    # hole inset
    st.integers(1, 3), st.integers(1, 3),    # hole size
)


def _frame(t):
    ox, oy, w, h, ix, iy, hw, hh = t
    outer = (ox, oy, ox + w, oy + h)
    hole = (
        ox + ix,
        oy + iy,
        min(ox + ix + hw, ox + w - 1),
        min(oy + iy + hh, oy + h - 1),
    )
    return outer, hole


@settings(max_examples=120, deadline=None)
@given(frame_strategy, frame_strategy)
def test_hole_overlay_areas_match_rect_algebra(ta, tb):
    """Polygons WITH HOLES through the sweep: intersection/union/diff
    areas of two rectangular frames vs exact rect inclusion-exclusion."""
    (ao, ah), (bo, bh) = _frame(ta), _frame(tb)
    A = [[_rect_ring(*ao), _rect_ring(*ah)]]
    B = [[_rect_ring(*bo), _rect_ring(*bh)]]
    area_a = _ov(ao, ao) - _ov(ah, ah)
    area_b = _ov(bo, bo) - _ov(bh, bh)
    inter = _ov(ao, bo) - _ov(ao, bh) - _ov(ah, bo) + _ov(ah, bh)

    tol = 1e-7
    assert abs(_parts_area(boolean_op(A, B, "intersection")) - inter) < tol
    assert (
        abs(_parts_area(boolean_op(A, B, "union")) - (area_a + area_b - inter))
        < tol
    )
    assert (
        abs(_parts_area(boolean_op(A, B, "difference")) - (area_a - inter))
        < tol
    )


# ------------------------------------------ rectilinear staircase (CONCAVE)


def _skyline(h: list[int]) -> np.ndarray:
    """CCW rectilinear 'histogram' polygon over unit columns of heights
    h[i] ≥ 1 — one reflex corner per descending step, shared collinear
    bottom edges, coincident verticals: the concave stress shape."""
    W = len(h)
    pts = [(0.0, 0.0), (float(W), 0.0), (float(W), float(h[W - 1]))]
    for i in range(W - 1, 0, -1):
        if h[i - 1] != h[i]:
            pts.append((float(i), float(h[i])))
            pts.append((float(i), float(h[i - 1])))
    pts.append((0.0, float(h[0])))
    return np.array(pts, dtype=float)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.integers(1, 8), min_size=2, max_size=12),
    st.lists(st.integers(1, 8), min_size=2, max_size=12),
    st.integers(0, 3),
    st.integers(0, 3),
)
def test_concave_staircase_overlay_matches_column_algebra(ha, hb, dx, dy):
    """boolean_op on two CONCAVE staircase polygons (B shifted by
    (dx, dy)) vs independent per-column interval algebra. Covers reflex
    vertices, long shared collinear edges and coincident verticals —
    the cases the convex property test can't produce."""
    A = _skyline(ha)
    B = _skyline(hb) + np.array([float(dx), float(dy)])
    area_a, area_b = float(sum(ha)), float(sum(hb))
    inter = 0.0
    for i, hai in enumerate(ha):
        j = i - dx
        if 0 <= j < len(hb):
            inter += max(0.0, min(float(hai), dy + float(hb[j])) - dy)

    pa_, pb_ = [[A]], [[B]]
    got_i = _parts_area(boolean_op(pa_, pb_, "intersection"))
    got_u = _parts_area(boolean_op(pa_, pb_, "union"))
    got_d = _parts_area(boolean_op(pa_, pb_, "difference"))
    got_s = _parts_area(boolean_op(pa_, pb_, "symmetric_difference"))

    tol = 1e-7
    assert abs(got_i - inter) < tol
    assert abs(got_u - (area_a + area_b - inter)) < tol
    assert abs(got_d - (area_a - inter)) < tol
    assert abs(got_s - (area_a + area_b - 2 * inter)) < tol
