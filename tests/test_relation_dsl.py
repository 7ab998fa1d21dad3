"""Relation DSL + DE-9IM mask tests (reference grammar
_geoops_sql.py:2516-2578, mask matching ST_RelateMatch semantics)."""

import numpy as np
import pytest

from geofileops_ray.stages.relation import (
    RelationQuery,
    _rect_relate,
    mask_matches,
)


def R(b1, b2):
    return _rect_relate(np.array(b1, float), np.array(b2, float), False, False)


def test_de9im_canonical_matrices():
    assert R([0, 0, 10, 10], [5, 5, 15, 15]) == "212101212"  # overlaps
    assert R([2, 2, 4, 4], [0, 0, 10, 10]) == "2FF1FF212"  # within (strict)
    assert R([0, 0, 5, 5], [5, 0, 10, 5]) == "FF2F11212"  # edge touch
    assert R([0, 0, 1, 1], [5, 5, 6, 6]) == "FF2FF1212"  # disjoint
    assert R([0, 0, 5, 5], [5, 5, 10, 10]) == "FF2F01212"  # corner touch
    assert R([0, 0, 10, 10], [0, 0, 10, 10]) == "2FFF1FFF2"  # equal


def test_mask_match_rules():
    assert mask_matches("212101212", "T*T***T**")
    assert not mask_matches("FF2FF1212", "T********")
    assert mask_matches("FF2FF1212", "FF*FF****")
    assert mask_matches("212101212", "2********")
    assert not mask_matches("212101212", "1********")


def test_query_with_mask_and_named():
    q = RelationQuery("T***T**** is True and touches is False")
    assert "mask:T***T****" in q.predicates
    assert "touches" in q.predicates
    # disjoint-satisfiability detection for masks
    assert RelationQuery("FF*FF**** is True").mentions_disjoint_true
    assert not RelationQuery("T******** is True").mentions_disjoint_true


def test_bad_queries_raise():
    with pytest.raises(ValueError):
        RelationQuery("intersects is Maybe")
    with pytest.raises(ValueError):
        RelationQuery("frobnicates is True")
    with pytest.raises(ValueError):
        RelationQuery("(intersects is True")


def test_mask_join(ray_session, oracle):
    from geofileops_ray.io.synth import PARCELS_CTE, ZONES_CTE, parcels_dataset, zones_dataset
    from geofileops_ray.stages.spatial_join import join_by_location

    # "interiors intersect" mask == open-interval overlap join
    res = join_by_location(
        parcels_dataset("/root/testdata/sf0.001"),
        zones_dataset("/root/testdata/sf0.001"),
        "T******** is True",
        cols1=[], cols2=[],
    ).take_all()
    got = sorted((r["l1_doc_id"], r["l2_doc_id"]) for r in res)
    want = [
        tuple(r)
        for r in oracle.execute(
            f"""WITH {PARCELS_CTE.strip()}, {ZONES_CTE.strip()}
            SELECT p.doc_id, z.doc_id FROM parcels p JOIN zones z
            ON p.minx < z.maxx AND p.maxx > z.minx
           AND p.miny < z.maxy AND p.maxy > z.miny ORDER BY 1,2"""
        ).fetchall()
    ]
    assert got == want


def _G(*gs):
    from geofileops_ray.geom.array import GeometryArray

    return GeometryArray.from_parts(list(gs))


def _rect(x0, y0, x1, y1):
    from geofileops_ray.geom.array import POLYGON

    return (POLYGON, [[np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)]])


def _tri(a, b, c):
    from geofileops_ray.geom.array import POLYGON

    return (POLYGON, [[np.array([a, b, c, a], float)]])


def _line(*pts):
    from geofileops_ray.geom.array import LINESTRING

    return (LINESTRING, [[np.array(pts, float)]])


def _pt(x, y):
    from geofileops_ray.geom.array import POINT

    return (POINT, [[np.array([[x, y]], float)]])


def test_general_relate_matches_rect_fast_path():
    """On rectangles the general measure-derived path must reproduce the
    exact interval-arithmetic matrices bit-for-bit."""
    from geofileops_ray.geom.relate import relate_general
    from geofileops_ray.stages.relation import _rect_relate

    cases = [
        ((0, 0, 4, 4), (1, 1, 2, 2)), ((0, 0, 2, 2), (2, 0, 4, 2)),
        ((0, 0, 2, 2), (1, 1, 3, 3)), ((0, 0, 2, 2), (3, 3, 4, 4)),
        ((0, 0, 2, 2), (0, 0, 2, 2)), ((0, 0, 2, 2), (2, 2, 4, 4)),
        ((0, 0, 2, 2), (1, 0, 3, 2)),
    ]
    for b1, b2 in cases:
        got = relate_general(_G(_rect(*b1)), 0, _G(_rect(*b2)), 0)
        want = _rect_relate(
            np.array(b1, float), np.array(b2, float), False, False)
        assert got == want, (b1, b2, got, want)


def test_general_relate_canonical_cases():
    """Hand-verified DE-9IM matrices for non-rectangular pairs across all
    type combinations (polygon/line/point)."""
    from geofileops_ray.geom.relate import relate_general

    cases = [
        # polygon × polygon
        (_tri((0, 0), (4, 0), (0, 4)), _tri((1, 1), (5, 1), (1, 5)),
         "212101212"),               # proper overlap
        (_tri((0, 0), (2, 0), (0, 2)), _tri((2, 0), (0, 2), (2, 2)),
         "FF2F11212"),               # shared hypotenuse edge
        (_tri((0, 0), (10, 0), (0, 10)), _tri((1, 1), (2, 1), (1, 2)),
         "212FF1FF2"),               # strict containment
        (_tri((0, 0), (2, 0), (0, 2)), _tri((2, 0), (4, 0), (2, 2)),
         "FF2F01212"),               # single-vertex touch
        # polygon × line
        (_rect(0, 0, 4, 4), _line((-1, 2), (5, 2)), "1F20F1102"),  # cross
        (_rect(0, 0, 4, 4), _line((0, 0), (4, 0)), "FF2101FF2"),   # on edge
        (_rect(0, 0, 4, 4), _line((1, 1), (2, 2)), "102FF1FF2"),   # inside
        (_rect(0, 0, 4, 4), _line((5, 5), (6, 6)), "FF2FF1102"),   # outside
        # line × line
        (_line((0, 0), (2, 2)), _line((0, 2), (2, 0)), "0F1FF0102"),
        (_line((0, 0), (2, 0)), _line((1, 0), (3, 0)), "1010F0102"),
        (_line((0, 0), (2, 0)), _line((0, 0), (2, 0)), "1FFF0FFF2"),
        (_line((0, 0), (2, 0)), _line((2, 0), (3, 1)), "FF1F00102"),
        # point combinations
        (_pt(1, 1), _pt(1, 1), "0FFFFFFF2"),
        (_pt(1, 1), _pt(2, 2), "FF0FFF0F2"),
        (_rect(0, 0, 2, 2), _pt(1, 1), "0F2FF1FF2"),
        (_rect(0, 0, 2, 2), _pt(0, 1), "FF20F1FF2"),
        (_rect(0, 0, 2, 2), _pt(5, 5), "FF2FF10F2"),
        (_line((0, 0), (2, 0)), _pt(1, 0), "0F1FF0FF2"),
        (_line((0, 0), (2, 0)), _pt(2, 0), "FF10F0FF2"),
    ]
    for ga, gb, want in cases:
        got = relate_general(_G(ga), 0, _G(gb), 0)
        assert got == want, (ga, gb, got, want)


def test_general_relate_mask_consistent_with_named_predicates(ray_session):
    """Property: the OGC mask definitions evaluated through the general
    relate matrix must agree with the engine's named pair predicates on
    the irregular triangle fixtures (the two implementations are fully
    independent)."""
    from geofileops_ray.geom import from_wkb
    from geofileops_ray.geom.predicates import PREDICATES
    from geofileops_ray.geom.relate import relate_general
    from geofileops_ray.io.synth import triangles_dataset, zones_dataset
    from geofileops_ray.stages.relation import mask_matches
    from geofileops_ray.util import collect

    tris = collect(triangles_dataset("/root/testdata/sf0.001"))
    zs = collect(zones_dataset("/root/testdata/sf0.001"))
    ga = from_wkb(tris.column("geometry").to_pylist()[:40])
    gb = from_wkb(zs.column("geometry").to_pylist()[:5])

    def from_mask(m, *masks):
        return any(mask_matches(m, k) for k in masks)

    for i in range(len(ga)):
        for j in range(len(gb)):
            m = relate_general(ga, i, gb, j)
            want_int = bool(PREDICATES["intersects"](ga, i, gb, j))
            got_int = from_mask(
                m, "T********", "*T*******", "***T*****", "****T****")
            assert got_int == want_int, (i, j, m)
            want_w = bool(PREDICATES["within"](ga, i, gb, j))
            assert from_mask(m, "T*F**F***") == want_w, (i, j, m)
            want_t = bool(PREDICATES["touches"](ga, i, gb, j))
            got_t = from_mask(m, "FT*******", "F**T*****", "F***T****")
            assert got_t == want_t, (i, j, m)
