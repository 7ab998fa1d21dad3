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
