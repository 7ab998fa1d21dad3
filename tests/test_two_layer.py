"""Two-layer operator tests vs DuckDB oracles on the SQL-mirrorable
synthetic layers (io/synth.py) — the engine-side analogue of the
reference's GeoPandas-oracle golden tests
(tests/multi_layer_operations/test_geofileops_twolayers.py)."""

import numpy as np
import pytest

from geofileops_ray.geom import from_wkb
from geofileops_ray.geom.measure import area
from geofileops_ray.io.synth import (
    PARCELS_CTE,
    POINTS_CTE,
    ZONES_CTE,
    parcels_dataset,
    points_dataset,
    zones_dataset,
)
from geofileops_ray.stages.knn import join_nearest
from geofileops_ray.stages.overlay_ops import (
    clip,
    difference,
    intersection,
    union,
)
from geofileops_ray.stages.spatial_join import (
    delete_duplicate_geometries,
    export_by_distance,
    export_by_location,
    join_by_location,
)

SF = "/root/testdata/sf0.001"
CTE = f"WITH {PARCELS_CTE.strip()}, {ZONES_CTE.strip()}, {POINTS_CTE.strip()}"
BBOX_ON = (
    "p.minx <= z.maxx AND p.maxx >= z.minx AND p.miny <= z.maxy AND p.maxy >= z.miny"
)
OVER_ON = (
    "p.minx < z.maxx AND p.maxx > z.minx AND p.miny < z.maxy AND p.maxy > z.miny"
)
OVERLAP_AREA = (
    "(LEAST(p.maxx,z.maxx)-GREATEST(p.minx,z.minx))"
    "*(LEAST(p.maxy,z.maxy)-GREATEST(p.miny,z.miny))"
)


def test_join_by_location_intersects(ray_session, oracle):
    res = join_by_location(
        parcels_dataset(SF), zones_dataset(SF), "intersects is True",
        cols1=["OIDN"], cols2=["naam"],
    ).take_all()
    got = sorted((r["l1_doc_id"], r["l2_doc_id"]) for r in res)
    want = [
        tuple(r)
        for r in oracle.execute(
            f"{CTE} SELECT p.doc_id, z.doc_id FROM parcels p JOIN zones z"
            f" ON {BBOX_ON} ORDER BY 1,2"
        ).fetchall()
    ]
    assert got == want


def test_join_by_location_within(ray_session, oracle):
    res = join_by_location(
        parcels_dataset(SF), zones_dataset(SF), "within is True",
        cols1=[], cols2=[],
    ).take_all()
    got = sorted((r["l1_doc_id"], r["l2_doc_id"]) for r in res)
    want = [
        tuple(r)
        for r in oracle.execute(
            f"{CTE} SELECT p.doc_id, z.doc_id FROM parcels p JOIN zones z ON"
            " p.minx >= z.minx AND p.maxx <= z.maxx AND p.miny >= z.miny"
            " AND p.maxy <= z.maxy AND (p.minx > z.minx OR p.maxx < z.maxx"
            " OR p.miny > z.miny OR p.maxy < z.maxy OR TRUE) ORDER BY 1,2"
        ).fetchall()
    ]
    assert got == want


def test_export_by_location_semi_and_anti(ray_session, oracle):
    semi = export_by_location(
        parcels_dataset(SF), zones_dataset(SF), "intersects is True"
    ).take_all()
    anti = export_by_location(
        parcels_dataset(SF), zones_dataset(SF), "intersects is False"
    ).take_all()
    n_semi = oracle.execute(
        f"{CTE} SELECT count(*) FROM parcels p WHERE EXISTS"
        f" (SELECT 1 FROM zones z WHERE {BBOX_ON})"
    ).fetchone()[0]
    n_anti = oracle.execute(
        f"{CTE} SELECT count(*) FROM parcels p WHERE NOT EXISTS"
        f" (SELECT 1 FROM zones z WHERE {BBOX_ON})"
    ).fetchone()[0]
    assert len(semi) == n_semi
    assert len(anti) == n_anti
    assert len(semi) + len(anti) == 500


def test_export_by_distance(ray_session, oracle):
    res = export_by_distance(
        points_dataset(SF), zones_dataset(SF), max_distance=30.0
    ).take_all()
    want = oracle.execute(
        f"""{CTE} SELECT count(*) FROM points p WHERE EXISTS (SELECT 1 FROM zones z
        WHERE SQRT(POWER(GREATEST(z.minx - p.x, p.x - z.maxx, 0),2)
                 + POWER(GREATEST(z.miny - p.y, p.y - z.maxy, 0),2)) <= 30.0)"""
    ).fetchone()[0]
    assert len(res) == want


def test_intersection_pair_areas(ray_session, oracle):
    res = intersection(
        parcels_dataset(SF), zones_dataset(SF), cols1=["OIDN"], cols2=["naam"]
    ).take_all()
    ga = from_wkb([r["geometry"] for r in res])
    got = sorted(
        (r["l1_doc_id"], r["l2_doc_id"], round(a, 9)) for r, a in zip(res, area(ga))
    )
    want = [
        (r[0], r[1], round(r[2], 9))
        for r in oracle.execute(
            f"{CTE} SELECT p.doc_id, z.doc_id, {OVERLAP_AREA} FROM parcels p"
            f" JOIN zones z ON {OVER_ON} ORDER BY 1,2"
        ).fetchall()
    ]
    assert got == want


def test_clip_and_difference_areas(ray_session, oracle):
    got_clip = clip(parcels_dataset(SF), zones_dataset(SF), cols1=["OIDN"]).take_all()
    ga = from_wkb([r["geometry"] for r in got_clip])
    got = sorted((r["l1_doc_id"], round(a, 9)) for r, a in zip(got_clip, area(ga)))
    want = [
        (r[0], round(r[1], 9))
        for r in oracle.execute(
            f"{CTE} SELECT p.doc_id, SUM({OVERLAP_AREA}) FROM parcels p JOIN"
            f" zones z ON {OVER_ON} GROUP BY 1 ORDER BY 1"
        ).fetchall()
    ]
    assert got == want

    got_diff = difference(
        parcels_dataset(SF), zones_dataset(SF), cols1=["OIDN"]
    ).take_all()
    ga = from_wkb([r["geometry"] for r in got_diff])
    got = sorted((r["l1_doc_id"], round(a, 9)) for r, a in zip(got_diff, area(ga)))
    want = [
        (r[0], round(r[1], 9))
        for r in oracle.execute(
            f"""{CTE} SELECT doc_id, a FROM (
            SELECT p.doc_id, p.OPPERVL - SUM(CASE WHEN z.doc_id IS NULL THEN 0
              ELSE {OVERLAP_AREA} END) a
            FROM parcels p LEFT JOIN zones z ON {OVER_ON}
            GROUP BY 1, p.OPPERVL) t WHERE a > 0 ORDER BY 1"""
        ).fetchall()
    ]
    assert got == want


def test_union_is_composition(ray_session, oracle):
    n_inter = oracle.execute(
        f"{CTE} SELECT count(*) FROM parcels p JOIN zones z ON {OVER_ON}"
    ).fetchone()[0]
    res = union(
        parcels_dataset(SF), zones_dataset(SF), cols1=["OIDN"], cols2=["naam"]
    ).take_all()
    # union = intersection ⊎ diff(p,z) ⊎ diff(z,p); every row has geometry
    assert len(res) > n_inter
    assert all(r["geometry"] is not None for r in res)


def test_join_nearest(ray_session, oracle):
    res = join_nearest(
        points_dataset(SF), zones_dataset(SF), nb_nearest=2,
        cols1=["naam"], cols2=["naam"],
    ).take_all()
    got = sorted((r["l1_doc_id"], r["pos"], round(r["distance"], 9)) for r in res)
    want = [
        (r[0], r[1], round(r[2], 9))
        for r in oracle.execute(
            f"""{CTE}, d AS (
            SELECT p.doc_id, ROW_NUMBER() OVER (PARTITION BY p.doc_id ORDER BY
              SQRT(POWER(GREATEST(z.minx - p.x, p.x - z.maxx, 0),2)
                 + POWER(GREATEST(z.miny - p.y, p.y - z.maxy, 0),2)), z.doc_id) pos,
              SQRT(POWER(GREATEST(z.minx - p.x, p.x - z.maxx, 0),2)
                 + POWER(GREATEST(z.miny - p.y, p.y - z.maxy, 0),2)) dist
            FROM points p CROSS JOIN zones z)
            SELECT doc_id, pos, dist FROM d WHERE pos <= 2 ORDER BY 1,2"""
        ).fetchall()
    ]
    assert got == want


def test_delete_duplicate_geometries(ray_session):
    import ray.data

    ds = points_dataset(SF)
    doubled = ds.union(ds)
    res = delete_duplicate_geometries(doubled).take_all()
    # each point unique in the layer → dedup back to 500... unless two
    # docs hash to identical coordinates; compare against distinct coords
    pts = points_dataset(SF).take_all()
    uniq = {(r["x"], r["y"]) for r in pts}
    assert len(res) == len(uniq)
