"""Round-5 reference parameter-parity additions: api.warp gcps
dispatch, isvalid(only_invalid=False), select_two_layers
remove_slivers."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from geofileops_ray.geom.wkb import from_wkb, to_wkb
from geofileops_ray.geom.wkt import from_wkt
from geofileops_ray.util import collect


def _geom_ds(wkts, extra=None):
    wkb = to_wkb(from_wkt(wkts))
    cols = {
        "doc_id": pa.array(range(len(wkb)), pa.int64()),
        **(extra or {}),
        "geometry": pa.array(wkb, pa.binary()),
    }
    return ray.data.from_arrow(pa.table(cols))


def test_api_warp_dispatches_gcps_and_matrix(ray_session):
    """The reference's warp takes GCPs (geoops.py:1561); the façade
    dispatches gcps= to the rubbersheeting path and the engine's
    affine spelling still works."""
    from geofileops_ray import api

    ds = _geom_ds(["POINT (1 1)", "POINT (3 2)"])
    # identity-fit GCPs with a +10/+20 shift
    gcps = [(0, 0, 10, 20), (10, 0, 20, 20), (0, 10, 10, 30), (10, 10, 20, 30)]
    out = collect(api.warp(ds, gcps=gcps, order=1))
    ga = from_wkb(out.sort_by("doc_id").column("geometry"))
    assert np.allclose(ga.coords, [[11, 21], [13, 22]])
    out2 = collect(api.warp(ds, matrix=(1, 0, 10, 0, 1, 20)))
    ga2 = from_wkb(out2.sort_by("doc_id").column("geometry"))
    assert np.allclose(ga2.coords, [[11, 21], [13, 22]])


def test_isvalid_only_invalid_false_flags_all_rows(ray_session):
    from geofileops_ray.stages.single_layer import isvalid

    bow = (
        "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"  # bowtie: invalid
    )
    sq = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    ds = _geom_ds([sq, bow])
    inv = collect(isvalid(ds))
    assert inv.num_rows == 1 and inv.column("doc_id").to_pylist() == [1]
    allrows = collect(isvalid(ds, only_invalid=False)).sort_by("doc_id")
    assert allrows.num_rows == 2
    assert allrows.column("isvalid").to_pylist() == [True, False]
    assert allrows.column("isvalidreason").to_pylist()[0] == "Valid Geometry"


def test_select_two_layers_remove_slivers(ray_session):
    """A hairline overlap produces a sliver intersection; the
    reference's remove_slivers drops it while the real overlap
    survives (avg-width + precision-collapse rule)."""
    from geofileops_ray.stages.compound import select_two_layers

    l1 = _geom_ds(
        [
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
            "POLYGON ((10 0, 14 0, 14 4, 10 4, 10 0))",
        ]
    )
    # first overlaps 2×4 for real; second only a 1e-5-wide strip
    l2 = _geom_ds(
        [
            "POLYGON ((2 0, 6 0, 6 4, 2 4, 2 0))",
            "POLYGON ((13.99999 0, 18 0, 18 4, 13.99999 4, 13.99999 0))",
        ]
    )
    sql = (
        "SELECT l1.doc_id AS doc_id, "
        "st_intersection(l1.geometry, l2.geometry) AS geometry "
        "FROM layer1 l1 JOIN layer2 l2 "
        "ON st_intersects(l1.geometry, l2.geometry)"
    )
    raw = collect(select_two_layers(l1, l2, sql, size=100.0))
    assert raw.num_rows == 2
    clean = collect(
        select_two_layers(l1, l2, sql, size=100.0, remove_slivers=True)
    )
    assert clean.num_rows == 1
    assert clean.column("doc_id").to_pylist() == [0]
