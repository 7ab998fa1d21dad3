import numpy as np
import pyarrow as pa

from geofileops_ray.geom import from_wkb
from geofileops_ray.geom.measure import area
from geofileops_ray.io.synth import parcels_dataset
from geofileops_ray.stages.catalog import (
    add_column,
    drop_column,
    layer_info,
    rename_column,
    subdivide,
)

SF = "/root/testdata/sf0.001"


def test_layer_info(ray_session):
    info = layer_info(parcels_dataset(SF))
    assert info.featurecount == 500
    assert info.geometrytypename == "POLYGON"
    assert info.total_bounds[0] >= 0.0
    assert "GEWASGROEP" in info.columns


def test_column_ops(ray_session):
    ds = parcels_dataset(SF)
    ds = add_column(ds, "flag", 7)
    ds = rename_column(ds, "flag", "flag2")
    rows = drop_column(ds, "OIDN").take_all()
    assert rows[0]["flag2"] == 7
    assert "OIDN" not in rows[0]


def test_subdivide_preserves_area(ray_session):
    ds = subdivide(parcels_dataset(SF), max_coords=4)  # every rect splits
    rows = ds.take_all()
    assert len(rows) > 500
    ga = from_wkb([r["geometry"] for r in rows])
    total = float(np.sum(area(ga)))
    orig = parcels_dataset(SF).take_all()
    ga0 = from_wkb([r["geometry"] for r in orig])
    assert abs(total - float(np.sum(area(ga0)))) < 1e-6
    # re-union by orig id gives back one geometry per original
    ids = {r["orig_doc_id"] for r in rows}
    assert ids == {r["doc_id"] for r in orig}
