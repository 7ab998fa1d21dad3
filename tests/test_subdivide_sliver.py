"""Auto-subdivide in two-layer ops (reference complexpoly benchmarks,
_geoops_sql.py:1893-1929) + the sliver filter (_get_sliver_where)."""

import numpy as np
import pyarrow as pa
import pytest


def _circle_poly(cx, cy, r, n):
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    return np.concatenate([ring, ring[:1]])


def _ds(rows):
    import ray.data

    from geofileops_ray.geom import GeometryArray, to_wkb

    ga = GeometryArray.from_parts([(3, [[ring]]) for _i, ring in rows])
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _r in rows], pa.int64()),
                "geometry": pa.array(to_wkb(ga), pa.binary()),
            }
        )
    )


@pytest.fixture(scope="module")
def complex_layer(ray_session):
    # 2 huge polygons (12k coords each) — over the 2000-coord trigger
    return _ds([(100, _circle_poly(50, 50, 45, 12000)),
                (101, _circle_poly(160, 50, 40, 12000))])


def test_export_by_location_subdivides(ray_session, complex_layer):
    from geofileops_ray.io.synth import parcels_dataset
    from geofileops_ray.stages.overlay_ops import _max_coords_estimate
    from geofileops_ray.stages.spatial_join import export_by_location

    assert _max_coords_estimate(complex_layer) > 2000
    p = parcels_dataset("/root/testdata/sf0.001")
    got = sorted(
        r["l1_doc_id"]
        for r in export_by_location(p, complex_layer, "intersects is True").take_all()
    )
    assert len(got) > 0
    # ground truth: centroid-circle distance math on the rect parcels is
    # complex; instead compare against the generic join (no subdivision
    # on the join path)
    from geofileops_ray.stages.spatial_join import join_by_location

    want = sorted(
        {r["l1_doc_id"] for r in join_by_location(
            p, complex_layer, "intersects is True", cols1=[], cols2=[]
        ).take_all()}
    )
    assert got == want


def test_difference_subdivided_matches_unsubdivided(ray_session, complex_layer):
    from geofileops_ray.geom import from_wkb
    from geofileops_ray.geom.measure import area
    from geofileops_ray.io.synth import parcels_dataset
    from geofileops_ray.stages.overlay_ops import difference

    p = parcels_dataset("/root/testdata/sf0.001")

    def areas(ds):
        rows = ds.take_all()
        ga = from_wkb([r["geometry"] for r in rows])
        return {r["l1_doc_id"]: round(float(a), 6) for r, a in zip(rows, area(ga))}

    got = areas(difference(p, complex_layer, cols1=[]))          # triggers subdivide
    want = areas(difference(p, complex_layer, cols1=[], subdivide_coords=10**9))
    assert got == want


def test_sliver_filter(ray_session):
    from geofileops_ray.geom import GeometryArray
    from geofileops_ray.stages.overlay_ops import _sliver_keep_mask

    fat = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    thin = np.array([[0, 0], [10, 0], [10, 0.0004], [0, 0.0004], [0, 0]], float)
    ga = GeometryArray.from_parts([(3, [[fat]]), (3, [[thin]])])
    keep = _sliver_keep_mask(ga, 0.001)
    assert keep.tolist() == [True, False]
    only_slivers = _sliver_keep_mask(ga, -0.001)
    assert only_slivers.tolist() == [False, True]
