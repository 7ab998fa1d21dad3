"""CRS / reprojection tests: closed-form mercator, LCC + UTM round-trips
(Snyder formulas vs inverse), copy_layer dst_crs path, and the driver
reproject oracle."""

import numpy as np

from geofileops_ray.geom.crs import get_crs, transform_xy


def test_mercator_exact():
    lon = np.array([0.0, 4.3592158, -71.06])
    lat = np.array([0.0, 50.797815, 42.36])
    x, y = transform_xy(lon, lat, 4326, 3857)
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    # known value: lon 4.3592158 deg -> 485,263.2 m (R*radians)
    assert abs(x[1] - 6378137.0 * np.radians(4.3592158)) < 1e-6
    lon2, lat2 = transform_xy(x, y, 3857, 4326)
    assert np.allclose(lon2, lon, atol=1e-12)
    assert np.allclose(lat2, lat, atol=1e-12)


def test_lcc_and_utm_roundtrip():
    rng = np.random.default_rng(42)
    lon = 2.5 + rng.random(100) * 4.0   # Belgium-ish
    lat = 49.5 + rng.random(100) * 2.0
    for epsg in (3812, 32631):
        x, y = transform_xy(lon, lat, 4326, epsg)
        lon2, lat2 = transform_xy(x, y, epsg, 4326)
        assert np.allclose(lon2, lon, atol=1e-8)
        assert np.allclose(lat2, lat, atol=1e-8)


def test_lcc_3812_known_point():
    # Belgian Lambert 2008 origin: (lon0, lat0) -> (649328, 665262)
    x, y = transform_xy(
        np.array([4.359215833333333]), np.array([50.797815]), 4326, 3812
    )
    assert abs(x[0] - 649328.0) < 0.01
    assert abs(y[0] - 665262.0) < 0.01


def test_get_crs():
    c = get_crs(3812)
    assert c.epsg == 3812 and not c.is_geographic
    assert get_crs(4326).is_geographic
    import pytest

    with pytest.raises(ValueError):
        get_crs(9999)


def test_reproject_dataset(ray_session):
    import ray.data

    from geofileops_ray.io.synth import points_dataset
    from geofileops_ray.stages.single_layer import reproject, warp
    from geofileops_ray.geom import from_wkb

    SF = "/root/testdata/sf0.001"
    ds = warp(points_dataset(SF), (0.01, 0.0, 4.0, 0.0, 0.01, 50.0))
    out = reproject(ds, 4326, 3857).take_all()
    ga = from_wkb([r["geometry"] for r in out])
    assert (np.abs(ga.coords[:, 0]) > 1e5).all()  # meters now
