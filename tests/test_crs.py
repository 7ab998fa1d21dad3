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


def test_lambert72_datum_roundtrip():
    # 31370 goes through the BD72 Helmert datum shift both ways — the
    # roundtrip must close to sub-mm (exact inverse Helmert, iterated
    # geodetic conversion)
    rng = np.random.default_rng(7)
    lon = 2.5 + rng.random(200) * 4.0
    lat = 49.5 + rng.random(200) * 2.0
    x, y = transform_xy(lon, lat, 4326, 31370)
    lon2, lat2 = transform_xy(x, y, 31370, 4326)
    assert np.allclose(lon2, lon, atol=1e-9)
    assert np.allclose(lat2, lat, atol=1e-9)
    # Brussels (4.3517E, 50.8467N) sits near (149km, 170km) on the
    # Belgian Lambert 72 grid — coarse anchor that catches sign/unit
    # errors in the datum shift (a missing shift moves ~100 m; a
    # sign-flipped one ~200 m; wrong projection params kilometres)
    bx, by = transform_xy(np.array([4.3517]), np.array([50.8467]), 4326, 31370)
    assert abs(bx[0] - 149000) < 2000 and abs(by[0] - 170000) < 2000


def test_lambert93_and_utm_south():
    # Paris → RGF93/Lambert-93 ≈ (652.7 km, 6 861.6 km)
    x, y = transform_xy(np.array([2.3522]), np.array([48.8566]), 4326, 2154)
    assert abs(x[0] - 652700) < 2000 and abs(y[0] - 6861600) < 2000
    lon2, lat2 = transform_xy(x, y, 2154, 4326)
    assert abs(lon2[0] - 2.3522) < 1e-9 and abs(lat2[0] - 48.8566) < 1e-9
    # Sydney → UTM 56S: southern false northing keeps y positive
    x, y = transform_xy(np.array([151.2093]), np.array([-33.8688]), 4326, 32756)
    assert abs(x[0] - 334000) < 2500 and abs(y[0] - 6251000) < 2500
    lon2, lat2 = transform_xy(x, y, 32756, 4326)
    assert abs(lon2[0] - 151.2093) < 1e-8 and abs(lat2[0] + 33.8688) < 1e-8
    # ETRS89 UTM 32N equals WGS84 UTM 32N to sub-mm (GRS80 ≈ WGS84)
    lon = np.array([8.5]); lat = np.array([50.0])
    x1, y1 = transform_xy(lon, lat, 4326, 25832)
    x2, y2 = transform_xy(lon, lat, 4326, 32632)
    assert abs(x1[0] - x2[0]) < 1e-6 and abs(y1[0] - y2[0]) < 1e-6


def test_helmert_exact_inverse():
    from geofileops_ray.geom.crs import _HELMERT_BD72, _helmert

    rng = np.random.default_rng(3)
    X = rng.normal(4e6, 1e5, 50)
    Y = rng.normal(3e5, 1e5, 50)
    Z = rng.normal(4.9e6, 1e5, 50)
    X2, Y2, Z2 = _helmert(*_helmert(X, Y, Z, _HELMERT_BD72), _HELMERT_BD72,
                          inverse=True)
    assert np.allclose(X2, X, atol=1e-9)
    assert np.allclose(Y2, Y, atol=1e-9)
    assert np.allclose(Z2, Z, atol=1e-9)


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


def test_albers_5070_properties():
    """EPSG:5070 is pinned by its defining properties: unit scale on
    BOTH standard parallels (29.5/45.5), false origin at the projection
    center, equal-area Jacobian everywhere, machine-exact round-trip."""
    import math

    from geofileops_ray.geom import crs

    x, y = transform_xy(np.array([-96.0]), np.array([23.0]), 4326, 5070)
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    a, e2 = crs._A, crs._E2

    def parallel_scale(lat):
        d = 1e-6
        x1, y1 = transform_xy(np.array([-96.0]), np.array([lat]), 4326, 5070)
        x2, y2 = transform_xy(np.array([-96.0 + d]), np.array([lat]), 4326, 5070)
        n = a / math.sqrt(1 - e2 * math.sin(math.radians(lat)) ** 2)
        return math.hypot(x2[0] - x1[0], y2[0] - y1[0]) / (
            n * math.cos(math.radians(lat)) * math.radians(d)
        )

    assert abs(parallel_scale(29.5) - 1) < 1e-7
    assert abs(parallel_scale(45.5) - 1) < 1e-7
    assert parallel_scale(37.0) < 1.0  # shrinks between the parallels
    assert parallel_scale(50.0) > 1.0  # grows outside
    rng = np.random.default_rng(3)
    lon = rng.uniform(-120, -70, 300)
    lat = rng.uniform(25, 50, 300)
    X, Y = transform_xy(lon, lat, 4326, 5070)
    lo, la = transform_xy(X, Y, 5070, 4326)
    assert np.abs(lo - lon).max() < 1e-10
    assert np.abs(la - lat).max() < 1e-10


def test_laea_3035_properties():
    """EPSG:3035: false origin at (10E, 52N), unit scale at the center
    in both directions, equal-area Jacobian, exact round-trip incl. the
    projection center itself (rho=0 branch)."""
    import math

    from geofileops_ray.geom import crs

    x, y = transform_xy(np.array([10.0]), np.array([52.0]), 4326, 3035)
    assert abs(x[0] - 4321000.0) < 1e-5 and abs(y[0] - 3210000.0) < 1e-5
    lo, la = transform_xy(x, y, 3035, 4326)
    assert abs(lo[0] - 10.0) < 1e-9 and abs(la[0] - 52.0) < 1e-9
    a, e2 = crs._A, crs._E2
    rng = np.random.default_rng(4)
    lon = rng.uniform(-10, 30, 300)
    lat = rng.uniform(35, 70, 300)
    X, Y = transform_xy(lon, lat, 4326, 3035)
    lo, la = transform_xy(X, Y, 3035, 4326)
    assert np.abs(lo - lon).max() < 1e-10
    assert np.abs(la - lat).max() < 1e-10
    # equal-area determinant == ellipsoidal area element
    d = 1e-5
    Xl, Yl = transform_xy(lon + d, lat, 4326, 3035)
    Xp, Yp = transform_xy(lon, lat + d, 4326, 3035)
    det = np.abs((Xl - X) * (Yp - Y) - (Xp - X) * (Yl - Y))
    phir = np.radians(lat)
    n = a / np.sqrt(1 - e2 * np.sin(phir) ** 2)
    m = a * (1 - e2) / (1 - e2 * np.sin(phir) ** 2) ** 1.5
    true = (n * np.cos(phir) * math.radians(d)) * (m * math.radians(d))
    assert np.abs(det / true - 1).max() < 1e-6


def test_epsg_27700_os_worked_example():
    """British National Grid: the projection reproduces the Ordnance
    Survey guide's worked example (OSGB36 52°39'27.2531"N 1°43'4.5177"E
    → E 651409.903 N 313177.270) to sub-mm, hits the false origin
    exactly, and the full WGS84 round trip (incl. the towgs84 Helmert)
    closes within 5 mm."""
    import numpy as np

    from geofileops_ray.geom.crs import (
        _TM_27700,
        _tm_fwd_gen,
        get_crs,
        transform_xy,
    )

    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    x, y = _tm_fwd_gen(np.array([lon]), np.array([lat]), _TM_27700)
    assert abs(x[0] - 651409.903) < 1e-3
    assert abs(y[0] - 313177.270) < 1e-3
    fx, fy = _tm_fwd_gen(np.array([-2.0]), np.array([49.0]), _TM_27700)
    assert abs(fx[0] - 400000.0) < 1e-6 and abs(fy[0] + 100000.0) < 1e-6

    gx = np.array([530000.0, 400000.0, 651409.9])
    gy = np.array([180000.0, -100000.0, 313177.3])
    lon_, lat_ = transform_xy(gx, gy, 27700, 4326)
    bx, by = transform_xy(lon_, lat_, 4326, 27700)
    assert np.abs(bx - gx).max() < 5e-3 and np.abs(by - gy).max() < 5e-3
    assert get_crs(27700).epsg == 27700


def test_epsg_28992_epsg_worked_example():
    """Amersfoort / RD New (oblique stereographic, EPSG method 9809):
    reproduces the EPSG Guidance Note 7-2 worked example (53°N 6°E on
    the Amersfoort datum → E 196105.283 N 557057.739) to sub-mm, hits
    the false origin exactly, and WGS84 round trips close within 5 mm."""
    import numpy as np

    from geofileops_ray.geom.crs import (
        _STEREO_28992,
        _sterea_fwd,
        get_crs,
        transform_xy,
    )

    x, y = _sterea_fwd(np.array([6.0]), np.array([53.0]), _STEREO_28992)
    assert abs(x[0] - 196105.283) < 1e-3
    assert abs(y[0] - 557057.739) < 1e-3
    fx, fy = _sterea_fwd(
        np.array([_STEREO_28992["lon0"]]),
        np.array([_STEREO_28992["lat0"]]),
        _STEREO_28992,
    )
    assert abs(fx[0] - 155000.0) < 1e-6 and abs(fy[0] - 463000.0) < 1e-6

    gx = np.array([155000.0, 196105.283, 80000.0])
    gy = np.array([463000.0, 557057.739, 400000.0])
    lon, lat = transform_xy(gx, gy, 28992, 4326)
    bx, by = transform_xy(lon, lat, 4326, 28992)
    assert np.abs(bx - gx).max() < 5e-3 and np.abs(by - gy).max() < 5e-3
    assert get_crs(28992).epsg == 28992


def test_register_crs_matches_builtins_and_validates():
    """register_crs: a user-registered parameter set must behave exactly
    like the curated builtin it mirrors (Lambert 72 incl. the Helmert),
    and unknown projection engines must refuse."""
    import numpy as np
    import pytest

    from geofileops_ray.geom.crs import (
        _HELMERT_BD72,
        _INTL_A,
        _INTL_F,
        get_crs,
        register_crs,
        transform_xy,
    )

    register_crs(
        990101, "user Lambert 72", "lcc",
        dict(lat1=51.16666723333333, lat2=49.8333339, lat0=90.0,
             lon0=4.367486666666666, x0=150000.013256, y0=5400088.4378),
        ellps=(_INTL_A, _INTL_F), towgs84=_HELMERT_BD72,
    )
    gx = np.array([150000.0, 200000.0, 120000.0])
    gy = np.array([150000.0, 120000.0, 200000.0])
    lon_b, lat_b = transform_xy(gx, gy, 31370, 4326)
    lon_u, lat_u = transform_xy(gx, gy, 990101, 4326)
    assert np.abs(lon_b - lon_u).max() == 0.0
    assert np.abs(lat_b - lat_u).max() == 0.0
    bx, by = transform_xy(lon_u, lat_u, 4326, 990101)
    # datum-shifted round trips close at the Bowring-iteration
    # residual (same as the builtin 31370 path)
    assert np.abs(bx - gx).max() < 5e-3
    assert get_crs(990101).name == "user Lambert 72"

    with pytest.raises(ValueError, match="projection engine"):
        register_crs(990102, "bad", "omerc", {})


def test_register_crs_works_inside_ray_workers(ray_session):
    """The user registry is driver-process-local; reproject must ship a
    snapshot into its worker kernels so a registered CRS works
    end-to-end (review finding: it previously raised in the worker)."""
    import numpy as np

    from geofileops_ray.geom import from_wkb
    from geofileops_ray.geom.crs import register_crs
    from geofileops_ray.io.synth import points_dataset
    from geofileops_ray.stages.single_layer import reproject, warp

    register_crs(
        990201, "user UTM31-like", "tm",
        dict(k0=0.9996, lon0=3.0, x0=500000.0, y0=0.0),
    )
    SF = "/root/testdata/sf0.001"
    ds = warp(points_dataset(SF), (0.01, 0.0, 4.0, 0.0, 0.01, 50.0))
    out = reproject(ds, 4326, 990201).take_all()
    ga = from_wkb([r["geometry"] for r in out])
    assert (np.abs(ga.coords[:, 0]) > 1e5).all()  # projected meters


def test_register_crs_guards():
    import pytest

    from geofileops_ray.geom.crs import register_crs

    with pytest.raises(ValueError, match="builtin"):
        register_crs(4326, "evil", "lcc",
                     dict(lat1=1, lat2=2, lat0=0, lon0=0))
    with pytest.raises(ValueError, match="missing parameters"):
        register_crs(990202, "incomplete", "tm", {})
    from geofileops_ray.stages.geometry_batch import geometry_op

    with pytest.raises(ValueError, match="exactly one"):
        geometry_op(gridsize=0.01)  # neither kernel nor batch_kernel


def test_bundled_epsg_table_breadth():
    """The bundled public EPSG parameter table (geom/epsg_table.py)
    auto-registers ~130 common codes through register_crs; unknown
    codes still raise the clean ValueError."""
    import numpy as np
    import pytest

    from geofileops_ray.geom import crs

    # breadth: at least 120 bundled codes on top of the ~140 builtins
    assert len(crs.KNOWN_CRS) >= 250
    for code in (26918, 28355, 7855, 3006, 5110, 3946, 31467, 2180,
                 2193, 3067, 3301, 3978, 2157, 31256, 4258, 4269):
        assert crs.get_crs(code) is not None

    # round-trip each family representative to sub-mm (degrees)
    cases = [
        (26918, -73.5, 42.1), (28355, 146.0, -37.0), (3006, 15.8, 59.3),
        (5110, 10.7, 59.9), (3946, 4.8, 45.7), (31467, 9.7, 50.1),
        (2180, 21.0, 52.2), (2193, 174.7, -41.3), (3067, 25.0, 62.0),
        (3301, 26.7, 58.4), (3978, -95.0, 60.0), (2157, -6.26, 53.35),
        (31256, 16.37, 48.2),
    ]
    for epsg, lon, lat in cases:
        x, y = crs._from_4326(np.array([lon]), np.array([lat]), epsg)
        lo, la = crs._to_4326(x, y, epsg)
        assert abs(lo[0] - lon) < 1e-7 and abs(la[0] - lat) < 1e-7, epsg

    # southern-hemisphere MGA false northing: Melbourne-ish y < 10^7
    x, y = crs._from_4326(np.array([145.0]), np.array([-37.8]), 28355)
    assert 0 < y[0] < 10_000_000 and 300_000 < x[0] < 700_000

    # unknown code: clean error, not silence
    with pytest.raises(ValueError):
        crs._to_4326(np.array([0.0]), np.array([0.0]), 99999)
