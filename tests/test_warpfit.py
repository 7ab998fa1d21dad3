"""GCP warp fitting (geom/warpfit.py) — the polynomial/TPS surface of
geoops.warp (geoops.py:1561-1612, _geoops_ogr.py:80-108)."""

import numpy as np
import pytest

from geofileops_ray.geom import warpfit


GRID = [(float(x), float(y)) for x in (0, 50, 100) for y in (0, 50, 100)]


def test_polynomial_recovers_exact_quadratic():
    gcps = [
        (x, y, 2.0 + 1.1 * x - 0.2 * y + 0.01 * x * x, -3.0 + 0.9 * y + 0.005 * x * y)
        for x, y in GRID
    ]
    ax, ay, order = warpfit.fit_polynomial(gcps, 2)
    assert order == 2
    x = np.linspace(0, 100, 17)
    y = np.linspace(0, 100, 17)
    nx, ny = warpfit.apply_polynomial(x, y, ax, ay, order)
    assert np.allclose(nx, 2.0 + 1.1 * x - 0.2 * y + 0.01 * x * x)
    assert np.allclose(ny, -3.0 + 0.9 * y + 0.005 * x * y)


def test_polynomial_order3_exact_cubic():
    grid4 = [(float(x), float(y)) for x in (0, 30, 70, 100) for y in (0, 30, 70, 100)]
    gcps = [(x, y, x + 1e-4 * x**3, y - 1e-4 * x * y * y) for x, y in grid4]
    ax, ay, order = warpfit.fit_polynomial(gcps, 3)
    x = np.linspace(5, 95, 13)
    y = np.linspace(5, 95, 13)
    nx, ny = warpfit.apply_polynomial(x, y, ax, ay, order)
    assert np.allclose(nx, x + 1e-4 * x**3)
    assert np.allclose(ny, y - 1e-4 * x * y * y)


def test_default_order_selection():
    assert warpfit.default_order(3) == 1
    assert warpfit.default_order(6) == 2
    assert warpfit.default_order(10) == 3


def test_polynomial_underdetermined_raises():
    gcps = [(0, 0, 0, 0), (1, 0, 1, 0), (0, 1, 0, 1)]
    with pytest.raises(ValueError):
        warpfit.fit_polynomial(gcps, 2)


def test_tps_interpolates_gcps_exactly():
    rng = np.random.default_rng(7)
    gcps = [
        (x, y, x + rng.uniform(-5, 5), y + rng.uniform(-5, 5)) for x, y in GRID
    ]
    src, wx, wy = warpfit.fit_tps(gcps)
    g = np.asarray(gcps)
    nx, ny = warpfit.apply_tps(g[:, 0], g[:, 1], src, wx, wy)
    assert np.allclose(nx, g[:, 2], atol=1e-8)
    assert np.allclose(ny, g[:, 3], atol=1e-8)


def test_tps_affine_input_stays_affine():
    # pure affine gcps → radial weights ~0, tps reduces to the affine map
    gcps = [(x, y, 2 * x + 1, 0.5 * y - 3) for x, y in GRID]
    src, wx, wy = warpfit.fit_tps(gcps)
    assert np.allclose(wx[: len(GRID)], 0, atol=1e-10)
    x = np.array([13.0, 77.7])
    y = np.array([21.5, 4.2])
    nx, ny = warpfit.apply_tps(x, y, src, wx, wy)
    assert np.allclose(nx, 2 * x + 1)
    assert np.allclose(ny, 0.5 * y - 3)
