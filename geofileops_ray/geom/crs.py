"""CRS model + vectorized reprojection (no external proj library).

The reference exposes CRS through ``LayerInfo.crs`` / ``get_crs``
(geofileops fileops.py:216-286, :2611-2705) and reprojects in
``copy_layer(dst_crs=...)`` (fileops.py:3043-3373, backed by pyproj).
This module provides the same surface from public projection formulas
(Snyder, "Map Projections — A Working Manual", USGS PP 1395):

* EPSG:4326  — geographic WGS84 (degrees)
* EPSG:3857  — spherical web mercator (exact closed form, SQL-mirrorable)
* EPSG:3812  — Belgian Lambert 2008 (ellipsoidal Lambert Conformal Conic
  2SP on GRS80 — the reference test corpus's home projection family)
* EPSG:31370 — Belgian Lambert 72 (the reference's default test CRS,
  e.g. tests/test_helper.py): LCC 2SP on the International 1924
  ellipsoid + the published 7-parameter BD72→WGS84 Helmert shift
  (position-vector convention, the standard towgs84 for this code)
* EPSG:2154  — RGF93 / Lambert-93 (LCC 2SP on GRS80, no datum shift)
* EPSG:326xx / 327xx — WGS84 UTM north / south zones (ellipsoidal
  transverse mercator, series expansion; south = 10 000 km false
  northing)
* EPSG:258xx — ETRS89 / UTM zones 25828-25838 (GRS80 ≡ WGS84 to <1e-9
  flattening; treated as WGS84 UTM north)
* EPSG:5070  — NAD83 / Conus Albers (ellipsoidal Albers equal-area
  conic, Snyder pp. 98-103; NAD83 treated as WGS84, ~1-2 m)
* EPSG:3035 — ETRS89-extended / LAEA Europe (ellipsoidal Lambert
  azimuthal equal-area, oblique form, Snyder pp. 182-190)
* EPSG:27700 — OSGB36 / British National Grid (TM on Airy 1830 +
  towgs84 Helmert; OSTN15 grid shifts need external data)
* EPSG:28992 — Amersfoort / RD New (oblique stereographic, EPSG
  method 9809, Bessel 1841 + Amersfoort towgs84 Helmert)

All transforms go through 4326 as the hub and are vectorized numpy over
the coordinate slab (one pass per batch — no per-geometry python).
Datum shifts run geodetic → ECEF → Helmert → geodetic, also fully
vectorized.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

# WGS84 / GRS80 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257222101  # GRS80 flattening (≈ WGS84 to < 1e-9)
_E2 = _F * (2 - _F)
_E = math.sqrt(_E2)
_R = 6378137.0  # spherical web-mercator radius

# International 1924 (Hayford) ellipsoid — datum of Belgian Lambert 72
_INTL_A = 6378388.0
_INTL_F = 1.0 / 297.0
_INTL_E2 = _INTL_F * (2 - _INTL_F)


@dataclass(frozen=True)
class CRS:
    epsg: int
    name: str
    is_geographic: bool

    def __str__(self) -> str:  # pyproj-ish repr
        return f"EPSG:{self.epsg}"


_LCC_3812 = dict(lat1=49.833333333333336, lat2=51.166666666666664,
                 lat0=50.797815, lon0=4.359215833333333,
                 x0=649328.0, y0=665262.0)

# RGF93 / Lambert-93 (proj: +proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5
# +lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80) — no datum shift.
_LCC_2154 = dict(lat1=49.0, lat2=44.0, lat0=46.5, lon0=3.0,
                 x0=700000.0, y0=6600000.0)

# Belgian Lambert 72 (proj: +proj=lcc +lat_1=51.16666723333333
# +lat_2=49.8333339 +lat_0=90 +lon_0=4.367486666666666
# +x_0=150000.013256 +y_0=5400088.4378 +ellps=intl) on BD72; the datum
# shift to WGS84 is the published towgs84 7-parameter Helmert below.
_LCC_31370 = dict(lat1=51.16666723333333, lat2=49.8333339, lat0=90.0,
                  lon0=4.367486666666666, x0=150000.013256,
                  y0=5400088.4378, a=_INTL_A, e2=_INTL_E2)

# BD72 → WGS84 position-vector Helmert (the standard +towgs84= for
# EPSG:31370: tx ty tz [m], rx ry rz [arc-sec], ds [ppm]).
_HELMERT_BD72 = (-106.868628, 52.297783, -103.723893,
                 0.336570, -0.456955, 1.842183, -1.2747)


def _known() -> dict[int, CRS]:
    out = {
        4326: CRS(4326, "WGS 84", True),
        3857: CRS(3857, "WGS 84 / Pseudo-Mercator", False),
        3812: CRS(3812, "ETRS89 / Belgian Lambert 2008", False),
        31370: CRS(31370, "BD72 / Belgian Lambert 72", False),
        2154: CRS(2154, "RGF93 v1 / Lambert-93", False),
        5070: CRS(5070, "NAD83 / Conus Albers", False),
        3035: CRS(3035, "ETRS89-extended / LAEA Europe", False),
        27700: CRS(27700, "OSGB36 / British National Grid", False),
        28992: CRS(28992, "Amersfoort / RD New", False),
    }
    for z in range(1, 61):
        out[32600 + z] = CRS(32600 + z, f"WGS 84 / UTM zone {z}N", False)
        out[32700 + z] = CRS(32700 + z, f"WGS 84 / UTM zone {z}S", False)
    for z in range(28, 39):
        out[25800 + z] = CRS(25800 + z, f"ETRS89 / UTM zone {z}N", False)
    return out


KNOWN_CRS = _known()


def get_crs(epsg: int | None) -> CRS | None:
    """CRS object for an epsg code (get_crs analogue)."""
    if epsg is None:
        return None
    try:
        return KNOWN_CRS[int(epsg)]
    except KeyError:
        raise ValueError(
            f"unsupported EPSG:{epsg}; known: 4326, 3857, 3812, 31370, "
            "2154, 5070, 3035, 27700, 28992, 326xx/327xx (UTM), 25828-25838"
        )


# ----------------------------------------------------------- web mercator


def _merc_fwd(lon: np.ndarray, lat: np.ndarray):
    x = _R * np.radians(lon)
    y = _R * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    return x, y


def _merc_inv(x: np.ndarray, y: np.ndarray):
    lon = np.degrees(x / _R)
    lat = np.degrees(2 * np.arctan(np.exp(y / _R)) - np.pi / 2)
    return lon, lat


# ------------------------------------------------- Lambert conformal conic


def _lcc_consts(p):
    a = p.get("a", _A)
    e2 = p.get("e2", _E2)
    e = math.sqrt(e2)

    def m(phi):
        return math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)

    def t(phi):
        return math.tan(math.pi / 4 - phi / 2) / (
            (1 - e * math.sin(phi)) / (1 + e * math.sin(phi))
        ) ** (e / 2)

    p1, p2, p0 = map(math.radians, (p["lat1"], p["lat2"], p["lat0"]))
    n = (math.log(m(p1)) - math.log(m(p2))) / (math.log(t(p1)) - math.log(t(p2)))
    F = m(p1) / (n * t(p1) ** n)
    rho0 = a * F * t(p0) ** n  # lat0=90 ⇒ t(p0)=0 ⇒ rho0=0 (Lambert 72)
    return n, F, rho0, a, e


def _lcc_fwd(lon, lat, p):
    n, F, rho0, a, e = _lcc_consts(p)
    phi = np.radians(lat)
    sphi = np.sin(phi)
    t = np.tan(np.pi / 4 - phi / 2) / ((1 - e * sphi) / (1 + e * sphi)) ** (e / 2)
    rho = a * F * t**n
    th = n * np.radians(lon - p["lon0"])
    return p["x0"] + rho * np.sin(th), p["y0"] + rho0 - rho * np.cos(th)


def _lcc_inv(x, y, p):
    n, F, rho0, a, e = _lcc_consts(p)
    dx = x - p["x0"]
    dy = rho0 - (y - p["y0"])
    rho = np.sign(n) * np.hypot(dx, dy)
    t = (rho / (a * F)) ** (1 / n)
    th = np.arctan2(dx, dy)
    lon = np.degrees(th / n) + p["lon0"]
    # iterate for phi
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(6):
        sphi = np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(
            t * ((1 - e * sphi) / (1 + e * sphi)) ** (e / 2)
        )
    return lon, np.degrees(phi)


# ---------------------------------------------------- transverse mercator
# Snyder USGS PP 1395 series (pp. 60-64), parameterized over ellipsoid
# and origin so one implementation serves UTM (WGS84/ETRS89, lat0=0,
# k0=0.9996, x0=500km) and national TM grids (27700: Airy 1830, offset
# false origin, k0=0.9996012717).

_K0 = 0.9996


def _tm_meridian_arc(phi, a, e2):
    e4, e6 = e2**2, e2**3
    return a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )


def _tm_fwd_gen(lon, lat, p):
    a, e2, k0 = p["a"], p["e2"], p["k0"]
    phi = np.radians(lat)
    lam = np.radians(lon - p["lon0"])
    ep2 = e2 / (1 - e2)
    N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    T = np.tan(phi) ** 2
    C = ep2 * np.cos(phi) ** 2
    Aq = lam * np.cos(phi)
    M = _tm_meridian_arc(phi, a, e2)
    M0 = _tm_meridian_arc(math.radians(p["lat0"]), a, e2) if p["lat0"] else 0.0
    x = k0 * N * (
        Aq + (1 - T + C) * Aq**3 / 6 + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * Aq**5 / 120
    ) + p["x0"]
    y = k0 * (
        (M - M0)
        + N * np.tan(phi) * (
            Aq**2 / 2
            + (5 - T + 9 * C + 4 * C**2) * Aq**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * Aq**6 / 720
        )
    )
    return x, p["y0"] + y


def _tm_inv_gen(x, y, p):
    a, e2, k0 = p["a"], p["e2"], p["k0"]
    ep2 = e2 / (1 - e2)
    e4, e6 = e2**2, e2**3
    M0 = _tm_meridian_arc(math.radians(p["lat0"]), a, e2) if p["lat0"] else 0.0
    M = M0 + (y - p["y0"]) / k0
    mu = M / (a * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    C1 = ep2 * np.cos(phi1) ** 2
    T1 = np.tan(phi1) ** 2
    N1 = a / np.sqrt(1 - e2 * np.sin(phi1) ** 2)
    R1 = a * (1 - e2) / (1 - e2 * np.sin(phi1) ** 2) ** 1.5
    D = (x - p["x0"]) / (N1 * k0)
    phi = phi1 - (N1 * np.tan(phi1) / R1) * (
        D**2 / 2
        - (5 + 3 * T1 + 10 * C1 - 4 * C1**2 - 9 * ep2) * D**4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1**2 - 252 * ep2 - 3 * C1**2) * D**6 / 720
    )
    lam = (
        D
        - (1 + 2 * T1 + C1) * D**3 / 6
        + (5 - 2 * C1 + 28 * T1 - 3 * C1**2 + 8 * ep2 + 24 * T1**2) * D**5 / 120
    ) / np.cos(phi1)
    return np.degrees(lam) + p["lon0"], np.degrees(phi)


def _utm_params(lon0, y0=0.0):
    return dict(a=_A, e2=_E2, k0=_K0, lon0=lon0, lat0=0.0, x0=500000.0, y0=y0)


def _tm_fwd(lon, lat, lon0, y0=0.0):
    return _tm_fwd_gen(lon, lat, _utm_params(lon0, y0))


def _tm_inv(x, y, lon0, y0=0.0):
    return _tm_inv_gen(x, y, _utm_params(lon0, y0))


# EPSG:27700 OSGB36 / British National Grid: TM on Airy 1830 with the
# published projection constants; datum shift via the standard towgs84
# position-vector Helmert for OSGB36 (±2 m class vs OSTN15 — documented;
# the grid-shift file is out of scope without external data).
_AIRY_A = 6377563.396
_AIRY_B = 6356256.909
_TM_27700 = dict(
    a=_AIRY_A,
    e2=1.0 - (_AIRY_B / _AIRY_A) ** 2,
    k0=0.9996012717,
    lon0=-2.0,
    lat0=49.0,
    x0=400000.0,
    y0=-100000.0,
)
_HELMERT_OSGB36 = (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)


def _osgb36_to_wgs84(lon, lat):
    X, Y, Z = _geodetic_to_ecef(lon, lat, _AIRY_A, _TM_27700["e2"])
    X, Y, Z = _helmert(X, Y, Z, _HELMERT_OSGB36)
    return _ecef_to_geodetic(X, Y, Z, _A, _E2)


def _wgs84_to_osgb36(lon, lat):
    X, Y, Z = _geodetic_to_ecef(lon, lat, _A, _E2)
    X, Y, Z = _helmert(X, Y, Z, _HELMERT_OSGB36, inverse=True)
    return _ecef_to_geodetic(X, Y, Z, _AIRY_A, _TM_27700["e2"])


# ------------------------------------------------ oblique stereographic
# EPSG method 9809 (Guidance Note 7-2): conformal-sphere double
# stereographic — EPSG:28992 Amersfoort / RD New on Bessel 1841, the
# Netherlands' national grid. Datum shift: the published towgs84
# position-vector Helmert for Amersfoort.

_BESSEL_A = 6377397.155
_BESSEL_F = 1.0 / 299.1528128
_BESSEL_E2 = _BESSEL_F * (2 - _BESSEL_F)
_STEREO_28992 = dict(
    a=_BESSEL_A,
    e2=_BESSEL_E2,
    lat0=52.0 + 9.0 / 60 + 22.178 / 3600,
    lon0=5.0 + 23.0 / 60 + 15.500 / 3600,
    k0=0.9999079,
    x0=155000.0,
    y0=463000.0,
)
_HELMERT_AMERSFOORT = (
    565.417, 50.3319, 465.552, -0.398957, 0.343988, -1.87740, 4.0725
)


def _sterea_consts(p):
    a, e2 = p["a"], p["e2"]
    e = math.sqrt(e2)
    phi0 = math.radians(p["lat0"])
    s0 = math.sin(phi0)
    rho0 = a * (1 - e2) / (1 - e2 * s0 * s0) ** 1.5
    nu0 = a / math.sqrt(1 - e2 * s0 * s0)
    R = math.sqrt(rho0 * nu0)
    n = math.sqrt(1 + e2 * math.cos(phi0) ** 4 / (1 - e2))
    S1 = (1 + s0) / (1 - s0)
    S2 = (1 - e * s0) / (1 + e * s0)
    w1 = (S1 * S2**e) ** n
    sin_chi0 = (w1 - 1) / (w1 + 1)
    c = (n + s0) * (1 - sin_chi0) / ((n - s0) * (1 + sin_chi0))
    w2 = c * w1
    chi0 = math.asin((w2 - 1) / (w2 + 1))
    return a, e2, e, R, n, c, chi0, math.radians(p["lon0"])


def _sterea_fwd(lon, lat, p):
    a, e2, e, R, n, c, chi0, lam0 = _sterea_consts(p)
    k0, x0, y0 = p["k0"], p["x0"], p["y0"]
    phi = np.radians(lat)
    lam = np.radians(lon)
    Lam = n * (lam - lam0) + lam0
    s = np.sin(phi)
    Sa = (1 + s) / (1 - s)
    Sb = (1 - e * s) / (1 + e * s)
    w = c * (Sa * Sb**e) ** n
    chi = np.arcsin((w - 1) / (w + 1))
    dl = Lam - lam0
    B = 1 + np.sin(chi) * math.sin(chi0) + np.cos(chi) * math.cos(chi0) * np.cos(dl)
    x = x0 + 2 * R * k0 * np.cos(chi) * np.sin(dl) / B
    y = y0 + 2 * R * k0 * (
        np.sin(chi) * math.cos(chi0) - np.cos(chi) * math.sin(chi0) * np.cos(dl)
    ) / B
    return x, y


def _sterea_inv(x, y, p):
    a, e2, e, R, n, c, chi0, lam0 = _sterea_consts(p)
    k0, x0, y0 = p["k0"], p["x0"], p["y0"]
    Ep = np.asarray(x, np.float64) - x0
    Np = np.asarray(y, np.float64) - y0
    g = 2 * R * k0 * math.tan(math.pi / 4 - chi0 / 2)
    h = 4 * R * k0 * math.tan(chi0) + g
    i = np.arctan2(Ep, h + Np)
    j = np.arctan2(Ep, g - Np) - i
    chi = chi0 + 2 * np.arctan((Np - Ep * np.tan(j / 2)) / (2 * R * k0))
    Lam = j + 2 * i + lam0
    lam = (Lam - lam0) / n + lam0
    # isometric latitude on the conformal sphere → ellipsoidal phi
    psi = 0.5 * np.log((1 + np.sin(chi)) / (c * (1 - np.sin(chi)))) / n
    phi = 2 * np.arctan(np.exp(psi)) - math.pi / 2
    for _ in range(6):
        s = np.sin(phi)
        psi_i = np.log(
            np.tan(phi / 2 + math.pi / 4) * ((1 - e * s) / (1 + e * s)) ** (e / 2)
        )
        phi = phi - (psi_i - psi) * np.cos(phi) * (1 - e2 * s * s) / (1 - e2)
    return np.degrees(lam), np.degrees(phi)


def _rd_to_wgs84(lon, lat):
    X, Y, Z = _geodetic_to_ecef(lon, lat, _BESSEL_A, _BESSEL_E2)
    X, Y, Z = _helmert(X, Y, Z, _HELMERT_AMERSFOORT)
    return _ecef_to_geodetic(X, Y, Z, _A, _E2)


def _wgs84_to_rd(lon, lat):
    X, Y, Z = _geodetic_to_ecef(lon, lat, _A, _E2)
    X, Y, Z = _helmert(X, Y, Z, _HELMERT_AMERSFOORT, inverse=True)
    return _ecef_to_geodetic(X, Y, Z, _BESSEL_A, _BESSEL_E2)


# --------------------------------------------------- datum shift (Helmert)


def _geodetic_to_ecef(lon, lat, a, e2):
    """Geodetic lon/lat (degrees, h=0) → geocentric XYZ on the given
    ellipsoid. Vectorized."""
    lam = np.radians(lon)
    phi = np.radians(lat)
    sphi = np.sin(phi)
    N = a / np.sqrt(1 - e2 * sphi**2)
    cphi = np.cos(phi)
    return N * cphi * np.cos(lam), N * cphi * np.sin(lam), N * (1 - e2) * sphi


def _ecef_to_geodetic(X, Y, Z, a, e2):
    """Geocentric XYZ → geodetic lon/lat (degrees), Bowring-style fixed
    point iteration (mm-converged in ≤5 rounds at h≈0)."""
    lon = np.degrees(np.arctan2(Y, X))
    p = np.hypot(X, Y)
    phi = np.arctan2(Z, p * (1 - e2))
    for _ in range(5):
        sphi = np.sin(phi)
        N = a / np.sqrt(1 - e2 * sphi**2)
        phi = np.arctan2(Z + e2 * N * sphi, p)
    return lon, np.degrees(phi)


def _helmert(X, Y, Z, params, inverse=False):
    """7-parameter similarity transform, position-vector convention
    (EPSG method 9606): X' = (1+ds)·R·X + T with R the small-angle
    rotation [[1,-rz,ry],[rz,1,-rx],[-ry,rx,1]]. `inverse` applies the
    exact reverse of the forward transform (not the negated-parameter
    approximation)."""
    tx, ty, tz, rx, ry, rz, ds = params
    rx, ry, rz = (math.radians(v / 3600.0) for v in (rx, ry, rz))
    s = 1.0 + ds * 1e-6
    if not inverse:
        return (
            s * (X - rz * Y + ry * Z) + tx,
            s * (rz * X + Y - rx * Z) + ty,
            s * (-ry * X + rx * Y + Z) + tz,
        )
    U, V, W = (X - tx) / s, (Y - ty) / s, (Z - tz) / s
    # invert the small-angle rotation exactly (transpose = inverse only
    # to first order; solve the 3x3 instead — scalar closed form)
    det = 1 + rx * rx + ry * ry + rz * rz
    return (
        (U * (1 + rx * rx) + V * (rz + rx * ry) + W * (rx * rz - ry)) / det,
        (U * (rx * ry - rz) + V * (1 + ry * ry) + W * (rx + ry * rz)) / det,
        (U * (ry + rx * rz) + V * (ry * rz - rx) + W * (1 + rz * rz)) / det,
    )


def _bd72_to_wgs84(lon, lat):
    X, Y, Z = _geodetic_to_ecef(lon, lat, _INTL_A, _INTL_E2)
    X, Y, Z = _helmert(X, Y, Z, _HELMERT_BD72)
    return _ecef_to_geodetic(X, Y, Z, _A, _E2)


def _wgs84_to_bd72(lon, lat):
    X, Y, Z = _geodetic_to_ecef(lon, lat, _A, _E2)
    X, Y, Z = _helmert(X, Y, Z, _HELMERT_BD72, inverse=True)
    return _ecef_to_geodetic(X, Y, Z, _INTL_A, _INTL_E2)


# ---------------------------------------------- equal-area projections
# Snyder, USGS PP 1395: Albers equal-area conic (pp. 98-103) and Lambert
# azimuthal equal-area, ellipsoidal oblique form (pp. 182-190). Both on
# GRS80; NAD83 / ETRS89 are treated as WGS84 (≈1-2 m datum offset,
# far below these projections' own use cases — documented restriction).

# EPSG:5070 NAD83 / Conus Albers
_AEA_5070 = dict(lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0, x0=0.0, y0=0.0)
# EPSG:3035 ETRS89-extended / LAEA Europe
_LAEA_3035 = dict(lat0=52.0, lon0=10.0, x0=4321000.0, y0=3210000.0)


def _q_auth(sphi: np.ndarray) -> np.ndarray:
    """Authalic q(φ) given sin(φ) (Snyder 3-12)."""
    es = _E * sphi
    return (1.0 - _E2) * (
        sphi / (1.0 - _E2 * sphi * sphi)
        - (1.0 / (2.0 * _E)) * np.log((1.0 - es) / (1.0 + es))
    )


def _phi_from_q(q: np.ndarray) -> np.ndarray:
    """Invert q(φ) by Snyder 3-16 iteration (converges quadratically)."""
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(6):
        s = np.sin(phi)
        es = _E * s
        one = 1.0 - _E2 * s * s
        cphi = np.cos(phi)
        # at the poles the correction is 0/0 — q is exactly ±q_pole there
        cphi = np.where(np.abs(cphi) < 1e-12, 1e-12, cphi)
        phi = phi + (one * one / (2.0 * cphi)) * (
            q / (1.0 - _E2)
            - s / one
            + (1.0 / (2.0 * _E)) * np.log((1.0 - es) / (1.0 + es))
        )
    return phi


def _aea_consts(p):
    s1, s2, s0 = (
        math.sin(math.radians(p["lat1"])),
        math.sin(math.radians(p["lat2"])),
        math.sin(math.radians(p["lat0"])),
    )
    c1, c2 = math.cos(math.radians(p["lat1"])), math.cos(math.radians(p["lat2"]))
    m1 = c1 / math.sqrt(1 - _E2 * s1 * s1)
    m2 = c2 / math.sqrt(1 - _E2 * s2 * s2)
    q1 = float(_q_auth(np.float64(s1)))
    q2 = float(_q_auth(np.float64(s2)))
    q0 = float(_q_auth(np.float64(s0)))
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = _A * math.sqrt(C - n * q0) / n
    return n, C, rho0


def _aea_fwd(lon, lat, p):
    n, C, rho0 = _aea_consts(p)
    q = _q_auth(np.sin(np.radians(lat)))
    rho = _A * np.sqrt(np.maximum(C - n * q, 0.0)) / n
    th = n * np.radians(lon - p["lon0"])
    return p["x0"] + rho * np.sin(th), p["y0"] + rho0 - rho * np.cos(th)


def _aea_inv(x, y, p):
    n, C, rho0 = _aea_consts(p)
    xp = np.asarray(x, np.float64) - p["x0"]
    yp = rho0 - (np.asarray(y, np.float64) - p["y0"])
    rho = np.hypot(xp, yp)
    q = (C - (rho * n / _A) ** 2) / n
    th = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
    lon = p["lon0"] + np.degrees(th / n)
    return lon, np.degrees(_phi_from_q(q))


def _laea_consts(p):
    s0 = math.sin(math.radians(p["lat0"]))
    c0 = math.cos(math.radians(p["lat0"]))
    qp = float(_q_auth(np.float64(1.0)))
    q0 = float(_q_auth(np.float64(s0)))
    b0 = math.asin(min(max(q0 / qp, -1.0), 1.0))
    rq = _A * math.sqrt(qp / 2.0)
    m0 = c0 / math.sqrt(1 - _E2 * s0 * s0)
    D = _A * m0 / (rq * math.cos(b0))
    return qp, b0, rq, D


def _laea_fwd(lon, lat, p):
    qp, b0, rq, D = _laea_consts(p)
    q = _q_auth(np.sin(np.radians(lat)))
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    dl = np.radians(lon - p["lon0"])
    denom = 1.0 + math.sin(b0) * np.sin(beta) + math.cos(b0) * np.cos(beta) * np.cos(dl)
    B = rq * np.sqrt(2.0 / np.maximum(denom, 1e-300))
    x = p["x0"] + B * D * np.cos(beta) * np.sin(dl)
    y = p["y0"] + (B / D) * (
        math.cos(b0) * np.sin(beta) - math.sin(b0) * np.cos(beta) * np.cos(dl)
    )
    return x, y


def _laea_inv(x, y, p):
    qp, b0, rq, D = _laea_consts(p)
    xp = (np.asarray(x, np.float64) - p["x0"]) / D
    yp = (np.asarray(y, np.float64) - p["y0"]) * D
    rho = np.hypot(xp, yp)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
    sce, cce = np.sin(ce), np.cos(ce)
    safe_rho = np.where(rho == 0.0, 1.0, rho)
    q = qp * (cce * math.sin(b0) + yp * sce * math.cos(b0) / safe_rho)
    q = np.where(rho == 0.0, qp * math.sin(b0), q)
    lon = p["lon0"] + np.degrees(
        np.arctan2(
            xp * sce,
            safe_rho * math.cos(b0) * cce - yp * math.sin(b0) * sce,
        )
    )
    lon = np.where(rho == 0.0, p["lon0"], lon)
    return lon, np.degrees(_phi_from_q(q))


# ------------------------------------------------------------ public API


# ------------------------------------------------- user-registered CRS
# The sandbox has no pyproj, so "arbitrary EPSG" cannot resolve from a
# parameter database — but any CRS expressible in the implemented
# projection engines CAN be registered at runtime with its proj-style
# parameters. This turns the curated builtin list into an open surface:
# the builtins themselves are just pre-registered parameter sets.

_USER_CRS: dict[int, dict] = {}


def register_crs(
    epsg: int,
    name: str,
    proj: str,
    params: dict | None = None,
    ellps: tuple[float, float] | None = None,
    towgs84: tuple | None = None,
) -> CRS:
    """Register a CRS from projection parameters (copy_layer/reproject
    accept it immediately). ``proj``: 'lcc' (2SP: lat1/lat2/lat0/lon0/
    x0/y0), 'tm' (k0/lon0/lat0/x0/y0), 'sterea' (k0/lat0/lon0/x0/y0) or
    'longlat'. ``ellps`` = (a, f) — defaults to GRS80/WGS84.
    ``towgs84`` = the 7-parameter position-vector Helmert to WGS84
    (tx ty tz [m], rx ry rz [arc-sec], ds [ppm]) when the datum is not
    WGS84-equivalent."""
    _REQUIRED = {
        "lcc": ("lat1", "lat2", "lat0", "lon0"),
        "tm": ("k0", "lon0"),
        "sterea": ("k0", "lat0", "lon0"),
        "longlat": (),
    }
    if proj not in _REQUIRED:
        raise ValueError(
            f"unsupported projection engine {proj!r}; available: "
            "lcc, tm, sterea, longlat"
        )
    missing = [k for k in _REQUIRED[proj] if k not in (params or {})]
    if missing:
        # fail at the call site, not as a KeyError inside a Ray worker
        raise ValueError(f"{proj} registration missing parameters: {missing}")
    if int(epsg) in KNOWN_CRS and int(epsg) not in _USER_CRS:
        # never shadow a builtin (registering 4326 would corrupt the
        # hub itself); re-registering one's OWN code is allowed
        raise ValueError(
            f"EPSG:{epsg} is a builtin CRS and cannot be overridden"
        )
    a, f = ellps if ellps is not None else (_A, _F)
    e2 = f * (2.0 - f)
    p = dict(params or {})
    p["a"], p["e2"] = a, e2
    p.setdefault("x0", 0.0)
    p.setdefault("y0", 0.0)
    p.setdefault("lat0", 0.0)
    entry = dict(
        name=name, proj=proj, p=p, a=a, e2=e2,
        towgs84=tuple(towgs84) if towgs84 else None,
    )
    _USER_CRS[int(epsg)] = entry
    crs = CRS(int(epsg), name, proj == "longlat")
    KNOWN_CRS[int(epsg)] = crs
    return crs


def user_crs_snapshot() -> dict:
    """Driver-side snapshot of the user CRS registry — ship it into
    worker closures and re-install with ``install_user_crs`` (module
    state does NOT travel to Ray workers on its own)."""
    return {k: dict(v) for k, v in _USER_CRS.items()}


def install_user_crs(snapshot: dict) -> None:
    """Install a driver-captured registry in this process (idempotent;
    called at the top of worker kernels that may see user CRS)."""
    for k, v in snapshot.items():
        if k not in _USER_CRS:
            _USER_CRS[k] = v
            KNOWN_CRS[k] = CRS(int(k), v["name"], v["proj"] == "longlat")


def _user_to_4326(x, y, u):
    proj, p = u["proj"], u["p"]
    if proj == "lcc":
        lon, lat = _lcc_inv(x, y, p)
    elif proj == "tm":
        lon, lat = _tm_inv_gen(x, y, p)
    elif proj == "sterea":
        lon, lat = _sterea_inv(x, y, p)
    else:  # longlat
        lon, lat = np.asarray(x, np.float64), np.asarray(y, np.float64)
    if u["towgs84"]:
        X, Y, Z = _geodetic_to_ecef(lon, lat, u["a"], u["e2"])
        X, Y, Z = _helmert(X, Y, Z, u["towgs84"])
        lon, lat = _ecef_to_geodetic(X, Y, Z, _A, _E2)
    return lon, lat


def _user_from_4326(lon, lat, u):
    if u["towgs84"]:
        X, Y, Z = _geodetic_to_ecef(lon, lat, _A, _E2)
        X, Y, Z = _helmert(X, Y, Z, u["towgs84"], inverse=True)
        lon, lat = _ecef_to_geodetic(X, Y, Z, u["a"], u["e2"])
    proj, p = u["proj"], u["p"]
    if proj == "lcc":
        return _lcc_fwd(lon, lat, p)
    if proj == "tm":
        return _tm_fwd_gen(lon, lat, p)
    if proj == "sterea":
        return _sterea_fwd(lon, lat, p)
    return lon, lat


def _to_4326(x, y, epsg: int):
    u = _USER_CRS.get(epsg)
    if u is not None:
        return _user_to_4326(x, y, u)
    if epsg == 4326:
        return x, y
    if epsg == 3857:
        return _merc_inv(x, y)
    if epsg == 3812:
        return _lcc_inv(x, y, _LCC_3812)
    if epsg == 2154:
        return _lcc_inv(x, y, _LCC_2154)
    if epsg == 31370:
        return _bd72_to_wgs84(*_lcc_inv(x, y, _LCC_31370))
    if epsg == 5070:
        return _aea_inv(x, y, _AEA_5070)
    if epsg == 3035:
        return _laea_inv(x, y, _LAEA_3035)
    if epsg == 27700:
        return _osgb36_to_wgs84(*_tm_inv_gen(x, y, _TM_27700))
    if epsg == 28992:
        return _rd_to_wgs84(*_sterea_inv(x, y, _STEREO_28992))
    if 32601 <= epsg <= 32660:
        return _tm_inv(x, y, (epsg - 32600) * 6 - 183)
    if 32701 <= epsg <= 32760:
        return _tm_inv(x, y, (epsg - 32700) * 6 - 183, y0=10_000_000.0)
    if 25828 <= epsg <= 25838:
        return _tm_inv(x, y, (epsg - 25800) * 6 - 183)
    raise ValueError(f"unsupported EPSG:{epsg}")


def _from_4326(lon, lat, epsg: int):
    u = _USER_CRS.get(epsg)
    if u is not None:
        return _user_from_4326(lon, lat, u)
    if epsg == 4326:
        return lon, lat
    if epsg == 3857:
        return _merc_fwd(lon, lat)
    if epsg == 3812:
        return _lcc_fwd(lon, lat, _LCC_3812)
    if epsg == 2154:
        return _lcc_fwd(lon, lat, _LCC_2154)
    if epsg == 31370:
        return _lcc_fwd(*_wgs84_to_bd72(lon, lat), _LCC_31370)
    if epsg == 5070:
        return _aea_fwd(lon, lat, _AEA_5070)
    if epsg == 3035:
        return _laea_fwd(lon, lat, _LAEA_3035)
    if epsg == 27700:
        return _tm_fwd_gen(*_wgs84_to_osgb36(lon, lat), _TM_27700)
    if epsg == 28992:
        return _sterea_fwd(*_wgs84_to_rd(lon, lat), _STEREO_28992)
    if 32601 <= epsg <= 32660:
        return _tm_fwd(lon, lat, (epsg - 32600) * 6 - 183)
    if 32701 <= epsg <= 32760:
        return _tm_fwd(lon, lat, (epsg - 32700) * 6 - 183, y0=10_000_000.0)
    if 25828 <= epsg <= 25838:
        return _tm_fwd(lon, lat, (epsg - 25800) * 6 - 183)
    raise ValueError(f"unsupported EPSG:{epsg}")


def transform_xy(x: np.ndarray, y: np.ndarray, src_epsg: int, dst_epsg: int):
    """Vectorized coordinate transform src→dst through the 4326 hub."""
    if src_epsg == dst_epsg:
        return x, y
    lon, lat = _to_4326(np.asarray(x, np.float64), np.asarray(y, np.float64), src_epsg)
    return _from_4326(lon, lat, dst_epsg)


# ------------------------------------------------------------ geodesic

#: mean Earth radius (IUGG R1) used for the spherical geodesic — no
#: pyproj/geographiclib in the sandbox, so distances are great-circle on
#: a sphere (documented deviation from the reference's spheroid
#: ST_Distance: <0.6% worst case). The SQL oracles mirror this formula
#: exactly.
R_MEAN = 6371008.7714


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Vectorized great-circle distance in meters between lon/lat pairs
    (degrees), haversine form (stable for small separations)."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2.0 * R_MEAN * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def geodesic_xy(x1, y1, x2, y2, epsg: int) -> np.ndarray:
    """Great-circle meters between two planar point columns given their
    CRS: inverse-project to lon/lat (geom/crs Snyder formulas), then
    haversine. Raises ValueError for EPSG codes outside the supported
    families (see _to_4326)."""
    lon1, lat1 = _to_4326(np.asarray(x1, np.float64), np.asarray(y1, np.float64), epsg)
    lon2, lat2 = _to_4326(np.asarray(x2, np.float64), np.asarray(y2, np.float64), epsg)
    return haversine_m(lon1, lat1, lon2, lat2)


# ---------------------------------------------------------------------------
# bundled EPSG parameter table (~130 common codes in the implemented
# engines, public registry facts) — loaded at import so the driver and
# every Ray worker see the identical registry without a snapshot hop
from .epsg_table import load_epsg_table as _load_epsg_table

_load_epsg_table()
