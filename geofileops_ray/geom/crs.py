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
* EPSG:326xx — WTS84 UTM north zones (ellipsoidal transverse mercator,
  series expansion)

All transforms go through 4326 as the hub and are vectorized numpy over
the coordinate slab (one pass per batch — no per-geometry python).
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


def _known() -> dict[int, CRS]:
    out = {
        4326: CRS(4326, "WGS 84", True),
        3857: CRS(3857, "WGS 84 / Pseudo-Mercator", False),
        3812: CRS(3812, "ETRS89 / Belgian Lambert 2008", False),
    }
    for z in range(1, 61):
        out[32600 + z] = CRS(32600 + z, f"WGS 84 / UTM zone {z}N", False)
    return out


KNOWN_CRS = _known()


def get_crs(epsg: int | None) -> CRS | None:
    """CRS object for an epsg code (get_crs analogue)."""
    if epsg is None:
        return None
    try:
        return KNOWN_CRS[int(epsg)]
    except KeyError:
        raise ValueError(f"unsupported EPSG:{epsg}; known: 4326, 3857, 3812, 326xx")


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
    e = _E

    def m(phi):
        return math.cos(phi) / math.sqrt(1 - _E2 * math.sin(phi) ** 2)

    def t(phi):
        return math.tan(math.pi / 4 - phi / 2) / (
            (1 - e * math.sin(phi)) / (1 + e * math.sin(phi))
        ) ** (e / 2)

    p1, p2, p0 = map(math.radians, (p["lat1"], p["lat2"], p["lat0"]))
    n = (math.log(m(p1)) - math.log(m(p2))) / (math.log(t(p1)) - math.log(t(p2)))
    F = m(p1) / (n * t(p1) ** n)
    rho0 = _A * F * t(p0) ** n
    return n, F, rho0


def _lcc_fwd(lon, lat, p):
    n, F, rho0 = _lcc_consts(p)
    phi = np.radians(lat)
    sphi = np.sin(phi)
    t = np.tan(np.pi / 4 - phi / 2) / ((1 - _E * sphi) / (1 + _E * sphi)) ** (_E / 2)
    rho = _A * F * t**n
    th = n * np.radians(lon - p["lon0"])
    return p["x0"] + rho * np.sin(th), p["y0"] + rho0 - rho * np.cos(th)


def _lcc_inv(x, y, p):
    n, F, rho0 = _lcc_consts(p)
    dx = x - p["x0"]
    dy = rho0 - (y - p["y0"])
    rho = np.sign(n) * np.hypot(dx, dy)
    t = (rho / (_A * F)) ** (1 / n)
    th = np.arctan2(dx, dy)
    lon = np.degrees(th / n) + p["lon0"]
    # iterate for phi
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(6):
        sphi = np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(
            t * ((1 - _E * sphi) / (1 + _E * sphi)) ** (_E / 2)
        )
    return lon, np.degrees(phi)


# ---------------------------------------------------- transverse mercator

_K0 = 0.9996


def _tm_fwd(lon, lat, lon0):
    phi = np.radians(lat)
    lam = np.radians(lon - lon0)
    ep2 = _E2 / (1 - _E2)
    N = _A / np.sqrt(1 - _E2 * np.sin(phi) ** 2)
    T = np.tan(phi) ** 2
    C = ep2 * np.cos(phi) ** 2
    Aq = lam * np.cos(phi)
    e4, e6 = _E2**2, _E2**3
    M = _A * (
        (1 - _E2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * _E2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )
    x = _K0 * N * (
        Aq + (1 - T + C) * Aq**3 / 6 + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * Aq**5 / 120
    ) + 500000.0
    y = _K0 * (
        M
        + N * np.tan(phi) * (
            Aq**2 / 2
            + (5 - T + 9 * C + 4 * C**2) * Aq**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * Aq**6 / 720
        )
    )
    return x, y


def _tm_inv(x, y, lon0):
    ep2 = _E2 / (1 - _E2)
    e4, e6 = _E2**2, _E2**3
    M = y / _K0
    mu = M / (_A * (1 - _E2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    e1 = (1 - math.sqrt(1 - _E2)) / (1 + math.sqrt(1 - _E2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    C1 = ep2 * np.cos(phi1) ** 2
    T1 = np.tan(phi1) ** 2
    N1 = _A / np.sqrt(1 - _E2 * np.sin(phi1) ** 2)
    R1 = _A * (1 - _E2) / (1 - _E2 * np.sin(phi1) ** 2) ** 1.5
    D = (x - 500000.0) / (N1 * _K0)
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
    return np.degrees(lam) + lon0, np.degrees(phi)


# ------------------------------------------------------------ public API


def _to_4326(x, y, epsg: int):
    if epsg == 4326:
        return x, y
    if epsg == 3857:
        return _merc_inv(x, y)
    if epsg == 3812:
        return _lcc_inv(x, y, _LCC_3812)
    if 32601 <= epsg <= 32660:
        return _tm_inv(x, y, (epsg - 32600) * 6 - 183)
    raise ValueError(f"unsupported EPSG:{epsg}")


def _from_4326(lon, lat, epsg: int):
    if epsg == 4326:
        return lon, lat
    if epsg == 3857:
        return _merc_fwd(lon, lat)
    if epsg == 3812:
        return _lcc_fwd(lon, lat, _LCC_3812)
    if 32601 <= epsg <= 32660:
        return _tm_fwd(lon, lat, (epsg - 32600) * 6 - 183)
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
