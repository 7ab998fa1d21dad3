"""Bundled EPSG parameter table — common codes auto-registered through
``register_crs``.

The reference accepts any pyproj CRS (fileops.py:2611-2705); this
sandbox has no pyproj, so ``geom/crs.py`` implements the projection
ENGINES (lcc 2SP / transverse mercator / oblique stereographic /
longlat, plus 7-parameter Helmert datum shifts) from the published
Snyder formulas, and this module supplies the PUBLIC EPSG registry
parameters for ~130 widely used codes expressible in those engines:
national TM/LCC grids, NAD83 & GDA UTM/MGA zone families, SWEREF99 and
Norwegian NTM zone families, RGF93 conic conformal zones, and the
common geographic (longlat) datums. Codes whose projection engine is
not implemented (oblique mercator, Krovak, NAD27 state planes in feet,
…) stay unregistered and keep raising the clean ValueError.

All numbers below are public EPSG registry facts (epsg.org); datum
shifts use the published single-transformation Helmert parameters
(grid-shift refinements like NTv2/OSTN need external data files and are
documented as ±m-class approximations, matching the 27700 builtin).
"""

from __future__ import annotations

# (a, 1/f) pairs — flattening passed to register_crs as f = 1/rf
_GRS80 = (6378137.0, 1.0 / 298.257222101)
_WGS84 = (6378137.0, 1.0 / 298.257223563)
_BESSEL = (6377397.155, 1.0 / 299.1528128)

# DHDN (Germany) and MGI (Austria) position-vector Helmert to WGS84
_TOWGS84_DHDN = (598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7)
_TOWGS84_MGI = (577.326, 90.129, 463.919, 5.137, 1.474, 5.297, 2.4232)


def _entries():
    """Yield (epsg, name, proj, params, ellps, towgs84) rows."""
    # --- geographic (longlat) datums; WGS84-equivalent frames carry no
    # Helmert (identity at the meter class of this engine)
    for code, name in (
        (4258, "ETRS89"),
        (4269, "NAD83"),
        (4283, "GDA94"),
        (4167, "NZGD2000"),
        (4171, "RGF93 v1"),
        (7844, "GDA2020"),
        (4619, "SWEREF99"),
    ):
        yield code, name, "longlat", {}, _GRS80, None

    # --- NAD83 / UTM zones 1N-23N (EPSG 26901-26923)
    for z in range(1, 24):
        yield (
            26900 + z,
            f"NAD83 / UTM zone {z}N",
            "tm",
            {"k0": 0.9996, "lon0": -183.0 + 6.0 * z, "x0": 500000.0},
            _GRS80,
            None,
        )

    # --- GDA94 / MGA zones 48-58 (28348-28358) and GDA2020 / MGA
    # zones 46-59 (7846-7859): southern-hemisphere UTM layout
    for z in range(48, 59):
        yield (
            28300 + z,
            f"GDA94 / MGA zone {z}",
            "tm",
            {"k0": 0.9996, "lon0": 6.0 * z - 183.0, "x0": 500000.0,
             "y0": 10000000.0},
            _GRS80,
            None,
        )
    for z in range(46, 60):
        yield (
            7800 + z,
            f"GDA2020 / MGA zone {z}",
            "tm",
            {"k0": 0.9996, "lon0": 6.0 * z - 183.0, "x0": 500000.0,
             "y0": 10000000.0},
            _GRS80,
            None,
        )

    # --- SWEREF99 TM (3006) + the 12 local zones (3007-3018)
    yield (3006, "SWEREF99 TM", "tm",
           {"k0": 0.9996, "lon0": 15.0, "x0": 500000.0}, _GRS80, None)
    for code, lon0 in (
        (3007, 12.0), (3008, 13.5), (3009, 15.0), (3010, 16.5),
        (3011, 18.0), (3012, 14.25), (3013, 15.75), (3014, 17.25),
        (3015, 18.75), (3016, 20.25), (3017, 21.75), (3018, 23.25),
    ):
        yield (code, f"SWEREF99 {lon0:.2f}".rstrip("0").rstrip("."),
               "tm", {"k0": 1.0, "lon0": lon0, "x0": 150000.0},
               _GRS80, None)

    # --- Norwegian NTM zones 5-30 (EPSG 5105-5130)
    for z in range(5, 31):
        yield (
            5100 + z,
            f"ETRS89 / NTM zone {z}",
            "tm",
            {"k0": 1.0, "lat0": 58.0, "lon0": z + 0.5, "x0": 100000.0,
             "y0": 1000000.0},
            _GRS80,
            None,
        )

    # --- RGF93 conic conformal zones CC42-CC50 (EPSG 3942-3950)
    for n in range(42, 51):
        yield (
            3900 + n,
            f"RGF93 v1 / CC{n}",
            "lcc",
            {"lat0": float(n), "lat1": n - 0.75, "lat2": n + 0.75,
             "lon0": 3.0, "x0": 1700000.0,
             "y0": (n - 41) * 1000000.0 + 200000.0},
            _GRS80,
            None,
        )

    # --- DHDN / Gauss-Krueger zones 2-5 (31466-31469, Bessel + Helmert)
    for z in range(2, 6):
        yield (
            31464 + z,
            f"DHDN / 3-degree Gauss-Krueger zone {z}",
            "tm",
            {"k0": 1.0, "lon0": 3.0 * z, "x0": z * 1000000.0 + 500000.0},
            _BESSEL,
            _TOWGS84_DHDN,
        )

    # --- MGI / Austria Gauss-Krueger M28/M31/M34 (31254-31256)
    for code, lon0 in (
        (31254, 10.0 + 20.0 / 60.0),
        (31255, 13.0 + 20.0 / 60.0),
        (31256, 16.0 + 20.0 / 60.0),
    ):
        yield (code, "MGI / Austria GK", "tm",
               {"k0": 1.0, "lon0": lon0, "x0": 0.0, "y0": -5000000.0},
               _BESSEL, _TOWGS84_MGI)

    # --- Poland: CS92 (2180) + CS2000 zones 5-8 (2176-2179)
    yield (2180, "ETRS89 / Poland CS92", "tm",
           {"k0": 0.9993, "lon0": 19.0, "x0": 500000.0, "y0": -5300000.0},
           _GRS80, None)
    for i, lon0 in enumerate((15.0, 18.0, 21.0, 24.0)):
        yield (2176 + i, f"ETRS89 / Poland CS2000 zone {int(lon0 / 3)}",
               "tm",
               {"k0": 0.999923, "lon0": lon0,
                "x0": (lon0 / 3.0) * 1000000.0 + 500000.0},
               _GRS80, None)

    # --- Korea 2000 West/Central/East belts 2010 (5185-5187)
    for code, lon0 in ((5185, 125.0), (5186, 127.0), (5187, 129.0)):
        yield (code, "Korea 2000 belt 2010", "tm",
               {"k0": 1.0, "lat0": 38.0, "lon0": lon0, "x0": 200000.0,
                "y0": 600000.0},
               _GRS80, None)

    # --- national TM grids
    yield (2193, "NZGD2000 / New Zealand Transverse Mercator", "tm",
           {"k0": 0.9996, "lon0": 173.0, "x0": 1600000.0,
            "y0": 10000000.0}, _GRS80, None)
    yield (3067, "ETRS89 / TM35FIN", "tm",
           {"k0": 0.9996, "lon0": 27.0, "x0": 500000.0}, _GRS80, None)
    yield (3059, "LKS92 / Latvia TM", "tm",
           {"k0": 0.9996, "lon0": 24.0, "x0": 500000.0, "y0": -6000000.0},
           _GRS80, None)
    yield (3346, "LKS94 / Lithuania TM", "tm",
           {"k0": 0.9998, "lon0": 24.0, "x0": 500000.0}, _GRS80, None)
    yield (3763, "ETRS89 / Portugal TM06", "tm",
           {"k0": 1.0, "lat0": 39.66825833333333,
            "lon0": -8.133108333333334}, _GRS80, None)
    yield (2157, "IRENET95 / Irish Transverse Mercator", "tm",
           {"k0": 0.99982, "lat0": 53.5, "lon0": -8.0, "x0": 600000.0,
            "y0": 750000.0}, _GRS80, None)

    # --- national LCC grids
    yield (3301, "Estonian Coordinate System of 1997", "lcc",
           {"lat0": 57.51755393055556, "lat1": 59.33333333333334,
            "lat2": 58.0, "lon0": 24.0, "x0": 500000.0, "y0": 6375000.0},
           _GRS80, None)
    yield (5243, "ETRS89 / LCC Germany (N-E)", "lcc",
           {"lat0": 51.0, "lat1": 48.66666666666666,
            "lat2": 53.66666666666666, "lon0": 10.5}, _GRS80, None)
    yield (3034, "ETRS89-extended / LCC Europe", "lcc",
           {"lat0": 52.0, "lat1": 35.0, "lat2": 65.0, "lon0": 10.0,
            "x0": 4000000.0, "y0": 2800000.0}, _GRS80, None)
    yield (3978, "NAD83 / Canada Atlas Lambert", "lcc",
           {"lat0": 49.0, "lat1": 49.0, "lat2": 77.0,
            "lon0": -95.0}, _GRS80, None)
    yield (3979, "NAD83(CSRS) / Canada Atlas Lambert", "lcc",
           {"lat0": 49.0, "lat1": 49.0, "lat2": 77.0,
            "lon0": -95.0}, _GRS80, None)
    yield (3347, "NAD83 / Statistics Canada Lambert", "lcc",
           {"lat0": 63.390675, "lat1": 49.0, "lat2": 77.0,
            "lon0": -91.86666666666666, "x0": 6200000.0,
            "y0": 3000000.0}, _GRS80, None)


_loaded = False


def load_epsg_table() -> int:
    """Register every bundled code (idempotent). Returns the number of
    codes registered. Called at ``geom.crs`` import so driver and every
    worker see the identical registry."""
    global _loaded
    if _loaded:
        return 0
    _loaded = True
    from .crs import KNOWN_CRS, register_crs

    n = 0
    for epsg, name, proj, params, (a, f), towgs84 in _entries():
        if epsg in KNOWN_CRS:  # builtin wins (never shadow)
            continue
        register_crs(epsg, name, proj, params, ellps=(a, f),
                     towgs84=towgs84)
        n += 1
    return n
