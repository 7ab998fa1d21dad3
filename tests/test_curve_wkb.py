"""CURVE WKB types linearize on decode (reference converts curves to
linear on read, fileops.py:1659-1660)."""

import struct

import numpy as np

from geofileops_ray.geom.array import LINESTRING, MULTIPOLYGON, POLYGON
from geofileops_ray.geom.measure import area, length
from geofileops_ray.geom.wkb import from_wkb


def _hdr(code, n):
    return b"\x01" + struct.pack("<II", code, n)


def _pts(*xy):
    return b"".join(struct.pack("<dd", x, y) for x, y in xy)


def _circularstring(*xy):
    return _hdr(8, len(xy)) + _pts(*xy)


def _linestring(*xy):
    return _hdr(2, len(xy)) + _pts(*xy)


def test_circularstring_half_circle():
    # half circle radius 2 from (2,0) through (0,2) to (-2,0)
    wkb = _circularstring((2, 0), (0, 2), (-2, 0))
    ga = from_wkb([wkb])
    assert ga.types[0] == LINESTRING
    # arc length ~ pi*r, dense sampling within 0.1%
    assert abs(length(ga)[0] - np.pi * 2) < np.pi * 2 * 1e-3
    ring = ga.coords
    assert np.allclose(ring[0], (2, 0)) and np.allclose(ring[-1], (-2, 0))
    assert len(ring) >= 180 / 4  # ~4 deg max step


def test_curvepolygon_full_circle_area():
    # full circle radius 3 as one circularstring ring (two half arcs)
    cs = _circularstring((3, 0), (0, 3), (-3, 0), (0, -3), (3, 0))
    wkb = _hdr(10, 1) + cs  # CURVEPOLYGON, 1 ring
    ga = from_wkb([wkb])
    assert ga.types[0] == POLYGON
    a = area(ga)[0]
    assert abs(a - np.pi * 9) / (np.pi * 9) < 1e-3


def test_compoundcurve_and_multisurface():
    # compound: straight segment + quarter arc, shared endpoint dropped
    cc = (
        _hdr(9, 2)
        + _linestring((0, 0), (1, 0))
        + _circularstring((1, 0), (1 + np.sin(np.pi / 4) - 0, 1 - np.cos(np.pi / 4)), (1, 2))
    )
    ga = from_wkb([cc])
    assert ga.types[0] == LINESTRING
    # length = 1 + half-circumference of r=1 arc from (1,0) to (1,2)
    assert abs(length(ga)[0] - (1 + np.pi)) < 1e-2

    # MULTISURFACE of one curvepolygon -> MULTIPOLYGON
    cs = _circularstring((1, 0), (0, 1), (-1, 0), (0, -1), (1, 0))
    ms = _hdr(12, 1) + _hdr(10, 1) + cs
    g2 = from_wkb([ms])
    assert g2.types[0] == MULTIPOLYGON
    assert abs(area(g2)[0] - np.pi) / np.pi < 1e-3


def test_curve_z_variant():
    # ISO 1008 = CircularString Z: z coords dropped like other Z types
    xy = [(2, 0, 5.0), (0, 2, 5.0), (-2, 0, 5.0)]
    wkb = b"\x01" + struct.pack("<II", 1008, 3) + b"".join(
        struct.pack("<ddd", *p) for p in xy
    )
    ga = from_wkb([wkb])
    assert ga.types[0] == LINESTRING
    assert abs(length(ga)[0] - np.pi * 2) < np.pi * 2 * 1e-3
