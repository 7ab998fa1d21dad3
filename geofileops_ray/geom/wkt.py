"""WKT codec for GeometryArray (ST_GeomFromText / ST_AsText analogue,
SURVEY.md §2.7 — the reference exposes both through its SQL surface).

2D only (the engine's coordinate model); Z/M raise. Collections follow
the same degrade convention as the WKB encoder (wkb.py:549-560): parts
re-type by ring structure on output.
"""

from __future__ import annotations

import numpy as np

from .array import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    GeometryArray,
)

_NAMES = {
    "POINT": POINT,
    "LINESTRING": LINESTRING,
    "POLYGON": POLYGON,
    "MULTIPOINT": MULTIPOINT,
    "MULTILINESTRING": MULTILINESTRING,
    "MULTIPOLYGON": MULTIPOLYGON,
    "GEOMETRYCOLLECTION": GEOMETRYCOLLECTION,
}


class WktError(ValueError):
    pass


def _skip_ws(s: str, i: int) -> int:
    n = len(s)
    while i < n and s[i].isspace():
        i += 1
    return i


def _expect(s: str, i: int, ch: str) -> int:
    i = _skip_ws(s, i)
    if i >= len(s) or s[i] != ch:
        raise WktError(f"expected '{ch}' at {i} in {s[:60]!r}...")
    return i + 1


def _number(s: str, i: int) -> tuple[float, int]:
    i = _skip_ws(s, i)
    j = i
    n = len(s)
    while j < n and (s[j] not in " \t\n,()"):
        j += 1
    if j == i:
        raise WktError(f"expected number at {i}")
    return float(s[i:j]), j


def _coord_seq(s: str, i: int) -> tuple[np.ndarray, int]:
    """'(x y, x y, ...)' → (k,2) array."""
    i = _expect(s, i, "(")
    pts: list[tuple[float, float]] = []
    while True:
        x, i = _number(s, i)
        y, i = _number(s, i)
        i = _skip_ws(s, i)
        pts.append((x, y))
        if i < len(s) and s[i] == ",":
            i += 1
            continue
        i = _expect(s, i, ")")
        return np.asarray(pts, dtype=np.float64), i


def _ring_list(s: str, i: int) -> tuple[list[np.ndarray], int]:
    """'((...), (...))' → list of rings."""
    i = _expect(s, i, "(")
    rings: list[np.ndarray] = []
    while True:
        ring, i = _coord_seq(s, i)
        rings.append(ring)
        i = _skip_ws(s, i)
        if i < len(s) and s[i] == ",":
            i += 1
            continue
        i = _expect(s, i, ")")
        return rings, i


def _parse_one(s: str) -> tuple[int, list]:
    i = _skip_ws(s, 0)
    j = i
    while j < len(s) and (s[j].isalpha()):
        j += 1
    name = s[i:j].upper()
    if name not in _NAMES:
        raise WktError(f"unknown geometry type {name!r}")
    code = _NAMES[name]
    i = _skip_ws(s, j)
    k = i
    while k < len(s) and s[k].isalpha():
        k += 1
    mod = s[i:k].upper()
    if mod in ("Z", "M", "ZM"):
        raise WktError("only 2D WKT is supported (no Z/M)")
    if s[i:].upper().startswith("EMPTY"):
        return code, []
    if code == POINT:
        i = _expect(s, i, "(")
        x, i = _number(s, i)
        y, i = _number(s, i)
        _expect(s, i, ")")
        return code, [[np.asarray([[x, y]], dtype=np.float64)]]
    if code == LINESTRING:
        seq, i = _coord_seq(s, i)
        if len(seq) < 2:
            raise WktError("LINESTRING needs >= 2 points")
        return code, [[seq]]
    if code == POLYGON:
        rings, i = _ring_list(s, i)
        for r in rings:
            if len(r) < 4 or not np.all(r[0] == r[-1]):
                raise WktError("POLYGON rings must be closed with >= 4 points")
        return code, [rings]
    if code == MULTIPOINT:
        # both 'MULTIPOINT (1 2, 3 4)' and 'MULTIPOINT ((1 2), (3 4))'
        i0 = _expect(s, i, "(")
        i1 = _skip_ws(s, i0)
        parts: list = []
        if i1 < len(s) and s[i1] == "(":
            i = i0
            while True:
                seq, i = _coord_seq(s, i)
                parts.append([seq[:1]])
                i = _skip_ws(s, i)
                if i < len(s) and s[i] == ",":
                    i += 1
                    continue
                _expect(s, i, ")")
                break
        else:
            seq, i = _coord_seq(s, i)
            parts = [[seq[k : k + 1]] for k in range(len(seq))]
        return code, parts
    if code == MULTILINESTRING:
        lines, i = _ring_list(s, i)
        return code, [[ln] for ln in lines]
    if code == MULTIPOLYGON:
        i = _expect(s, i, "(")
        parts = []
        while True:
            rings, i = _ring_list(s, i)
            parts.append(rings)
            i = _skip_ws(s, i)
            if i < len(s) and s[i] == ",":
                i += 1
                continue
            _expect(s, i, ")")
            break
        return code, parts
    # GEOMETRYCOLLECTION: parse sub-geometries, flatten their parts (the
    # array model keeps one type code per row — same degrade as WKB)
    i = _expect(s, i, "(")
    parts = []
    depth = 1
    start = i
    # split top-level comma-separated sub-WKTs by paren depth
    subs: list[str] = []
    j = i
    while j < len(s):
        c = s[j]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                subs.append(s[start:j])
                break
        elif c == "," and depth == 1:
            subs.append(s[start:j])
            start = j + 1
        j += 1
    else:
        raise WktError("unterminated GEOMETRYCOLLECTION")
    for sub in subs:
        sub = sub.strip()
        if not sub:
            continue
        _c, p = _parse_one(sub)
        parts.extend(p)
    return GEOMETRYCOLLECTION, parts


def from_wkt(values) -> GeometryArray:
    """Parse a sequence of WKT strings (None/'' → missing row)."""
    geoms: list[tuple[int, list]] = []
    for v in values:
        if v is None or (isinstance(v, str) and not v.strip()):
            geoms.append((MISSING, []))
            continue
        geoms.append(_parse_one(str(v)))
    return GeometryArray.from_parts(geoms)


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _seq_txt(ring: np.ndarray) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in ring)


def to_wkt(arr: GeometryArray) -> list[str | None]:
    """Emit WKT per row (missing → None). Integers print without the
    trailing '.0'; other values print with round-trip repr."""
    out: list[str | None] = []
    for i in range(len(arr)):
        t = int(arr.types[i])
        if t == MISSING:
            out.append(None)
            continue
        parts = arr._parts_of(i)
        name = {v: k for k, v in _NAMES.items()}[t]
        if not parts:
            out.append(f"{name} EMPTY")
            continue
        if t == POINT:
            x, y = parts[0][0][0]
            out.append(f"POINT ({_fmt(x)} {_fmt(y)})")
        elif t == LINESTRING:
            out.append(f"LINESTRING ({_seq_txt(parts[0][0])})")
        elif t == POLYGON:
            rings = ", ".join(f"({_seq_txt(r)})" for r in parts[0])
            out.append(f"POLYGON ({rings})")
        elif t == MULTIPOINT:
            pts = ", ".join(
                f"({_fmt(p[0][0][0])} {_fmt(p[0][0][1])})" for p in parts
            )
            out.append(f"MULTIPOINT ({pts})")
        elif t == MULTILINESTRING:
            lines = ", ".join(f"({_seq_txt(p[0])})" for p in parts)
            out.append(f"MULTILINESTRING ({lines})")
        elif t == MULTIPOLYGON:
            polys = ", ".join(
                "(" + ", ".join(f"({_seq_txt(r)})" for r in p) + ")"
                for p in parts
            )
            out.append(f"MULTIPOLYGON ({polys})")
        else:  # GEOMETRYCOLLECTION — re-type parts by ring structure
            subs = []
            for p in parts:
                if len(p) == 1 and len(p[0]) == 1:
                    subs.append(
                        f"POINT ({_fmt(p[0][0][0])} {_fmt(p[0][0][1])})"
                    )
                elif len(p) == 1 and not (
                    len(p[0]) >= 4 and bool(np.all(p[0][0] == p[0][-1]))
                ):
                    subs.append(f"LINESTRING ({_seq_txt(p[0])})")
                else:
                    rr = ", ".join(f"({_seq_txt(r)})" for r in p)
                    subs.append(f"POLYGON ({rr})")
            out.append(f"GEOMETRYCOLLECTION ({', '.join(subs)})")
    return out
