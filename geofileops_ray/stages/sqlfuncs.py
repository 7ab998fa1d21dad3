"""ST_* scalar functions for the user-SQL surface.

The reference lets users embed Spatialite SQL in ``select`` /
``select_two_layers`` / ``where_post`` / ``update_column`` with the
ST_* scalar set (SURVEY.md §2.7, fileops.py:1522-1620). Our per-batch
SQL engine is DuckDB, which has no spatial extension in this sandbox —
so the subset of ST_* the reference itself exercises is registered as
VECTORIZED DuckDB Python UDFs (``type='arrow'``: one call per chunk,
the WKB column decodes once through the packed GeometryArray codec,
the kernel is the same numpy code every pipeline stage uses).

Registration is opt-in per connection (``register_st_functions``) and
the hot-path helper ``run_sql_on_batch`` only pays for it when the SQL
actually mentions an ``st_`` name.

Scalar geometry→geometry functions with a parameter (buffer distance,
simplify tolerance) accept per-row values but evaluate per DISTINCT
parameter value (in user SQL the parameter is almost always a literal
→ exactly one kernel call per chunk).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import GeometryArray, from_wkb
from ..geom import algorithms as alg
from ..geom import measure as meas
from ..geom import predicates as pred
from ..geom.wkb import to_wkb_arrow

_ST_MARKER = "st_"


def _decode(chunked) -> tuple[GeometryArray, np.ndarray]:
    """ChunkedArray[BLOB] → (GeometryArray of the non-null rows,
    validity mask). Null WKB rows yield null outputs."""
    arr = (
        chunked.combine_chunks()
        if isinstance(chunked, pa.ChunkedArray)
        else chunked
    )
    valid = np.ones(len(arr), dtype=bool)
    if arr.null_count:
        import pyarrow.compute as pc

        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False).astype(bool)
        arr = arr.filter(pa.array(valid))
    return from_wkb(arr), valid


def _scatter(vals: np.ndarray, valid: np.ndarray, typ) -> pa.Array:
    # zeros, not empty: masked slots are skipped by pyarrow but must not
    # hold uninitialized floats (nan→int conversion would be flaky)
    out = np.zeros(len(valid), dtype=vals.dtype if len(vals) else np.float64)
    out[valid] = vals
    return pa.array(out, typ, mask=~valid)


def _geom_out(ga: GeometryArray, valid: np.ndarray) -> pa.Array:
    wkb = to_wkb_arrow(ga)
    if isinstance(wkb, pa.ChunkedArray):  # pragma: no cover
        wkb = wkb.combine_chunks()
    if valid.all():
        return wkb
    idx = np.full(len(valid), -1, dtype=np.int64)
    idx[valid] = np.arange(int(valid.sum()))
    return wkb.take(pa.array(np.where(valid, idx, None)))


def _measure_fn(kernel):
    def fn(g):
        ga, valid = _decode(g)
        return _scatter(kernel(ga).astype(np.float64), valid, pa.float64())

    return fn


def _unary_geom_fn(kernel):
    def fn(g):
        ga, valid = _decode(g)
        return _geom_out(kernel(ga), valid)

    return fn


def _param_geom_fn(kernel):
    """(geom, param) → geom, evaluated per distinct param value."""

    def fn(g, p):
        ga, valid = _decode(g)
        pv_full = (
            p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        # a NULL parameter nulls the output row (SQL scalar semantics)
        pnull = np.isnan(pv_full)
        if pnull.any():
            keep_of_valid = ~pnull[valid]
            ga = ga.take(np.flatnonzero(keep_of_valid))
            valid = valid & ~pnull
        pv = pv_full[valid]
        if len(pv) == 0:
            return _geom_out(ga, valid)
        parts: list[GeometryArray] = []
        # pos[i] = row i's position in the grouped concat, so
        # concat.take(pos) restores row order
        pos = np.empty(len(pv), dtype=np.int64)
        n = 0
        for val in np.unique(pv):
            sel = np.flatnonzero(pv == val)
            parts.append(kernel(ga.take(sel), float(val)))
            pos[sel] = np.arange(n, n + len(sel))
            n += len(sel)
        from ..geom import concat

        return _geom_out(concat(parts).take(pos), valid)

    return fn


def _pair_bool_fn(pair_kernel):
    def fn(g1, g2):
        ga, va = _decode(g1)
        gb, vb = _decode(g2)
        valid = va & vb
        # per-row scalar predicate (user-SQL convenience surface — the
        # engine's joins never route through SQL UDFs)
        ia = np.cumsum(va) - 1
        ib = np.cumsum(vb) - 1
        out = np.zeros(len(valid), dtype=bool)
        for k in np.flatnonzero(valid):
            out[k] = bool(pair_kernel(ga, int(ia[k]), gb, int(ib[k])))
        return pa.array(out, pa.bool_(), mask=~valid)

    return fn


def _pair_double_fn(pair_kernel):
    def fn(g1, g2):
        ga, va = _decode(g1)
        gb, vb = _decode(g2)
        valid = va & vb
        ia = np.cumsum(va) - 1
        ib = np.cumsum(vb) - 1
        out = np.zeros(len(valid), dtype=np.float64)
        for k in np.flatnonzero(valid):
            out[k] = float(pair_kernel(ga, int(ia[k]), gb, int(ib[k])))
        return pa.array(out, pa.float64(), mask=~valid)

    return fn


def register_st_functions(con):
    """Register the ST_* scalar set on a DuckDB connection. Idempotent:
    a connection that already has ``st_area`` is returned untouched
    (DuckDBPyConnection forbids Python attributes, so the probe is a
    catalog lookup)."""
    already = con.execute(
        "SELECT count(*) FROM duckdb_functions() WHERE function_name = 'st_area'"
    ).fetchall()[0][0]  # fetchall releases the implicit transaction —
    # fetchone leaves it open and create_function then refuses to run
    if already:
        return con
    from duckdb.typing import BIGINT, BLOB, BOOLEAN, DOUBLE

    def _bounds_fn(col):
        def fn(g):
            ga, valid = _decode(g)
            return _scatter(ga.bounds()[:, col], valid, pa.float64())

        return fn

    def _centroid_fn(col):
        def fn(g):
            ga, valid = _decode(g)
            return _scatter(meas.centroid(ga)[:, col], valid, pa.float64())

        return fn

    def _npoints(g):
        ga, valid = _decode(g)
        return _scatter(ga.num_coords().astype(np.int64), valid, pa.int64())

    def _isvalid(g):
        ga, valid = _decode(g)
        ok, _reasons = alg.is_valid_detail(ga)
        out = np.zeros(len(valid), dtype=bool)
        out[valid] = ok
        return pa.array(out, pa.bool_(), mask=~valid)

    def _isempty(g):
        ga, valid = _decode(g)
        out = np.zeros(len(valid), dtype=bool)
        out[valid] = ga.num_coords() == 0
        return pa.array(out, pa.bool_(), mask=~valid)

    funcs = [
        ("st_area", _measure_fn(meas.area), [BLOB], DOUBLE),
        ("st_length", _measure_fn(meas.length), [BLOB], DOUBLE),
        ("st_perimeter", _measure_fn(meas.perimeter), [BLOB], DOUBLE),
        ("st_npoints", _npoints, [BLOB], BIGINT),
        ("st_minx", _bounds_fn(0), [BLOB], DOUBLE),
        ("st_miny", _bounds_fn(1), [BLOB], DOUBLE),
        ("st_maxx", _bounds_fn(2), [BLOB], DOUBLE),
        ("st_maxy", _bounds_fn(3), [BLOB], DOUBLE),
        ("st_centroid_x", _centroid_fn(0), [BLOB], DOUBLE),
        ("st_centroid_y", _centroid_fn(1), [BLOB], DOUBLE),
        ("st_isvalid", _isvalid, [BLOB], BOOLEAN),
        ("st_isempty", _isempty, [BLOB], BOOLEAN),
        ("st_makevalid", _unary_geom_fn(alg.make_valid), [BLOB], BLOB),
        ("st_convexhull", _unary_geom_fn(alg.convex_hull), [BLOB], BLOB),
        (
            "st_buffer",
            _param_geom_fn(lambda ga, d: alg.buffer(ga, d)),
            [BLOB, DOUBLE],
            BLOB,
        ),
        (
            "st_simplify",
            _param_geom_fn(lambda ga, t: alg.simplify(ga, t)),
            [BLOB, DOUBLE],
            BLOB,
        ),
        ("st_intersects", _pair_bool_fn(pred.pair_intersects), [BLOB, BLOB], BOOLEAN),
        ("st_distance", _pair_double_fn(pred.pair_distance), [BLOB, BLOB], DOUBLE),
    ]

    # relationship predicates + DE-9IM + validity reasons + precision
    from ..geom.relate import relate_general

    def _pair_varchar_fn(pair_kernel):
        def fn(g1, g2):
            ga, va = _decode(g1)
            gb, vb = _decode(g2)
            valid = va & vb
            ia = np.cumsum(va) - 1
            ib = np.cumsum(vb) - 1
            out = np.full(len(valid), None, dtype=object)
            for k in np.flatnonzero(valid):
                out[k] = str(pair_kernel(ga, int(ia[k]), gb, int(ib[k])))
            return pa.array(out.tolist(), pa.string())

        return fn

    def _isvalidreason(g):
        ga, valid = _decode(g)
        ok, reasons = alg.is_valid_detail(ga)
        out = np.full(len(valid), None, dtype=object)
        vi = np.flatnonzero(valid)
        for k, o, r in zip(vi, ok, reasons):
            out[k] = "Valid Geometry" if o else (r or "Invalid Geometry")
        return pa.array(out.tolist(), pa.string())

    def _collectionextract(g, p):
        # per DISTINCT type parameter (the parameter may vary per row;
        # a NULL parameter nulls the output row, SQL scalar semantics)
        ga, valid = _decode(g)
        pv_full = (
            p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        pnull = np.isnan(pv_full)
        if pnull.any():
            ga = ga.take(np.flatnonzero(~pnull[valid]))
            valid = valid & ~pnull
        pv = pv_full[valid].astype(np.int64)
        if len(pv) == 0:
            return _geom_out(ga, valid)
        parts: list[GeometryArray] = []
        pos = np.empty(len(pv), dtype=np.int64)
        n = 0
        for val in np.unique(pv):
            sel = np.flatnonzero(pv == val)
            parts.append(alg.collection_extract(ga.take(sel), int(val)))
            pos[sel] = np.arange(n, n + len(sel))
            n += len(sel)
        from ..geom import concat

        return _geom_out(concat(parts).take(pos), valid)

    def _linemerge(ga: GeometryArray) -> GeometryArray:
        """ST_LineMerge: greedily chain line parts that share endpoints
        (each endpoint used once — branch points break chains, matching
        the GEOS contract of only merging degree-2 connections)."""
        from ..geom.array import LINESTRING, MULTILINESTRING

        geoms = []
        for i in range(len(ga)):
            t = int(ga.types[i])
            parts = ga._parts_of(i)
            if t not in (LINESTRING, MULTILINESTRING) or len(parts) <= 1:
                geoms.append((t, parts))
                continue
            lines = [p[0] for p in parts if len(p) and len(p[0]) >= 2]
            # endpoint index: key → list of (line_idx, is_start)
            from collections import defaultdict

            ends: dict = defaultdict(list)
            for li, ln in enumerate(lines):
                ends[tuple(ln[0])].append((li, True))
                ends[tuple(ln[-1])].append((li, False))
            used = [False] * len(lines)
            merged = []
            for li in range(len(lines)):
                if used[li]:
                    continue
                used[li] = True
                chain = [lines[li]]
                # extend forward from the tail, then backward from head
                for forward in (True, False):
                    while True:
                        tip = tuple(chain[-1][-1]) if forward else tuple(
                            chain[0][0]
                        )
                        incident = ends.get(tip, [])
                        cands = [
                            (lj, at_start)
                            for lj, at_start in incident
                            if not used[lj]
                        ]
                        # merge only true degree-2 nodes: the chain's own
                        # endpoint + exactly one continuation (a branch
                        # point never merges, even with consumed arms)
                        if len(incident) != 2 or len(cands) != 1:
                            break
                        lj, at_start = cands[0]
                        used[lj] = True
                        nxt = lines[lj] if at_start else lines[lj][::-1]
                        if forward:
                            chain.append(nxt[1:])
                        else:
                            chain.insert(0, nxt[::-1][:-1])
                merged.append(np.concatenate(chain, axis=0))
            if len(merged) == 1:
                geoms.append((LINESTRING, [[merged[0]]]))
            else:
                geoms.append((MULTILINESTRING, [[m] for m in merged]))
        return GeometryArray.from_parts(geoms)

    def _removerepeated(ga: GeometryArray) -> GeometryArray:
        geoms = []
        for i in range(len(ga)):
            t = int(ga.types[i])
            parts_out = []
            for part in ga._parts_of(i):
                rings = []
                for ring in part:
                    if len(ring) > 1:
                        keep = np.ones(len(ring), dtype=bool)
                        keep[1:] = (np.diff(ring, axis=0) != 0).any(axis=1)
                        ring = ring[keep]
                    rings.append(ring)
                parts_out.append(rings)
            geoms.append((t, parts_out))
        return GeometryArray.from_parts(geoms)

    def _swap(k):
        return lambda a, i, b, j: k(b, j, a, i)

    pred_pairs = [
        ("st_touches", pred.pair_touches),
        ("st_equals", pred.pair_equals),
        ("st_crosses", pred.pair_crosses),
        ("st_overlaps", pred.pair_overlaps),
        ("st_contains", pred.pair_contains),
        ("st_within", _swap(pred.pair_contains)),
    ]

    # scalar boolean overlays (ST_Intersection / ST_Difference /
    # ST_Union — the reference's SQL templates call these per row pair,
    # _geoops_sql.py; polygonal inputs, same sweep kernel as the
    # pipeline overlay ops)
    from ..geom.array import MISSING, POLYGON
    from ..geom.overlay import parts_to_geom, polygon_overlay

    def _pair_overlay_fn(op):
        def fn(g1, g2):
            ga, va = _decode(g1)
            gb, vb = _decode(g2)
            valid = va & vb
            ia = np.cumsum(va) - 1
            ib = np.cumsum(vb) - 1
            geoms = []
            for kk in np.flatnonzero(valid):
                i, j = int(ia[kk]), int(ib[kk])
                if (
                    ga.part_types(i) != POLYGON
                    or gb.part_types(j) != POLYGON
                ):
                    # NULL-out unsupported rows (the reference's
                    # Spatialite surface evaluates per row for any
                    # geometry type; our sweep kernel is polygonal —
                    # NULL-in/NULL-out like every other UDF here)
                    geoms.append((MISSING, []))
                    continue
                parts = polygon_overlay(ga._parts_of(i), gb._parts_of(j), op)
                geoms.append(parts_to_geom(parts))
            return _geom_out(GeometryArray.from_parts(geoms), valid)

        return fn

    from ..geom.wkt import from_wkt, to_wkt
    from duckdb.typing import VARCHAR

    from ..geom.wkt import WktError

    def _geomfromtext(txt):
        a = (
            txt.combine_chunks()
            if isinstance(txt, pa.ChunkedArray)
            else txt
        )
        vals = a.to_pylist()
        # malformed WKT → NULL row (Spatialite GeomFromText contract),
        # not a chunk-wide failure. Fast path: parse the chunk at once;
        # only on a parse error re-scan per value to find the bad rows.
        try:
            ga = from_wkt(vals)
        except WktError:
            vals = [v for v in vals]
            for k, v in enumerate(vals):
                if v is None:
                    continue
                try:
                    from_wkt([v])
                except WktError:
                    vals[k] = None
            ga = from_wkt(vals)
        valid = np.array([v is not None for v in vals], dtype=bool)
        return _geom_out(ga.take(np.flatnonzero(valid)), valid)

    def _astext(g):
        ga, valid = _decode(g)
        txt = to_wkt(ga)
        out = np.full(len(valid), None, dtype=object)
        out[valid] = txt
        return pa.array(out.tolist(), pa.string())

    funcs += [
        ("st_geomfromtext", _geomfromtext, [VARCHAR], BLOB),
        ("st_astext", _astext, [BLOB], VARCHAR),
        ("st_relate", _pair_varchar_fn(relate_general), [BLOB, BLOB], VARCHAR),
        ("st_isvalidreason", _isvalidreason, [BLOB], VARCHAR),
        ("st_collectionextract", _collectionextract, [BLOB, BIGINT], BLOB),
        (
            "st_reduceprecision",
            _param_geom_fn(lambda ga, gs: alg.set_precision(ga, gs)),
            [BLOB, DOUBLE],
            BLOB,
        ),
        ("st_removerepeatedpoints", _unary_geom_fn(_removerepeated), [BLOB], BLOB),
        ("st_linemerge", _unary_geom_fn(_linemerge), [BLOB], BLOB),
        # the engine's coordinate model is 2D: CastToXYZ's Z-strip is an
        # identity here (registered so reference SQL ports run unchanged)
        ("casttoxy", _unary_geom_fn(lambda ga: ga), [BLOB], BLOB),
    ] + [
        (name, _pair_bool_fn(k), [BLOB, BLOB], BOOLEAN)
        for name, k in pred_pairs
    ] + [
        (f"st_{op}", _pair_overlay_fn(op), [BLOB, BLOB], BLOB)
        for op in ("intersection", "difference", "union",
                   "symmetric_difference")
    ]
    for name, fn, args, ret in funcs:
        con.create_function(name, fn, args, ret, type="arrow")
    return con


def wants_st(sql: str) -> bool:
    return _ST_MARKER in sql.lower()
