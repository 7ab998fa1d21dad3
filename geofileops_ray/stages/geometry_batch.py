"""Arrow-batch ↔ geometry-kernel bridge + shared per-op post-steps.

Implements the common post-processing chain every reference operation
applies after its core kernel (SURVEY.md §2.2 last row): gridsize
coordinate rounding (_geoops_sql.py:4018-4056), drop-NULL/EMPTY unless
keep_empty_geoms (:731-738), explodecollections (_geoops_gpd.py:1077-1078)
and where_post (:740-754) — here as chained batch transforms, all inside
one ``map_batches`` call per operator.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ..geom import GeometryArray, from_wkb, to_wkb
from ..geom.algorithms import explode as _explode
from ..geom.algorithms import set_precision


def decode_geometry(batch: pa.Table, column: str = "geometry") -> GeometryArray:
    return from_wkb(batch.column(column))


def encode_geometry(
    batch: pa.Table, ga: GeometryArray, column: str = "geometry"
) -> pa.Table:
    from ..geom.wkb import to_wkb_arrow

    wkb = to_wkb_arrow(ga)
    idx = batch.schema.get_field_index(column)
    if idx >= 0:
        return batch.set_column(idx, column, wkb)
    return batch.append_column(column, wkb)


def add_bounds(batch: pa.Table, ga: GeometryArray | None = None) -> pa.Table:
    """Append (minx,miny,maxx,maxy) columns — bbox stats for pruning &
    cell assignment (replaces the reference's R-tree bbox prefilter)."""
    if ga is None:
        ga = decode_geometry(batch)
    b = ga.bounds()
    for k, name in enumerate(("minx", "miny", "maxx", "maxy")):
        if name in batch.column_names:
            batch = batch.drop_columns([name])
        batch = batch.append_column(name, pa.array(b[:, k], pa.float64()))
    return batch


def explode_batch(batch: pa.Table, ga: GeometryArray) -> tuple[pa.Table, GeometryArray]:
    """Multi→single explode: replicate attribute rows per part."""
    exploded, src = _explode(ga)
    return batch.take(pa.array(src)), exploded


def run_sql_on_batch(batch: pa.Table, sql: str) -> pa.Table:
    """Execute DuckDB SQL with the batch registered as view ``batch`` —
    the engine's user-SQL surface (select / where_post analogue of the
    reference's Spatialite SQL injection, geoops.py:1688-1702)."""
    import duckdb

    con = duckdb.connect()
    try:
        from .sqlfuncs import register_st_functions, wants_st

        if wants_st(sql):
            register_st_functions(con)
        con.register("batch", batch)
        return con.execute(sql).arrow()
    finally:
        con.close()


def geometry_op(
    kernel: Callable[[GeometryArray], GeometryArray] | None = None,
    gridsize: float = 0.0,
    keep_empty_geoms: bool = False,
    explodecollections: bool = False,
    where_post: str | None = None,
    batch_kernel: Callable[[pa.Table, GeometryArray], GeometryArray] | None = None,
) -> Callable[[pa.Table], pa.Table]:
    """Build the standard single-layer batch function:
    decode → kernel → set_precision → drop-empty → explode → where_post.
    Mirrors _single_layer_vector_operation's template post-steps
    (_geoops_sql.py:705-766). ``batch_kernel`` additionally receives the
    attribute batch (apply's only_geom_input=False row mode)."""
    if (kernel is None) == (batch_kernel is None):
        # fail at construction, not as a NoneType call inside a worker
        raise ValueError("geometry_op needs exactly one of kernel/batch_kernel")

    def fn(batch: pa.Table) -> pa.Table:
        ga = decode_geometry(batch)
        ga = batch_kernel(batch, ga) if batch_kernel is not None else kernel(ga)
        if gridsize:
            ga = set_precision(ga, gridsize)
        if not keep_empty_geoms:
            keep = ~ga.is_empty()
            if not keep.all():
                idx = np.flatnonzero(keep)
                ga = ga.take(idx)
                batch = batch.take(pa.array(idx))
        if explodecollections:
            batch, ga = explode_batch(batch, ga)
        out = encode_geometry(batch, ga)
        if where_post:
            out = add_bounds(out, ga)
            out = run_sql_on_batch(out, f"SELECT * FROM batch WHERE {where_post}")
        return out

    return fn
