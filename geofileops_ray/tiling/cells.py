"""Hierarchical square-grid cell index (H3/S2 analogue, from scratch).

A cell at resolution ``r`` is an axis-aligned square of edge
``base_size * 2**r``; resolution 0 is the finest. Coarsening by one level
(r → r+1) merges 4 children into their parent — the analogue of taking an
H3 parent cell, used by dissolve's recursive tiled-union passes
(geofileops _geoops_gpd.py:1370-1474 uses strictly-shrinking squarish
grids the same way).

Cell ids are single int64 keys (shuffle-friendly):

    cell = (floor(x / size) + CELL_OFFSET) << CELL_SHIFT
         | (floor(y / size) + CELL_OFFSET)

mirrored in SQL (DuckDB oracle) as

    ((CAST(FLOOR(x/size) AS BIGINT) + 1048576) * 2097152
      + CAST(FLOOR(y/size) AS BIGINT) + 1048576)

so tile assignments are verifiable line-by-line against plain SQL.

Hot-cell salting (north rule: "explicit salting of hot cells — dense
urban tiles"): ``compute_salt_map`` probes per-cell row counts of the
*left* side with a cheap column-pruned groupby, returns {cell: k} for
cells above threshold; the replication stage then splits the left side of
a hot cell into k salted sub-keys and replicates the right side to all k
(a standard skew-join salt; the reference has no equivalent — it only
doubles batch counts, _geoops_sql.py:4518-4597).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..config import OPTIONS

CELL_SHIFT = 21
CELL_OFFSET = 1 << 20  # supports coords in ±(2^20 * cell_size)
_SALT_SHIFT = 8  # salted key = cell << 8 | salt  (max 256 salts per cell)


def cell_id(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return ((cx.astype(np.int64) + CELL_OFFSET) << CELL_SHIFT) | (
        cy.astype(np.int64) + CELL_OFFSET
    )


def cell_of_point(x: np.ndarray, y: np.ndarray, size: float) -> np.ndarray:
    return cell_id(np.floor(x / size), np.floor(y / size))


def cell_bounds(cell: int, size: float) -> tuple[float, float, float, float]:
    cx = (cell >> CELL_SHIFT) - CELL_OFFSET
    cy = (cell & ((1 << CELL_SHIFT) - 1)) - CELL_OFFSET
    return (cx * size, cy * size, (cx + 1) * size, (cy + 1) * size)


def assign_cells(bounds: np.ndarray, size: float) -> tuple[np.ndarray, np.ndarray]:
    """For each bbox row, the covering cell-range; returns (row_index
    repeated per covered cell, cell_id). Fully vectorized."""
    minx, miny, maxx, maxy = bounds[:, 0], bounds[:, 1], bounds[:, 2], bounds[:, 3]
    empty = ~np.isfinite(minx)
    cx0 = np.floor(np.where(empty, 0, minx) / size).astype(np.int64)
    cy0 = np.floor(np.where(empty, 0, miny) / size).astype(np.int64)
    cx1 = np.floor(np.where(empty, 0, maxx) / size).astype(np.int64)
    cy1 = np.floor(np.where(empty, 0, maxy) / size).astype(np.int64)
    nx = cx1 - cx0 + 1
    ny = cy1 - cy0 + 1
    counts = np.where(empty, 0, nx * ny)
    rows = np.repeat(np.arange(len(bounds), dtype=np.int64), counts)
    # per-repeat local index 0..count-1
    if len(rows) == 0:
        return rows, np.empty(0, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(len(rows), dtype=np.int64) - np.repeat(starts, counts)
    nyr = np.repeat(np.where(ny == 0, 1, ny), counts)
    dx = local // nyr
    dy = local % nyr
    cells = cell_id(np.repeat(cx0, counts) + dx, np.repeat(cy0, counts) + dy)
    return rows, cells


def replicate_to_cells(
    batch: pa.Table,
    size: float,
    bounds: np.ndarray,
    cell_col: str = "__cell",
    expand: float = 0.0,
    salt_map: dict[int, int] | None = None,
    salt_mode: str = "none",
    id_col: str = "doc_id",
) -> pa.Table:
    """Replicate each row to every grid cell its (optionally expanded)
    bbox overlaps; appends the shuffle-key column ``cell_col``.

    salt_mode: 'none' | 'split' (hot-cell rows hashed into k sub-keys) |
    'replicate' (rows copied to ALL k sub-keys of a hot cell — used for
    the small/right side of a salted join).
    """
    b = bounds
    if expand:
        b = b.copy()
        b[:, :2] -= expand
        b[:, 2:] += expand
    rows, cells = assign_cells(b, size)
    out = batch.take(pa.array(rows))
    keys = cells << _SALT_SHIFT
    if salt_map and salt_mode != "none":
        hot_cells = np.array(sorted(salt_map), dtype=np.int64)
        ks = np.array([salt_map[c] for c in sorted(salt_map)], dtype=np.int64)
        pos = np.searchsorted(hot_cells, cells)
        pos = np.clip(pos, 0, len(hot_cells) - 1)
        is_hot = hot_cells[pos] == cells
        k_of = np.where(is_hot, ks[pos], 1)
        if salt_mode == "split":
            ids = out.column(id_col).to_numpy()
            # uint64 mod-2^32 arithmetic: an int64 product wraps for
            # ids ≥ 2^63/2654435761 ≈ 3.47e9 (see io/synth.py _hash)
            h = (
                (ids.astype(np.uint64) % np.uint64(4294967296))
                * np.uint64(2654435761)
            ) % np.uint64(4294967296)
            salt = h.astype(np.int64) % np.maximum(k_of, 1)
            keys = keys | salt
        else:  # replicate
            rep_rows = np.repeat(np.arange(len(out), dtype=np.int64), k_of)
            starts = np.concatenate([[0], np.cumsum(k_of)[:-1]])
            salt = np.arange(len(rep_rows), dtype=np.int64) - np.repeat(starts, k_of)
            out = out.take(pa.array(rep_rows))
            keys = (np.repeat(cells, k_of) << _SALT_SHIFT) | salt
    if cell_col in out.column_names:
        out = out.drop_columns([cell_col])
    return out.append_column(cell_col, pa.array(keys, pa.int64()))


def compute_salt_map(
    ds: ray.data.Dataset,
    size: float,
    threshold: int | None = None,
    target: int | None = None,
    expand: float = 0.0,
) -> dict[int, int]:
    """Probe per-cell row counts (column-pruned: only bbox columns leave
    the scan) and return {cell_id: n_salts} for hot cells. The result is
    tiny (#hot cells) and is captured by value in task closures — the
    broadcast-small-side pattern."""
    from ..stages.geometry_batch import add_bounds, decode_geometry

    threshold = threshold or OPTIONS.salt_threshold
    target = target or OPTIONS.salt_target

    def to_cells(batch: pa.Table) -> pa.Table:
        ga = decode_geometry(batch)
        b = ga.bounds().copy()
        if expand:
            b[:, :2] -= expand
            b[:, 2:] += expand
        _, cells = assign_cells(b, size)
        return pa.table({"__cell": pa.array(cells, pa.int64())})

    from ..stages.agg import bucket_aggregate

    # combiner-first count (no per-cell Python), and filter to HOT cells
    # BEFORE take_all — the driver must only ever hold the hot set (the
    # genuinely tiny broadcast side), not one row per distinct cell
    counts = (
        bucket_aggregate(
            ds.map_batches(
                to_cells, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["__cell"],
            [("__cell", "count", "n")],
        )
        .filter(expr=f"n > {int(threshold)}")
        .take_all()
    )
    out: dict[int, int] = {}
    for row in counts:
        out[int(row["__cell"])] = int(min(256, -(-row["n"] // target)))
    return out
