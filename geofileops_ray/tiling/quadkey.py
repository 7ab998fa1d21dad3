"""Adaptive quadtree cell index (S2/H3-style covering, from scratch).

The flat grid in ``tiling/cells.py`` is the engine's join shuffle key; this
module adds the *hierarchical* half of the north rule's "H3/S2 index":
every geometry is assigned the SMALLEST quadtree cell that fully contains
its bbox — the single-cell covering S2 computes with
``S2CellId::FromToken`` / ``S2RegionCoverer(max_cells=1)``. Large
features land in coarse cells, small ones in fine cells, so the index is
balanced under mixed feature sizes without per-feature tuning (the same
property H3's ``polygonToCells`` resolution picking exploits).

All math is integer-exact and SQL-mirrorable (see QUADKEY_SQL in
pipelines/queries.py): scale the bbox into the 2**max_level integer grid
over a square world extent, then the containing cell is the common
bit-prefix of the corner cell coordinates —

    shift = bit_length((ix0 ^ ix1) | (iy0 ^ iy1))
    level = max_level - shift          (max_level = finest)
    (qx, qy) = (ix0 >> shift, iy0 >> shift)

Reference parity: geofileops has no hierarchical index (it rebuilds a
flat squarish grid per pass, _geoops_gpd.py:1370-1474); this is the
scale-path addition the north rule asks for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def quadkey_of_bbox(
    bounds: np.ndarray,
    world: tuple[float, float, float, float],
    max_level: int = 12,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Smallest quad cell containing each bbox row.

    Returns ``(level, qx, qy)`` with ``level`` in [0, max_level]
    (max_level = finest) and ``(qx, qy)`` the cell coordinates at that
    level. Fully vectorized; exact integer bit math after the one float
    scaling step (which the SQL oracle reproduces op-for-op).
    """
    x0, y0, x1, y1 = world
    side = max(x1 - x0, y1 - y0, 1e-9)
    res = 1 << max_level

    def scaled(v: np.ndarray, origin: float) -> np.ndarray:
        i = np.floor((v - origin) / side * res).astype(np.int64)
        return np.clip(i, 0, res - 1)

    ix0 = scaled(bounds[:, 0], x0)
    iy0 = scaled(bounds[:, 1], y0)
    ix1 = scaled(bounds[:, 2], x0)
    iy1 = scaled(bounds[:, 3], y0)
    z = (ix0 ^ ix1) | (iy0 ^ iy1)
    # exact vectorized bit_length: #powers of two <= z
    powers = np.left_shift(np.int64(1), np.arange(max_level + 1, dtype=np.int64))
    shift = np.searchsorted(powers, z, side="right").astype(np.int64)
    level = max_level - shift
    return level, ix0 >> shift, iy0 >> shift


def pack_quadkey(level: np.ndarray, qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    """One int64 shuffle key: (level << 52) | (qx << 26) | qy.

    Supports max_level <= 26. Mirrored in SQL as
    ``level * 2**52 + qx * 2**26 + qy``.
    """
    return (level << 52) | (qx << 26) | qy


def quadkey_assignments(
    ds: ray.data.Dataset,
    world: tuple[float, float, float, float],
    max_level: int = 12,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-row adaptive quadkey assignment (doc_id, qk_level, qk_x, qk_y,
    qk_id). ``world`` is computed once on the driver (a tiny 4-float
    aggregate) and captured by value — the broadcast-small-side pattern;
    the assignment itself is a stateless vectorized map_batches.
    """
    from ..stages.geometry_batch import add_bounds

    def fn(batch: pa.Table) -> pa.Table:
        b = add_bounds(batch)
        arr = np.column_stack(
            [b.column(c).to_numpy() for c in ("minx", "miny", "maxx", "maxy")]
        )
        level, qx, qy = quadkey_of_bbox(arr, world, max_level)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "qk_level": pa.array(level, pa.int64()),
                "qk_x": pa.array(qx, pa.int64()),
                "qk_y": pa.array(qy, pa.int64()),
                "qk_id": pa.array(pack_quadkey(level, qx, qy), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quadkey_ancestors(level: np.ndarray, qx: np.ndarray, qy: np.ndarray):
    """Yield (lvl, x, y) for each ancestor chain entry up to the root —
    the lookup side of a hierarchical join: a probe at level L matches
    any indexed feature stored at an ancestor cell. Vectorized per level.
    """
    lvl = level.copy()
    x, y = qx.copy(), qy.copy()
    out = [(lvl.copy(), x.copy(), y.copy())]
    while (lvl > 0).any():
        step = lvl > 0
        lvl = np.where(step, lvl - 1, lvl)
        x = np.where(step, x >> 1, x)
        y = np.where(step, y >> 1, y)
        out.append((lvl.copy(), x.copy(), y.copy()))
    return out
