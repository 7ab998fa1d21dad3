"""Hexagonal cell index (H3 analogue of the quadkey S2 analogue).

North-rule coverage: "H3/S2 index". ``tiling/quadkey.py`` is the
S2-style hierarchical square index; this module is the hex side:
points are assigned to the hexagonal Voronoi cells of a two-phase
offset lattice — exactly the construction planar H3 uses per face
(hex cells = Voronoi diagram of a triangular center lattice).

Lattice: phase-A centers at ``(i*W, j*2H)``, phase-B centers at
``((i+0.5)*W, (j+0.5)*2H)``.  With ``H/W = sqrt(3)/6`` the cells are
regular hexagons; we default to W=8, H=3.5 (ratio 0.4375, a vertically
stretched hex) so every center coordinate is dyadic-rational — all
distance arithmetic below is then EXACT in float64 for dyadic inputs,
which makes the assignment bit-reproducible in SQL (the DuckDB oracle
mirrors the same FLOOR/CASE algebra; ties broken "A wins" identically
in both engines).

Cell id is the doubled-coordinate pair ``(hex_row, hex_col)``:
phase-A center (i, j) → (2j, 2i); phase-B center → (2j+1, 2i+1).
Neighbouring (edge-sharing Voronoi) hexes differ by (±2,0), (±1,±1):
as long as the vertical center spacing ``2H`` is smaller than the
horizontal ``W``, the two vertical same-phase cells share an edge and
the two horizontal ones do NOT (they only meet the four diagonals) —
cheap ring expansion for kNN-style probes without any library.

Scale shape: assignment is a stateless vectorized ``map_batches`` (two
candidate roundings + one comparison per point, ~10 flops); binning is
a per-batch combiner (np.unique on the packed key) followed by one
small groupby — the only shuffle is over distinct cells, not points.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

HEX_W = 8.0  # horizontal center spacing within a phase
HEX_H = 3.5  # half the vertical period (phase-B row offset)


def hex_assign(
    x: np.ndarray, y: np.ndarray, width: float = HEX_W, halfv: float = HEX_H
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized point → (hex_row, hex_col) doubled-coordinate cell id.

    Nearest-center over the two phase lattices; the Voronoi cell of the
    winning center is the containing hexagon. Ties (point exactly on a
    cell edge) go to phase A — the SQL mirror uses the same ``<=``.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    w, v2 = width, 2.0 * halfv
    ia = np.floor(x / w + 0.5)
    ja = np.floor(y / v2 + 0.5)
    ib = np.floor((x - w * 0.5) / w + 0.5)
    jb = np.floor((y - halfv) / v2 + 0.5)
    dax = x - ia * w
    day = y - ja * v2
    dbx = x - (ib * w + w * 0.5)
    dby = y - (jb * v2 + halfv)
    a_wins = dax * dax + day * day <= dbx * dbx + dby * dby
    row = np.where(a_wins, 2 * ja, 2 * jb + 1).astype(np.int64)
    col = np.where(a_wins, 2 * ia, 2 * ib + 1).astype(np.int64)
    return row, col


def hex_center(
    row: np.ndarray, col: np.ndarray, width: float = HEX_W, halfv: float = HEX_H
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`hex_assign` — doubled coords → center point."""
    row = np.asarray(row, dtype=np.float64)
    col = np.asarray(col, dtype=np.float64)
    return col * (width * 0.5), row * halfv


def hex_ring(row: int, col: int, k: int = 1) -> list[tuple[int, int]]:
    """All cells within k rings of (row, col) — the neighbour probe used
    for kNN-style expansion (H3 kRing analogue). k=0 → just the cell."""
    out = []
    for dr in range(-2 * k, 2 * k + 1):
        for dc in range(-2 * k, 2 * k + 1):
            if (dr + dc) % 2:
                continue  # doubled coords: row+col parity is invariant
            # doubled-height hex distance: ROW is the doubled axis here
            # (vertical same-phase cells are the edge-sharing ones — see
            # module docstring); one hex step is (±1,±1) or (±2,0)
            adr, adc = abs(dr), abs(dc)
            dist = adc + max(0, (adr - adc) // 2)
            if dist <= k:
                out.append((row + dr, col + dc))
    return sorted(out)


def hex_bin_points(
    ds: ray.data.Dataset,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "doc_id",
    width: float = HEX_W,
    halfv: float = HEX_H,
) -> ray.data.Dataset:
    """Per-hex-cell point counts: (hex_row, hex_col, n_points, min_doc).

    Per-batch combiner (np.unique on the packed 64-bit key) before the
    groupby — the shuffle carries one row per distinct cell per block,
    not one per point, so skewed dense regions cost bandwidth only once.
    """

    def partial(batch: pa.Table) -> pa.Table:
        xs = batch.column(x_col).to_numpy()
        ys = batch.column(y_col).to_numpy()
        ids = batch.column(id_col).to_numpy()
        row, col = hex_assign(xs, ys, width, halfv)
        key = (row + 1_000_000) * 4_000_000 + (col + 1_000_000)
        uk, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
        min_doc = np.full(len(uk), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(min_doc, inv, ids)
        return pa.table(
            {
                "hex_row": pa.array(uk // 4_000_000 - 1_000_000, pa.int64()),
                "hex_col": pa.array(uk % 4_000_000 - 1_000_000, pa.int64()),
                "n_points": pa.array(counts.astype(np.int64), pa.int64()),
                "min_doc": pa.array(min_doc, pa.int64()),
            }
        )

    # merge partials with the combiner-first vectorized aggregate (the
    # occupied-cell count scales with the data extent, so a per-cell
    # map_groups would be per-key Python at exactly the wrong scale)
    from ..stages.agg import bucket_aggregate

    return bucket_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["hex_row", "hex_col"],
        [("n_points", "sum", "n_points"), ("min_doc", "min", "min_doc")],
    )
