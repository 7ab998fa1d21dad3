"""Spatial cell index + shuffle layer (SURVEY.md §7.1 step 3).

Replaces the reference's per-layer R-tree + rowid-range batching
(geofileops _geoops_sql.py:4376-4515, fileops.py:621-708) with an explicit
hierarchical square-grid cell assignment, multi-cell replication, and
hot-cell salting ahead of a ``groupby(cell)`` shuffle.
"""

from .cells import (  # noqa: F401
    CELL_OFFSET,
    CELL_SHIFT,
    assign_cells,
    cell_bounds,
    cell_id,
    cell_of_point,
    compute_salt_map,
    replicate_to_cells,
)
from .grid import create_squarish_grid, tile_assignments  # noqa: F401
