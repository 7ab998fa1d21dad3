"""Small driver-side helpers (test / bench convenience — not hot path)."""

from __future__ import annotations

import pyarrow as pa

import ray.data


def collect(ds: ray.data.Dataset) -> pa.Table:
    """Materialize a (small) Dataset to one Arrow table on the driver.
    Only for results / tests — pipelines should stream to sinks."""
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table({})
    return pa.concat_tables([t if isinstance(t, pa.Table) else pa.Table.from_batches([t]) for t in tables])
