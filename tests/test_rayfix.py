"""Schema-stable empty blocks (rayfix): Ray 2.49 loses a typed 0-row
block's schema across map_batches / sort / groupby boundaries; the
package-level patch keeps it. Regressions here mean the RefBundle
"different schema" warnings (and schema-strict union failures on a real
cluster) are back."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

import geofileops_ray  # noqa: F401  (applies rayfix at import)
from geofileops_ray import rayfix


def test_rayfix_applied():
    assert rayfix.apply() is True


def test_map_batches_runs_udf_on_typed_empty_blocks(ray_session):
    t_full = pa.table({"a": pa.array([1, 2], pa.int64())})
    t_empty = pa.table({"a": pa.array([], pa.int64())})
    ds = ray.data.from_arrow([t_full, t_empty])
    out = ds.map_batches(
        lambda b: b.append_column(
            "b", pa.array(np.zeros(len(b)), pa.float64())
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    schemas = {
        tuple(t.schema.names) for t in ray.get(out.to_arrow_refs())
    }
    assert schemas == {("a", "b")}


def test_projection_keeps_schema_on_empty_blocks(ray_session):
    # the original repro: a projection after a selective stage whose
    # blocks are mostly empty must emit the PROJECTED schema everywhere
    t_full = pa.table(
        {"x": pa.array([1, 2], pa.int64()), "y": pa.array([3, 4], pa.int64())}
    )
    t_empty = t_full.slice(0, 0)
    ds = ray.data.from_arrow([t_empty, t_full, t_empty])
    out = ds.map_batches(
        lambda b: pa.table({"l1_x": b.column("x")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    schemas = {
        tuple(t.schema.names) for t in ray.get(out.to_arrow_refs())
    }
    assert schemas == {("l1_x",)}


def test_sort_empty_partitions_carry_schema(ray_session):
    # 2 rows over many partitions: most sort reduce partitions are
    # empty and must still carry the input schema (rayfix patch d)
    t = pa.table(
        {
            "k": pa.array([5, 1], pa.int64()),
            "v": pa.array(["a", "b"], pa.string()),
        }
    )
    ds = ray.data.from_arrow([t] + [t.slice(0, 0)] * 6)
    out = ds.sort("k")
    schemas = {
        tuple(tt.schema.names) for tt in ray.get(out.to_arrow_refs())
    }
    assert schemas == {("k", "v")}


def test_groupby_map_groups_empty_partition_typed(ray_session):
    # a len==0-guarded group fn must get the chance to emit its typed
    # output on empty partitions (rayfix patch c)
    t = pa.table(
        {
            "g": pa.array([1, 1, 2], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    ds = ray.data.from_arrow([t] + [t.slice(0, 0)] * 4)

    def fn(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "s": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "g": group.column("g").slice(0, 1),
                "s": pa.array(
                    [float(sum(group.column("v").to_pylist()))],
                    pa.float64(),
                ),
            }
        )

    out = ds.groupby("g").map_groups(fn, batch_format="pyarrow")
    tabs = ray.get(out.to_arrow_refs())
    schemas = {tuple(tt.schema.names) for tt in tabs}
    assert schemas == {("g", "s")}
    rows = sorted(
        r
        for tt in tabs
        for r in zip(
            tt.column("g").to_pylist(), tt.column("s").to_pylist()
        )
    )
    assert rows == [(1, 3.0), (2, 3.0)]
