"""Per-partition lineage checkpointing.

The reference's resume story is file-level idempotence (``force=False``
short-circuit when the output exists, geofileops _io_util.output_exists
used at e.g. geoops.py:110-111). The north rule requires finer grain:
per-partition lineage records (cell id, input batch range, output row
counts, stage metrics) written next to the output so a failed run can
skip finished partitions and resume mid-pipeline.

Layout under ``checkpoint_dir``:

    data/part=<cell>/...parquet   — one directory per partition key
    lineage/<cell>.json           — written AFTER the partition's data
                                    (write-then-commit: a partition is
                                    "done" iff its lineage record exists)

``checkpointed_write`` consumes a Dataset whose rows carry a partition
column, skips partitions whose lineage record already exists (pushdown:
the skip happens in a map_batches filter BEFORE any heavy compute when
placed early in the pipeline), writes the rest partition-per-file and
commits lineage records. Single-writer-per-partition is guaranteed by
hash-partitioning on the key.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def finished_partitions(checkpoint_dir: str) -> set[int]:
    """Partition keys whose lineage record exists (committed)."""
    ldir = os.path.join(checkpoint_dir, "lineage")
    if not os.path.isdir(ldir):
        return set()
    out = set()
    for name in os.listdir(ldir):
        if name.endswith(".json"):
            out.add(int(name[:-5]))
    return out


class LineageWriter:
    """Actor-pool stage: writes one parquet file + lineage record per
    partition group. Use via ``checkpointed_write`` (groupby partition →
    map_groups(LineageWriter))."""

    def __init__(
        self,
        checkpoint_dir: str,
        partition_col: str,
        sort_cols: list[str] | None = None,
        range_col: str | None = None,
    ):
        self.dir = checkpoint_dir
        self.col = partition_col
        self.sort_cols = list(sort_cols or [])
        self.range_col = range_col
        os.makedirs(os.path.join(checkpoint_dir, "data"), exist_ok=True)
        os.makedirs(os.path.join(checkpoint_dir, "lineage"), exist_ok=True)

    def __call__(self, group: pa.Table) -> pa.Table:
        key = int(group.column(self.col)[0].as_py())
        if self.sort_cols:
            import pyarrow.compute as pc

            group = group.take(
                pc.sort_indices(
                    group,
                    sort_keys=[(c, "ascending") for c in self.sort_cols],
                )
            )
        # fault-injection hook for the kill/resume e2e test: slow each
        # partition write so a SIGKILL can land between commits
        delay = float(os.environ.get("GFR_LINEAGE_WRITE_DELAY", "0") or 0)
        if delay:
            time.sleep(delay)
        t0 = time.perf_counter()
        pdir = os.path.join(self.dir, "data", f"part={key}")
        os.makedirs(pdir, exist_ok=True)
        path = os.path.join(pdir, "part.parquet")
        pq.write_table(group.drop_columns([self.col]), path)
        record = {
            "partition": key,
            "rows_out": len(group),
            "bytes_out": group.nbytes,
            "write_seconds": round(time.perf_counter() - t0, 4),
            "columns": group.column_names,
            "committed_at": time.time(),
        }
        if self.range_col and self.range_col in group.column_names:
            # the north rule's "input batch range": which slice of the
            # input keyspace this partition covers, so an auditor can
            # map any output partition back to its input rows without
            # replaying the shuffle
            import pyarrow.compute as pc

            c = group.column(self.range_col)
            record["input_range"] = {
                "col": self.range_col,
                "min": pc.min(c).as_py(),
                "max": pc.max(c).as_py(),
                "count": len(c) - c.null_count,
            }
        tmp = os.path.join(self.dir, "lineage", f".{key}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, os.path.join(self.dir, "lineage", f"{key}.json"))
        return pa.table(
            {
                "partition": pa.array([key], pa.int64()),
                "rows_out": pa.array([len(group)], pa.int64()),
            }
        )


def checkpointed_write(
    ds: ray.data.Dataset,
    checkpoint_dir: str,
    partition_col: str = "__cell",
    sort_cols: list[str] | None = None,
    range_col: str | None = None,
) -> list[dict]:
    """Write ``ds`` partitioned by ``partition_col`` with per-partition
    lineage commit; partitions already committed are SKIPPED before the
    shuffle (resume). ``sort_cols`` orders rows WITHIN each partition
    file (deterministic shard layout); ``range_col`` names an input id
    column whose per-partition min/max/count is recorded in the lineage
    record (input-range provenance). Returns this run's lineage
    summaries."""
    done = finished_partitions(checkpoint_dir)
    if done:
        done_arr = np.array(sorted(done), dtype=np.int64)

        def skip(batch: pa.Table) -> pa.Table:
            keys = batch.column(partition_col).to_numpy()
            keep = ~np.isin(keys, done_arr)
            return batch.filter(pa.array(keep))

        ds = ds.map_batches(skip, batch_format="pyarrow", zero_copy_batch=True)
    writer = LineageWriter(
        checkpoint_dir, partition_col, sort_cols=sort_cols, range_col=range_col
    )

    def write_group(group: pa.Table) -> pa.Table:
        return writer(group)

    out = ds.groupby(partition_col).map_groups(write_group, batch_format="pyarrow")
    return out.take_all()
