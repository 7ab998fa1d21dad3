"""Windowed event aggregation over the ``events`` stream table
(event_id, ts, user_id, event_type, value, props) — the
streaming-window custom operator slot from the build brief (tumbling
event-time windows as a groupby over integer window ids; no watermarks:
the driver tables are bounded batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def tumbling_window_agg(
    ds: ray.data.Dataset,
    window_seconds: int = 3600,
) -> ray.data.Dataset:
    """Per (user_id, tumbling window): event count, value sum, distinct
    event types. window id = floor(epoch_micros / window_micros) —
    integer arithmetic, exactly SQL-mirrorable."""
    wus = window_seconds * 1_000_000

    def keyed(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        win = ts // wus
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "window_id": pa.array(win, pa.int64()),
                "value": batch.column("value"),
                "event_type": batch.column("event_type"),
            }
        )

    def per_group(group: pa.Table) -> pa.Table:
        vals = group.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "window_id": group.column("window_id").slice(0, 1),
                "n_events": pa.array([len(group)], pa.int64()),
                "sum_value": pa.array(
                    [round(float(np.nansum(vals)), 6)], pa.float64()
                ),
                "n_types": pa.array(
                    [len(set(group.column("event_type").to_pylist()))], pa.int64()
                ),
            }
        )

    # pre-aggregate inside each batch before the shuffle (combiner):
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        # sort within batch then reduce runs — cheap local combine
        idx = _pc.sort_indices(
            batch, sort_keys=[("user_id", "ascending"), ("window_id", "ascending")]
        )
        b = batch.take(idx)
        u = b.column("user_id").to_numpy()
        w = b.column("window_id").to_numpy()
        v = b.column("value").to_numpy(zero_copy_only=False)
        et = b.column("event_type").to_pylist()
        key_change = np.flatnonzero((np.diff(u) != 0) | (np.diff(w) != 0)) + 1
        starts = np.concatenate([[0], key_change])
        ends = np.concatenate([key_change, [len(b)]])
        out = {
            "user_id": u[starts],
            "window_id": w[starts],
            "n_events": (ends - starts).astype(np.int64),
            "sum_value": np.add.reduceat(v, starts) if len(b) else np.array([]),
            "types": [sorted(set(et[s:e])) for s, e in zip(starts, ends)],
        }
        return pa.table(
            {
                "user_id": pa.array(out["user_id"], pa.int64()),
                "window_id": pa.array(out["window_id"], pa.int64()),
                "n_events": pa.array(out["n_events"], pa.int64()),
                "sum_value": pa.array(out["sum_value"], pa.float64()),
                "types": pa.array(out["types"], pa.list_(pa.string())),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        n = int(np.sum(group.column("n_events").to_numpy()))
        s = float(np.sum(group.column("sum_value").to_numpy()))
        types = set()
        for t in group.column("types").to_pylist():
            types.update(t)
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "window_id": group.column("window_id").slice(0, 1),
                "n_events": pa.array([n], pa.int64()),
                "sum_value": pa.array([round(s, 6)], pa.float64()),
                "n_types": pa.array([len(types)], pa.int64()),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    partials = keyed_ds.map_batches(partial, batch_format="pyarrow")

    def pairkey(batch: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(batch.column("user_id"), pa.string()),
            pc.cast(batch.column("window_id"), pa.string()),
            "_",
        )
        return batch.append_column("__k", k)

    return (
        partials.map_batches(pairkey, batch_format="pyarrow")
        .groupby("__k")
        .map_groups(merge, batch_format="pyarrow")
    )


def tumbling_window_sql(window_seconds: int = 3600) -> str:
    wus = window_seconds * 1_000_000
    return f"""
SELECT user_id,
       CAST(epoch_us(ts) // {wus} AS BIGINT) AS window_id,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS sum_value,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""
