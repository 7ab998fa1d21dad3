"""Windowed event aggregation over the ``events`` stream table
(event_id, ts, user_id, event_type, value, props) — the
streaming-window custom operator slot from the build brief (tumbling
event-time windows as a groupby over integer window ids; no watermarks:
the driver tables are bounded batch).
"""

from __future__ import annotations

import math

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


def sessionize(
    ds: ray.data.Dataset,
    gap_seconds: int = 1800,
) -> ray.data.Dataset:
    """Gap-based sessionization (the session-window streaming operator):
    per user, events sorted by time start a new session whenever the gap
    from the previous event exceeds ``gap_seconds``.

    Shape: column-pruned keyed projection → ONE shuffle keyed on
    ``user_id`` → vectorized per-user segmentation (sort, diff,
    flag-cumsum, ``reduceat`` per session — no Python loop over events).
    Partitioning assumption (documented per the build brief): a single
    user's event history fits one group — the same per-key assumption
    Flink/Spark session windows make; a pathological single-user firehose
    would need secondary time-bucketing before this stage.

    Session assignment is invariant to the tie order of equal timestamps
    (equal ts ⇒ gap 0 ⇒ same session), so the result is deterministic
    without an explicit tie-break column.
    """
    gap_us = gap_seconds * 1_000_000

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts_us": batch.column("ts").cast(pa.int64()),
                "value": batch.column("value"),
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts_us").to_numpy()
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        v = group.column("value").to_numpy(zero_copy_only=False)[order]
        n = len(ts)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [n]])
        sums = np.add.reduceat(np.where(np.isnan(v), 0.0, v), starts)
        return pa.table(
            {
                "user_id": pa.array(
                    np.repeat(group.column("user_id")[0].as_py(), len(starts)),
                    pa.int64(),
                ),
                "session_id": pa.array(
                    np.arange(len(starts), dtype=np.int64), pa.int64()
                ),
                "n_events": pa.array(
                    (ends - starts).astype(np.int64), pa.int64()
                ),
                "start_us": pa.array(ts[starts], pa.int64()),
                "duration_us": pa.array(
                    ts[ends - 1] - ts[starts], pa.int64()
                ),
                "sum_value": pa.array(np.round(sums, 6), pa.float64()),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def asof_join_events(
    ds: ray.data.Dataset,
    left_type: str = "click",
    right_type: str = "view",
) -> ray.data.Dataset:
    """As-of join (the brief's named custom operator): attach to every
    ``left_type`` event the LATEST ``right_type`` event of the same user
    with ``ts_right <= ts_left`` plus the running count of prior
    right-side events.

    Shape: column-pruned filter to the two types → ONE shuffle keyed on
    ``user_id`` → per-user vectorized merge (sort right side once,
    ``np.searchsorted`` for all left rows). Same per-key partitioning
    assumption as ``sessionize``; ties at identical timestamps resolve
    deterministically to the max event_id (the SQL ROW_NUMBER mirror).
    """

    def keyed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        m = _pc.is_in(
            batch.column("event_type"),
            value_set=pa.array([left_type, right_type]),
        )
        b = batch.filter(m)
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "event_id": b.column("event_id"),
                "ts_us": b.column("ts").cast(pa.int64()),
                "is_left": pc.equal(b.column("event_type"), left_type),
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        is_l = group.column("is_left").to_numpy(zero_copy_only=False)
        ts = group.column("ts_us").to_numpy()
        eid = group.column("event_id").to_numpy()
        ta_, ia_ = ts[is_l], eid[is_l]
        tb, ib = ts[~is_l], eid[~is_l]
        order = np.lexsort((ib, tb))
        tb, ib = tb[order], ib[order]
        pos = np.searchsorted(tb, ta_, side="right") - 1
        hit = pos >= 0
        safe = np.maximum(pos, 0)
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(len(ta_), group.column("user_id")[0].as_py()),
                    pa.int64(),
                ),
                "event_id": pa.array(ia_, pa.int64()),
                "ts_us": pa.array(ta_, pa.int64()),
                "ref_event_id": pa.array(
                    np.where(hit, ib[safe] if len(ib) else 0, 0),
                    pa.int64(),
                    mask=~hit,
                ),
                "ref_ts_us": pa.array(
                    np.where(hit, tb[safe] if len(tb) else 0, 0),
                    pa.int64(),
                    mask=~hit,
                ),
                "n_ref_before": pa.array(pos + 1, pa.int64()),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def percentiles_per_group(
    ds: ray.data.Dataset,
    key_col: str = "event_type",
    value_col: str = "value",
    qs: tuple = (0.5, 0.9, 0.99),
) -> ray.data.Dataset:
    """Exact per-key percentiles (DuckDB ``quantile_cont`` semantics:
    sorted linear interpolation at q·(n-1)).

    One shuffle keyed on ``key_col``, vectorized sort+interp per group.
    Exact-by-sort assumes a key's values fit one group (fine for
    low-cardinality keys like event_type/lang at any row scale since the
    projection is 2 columns); for high-cardinality × huge-group inputs
    swap the final for a t-digest style sketch — the pipeline shape
    (prune → shuffle → per-key reduce) stays the same."""

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch.column(key_col),
                value_col: batch.column(value_col),
            }
        )

    def per_key(group: pa.Table) -> pa.Table:
        v = group.column(value_col).to_numpy(zero_copy_only=False)
        v = np.sort(v[~np.isnan(v)])
        cols = {key_col: group.column(key_col).slice(0, 1)}
        for q in qs:
            if len(v) == 0:
                val = float("nan")
            else:
                pos = q * (len(v) - 1)
                lo = int(math.floor(pos))
                hi = min(lo + 1, len(v) - 1)
                val = v[lo] + (pos - lo) * (v[hi] - v[lo])
            cols[f"p{str(q)[2:]}"] = pa.array(
                [round(float(val), 6)], pa.float64()
            )
        return pa.table(cols)

    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .map_groups(per_key, batch_format="pyarrow")
    )


def percentiles_sql(
    key_col: str = "event_type",
    value_col: str = "value",
    qs: tuple = (0.5, 0.9, 0.99),
) -> str:
    cols = ",\n       ".join(
        f"ROUND(quantile_cont({value_col}, {q}), 6) AS p{str(q)[2:]}"
        for q in qs
    )
    return f"""
SELECT {key_col},
       {cols}
FROM events GROUP BY 1 ORDER BY 1
"""


def asof_join_sql(left_type: str = "click", right_type: str = "view") -> str:
    return f"""
WITH a AS (SELECT * FROM events WHERE event_type='{left_type}'),
b AS (SELECT user_id, ts, event_id,
       ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) rn
      FROM events WHERE event_type='{right_type}'),
b1 AS (SELECT * FROM b WHERE rn = 1)
SELECT a.user_id, a.event_id, epoch_us(a.ts) AS ts_us,
       bb.event_id AS ref_event_id, epoch_us(bb.ts) AS ref_ts_us,
       (SELECT COUNT(*) FROM events b2
         WHERE b2.user_id = a.user_id AND b2.event_type='{right_type}'
           AND b2.ts <= a.ts) AS n_ref_before
FROM a ASOF LEFT JOIN b1 bb
  ON a.user_id = bb.user_id AND a.ts >= bb.ts
ORDER BY 1, 2
"""


def sessionize_sql(gap_seconds: int = 1800) -> str:
    gap_us = gap_seconds * 1_000_000
    return f"""
WITH d AS (
  SELECT user_id, epoch_us(ts) AS ts_us, value,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts) > {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM events),
s AS (SELECT user_id, ts_us, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM d)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(ts_us) AS start_us,
       MAX(ts_us) - MIN(ts_us) AS duration_us,
       ROUND(SUM(value), 6) AS sum_value
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""


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
