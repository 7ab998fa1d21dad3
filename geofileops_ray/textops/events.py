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

    # pre-aggregate inside each batch before the shuffle (combiner):
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        if len(batch) == 0:  # u[starts] would index into an empty array
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "window_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_value": pa.array([], pa.float64()),
                    "nn_value": pa.array([], pa.int64()),
                    "types": pa.array([], pa.list_(pa.string())),
                }
            )
        # sort within batch then reduce runs — cheap local combine
        idx = _pc.sort_indices(
            batch, sort_keys=[("user_id", "ascending"), ("window_id", "ascending")]
        )
        b = batch.take(idx)
        u = b.column("user_id").to_numpy()
        w = b.column("window_id").to_numpy()
        v = b.column("value").to_numpy(zero_copy_only=False)
        # SQL SUM ignores NULL — zero NaN, but carry the per-run non-null
        # count so an ALL-null run can finalize to NULL (not 0.0)
        nonnull = ~np.isnan(v)
        v = np.where(nonnull, v, 0.0)
        et = b.column("event_type").to_pylist()
        key_change = np.flatnonzero((np.diff(u) != 0) | (np.diff(w) != 0)) + 1
        starts = np.concatenate([[0], key_change])
        ends = np.concatenate([key_change, [len(b)]])
        out = {
            "user_id": u[starts],
            "window_id": w[starts],
            "n_events": (ends - starts).astype(np.int64),
            "sum_value": np.add.reduceat(v, starts),
            "nn_value": np.add.reduceat(nonnull.astype(np.int64), starts),
            "types": [sorted(set(et[s:e])) for s, e in zip(starts, ends)],
        }
        return pa.table(
            {
                "user_id": pa.array(out["user_id"], pa.int64()),
                "window_id": pa.array(out["window_id"], pa.int64()),
                "n_events": pa.array(out["n_events"], pa.int64()),
                "sum_value": pa.array(out["sum_value"], pa.float64()),
                "nn_value": pa.array(out["nn_value"], pa.int64()),
                "types": pa.array(out["types"], pa.list_(pa.string())),
            }
        )

    def merge_part(group: pa.Table) -> pa.Table:
        # one call per salt partition: merge all (user, window) runs
        # vectorized — counts/sums via reduceat, distinct-type counts by
        # sorting the flattened (run, type) pairs and counting boundaries
        srt = group.take(
            pc.sort_indices(
                group,
                sort_keys=[("user_id", "ascending"), ("window_id", "ascending")],
            )
        )
        u = srt.column("user_id").to_numpy()
        w = srt.column("window_id").to_numpy()
        n = len(u)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "window_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_value": pa.array([], pa.float64()),
                    "n_types": pa.array([], pa.int64()),
                }
            )
        starts = np.flatnonzero(
            np.concatenate([[True], (u[1:] != u[:-1]) | (w[1:] != w[:-1])])
        )
        L = np.diff(np.concatenate([starts, [n]]))
        run_id = np.repeat(np.arange(len(starts)), L)
        nev = np.add.reduceat(srt.column("n_events").to_numpy(), starts)
        sv = np.add.reduceat(srt.column("sum_value").to_numpy(), starts)
        nn = np.add.reduceat(srt.column("nn_value").to_numpy(), starts)
        tl = srt.column("types").combine_chunks()
        flat = np.asarray(tl.flatten().to_pylist(), dtype=object)
        offs = tl.offsets.to_numpy()
        rid = np.repeat(run_id, offs[1:] - offs[:-1])
        if len(flat):
            o = np.lexsort((flat, rid))
            fr, fv = rid[o], flat[o]
            newv = np.concatenate([[True], (fr[1:] != fr[:-1]) | (fv[1:] != fv[:-1])])
            ntypes = np.bincount(fr[newv], minlength=len(starts))
        else:
            ntypes = np.zeros(len(starts), dtype=np.int64)
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "window_id": pa.array(w[starts], pa.int64()),
                "n_events": pa.array(nev.astype(np.int64), pa.int64()),
                # all values in the window NULL ⇒ SQL SUM is NULL, not 0
                "sum_value": pa.array(np.round(sv, 6), pa.float64(), mask=nn == 0),
                "n_types": pa.array(ntypes.astype(np.int64), pa.int64()),
            }
        )

    from ..stages.agg import _salt_parts, default_nparts

    nparts = default_nparts()  # fixed at the driver: same key, same part
    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    partials = keyed_ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.map_batches(
            lambda b: _salt_parts(b, ["user_id", "window_id"], nparts),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(merge_part, batch_format="pyarrow")
    )


def hopping_window_agg(
    ds: ray.data.Dataset,
    window_seconds: int = 3600,
    slide_seconds: int = 900,
) -> ray.data.Dataset:
    """Per (user_id, hopping window): event count + value sum. Windows
    have length ``window_seconds`` and start every ``slide_seconds``
    (must divide evenly); window id i covers [i·S, i·S + W), so each
    event belongs to exactly W/S consecutive windows — the replication
    happens INSIDE the batch (np.repeat, k small) before the same
    combiner → salt-partition merge shape as the tumbling windows.
    window_id is the integer window start // slide — SQL-mirrorable
    with a CROSS JOIN range(0, k)."""
    if window_seconds % slide_seconds:
        raise ValueError("window_seconds must be a multiple of slide_seconds")
    k = window_seconds // slide_seconds
    sus = slide_seconds * 1_000_000

    def keyed(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        base = ts // sus
        n = len(ts)
        rep = np.repeat(np.arange(n, dtype=np.int64), k)
        j = np.tile(np.arange(k, dtype=np.int64), n)
        u = batch.column("user_id").to_numpy()
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(u[rep], pa.int64()),
                "window_id": pa.array(base[rep] - j, pa.int64()),
                "value": pa.array(v[rep], pa.float64()),
            }
        )

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "window_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_value": pa.array([], pa.float64()),
                    "nn_value": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            batch,
            sort_keys=[("user_id", "ascending"), ("window_id", "ascending")],
        )
        b = batch.take(idx)
        u = b.column("user_id").to_numpy()
        w = b.column("window_id").to_numpy()
        v = b.column("value").to_numpy(zero_copy_only=False)
        # SQL SUM ignores NULL; the per-run non-null count lets an
        # all-NULL (user, window) finalize to NULL instead of 0.0
        nonnull = ~np.isnan(v)
        v = np.where(nonnull, v, 0.0)
        starts = np.flatnonzero(
            np.concatenate([[True], (u[1:] != u[:-1]) | (w[1:] != w[:-1])])
        )
        ends = np.concatenate([starts[1:], [len(b)]])
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "window_id": pa.array(w[starts], pa.int64()),
                "n_events": pa.array(
                    (ends - starts).astype(np.int64), pa.int64()
                ),
                "sum_value": pa.array(np.add.reduceat(v, starts), pa.float64()),
                "nn_value": pa.array(
                    np.add.reduceat(nonnull.astype(np.int64), starts), pa.int64()
                ),
            }
        )

    def merge_part(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "window_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_value": pa.array([], pa.float64()),
                }
            )
        srt = group.take(
            pc.sort_indices(
                group,
                sort_keys=[("user_id", "ascending"), ("window_id", "ascending")],
            )
        )
        u = srt.column("user_id").to_numpy()
        w = srt.column("window_id").to_numpy()
        starts = np.flatnonzero(
            np.concatenate([[True], (u[1:] != u[:-1]) | (w[1:] != w[:-1])])
        )
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "window_id": pa.array(w[starts], pa.int64()),
                "n_events": pa.array(
                    np.add.reduceat(
                        srt.column("n_events").to_numpy(), starts
                    ).astype(np.int64),
                    pa.int64(),
                ),
                # all values in the window NULL ⇒ SQL SUM is NULL, not 0
                "sum_value": pa.array(
                    np.round(
                        np.add.reduceat(srt.column("sum_value").to_numpy(), starts),
                        6,
                    ),
                    pa.float64(),
                    mask=np.add.reduceat(srt.column("nn_value").to_numpy(), starts)
                    == 0,
                ),
            }
        )

    from ..stages.agg import _salt_parts, default_nparts

    nparts = default_nparts()  # fixed at the driver: same key, same part
    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(
            lambda b: _salt_parts(b, ["user_id", "window_id"], nparts),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(merge_part, batch_format="pyarrow")
    )


def hopping_window_sql(
    window_seconds: int = 3600, slide_seconds: int = 900
) -> str:
    k = window_seconds // slide_seconds
    sus = slide_seconds * 1_000_000
    return f"""
SELECT user_id,
       CAST(epoch_us(ts) // {sus} - j AS BIGINT) AS window_id,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM events
CROSS JOIN (SELECT CAST(range AS BIGINT) AS j FROM range(0, {k}))
GROUP BY 1, 2 ORDER BY 1, 2
"""


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

    def per_part(group: pa.Table) -> pa.Table:
        # one call per salt partition: sort (user, ts) once, session
        # breaks = user change OR gap; per-session reduceat; session_id =
        # position within the user's session sequence — all vectorized
        srt = group.take(
            pc.sort_indices(
                group, sort_keys=[("user_id", "ascending"), ("ts_us", "ascending")]
            )
        )
        u = srt.column("user_id").to_numpy()
        ts = srt.column("ts_us").to_numpy()
        v = srt.column("value").to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "duration_us": pa.array([], pa.int64()),
                    "sum_value": pa.array([], pa.float64()),
                }
            )
        newu = np.concatenate([[True], u[1:] != u[:-1]])
        news = newu | np.concatenate([[True], (ts[1:] - ts[:-1]) > gap_us])
        starts = np.flatnonzero(news)
        ends = np.concatenate([starts[1:], [n]])
        nonnull = ~np.isnan(v)
        sums = np.add.reduceat(np.where(nonnull, v, 0.0), starts)
        # all values in the session NULL ⇒ SQL SUM is NULL, not 0.0
        allnull = np.add.reduceat(nonnull.astype(np.int64), starts) == 0
        # session_id: index within each user's session run
        user_first = np.flatnonzero(newu[starts])
        sid = np.arange(len(starts), dtype=np.int64) - np.repeat(
            user_first, np.diff(np.concatenate([user_first, [len(starts)]]))
        )
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "session_id": pa.array(sid, pa.int64()),
                "n_events": pa.array((ends - starts).astype(np.int64), pa.int64()),
                "start_us": pa.array(ts[starts], pa.int64()),
                "duration_us": pa.array(ts[ends - 1] - ts[starts], pa.int64()),
                "sum_value": pa.array(np.round(sums, 6), pa.float64(), mask=allnull),
            }
        )

    from ..stages.agg import _salt_parts, default_nparts

    nparts = default_nparts()  # fixed at the driver: same key, same part
    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda b: _salt_parts(b, ["user_id"], nparts),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(per_part, batch_format="pyarrow")
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

    def per_part(group: pa.Table) -> pa.Table:
        # one call per salt partition: merge-order ALL users' rows by
        # (user, ts, eid) with rights before lefts on ties, then the
        # as-of lookup is a per-row running count / last-seen-right
        # (cumsum + maximum.accumulate with per-user reset) — no per-user
        # Python calls
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "ref_event_id": pa.array([], pa.int64()),
                "ref_ts_us": pa.array([], pa.int64()),
                "n_ref_before": pa.array([], pa.int64()),
            }
        )
        if len(group) == 0:
            return empty
        u0 = group.column("user_id").to_numpy()
        ts0 = group.column("ts_us").to_numpy()
        eid0 = group.column("event_id").to_numpy()
        isl0 = group.column("is_left").to_numpy(zero_copy_only=False)
        # rights before lefts at equal (user, ts); rights by ascending
        # eid so last-seen = max event_id (the SQL ROW_NUMBER mirror)
        o = np.lexsort((eid0, isl0, ts0, u0))
        u, ts, eid, isl = u0[o], ts0[o], eid0[o], isl0[o]
        n = len(u)
        newu = np.concatenate([[True], u[1:] != u[:-1]])
        run_start = np.maximum.accumulate(
            np.where(newu, np.arange(n), 0)
        )
        # rights preceding each row within its user run: global exclusive
        # cumsum minus the cumsum at the run start
        right = ~isl
        cr_excl = np.concatenate([[0], np.cumsum(right)[:-1]])
        n_right = cr_excl - cr_excl[run_start]
        # index of the latest right so far (within run), else -1
        lr = np.where(right, np.arange(n), -1)
        lr = np.maximum.accumulate(lr)
        valid = lr >= run_start
        lefts = np.flatnonzero(isl)
        hit = valid[lefts]
        safe = np.maximum(lr[lefts], 0)
        return pa.table(
            {
                "user_id": pa.array(u[lefts], pa.int64()),
                "event_id": pa.array(eid[lefts], pa.int64()),
                "ts_us": pa.array(ts[lefts], pa.int64()),
                "ref_event_id": pa.array(
                    np.where(hit, eid[safe], 0), pa.int64(), mask=~hit
                ),
                "ref_ts_us": pa.array(
                    np.where(hit, ts[safe], 0), pa.int64(), mask=~hit
                ),
                "n_ref_before": pa.array(
                    n_right[lefts].astype(np.int64), pa.int64()
                ),
            }
        )

    from ..stages.agg import _salt_parts, default_nparts

    nparts = default_nparts()  # fixed at the driver: same key, same part
    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda b: _salt_parts(b, ["user_id"], nparts),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def percentiles_per_group(
    ds: ray.data.Dataset,
    key_col: str = "event_type",
    value_col: str = "value",
    qs: tuple = (0.5, 0.9, 0.99),
) -> ray.data.Dataset:
    """Exact per-key percentiles (DuckDB ``quantile_cont`` semantics:
    sorted linear interpolation at q·(n-1)).

    One hash shuffle into ~2×CPU salt partitions; each partition sorts
    (key, value) ONCE and interpolates every quantile vectorized over
    the key runs — key cardinality costs no per-key Python. Exact-by-
    sort assumes a salt partition fits a worker (the 2-column projection
    makes that rows/2·CPUs × 16 bytes); for huge-value-count keys swap
    the merge for a t-digest sketch — the pipeline shape stays."""

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch.column(key_col),
                value_col: batch.column(value_col),
            }
        )

    def per_part(group: pa.Table) -> pa.Table:
        # one call per salt partition, all its keys at once: sort
        # (key, value) ONCE, then every quantile is a vectorized
        # interpolation at starts + q·(L-1) — no per-key Python
        group = group.drop_columns(["__part"])
        cols: dict = {}
        if len(group) == 0:
            cols[key_col] = group.column(key_col)
            for q in qs:
                cols[f"p{str(q)[2:]}"] = pa.array([], pa.float64())
            return pa.table(cols)
        v0 = group.column(value_col).to_numpy(zero_copy_only=False)
        kcol = group.column(key_col)
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        enc = pc.dictionary_encode(kcol)
        kidx = enc.indices.to_numpy().astype(np.int64)
        order = np.lexsort((v0, kidx))  # NaNs sort last within each key
        ks, v = kidx[order], v0[order]
        n = len(ks)
        newk = np.ones(n, dtype=bool)
        newk[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(newk)
        # quantiles interpolate over the key's NON-NaN prefix (SQL
        # quantile_cont ignores NULLs; an all-NaN key yields NaN)
        Lv = np.add.reduceat((~np.isnan(v)).astype(np.int64), starts)
        cols[key_col] = kcol.take(
            pa.array(np.asarray(order[starts]), pa.int64())
        )
        for q in qs:
            pos = q * np.maximum(Lv - 1, 0).astype(np.float64)
            lo = np.floor(pos).astype(np.int64)
            hi = np.minimum(lo + 1, np.maximum(Lv - 1, 0))
            vlo = v[starts + lo]
            vhi = v[starts + hi]
            val = np.where(
                Lv > 0, vlo + (pos - lo) * (vhi - vlo), np.nan
            )
            # round-half-even like Python round() (the previous per-key
            # implementation) and DuckDB ROUND-on-binary-float
            cols[f"p{str(q)[2:]}"] = pa.array(
                np.asarray(
                    [round(float(x), 6) for x in val], dtype=np.float64
                ),
                pa.float64(),
            )
        return pa.table(cols)

    from ..stages.agg import _salt_parts, default_nparts

    nparts = default_nparts()  # fixed at the driver: same key, same part
    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda b: _salt_parts(b, [key_col], nparts),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(per_part, batch_format="pyarrow")
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
