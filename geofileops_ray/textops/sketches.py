"""Mergeable sketches for 100-TB-scale statistics: HyperLogLog distinct
count and an evenly-spaced-sample quantile sketch.

Both follow the same Ray shape: per-batch PARTIAL sketch (vectorized —
register maxima / sorted sample), then a driver-side merge of ONE small
row per block (16 KB HLL registers / k (value, weight) pairs) — the
merge input is bounded by the block count, never the row count, so the
reduction is a take_all of sketches, not data.

Determinism: register maxima and rank-space samples are invariant to
partitioning and row order, so the estimates are bit-identical across
re-runs and repartitionings (pinned by tests) — the resumability
property exact aggregates have, kept by the approximate ones.

Estimator constants are the published HyperLogLog values (Flajolet et
al. 2007: alpha_m bias correction, linear counting below 2.5·m); the
quantile sketch is the evenly-spaced-sample scheme with per-batch error
1/k (the practical GK-lite used by batch engines)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

_P = 14  # 2^14 = 16384 registers → relative error ≈ 1.04/√m ≈ 0.81%
_M = 1 << _P


def _hll_registers(vals: np.ndarray) -> np.ndarray:
    """Vectorized register maxima for one batch of uint64 hashes."""
    import pandas as pd

    h = pd.util.hash_array(np.ascontiguousarray(vals))
    idx = (h >> np.uint64(64 - _P)).astype(np.int64)
    rest = h << np.uint64(_P)  # top 64-P bits consumed by the index
    # rank = leading zeros of `rest` + 1 (capped at 64-P+1 when rest==0).
    # Exact binary clz in 6 vectorized passes — float log2 rounds values
    # near powers of two ABOVE 2^53 and would mis-rank ~1/2^11 hashes.
    lz = np.zeros(len(h), dtype=np.uint8)
    x = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = x < (np.uint64(1) << np.uint64(64 - shift))
        lz[m] += np.uint8(shift)
        x[m] <<= np.uint64(shift)
    fl = np.minimum(lz + 1, 64 - _P + 1).astype(np.uint8)  # rest==0 → cap
    reg = np.zeros(_M, dtype=np.uint8)
    np.maximum.at(reg, idx, fl)
    return reg


def approx_distinct(ds: ray.data.Dataset, col: str) -> int:
    """HyperLogLog distinct-count estimate of ``col`` (~0.8% error).
    One streaming pass; the driver merges one 16 KB register row per
    block."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arr = batch.column(col)
        if arr.null_count:
            arr = arr.filter(pc.is_valid(arr))
        vals = arr.to_numpy(zero_copy_only=False)
        if vals.dtype.kind not in "iuf":
            import pandas as pd

            vals = pd.util.hash_array(np.asarray(vals, dtype=object))
        reg = _hll_registers(np.asarray(vals))
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    reg = np.zeros(_M, dtype=np.uint8)
    for r in parts:
        reg = np.maximum(reg, np.frombuffer(r["reg"], dtype=np.uint8))
    alpha = 0.7213 / (1 + 1.079 / _M)
    est = alpha * _M * _M / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * _M and zeros:  # linear counting for the small range
        est = _M * np.log(_M / zeros)
    return int(round(est))


def approx_quantiles(
    ds: ray.data.Dataset, col: str, qs: list[float], k: int = 1024
) -> list[float]:
    """Mergeable quantile sketch: per batch, sort and keep k evenly
    spaced (value, weight) pairs (weight = n/k); driver merges one
    k-pair row per block and reads quantiles off the weighted CDF.
    Per-batch rank error ≤ 1/k."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arr = batch.column(col)
        if arr.null_count:
            arr = arr.filter(pc.is_valid(arr))
        v = np.sort(arr.to_numpy(zero_copy_only=False).astype(np.float64))
        n = len(v)
        if n == 0:
            return pa.table(
                {
                    "vals": pa.array([], pa.list_(pa.float64())),
                    "wts": pa.array([], pa.list_(pa.float64())),
                }
            )
        if n <= k:
            sample, w = v, np.ones(n, dtype=np.float64)
        else:
            # midpoints of k equal-rank strata — each carries n/k rows
            pos = ((np.arange(k) + 0.5) * n / k).astype(np.int64)
            sample, w = v[pos], np.full(k, n / k, dtype=np.float64)
        return pa.table(
            {
                "vals": pa.array([sample.tolist()], pa.list_(pa.float64())),
                "wts": pa.array([w.tolist()], pa.list_(pa.float64())),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        return [float("nan")] * len(qs)
    vals = np.concatenate([np.asarray(p["vals"], np.float64) for p in parts])
    wts = np.concatenate([np.asarray(p["wts"], np.float64) for p in parts])
    if len(vals) == 0:
        return [float("nan")] * len(qs)
    o = np.argsort(vals, kind="stable")
    vals, wts = vals[o], wts[o]
    cdf = np.cumsum(wts)
    tot = cdf[-1]
    out = []
    for q in qs:
        i = int(np.searchsorted(cdf, q * tot, side="left"))
        out.append(float(vals[min(i, len(vals) - 1)]))
    return out
