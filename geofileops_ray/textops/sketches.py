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

_BLOOM_SALT = "|b"

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


# ---------------------------------------------------------------------------
# Bloom filter: constant-memory broadcast membership at blocklist scale
# ---------------------------------------------------------------------------
#
# ngram_decontaminate broadcasts the EXACT distinct benchmark set — right
# for eval sets (10^4-10^6 entries). A 100-TB corpus filtered against a
# 10^9-entry blocklist (URLs, known-bad fingerprints) can't ship the set:
# the bloom is a FIXED n_bits/8-byte bit array regardless of entry count,
# OR-mergeable (per-block partials combine commutatively → bit-identical
# across partitionings), broadcast once via ray.put. Misses are definite
# ("not in the blocklist"), hits carry the standard false-positive rate
# (1 - e^(-kn/m))^k. Hash layout is Kirsch–Mitzenmacher double hashing on
# the repo's md5_u64 convention (util.py), so a DuckDB oracle reproduces
# the EXACT bit positions — bloom hits, false positives included, are
# oracle-checkable, not just bounded.


def _bloom_positions(vals, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(vals), n_hashes) int64 bit positions. pos_i =
    ((md5_u64(v) % m) + i*(md5_u64(v+'|b') % m)) % m — every term is
    reduced mod m BEFORE the multiply so the identical arithmetic stays
    in BIGINT range for the SQL mirror (no uint64 wraparound to match)."""
    from ..util import md5_u64

    n = len(vals)
    h1 = np.fromiter((md5_u64(s) % n_bits for s in vals), np.int64, n)
    h2 = np.fromiter(
        (md5_u64(s + _BLOOM_SALT) % n_bits for s in vals), np.int64, n
    )
    i = np.arange(n_hashes, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % n_bits


def build_bloom(
    ds: ray.data.Dataset,
    col: str,
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
) -> bytes:
    """Build a bloom bit array over the distinct values of ``col``.
    Per-batch partial = a local bit array over the batch's DISTINCT
    values (one md5 pair per distinct value, bit-sets vectorized); the
    driver OR-merges ONE n_bits/8-byte row per block — reduction bounded
    by block count, never rows. Defaults: 2^23 bits = 1 MB."""
    import pyarrow.compute as pc

    nbytes = (n_bits + 7) // 8

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if arr.null_count:
            arr = arr.filter(pc.is_valid(arr))
        uniq = pc.unique(pc.cast(arr, pa.string())).to_pylist()
        bits = np.zeros(nbytes, dtype=np.uint8)
        if uniq:
            pos = _bloom_positions(uniq, n_bits, n_hashes).ravel()
            np.bitwise_or.at(
                bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
            )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    bits = np.zeros(nbytes, dtype=np.uint8)
    for r in parts:
        bits |= np.frombuffer(r["bits"], dtype=np.uint8)
    return bits.tobytes()


def bloom_membership(
    ds: ray.data.Dataset,
    bloom: bytes,
    col: str,
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
    out_col: str = "bloom_hit",
) -> ray.data.Dataset:
    """Append a boolean ``out_col``: True iff all n_hashes bit positions
    of the value are set (possible member), False = definite miss. The
    bit array is broadcast ONCE (ray.put) and read zero-copy per task;
    per batch the md5 pair is computed per DISTINCT value (dictionary
    encode) and mapped back through the indices. NULL values are
    definite misses."""
    bloom_ref = ray.put(np.frombuffer(bloom, dtype=np.uint8))

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bits = ray.get(bloom_ref)
        arr = pc.cast(batch.column(col), pa.string())
        dic = pc.dictionary_encode(arr.combine_chunks())
        if isinstance(dic, pa.ChunkedArray):  # pragma: no cover
            dic = dic.combine_chunks()
        uniq = dic.dictionary.to_pylist()
        if uniq:
            pos = _bloom_positions(uniq, n_bits, n_hashes)
            member_u = (
                (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
            ).all(axis=1)
        else:
            member_u = np.zeros(0, dtype=bool)
        idx = dic.indices.to_numpy(zero_copy_only=False)
        hit = np.zeros(len(batch), dtype=bool)
        valid = ~np.isnan(idx) if idx.dtype.kind == "f" else np.ones(
            len(idx), dtype=bool
        )
        if valid.any():
            hit[valid] = member_u[idx[valid].astype(np.int64)]
        return batch.append_column(out_col, pa.array(hit))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def filter_by_bloom(
    ds: ray.data.Dataset,
    bloom: bytes,
    col: str,
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
    keep: str = "miss",
) -> ray.data.Dataset:
    """Keep definite non-members (``keep='miss'`` — blocklist semantics:
    what survives is guaranteed clean) or possible members
    (``keep='hit'`` — candidate prefilter before an exact verify join)."""
    if keep not in ("miss", "hit"):
        raise ValueError("keep must be 'miss' or 'hit'")
    want = keep == "hit"
    flagged = bloom_membership(ds, bloom, col, n_bits, n_hashes, "__bloom")

    def cut(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep_mask = pc.equal(batch.column("__bloom"), want)
        return batch.filter(keep_mask).drop_columns(["__bloom"])

    return flagged.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)


def bloom_sql(
    build_from: str,
    probe: str,
    key_expr: str,
    n_bits: int,
    n_hashes: int,
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of the bloom membership test: the set-bit positions
    of the build side reproduce the engine's bit array exactly (same
    md5_number_lower double hashing), so ``nhit = n_hashes`` IS the
    bloom verdict — false positives and all. ``build_from`` / ``probe``
    are subqueries projecting ``{key_expr}`` (and ``id_col`` on the
    probe side); the result CTE ``bloom`` is (id_col, bloom_hit)."""
    pos = (
        f"(CAST(md5_number_lower({key_expr}) % {n_bits} AS BIGINT)"
        f" + t.i * CAST(md5_number_lower({key_expr} || '{_BLOOM_SALT}')"
        f" % {n_bits} AS BIGINT)) % {n_bits}"
    )
    return f"""
bits AS (
  SELECT DISTINCT {pos} AS pos
  FROM ({build_from}) b CROSS JOIN range({n_hashes}) t(i)),
probe_bits AS (
  SELECT p.{id_col}, {pos} AS pos
  FROM ({probe}) p CROSS JOIN range({n_hashes}) t(i)),
bloom AS (
  SELECT {id_col},
         SUM(CASE WHEN pos IN (SELECT pos FROM bits) THEN 1 ELSE 0 END)
           = {n_hashes} AS bloom_hit
  FROM probe_bits GROUP BY {id_col})
"""


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: mergeable frequent-values summary
# ---------------------------------------------------------------------------


def _mg_compress(values: np.ndarray, counts: np.ndarray, capacity: int):
    """Classic Misra-Gries compression: subtract the (capacity+1)-th
    largest count from all counters, keep the positives (≤ capacity
    survive). No-op when distinct ≤ capacity — the SATURATED regime,
    where every count stays exact."""
    if len(values) <= capacity:
        return values, counts
    order = np.argsort(-counts, kind="stable")
    thresh = counts[order[capacity]]
    adj = counts - thresh
    keep = adj > 0
    return values[keep], adj[keep]


def approx_topk_values(
    ds: ray.data.Dataset,
    col: str,
    k: int = 10,
    capacity: int = 256,
) -> pa.Table:
    """Frequent values of ``col`` with estimated counts → Arrow table
    (value, est_count), count-descending then value-ascending, top k.

    Shape: per-batch value_counts compressed to ``capacity`` counters
    (Misra-Gries), driver sums the bounded per-block summaries (integer
    addition — order-independent, so the merged summary is deterministic
    across partitionings) and compresses once more. Error bound:
    true_count - est ≤ N/(capacity+1) (each compression step's
    subtraction, summed over blocks). When the column's distinct count
    ≤ capacity no subtraction ever fires and every count is EXACT —
    the saturated regime the oracle checks; the approximate regime is
    bound-checked in tests."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        arr = pc.cast(batch.column(col), pa.string())
        vc = pc.value_counts(arr.combine_chunks())
        vals = np.asarray(vc.field("values").to_pylist(), dtype=object)
        cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ok = np.array([v is not None for v in vals], dtype=bool)
        vals, cnts = _mg_compress(vals[ok], cnts[ok], capacity)
        return pa.table(
            {
                "value": pa.array(list(vals), pa.string()),
                "cnt": pa.array(cnts, pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[str, int] = {}
    for r in parts:
        agg[r["value"]] = agg.get(r["value"], 0) + int(r["cnt"])
    vals = np.asarray(list(agg.keys()), dtype=object)
    cnts = np.asarray(list(agg.values()), dtype=np.int64)
    vals, cnts = _mg_compress(vals, cnts, capacity)
    order = np.lexsort((vals.astype(str), -cnts))[:k]
    return pa.table(
        {
            "value": pa.array(list(vals[order]), pa.string()),
            "est_count": pa.array(cnts[order], pa.int64()),
        }
    )
