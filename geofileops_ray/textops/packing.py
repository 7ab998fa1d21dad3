"""Training-sequence assembly operators.

``pack_sequences`` — concatenate-then-chunk sequence packing (the
standard pretraining layout: documents concatenated in a fixed global
order, the token stream cut into fixed-size sequences): every doc gets
its (seq_id, seq_offset) placement from an EXACT distributed prefix sum
of token counts in ``doc_id`` order.

``shuffle_shards`` — deterministic seeded global shuffle for training
output: shard + within-shard order from a content hash (the same
md5 convention as sampling/dedup, so the assignment is bit-reproducible
in SQL, stable under re-runs/repartitioning, and needs NO all-to-all
``random_shuffle`` — the write is a plain partition-by-shard).

Scale shape of the prefix sum (the only non-map step here):
1. stateless map → (doc_id, n_tokens) — text never leaves stage 1;
2. range-bucket doc ids (``n_buckets ≈ rows / 250k``); ONE combiner-first
   ``bucket_aggregate`` gives per-bucket token totals; the driver
   cumsums #buckets rows (10^12 docs → ~4M buckets ≈ 100 MB, the
   documented driver-side cap — beyond that, add a second bucket level)
   and broadcasts the base offsets via ``ray.put``;
3. ONE hash shuffle keyed on the bucket; each salt partition computes
   its buckets' internal exclusive cumsums vectorized (sort + cumsum -
   run-base) and adds the broadcast base.
Partitioning assumption (documented per the build brief): doc ids are
roughly uniform over their range, so range buckets are balanced; a
heavily clustered id space needs a quantile-probed bucketing instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..util import md5_u64 as _md5_u64

_ROWS_PER_BUCKET = 250_000


def pack_sequences(
    ds: ray.data.Dataset,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Assign every doc its slot in the packed token stream:
    (doc_id, n_tokens, seq_id, seq_offset, end_seq_id) where seq_id =
    exclusive-prefix-sum // budget, seq_offset the position inside that
    sequence, end_seq_id the last sequence the doc touches (docs may
    straddle sequence boundaries — concat-then-chunk semantics).

    ``id_col`` must be UNIQUE (it is the table key): the stream order is
    "sorted by id", so duplicate ids would make the placement of the
    tied rows order-dependent (the SQL ROWS window has the same
    ambiguity)."""
    if budget <= 0:
        raise ValueError("budget must be positive")

    def counts(batch: pa.Table) -> pa.Table:
        col = batch.column(id_col)
        if col.null_count:  # NULL ids never pack (SQL ORDER BY excluded)
            batch = batch.filter(pc.is_valid(col))
        # NULL text = 0 tokens (mirrored by COALESCE in the oracle) — an
        # unfilled null count would flow NaN→astype(int64) garbage into
        # the bucket bases and silently corrupt EVERY later placement
        toks = pc.count_substring_regex(
            pc.fill_null(batch.column(text_col), ""), r"\S+"
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": toks.cast(pa.int64()),
            }
        )

    slim = ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
    return _place_by_prefix_sum(slim, budget, id_col)


def pack_interleaved(
    ds: ray.data.Dataset,
    budget: int = 2048,
    media_token_cost: int = 64,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> ray.data.Dataset:
    """pack_sequences for INTERLEAVED text+media documents (the
    north-rule input shape): a doc's token cost is the sum of its text
    spans' whitespace token counts plus ``media_token_cost`` per media
    span (the fixed patch/frame budget a multimodal trainer reserves per
    media item). Same placement semantics and uniqueness contract as
    pack_sequences; all span arithmetic is vectorized Arrow list ops
    (offsets + cumsum), no per-row Python."""
    if budget <= 0:
        raise ValueError("budget must be positive")

    def counts(batch: pa.Table) -> pa.Table:
        col = batch.column(id_col)
        if col.null_count:  # NULL ids never pack (SQL ORDER BY excluded)
            batch = batch.filter(pc.is_valid(col))
        spans = batch.column(spans_col).combine_chunks()
        if isinstance(spans, pa.ChunkedArray):  # zero-chunk edge
            spans = (
                spans.chunk(0)
                if spans.num_chunks
                else pa.array([], spans.type)
            )
        flat = spans.flatten()
        toks = pc.count_substring_regex(
            pc.fill_null(flat.field("text"), ""), r"\S+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        is_media = pc.equal(flat.field("kind"), "media").to_numpy(
            zero_copy_only=False
        )
        per_span = np.where(is_media, np.int64(media_token_cost), toks)
        offs = spans.offsets.to_numpy().astype(np.int64)
        offs = offs - offs[0]  # sliced arrays carry a nonzero base
        cs = np.concatenate([[0], np.cumsum(per_span)])
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(cs[offs[1:]] - cs[offs[:-1]], pa.int64()),
            }
        )

    slim = ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
    return _place_by_prefix_sum(slim, budget, id_col)


def pack_interleaved_sql(
    budget: int = 2048, media_token_cost: int = 64, docspans: str = "docspans"
) -> str:
    """DuckDB mirror of pack_interleaved over the exploded span relation
    (compose with the DOCSPANS_CTE)."""
    return f"""
__pi_t AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN kind = 'text'
                       THEN COALESCE(len(regexp_extract_all(piece, '\\S+')), 0)
                       ELSE {media_token_cost} END) AS BIGINT) AS n_tokens
  FROM {docspans} WHERE doc_id IS NOT NULL GROUP BY doc_id
), __pi_c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM __pi_t
)
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // {budget} AS BIGINT) AS seq_id,
       CAST((cum - n_tokens) % {budget} AS BIGINT) AS seq_offset,
       CAST(((cum - n_tokens) + GREATEST(n_tokens, 1) - 1) // {budget}
            AS BIGINT) AS end_seq_id
FROM __pi_c ORDER BY doc_id
"""


def _place_by_prefix_sum(
    slim: ray.data.Dataset, budget: int, id_col: str
) -> ray.data.Dataset:
    """Shared placement core: (id, n_tokens) → (id, n_tokens, seq_id,
    seq_offset, end_seq_id) via the exact distributed prefix sum
    described in the module docstring."""
    from ..stages.agg import _salt_parts, bucket_aggregate, default_nparts

    slim = slim.materialize()  # consumed 3× below (span probe, totals, final)

    # ---- bucket layout (driver-side scalars only; metadata count —
    # a bare ray.data Count() aggregate returns 0 on some versions)
    nrows = int(slim.count() or 0)
    if nrows == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "seq_id": pa.array([], pa.int64()),
                    "seq_offset": pa.array([], pa.int64()),
                    "end_seq_id": pa.array([], pa.int64()),
                }
            )
        )
    nparts = default_nparts()
    n_buckets = max(nparts * 8, nrows // _ROWS_PER_BUCKET + 1)
    # balanced bucket boundaries from an id SAMPLE (quantile bucketing):
    # value-range buckets would overload under clustered id spaces; the
    # sample is bounded by #blocks × 256 rows on the driver, and ANY
    # monotone id→bucket map gives an exact prefix sum — balance only
    # affects task sizing, never placement correctness.

    def sample_ids(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) > 256:
            pos = ((np.arange(256) + 0.5) * len(ids) / 256).astype(np.int64)
            ids = np.sort(ids)[pos]
        return pa.table({id_col: pa.array(ids, pa.int64())})

    samp = np.array(
        [
            r[id_col]
            for r in slim.map_batches(
                sample_ids, batch_format="pyarrow"
            ).take_all()
        ],
        dtype=np.int64,
    )
    samp.sort()
    edges = np.unique(
        samp[((np.arange(1, n_buckets) * len(samp)) // n_buckets).clip(0, len(samp) - 1)]
    )
    edges_ref = ray.put(edges)

    def with_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bounds = ray.get(edges_ref)
        return batch.append_column(
            "__bucket",
            pa.array(np.searchsorted(bounds, ids, side="right"), pa.int64()),
        )

    bucketed = slim.map_batches(with_bucket, batch_format="pyarrow")

    # ---- per-bucket token totals → driver cumsum → broadcast bases
    totals = pa.Table.from_pylist(
        bucket_aggregate(
            bucketed, ["__bucket"], [("n_tokens", "sum", "tok")]
        ).take_all()
    ).sort_by("__bucket")
    bkeys = totals.column("__bucket").to_numpy().astype(np.int64)
    bsums = totals.column("tok").to_numpy().astype(np.int64)
    bases = np.concatenate([[0], np.cumsum(bsums)[:-1]])
    base_ref = ray.put((bkeys, bases))

    # ---- one bucket-keyed shuffle; vectorized per-partition placement
    def place(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["__part"])
        n = len(part)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "seq_id": pa.array([], pa.int64()),
                    "seq_offset": pa.array([], pa.int64()),
                    "end_seq_id": pa.array([], pa.int64()),
                }
            )
        srt = part.take(
            pc.sort_indices(
                part,
                sort_keys=[("__bucket", "ascending"), (id_col, "ascending")],
            )
        )
        bk = srt.column("__bucket").to_numpy()
        ids = srt.column(id_col).to_numpy()
        tok = srt.column("n_tokens").to_numpy().astype(np.int64)
        keys, bas = ray.get(base_ref)
        cs = np.cumsum(tok)
        excl = cs - tok
        newb = np.concatenate([[True], bk[1:] != bk[:-1]])
        starts = np.flatnonzero(newb)
        runlen = np.diff(np.concatenate([starts, [n]]))
        within = excl - np.repeat(excl[starts], runlen)
        base = bas[np.searchsorted(keys, bk)]
        cum_excl = base + within
        seq_id = cum_excl // budget
        seq_off = cum_excl % budget
        last = cum_excl + np.maximum(tok, 1) - 1  # 0-token docs stay put
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(tok, pa.int64()),
                "seq_id": pa.array(seq_id, pa.int64()),
                "seq_offset": pa.array(seq_off, pa.int64()),
                "end_seq_id": pa.array(last // budget, pa.int64()),
            }
        )

    return (
        bucketed.map_batches(
            lambda b: _salt_parts(b, ["__bucket"], nparts),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(place, batch_format="pyarrow")
    )


def pack_sequences_sql(budget: int = 2048, table: str = "documents") -> str:
    """DuckDB mirror: window-function prefix sum in doc_id order."""
    return f"""
WITH __pk_t AS (
  SELECT doc_id,
         CAST(COALESCE(len(regexp_extract_all(text, '\\S+')), 0)
              AS BIGINT) AS n_tokens
  FROM {table} WHERE doc_id IS NOT NULL
), __pk_c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM __pk_t
)
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // {budget} AS BIGINT) AS seq_id,
       CAST((cum - n_tokens) % {budget} AS BIGINT) AS seq_offset,
       CAST(((cum - n_tokens) + GREATEST(n_tokens, 1) - 1) // {budget}
            AS BIGINT) AS end_seq_id
FROM __pk_c ORDER BY doc_id
"""


def shuffle_shards(
    ds: ray.data.Dataset,
    n_shards: int = 64,
    seed: int = 0,
    id_col: str = "doc_id",
    exact_oracle: bool = True,
) -> ray.data.Dataset:
    """Deterministic seeded global shuffle: (doc_id, shard_id,
    shuffle_key). shard_id = md5(seed:id) % n_shards; shuffle_key orders
    rows WITHIN a shard (md5(seed:id:o)). Stateless map — a resumable
    100-TB shuffle is a partition-by-shard write of this assignment, not
    an all-to-all ``random_shuffle`` (re-runs reproduce it exactly).

    ``exact_oracle=False`` swaps the per-row md5 (the SQL-mirrorable
    convention, ~1 µs/row) for one vectorized C hash pass — same
    determinism/partition-invariance guarantees, ~50× faster per batch,
    just no bit-level DuckDB mirror. Use it for production-scale runs;
    the default keeps the oracle-checked path."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")

    def fn(batch: pa.Table) -> pa.Table:
        return _assign_batch(batch, n_shards, seed, id_col, exact_oracle)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def write_training_shards(
    ds: ray.data.Dataset,
    out_dir: str,
    n_shards: int = 64,
    seed: int = 0,
    id_col: str = "doc_id",
    exact_oracle: bool = False,
) -> list[dict]:
    """The composed training-output writer: seeded content-hash shard +
    within-shard order (``shuffle_shards`` columns appended to the FULL
    rows), written partition-per-shard through the per-partition lineage
    checkpoint — a killed run resumes by skipping committed shards, and
    the shard files' row order is content-deterministic (re-runs produce
    the same layout). This is the 100-TB global shuffle without a
    ``random_shuffle`` all-to-all: ONE hash-partition exchange.
    Returns this run's per-shard lineage summaries."""
    from ..state.lineage import checkpointed_write

    def with_shards(batch: pa.Table) -> pa.Table:
        col = batch.column(id_col)
        if col.null_count:  # NULL ids never shuffle in
            batch = batch.filter(pc.is_valid(col))
        asg = _assign_batch(batch, n_shards, seed, id_col, exact_oracle)
        out = batch
        for name in ("shard_id", "shuffle_key"):
            out = out.append_column(name, asg.column(name))
        return out

    tagged = ds.map_batches(
        with_shards, batch_format="pyarrow", zero_copy_batch=True
    )
    return checkpointed_write(
        tagged, out_dir, partition_col="shard_id",
        sort_cols=["shuffle_key", id_col], range_col=id_col,
    )


def _assign_batch(
    batch: pa.Table, n_shards: int, seed: int, id_col: str, exact_oracle: bool
) -> pa.Table:
    """One batch of shuffle_shards assignments (shared by the dataset op
    and the composed writer)."""
    col = batch.column(id_col)
    if col.null_count:
        batch = batch.filter(pc.is_valid(col))
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    if exact_oracle:
        shard = np.fromiter(
            (_md5_u64(f"{seed}:{int(i)}") % n_shards for i in ids),
            np.int64,
            len(ids),
        )
        key = np.fromiter(
            (_md5_u64(f"{seed}:{int(i)}:o") for i in ids),
            np.uint64,
            len(ids),
        ).astype(np.int64)
    else:
        import pandas as pd

        h = pd.util.hash_array(np.ascontiguousarray(ids.astype(np.int64)))
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15) ^ np.uint64(
                (seed * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF
            )
            shard = (h % np.uint64(n_shards)).astype(np.int64)
            key = (h * np.uint64(0xBF58476D1CE4E5B9)).astype(np.int64)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "shard_id": pa.array(shard, pa.int64()),
            "shuffle_key": pa.array(key, pa.int64()),
        }
    )


def shuffle_shards_sql(
    n_shards: int = 64, seed: int = 0, table: str = "documents"
) -> str:
    """DuckDB mirror of shuffle_shards. md5_number_lower is the u64 of
    the LOWER 8 digest bytes little-endian == util.md5_u64; the int64
    shuffle_key is that u64 reinterpreted as signed."""
    h = f"md5_number_lower(concat('{seed}:', CAST(doc_id AS VARCHAR)))"
    hk = f"md5_number_lower(concat('{seed}:', CAST(doc_id AS VARCHAR), ':o'))"
    return f"""
SELECT doc_id,
       CAST({h} % {n_shards} AS BIGINT) AS shard_id,
       CAST({hk} - CASE WHEN {hk} >= 9223372036854775808
                        THEN 18446744073709551616 ELSE 0 END
            AS BIGINT) AS shuffle_key
FROM {table} WHERE doc_id IS NOT NULL ORDER BY doc_id
"""
