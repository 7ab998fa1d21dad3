"""Deduplication stages: exact, MinHash(+LSH banding), SimHash, n-gram
Jaccard — each a composition of vectorized ``map_batches`` + a
hash-partition ``groupby`` (SURVEY.md build brief: dedup as first-class
engine components).

Hash choice is md5 throughout, so every signature is bit-reproducible by
DuckDB's ``md5()`` — the MinHash/LSH pipeline is oracle-checkable, not
just smoke-tested.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_WS = re.compile(r"\s+")
_TOK = re.compile(r"[a-z0-9]+")


def _norm_tokens(t: str | None) -> list[str]:
    return _TOK.findall((t or "").lower())


# ------------------------------------------------------------ exact dedup


def exact_dedup(
    ds: ray.data.Dataset, key: str = "prefix8", text_col: str = "text"
) -> ray.data.Dataset:
    """Keep the lowest-doc_id row per duplicate class.

    key='prefix8': class = first 8 normalized tokens (catches
    boilerplate-prefix duplicates); key='full': whole normalized text.
    hash-partition groupby on the class key → per-group min(doc_id) —
    the canonical exact-dedup shape (shuffle by hash, first per group).
    """

    def keyed(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        keys = []
        for t in texts:
            toks = _norm_tokens(t)
            base = " ".join(toks[:8]) if key == "prefix8" else " ".join(toks)
            keys.append(hashlib.md5(base.encode()).hexdigest())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "__key": pa.array(keys, pa.string()),
            }
        )

    from ..stages.agg import bucket_aggregate

    # min(doc_id) per class with zero per-key Python (combiner-first
    # vectorized aggregate — the class key has ~one key per unique doc)
    return bucket_aggregate(
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True),
        ["__key"],
        [("doc_id", "min", "doc_id")],
    ).map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow"
    )


EXACT_DEDUP_SQL = """
WITH k AS (
  SELECT doc_id,
    md5(array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), 1, 8), ' ')) AS key
  FROM documents)
SELECT min(doc_id) AS doc_id FROM k GROUP BY key ORDER BY 1
"""


# ---------------------------------------------------------------- minhash


def _shingles(toks: list[str], k: int = 3) -> list[str]:
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


_U64 = 1 << 64


def _perm_consts(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic affine-permutation constants h_i = (a_i·h + b_i)
    mod 2^64: a_i odd 32-bit, b_i < 2^63 — both derived from md5 so the
    SQL mirror can embed the same literals, and a_i·h + b_i ≤ 2^96 fits
    DuckDB's HUGEINT exactly."""
    A, B = [], []
    for i in range(num_hashes):
        da = hashlib.md5(f"perm_a|{i}".encode()).digest()
        db = hashlib.md5(f"perm_b|{i}".encode()).digest()
        A.append(int.from_bytes(da[:4], "little") | 1)
        B.append(int.from_bytes(db[:8], "little") >> 1)
    return A, B


def minhash_signatures(
    ds: ray.data.Dataset,
    num_hashes: int = 16,
    shingle_k: int = 3,
    band_size: int = 4,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-doc MinHash signature + LSH band keys.

    Base hash = md5_number_lower(shingle) (lower 8 md5 bytes,
    little-endian — DuckDB-identical), computed ONCE per distinct
    shingle in the batch; the ``num_hashes`` permutations are affine
    maps (a_i·h + b_i) mod 2^64 evaluated as one vectorized uint64
    matrix op, and per-doc minima come from one ``minimum.reduceat``
    over the doc-offset segments — no per-doc × per-hash Python md5
    loop (that was ``num_hashes × shingles`` digests per document, the
    dominant cost at corpus scale). Output: (doc_id, band_id, band_key)
    with band_key = md5 of the band's '|'-joined decimal min-hashes;
    docs sharing any (band_id, band_key) are LSH near-dup candidates.
    """
    nb = num_hashes // band_size
    A_c, B_c = _perm_consts(num_hashes)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column("doc_id").to_numpy()
        doc_sh = [_shingles(_norm_tokens(t), shingle_k) for t in texts]
        lens = np.fromiter((len(s) for s in doc_sh), np.int64, len(doc_sh))
        flat = [s for sh in doc_sh for s in sh]
        base = np.empty(len(flat), np.uint64)
        memo: dict[str, int] = {}
        from ..util import md5_u64 as _md5_u64

        for j, s in enumerate(flat):
            v = memo.get(s)
            if v is None:
                v = _md5_u64(s)
                memo[s] = v
            base[j] = v
        A = np.array(A_c, np.uint64)
        B = np.array(B_c, np.uint64)
        with np.errstate(over="ignore"):
            vals = base[:, None] * A[None, :] + B[None, :]  # uint64 wrap
        offs = np.concatenate([[0], np.cumsum(lens)])
        nz = np.flatnonzero(lens > 0)
        out_id, out_band, out_key = [], [], []
        if len(nz) and len(flat):
            sig = np.minimum.reduceat(vals, offs[nz], axis=0)
            for row, d in zip(sig, ids[nz]):
                for b in range(nb):
                    band = "|".join(
                        str(int(v))
                        for v in row[b * band_size : (b + 1) * band_size]
                    )
                    out_id.append(int(d))
                    out_band.append(b)
                    out_key.append(hashlib.md5(band.encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band_id": pa.array(out_band, pa.int64()),
                "band_key": pa.array(out_key, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def minhash_dedup_pairs(
    ds: ray.data.Dataset,
    num_hashes: int = 16,
    shingle_k: int = 3,
    band_size: int = 4,
    jaccard_threshold: float = 0.5,
    text_col: str = "text",
    bucket_cap: int = 2_000,
) -> ray.data.Dataset:
    """LSH candidate pairs verified with exact n-gram Jaccard:
    shingle → minhash → band → bucket groupby → per-bucket pairs →
    exact verification. Returns (doc_id_a, doc_id_b, jaccard).

    ``bucket_cap`` bounds the O(n²) verify inside one LSH bucket: a
    degenerate bucket (e.g. empty-text documents all sharing one band
    key) is truncated to its first ``bucket_cap`` doc_ids (deterministic)
    — without a cap one hot bucket is a quadratic scale hazard."""
    sigs = minhash_signatures(ds, num_hashes, shingle_k, band_size, text_col)
    texts = ds.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id"), "text": b.column(text_col)}),
        batch_format="pyarrow",
    )
    from ..stages.agg import default_nparts

    joined = sigs.join(
        texts, join_type="inner", num_partitions=default_nparts(),
        on=("doc_id",),
    )

    def per_part(group: pa.Table) -> pa.Table:
        # ONE call per salt partition (not per LSH bucket): sort by
        # bucket key, loop bucket RUNS in-process, accumulate into one
        # output table — the per-bucket verify logic is unchanged
        srt = group.take(
            pc.sort_indices(group, sort_keys=[("__bucket", "ascending")])
        )
        keys = srt.column("__bucket").to_numpy(zero_copy_only=False)
        ids_all = srt.column("doc_id").to_numpy()
        txt_all = srt.column("text").to_pylist()
        bounds = np.flatnonzero(
            np.concatenate([[True], keys[1:] != keys[:-1], [True]])
        )
        a_out, b_out, j_out = [], [], []
        for r in range(len(bounds) - 1):
            lo, hi = bounds[r], bounds[r + 1]
            uniq: dict[int, str] = {}
            for d, t in zip(ids_all[lo:hi], txt_all[lo:hi]):
                uniq[int(d)] = t
            items = sorted(uniq)[:bucket_cap]
            # shingle sets computed ONCE per doc, not per pair
            sets = [
                set(_shingles(_norm_tokens(uniq[d]), shingle_k)) for d in items
            ]
            for x in range(len(items)):
                sx = sets[x]
                for y in range(x + 1, len(items)):
                    sy = sets[y]
                    inter = len(sx & sy)
                    un = len(sx | sy)
                    j = inter / un if un else 0.0
                    if j >= jaccard_threshold:
                        a_out.append(items[x])
                        b_out.append(items[y])
                        # SQL ROUND semantics (half away from zero), so
                        # the DuckDB oracle (minhash_pairs_sql) matches
                        j_out.append(math.floor(j * 1e6 + 0.5) / 1e6)
        return pa.table(
            {
                "doc_id_a": pa.array(a_out, pa.int64()),
                "doc_id_b": pa.array(b_out, pa.int64()),
                "jaccard": pa.array(j_out, pa.float64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch.column("band_id"), pa.string()),
            batch.column("band_key"),
            "|",
        )
        return batch.append_column("__bucket", key)

    from ..stages.agg import _salt_parts, default_nparts

    nparts = default_nparts()  # fixed at the driver: same key, same part
    pairs = (
        joined.map_batches(add_bucket, batch_format="pyarrow")
        .map_batches(
            lambda b: _salt_parts(b, ["__bucket"], nparts),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(per_part, batch_format="pyarrow")
    )

    # a pair can surface from several bands → dedup by (a, b); the
    # jaccard is computed from the same shingle sets in every band, so
    # min() of the duplicates is the value itself (vectorized aggregate,
    # no per-pair Python)
    from ..stages.agg import bucket_aggregate

    return bucket_aggregate(
        pairs, ["doc_id_a", "doc_id_b"], [("jaccard", "min", "jaccard")]
    )


def _minhash_ctes(num_hashes: int, band_size: int, shingle_k: int) -> str:
    """Shared CTE chain: tokens → shingles → md5_number_lower base hash →
    affine permutations (same (a_i, b_i) literals as the engine, HUGEINT
    arithmetic mod 2^64) → per-doc minima → band keys."""
    nb = num_hashes // band_size
    A_c, B_c = _perm_consts(num_hashes)
    band_rows = []
    for b in range(nb):
        cols = " || '|' || ".join(
            f"CAST(s{i} AS VARCHAR)"
            for i in range(b * band_size, (b + 1) * band_size)
        )
        band_rows.append(
            f"SELECT doc_id, {b} AS band_id, md5({cols}) AS band_key FROM sig"
        )
    bands_sql = " UNION ALL ".join(band_rows)
    sig_cols = ", ".join(
        f"min((CAST(h AS HUGEINT) * {A_c[i]} + {B_c[i]}) % {_U64}) AS s{i}"
        for i in range(num_hashes)
    )
    return f"""toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents),
sh AS (
  SELECT doc_id,
         array_to_string(list_slice(t, i, i + {shingle_k - 1}), ' ') AS shingle
  FROM (SELECT doc_id, t, unnest(range(1, GREATEST(len(t) - {shingle_k - 1}, 1) + 1)) i
        FROM toks WHERE len(t) > 0)),
hs AS (
  SELECT doc_id, md5_number_lower(shingle) h FROM sh),
sig AS (
  SELECT doc_id, {sig_cols} FROM hs GROUP BY doc_id),
bands AS ({bands_sql})"""


def minhash_sql(num_hashes: int = 16, band_size: int = 4, shingle_k: int = 3) -> str:
    """DuckDB mirror of minhash_signatures (same md5 min semantics)."""
    return f"""
WITH {_minhash_ctes(num_hashes, band_size, shingle_k)}
SELECT doc_id, band_id, band_key FROM bands ORDER BY doc_id, band_id
"""


def minhash_pairs_sql(
    num_hashes: int = 16,
    band_size: int = 4,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
) -> str:
    """DuckDB mirror of minhash_dedup_pairs: candidates = doc pairs
    sharing any LSH band bucket, verified with the same exact
    distinct-shingle-set Jaccard and threshold. (The engine's
    ``bucket_cap`` never binds at oracle scale — no degenerate bucket
    exists because empty-token docs have no signature rows.)"""
    return f"""
WITH {_minhash_ctes(num_hashes, band_size, shingle_k)},
shs AS (SELECT DISTINCT doc_id, shingle FROM sh),
ssz AS (SELECT doc_id, count(*) AS n FROM shs GROUP BY doc_id),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
ji AS (
  SELECT c.da, c.db, count(*) AS n_int
  FROM cand c
  JOIN shs x ON x.doc_id = c.da
  JOIN shs y ON y.doc_id = c.db AND y.shingle = x.shingle
  GROUP BY c.da, c.db)
SELECT ji.da AS doc_id_a, ji.db AS doc_id_b,
       ROUND(CAST(ji.n_int AS DOUBLE) / (sa.n + sb.n - ji.n_int), 6) AS jaccard
FROM ji
JOIN ssz sa ON sa.doc_id = ji.da
JOIN ssz sb ON sb.doc_id = ji.db
WHERE CAST(ji.n_int AS DOUBLE) / (sa.n + sb.n - ji.n_int) >= {jaccard_threshold}
ORDER BY 1, 2
"""


# ----------------------------------------------------------------- simhash


def simhash(
    ds: ray.data.Dataset, bits: int = 32, text_col: str = "text"
) -> ray.data.Dataset:
    """32-bit SimHash over unique tokens: bit b of md5(token) votes ±1;
    sign of the vote sum sets bit b of the fingerprint. (doc_id, sh)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        # flatten unique tokens per doc with offsets, hash each UNIQUE
        # batch token once (memoized md5), then vote fully vectorized:
        # bit matrix (ntok × bits) → per-doc reduceat sums
        doc_toks: list[list[str]] = [sorted(set(_norm_tokens(t))) for t in texts]
        offs = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum([len(t) for t in doc_toks], out=offs[1:])
        flat = [tok for toks in doc_toks for tok in toks]
        uniq = sorted(set(flat))
        hmap = {
            tok: int(hashlib.md5(tok.encode()).hexdigest()[: bits // 4], 16)
            for tok in uniq
        }
        hs = np.fromiter((hmap[t] for t in flat), dtype=np.int64, count=len(flat))
        bitmat = ((hs[:, None] >> np.arange(bits)[None, :]) & 1) * 2 - 1
        votes = np.zeros((len(texts), bits), dtype=np.int64)
        nonempty = np.flatnonzero(np.diff(offs) > 0)
        if len(nonempty) and len(flat):
            sums = np.add.reduceat(bitmat, offs[nonempty], axis=0)
            votes[nonempty] = sums
        sh = ((votes > 0).astype(np.int64) << np.arange(bits)[None, :]).sum(axis=1)
        # omit token-less docs (empty/NULL/symbol-only text): the SQL
        # mirror's unnest produces no rows for them, so emitting a sh=0
        # row here would be a row-count oracle divergence
        keep = np.diff(offs) > 0
        if not keep.all():
            kidx = pa.array(np.flatnonzero(keep), pa.int64())
            return pa.table(
                {
                    "doc_id": batch.column("doc_id").take(kidx),
                    "sh": pa.array(sh[keep], pa.int64()),
                }
            )
        return pa.table(
            {"doc_id": batch.column("doc_id"), "sh": pa.array(sh, pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def simhash_sql(bits: int = 32) -> str:
    """DuckDB mirror: same md5-prefix bit votes. Generated per-bit SQL."""
    hexlen = bits // 4
    bit_cols = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) v{b}"
        for b in range(bits)
    )
    sh_expr = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) tok
        FROM documents)),
hv AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, {hexlen})) AS BIGINT) h
  FROM toks),
votes AS (SELECT doc_id, {bit_cols} FROM hv GROUP BY doc_id)
SELECT doc_id, CAST({sh_expr} AS BIGINT) AS sh FROM votes ORDER BY doc_id
"""


# ------------------------------------------------------- n-gram jaccard


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    shingle_k: int = 3,
    threshold: float = 0.2,
    text_col: str = "text",
    max_df: int = 10_000,
) -> ray.data.Dataset:
    """All-pairs n-gram Jaccard ≥ threshold via inverted-index shuffle
    with a DOCUMENT-FREQUENCY CEILING: shingles occurring in more than
    ``max_df`` docs are excluded from the similarity space entirely (both
    from pair generation AND per-doc sizes — like stopword removal), so a
    hot shingle can never trigger O(df²) pair blowup. Deterministic and
    mirrored exactly by the SQL oracle (same df filter).

    Shape: explode → groupby(shingle) {df filter + pair emission} →
    groupby(pair) count → distributed joins with the filtered per-doc
    sizes. J = |∩| / (|A| + |B| − |∩|) over the capped space."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column(text_col).to_pylist()
        out_id, out_sh = [], []
        for d, t in zip(ids, texts):
            for s in set(_shingles(_norm_tokens(t), shingle_k)):
                out_id.append(int(d))
                out_sh.append(s)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "shingle": pa.array(out_sh, pa.string()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    from ..stages.agg import _salt_parts, bucket_aggregate, default_nparts

    nparts = default_nparts()  # fixed at the driver: same key, same part

    # every shingle-keyed stage runs per SALT PARTITION (hash(shingle) %
    # ~2×CPU) with fully vectorized run processing inside — zero per-key
    # Python for a key space the size of the shingle vocabulary
    def df_filter(group: pa.Table) -> pa.Table:
        srt = group.take(
            pc.sort_indices(group, sort_keys=[("shingle", "ascending")])
        )
        k = srt.column("shingle").to_numpy(zero_copy_only=False)
        n = len(k)
        if n == 0:
            return srt.drop_columns(["__part"])
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        L = np.diff(np.concatenate([starts, [n]]))
        return srt.filter(pa.array(np.repeat(L <= max_df, L))).drop_columns(
            ["__part"]
        )

    kept = (
        exploded.map_batches(
            lambda b: _salt_parts(b, ["shingle"], nparts),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(df_filter, batch_format="pyarrow")
        .materialize()
    )

    sizes = bucket_aggregate(kept, ["doc_id"], [("doc_id", "count", "n")])

    def pairs_of_part(group: pa.Table) -> pa.Table:
        # all (a<b) doc pairs within every shingle run, built by the
        # ragged triangular expansion (repeat/cumsum) — no Python loop
        srt = group.take(
            pc.sort_indices(
                group,
                sort_keys=[("shingle", "ascending"), ("doc_id", "ascending")],
            )
        )
        ids = srt.column("doc_id").to_numpy()
        k = srt.column("shingle").to_numpy(zero_copy_only=False)
        n = len(k)
        empty = pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        L = np.diff(np.concatenate([starts, [n]]))
        pos = np.arange(n, dtype=np.int64)
        rep = np.repeat(starts + L, L) - 1 - pos  # suffix length per row
        total = int(rep.sum())
        if total == 0:
            return empty
        sstart = np.cumsum(rep) - rep
        w = np.arange(total, dtype=np.int64) - np.repeat(sstart, rep)
        a_idx = np.repeat(pos, rep)
        b_idx = a_idx + 1 + w
        return pa.table(
            {
                "doc_id_a": pa.array(ids[a_idx], pa.int64()),
                "doc_id_b": pa.array(ids[b_idx], pa.int64()),
            }
        )

    pair_stream = (
        kept.map_batches(
            lambda b: _salt_parts(b, ["shingle"], nparts),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(pairs_of_part, batch_format="pyarrow")
    )
    inter = bucket_aggregate(
        pair_stream, ["doc_id_a", "doc_id_b"], [("doc_id_a", "count", "count()")]
    )
    npj = max(2, default_nparts() // 2)
    j1 = inter.join(
        sizes.map_batches(
            lambda b: b.rename_columns(["doc_id_a", "na"]), batch_format="pyarrow"
        ),
        join_type="inner", num_partitions=npj, on=("doc_id_a",),
    )
    j2 = j1.join(
        sizes.map_batches(
            lambda b: b.rename_columns(["doc_id_b", "nb"]), batch_format="pyarrow"
        ),
        join_type="inner", num_partitions=npj, on=("doc_id_b",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        i = batch.column("count()").to_numpy().astype(np.float64)
        na = batch.column("na").to_numpy().astype(np.float64)
        nb_ = batch.column("nb").to_numpy().astype(np.float64)
        j = i / (na + nb_ - i)
        keep_m = j >= threshold
        idx = np.flatnonzero(keep_m)
        # SQL ROUND semantics (half away from zero) like the minhash
        # path — np.round is half-to-even and diverges from the DuckDB
        # oracle on exact .5e-6 boundaries
        jr = np.floor(j[idx] * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "doc_id_a": batch.column("doc_id_a").take(pa.array(idx)),
                "doc_id_b": batch.column("doc_id_b").take(pa.array(idx)),
                "jaccard": pa.array(jr, pa.float64()),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow")


def ngram_jaccard_sql(
    shingle_k: int = 3, threshold: float = 0.2, max_df: int = 10_000
) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(t, i, i + {shingle_k - 1}), ' ') AS shingle
  FROM (SELECT doc_id, t, unnest(range(1, GREATEST(len(t) - {shingle_k - 1}, 1) + 1)) i
        FROM toks WHERE len(t) > 0)),
dfs AS (SELECT shingle, count(*) df FROM sh0 GROUP BY 1),
sh AS (SELECT sh0.* FROM sh0 JOIN dfs USING (shingle) WHERE dfs.df <= {max_df}),
sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id da, b.doc_id db, count(*) i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT da AS doc_id_a, db AS doc_id_b,
       ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {threshold}
ORDER BY 1, 2
"""


def connected_components(
    pairs: ray.data.Dataset,
    nodes: ray.data.Dataset,
    max_rounds: int = 20,
) -> ray.data.Dataset:
    """Distributed connected components over a near-duplicate pair graph:
    (doc_id, cluster_id) with cluster_id = min doc_id in the component.
    The step a pair list alone cannot give you — dedup keeps ONE doc per
    component, so the transitive closure of pairs must be computed.

    Min-label propagation: each round every node takes the min label
    among itself and its neighbours. The neighbour lookup is a sort-based
    cogroup (union of tagged edge/label rows → groupby(node).map_groups)
    followed by a groupby-min — two shuffles of O(|E|) rows per round,
    labels materialized between rounds, never the edge set re-derived.
    Rounds needed = graph diameter; near-dup components are near-cliques
    (diameter ≤ ~3), so 3–4 rounds in practice. Convergence is detected
    by the monotone label sum, so no extra equality join. For adversarial
    long-chain graphs swap in star-contraction (O(log n) rounds, same
    building blocks).

    ``nodes`` supplies the full doc_id universe so pairless docs come out
    as their own singleton cluster.
    """

    def both_dir(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_id_a").to_numpy()
        b = batch.column("doc_id_b").to_numpy()
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), pa.int64()),
                "src": pa.array(np.concatenate([b, a]), pa.int64()),
                "label": pa.array(np.full(2 * len(a), -1), pa.int64()),
            }
        )

    # adjacency rows (node, src, -1); label rows are (node, -1, label)
    edges = pairs.map_batches(
        both_dir, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def init(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        return pa.table(
            {
                "node": ids,
                "src": pa.array(np.full(len(batch), -1), pa.int64()),
                "label": ids,
            }
        )

    lab = nodes.map_batches(
        init, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    from ..stages.agg import _salt_parts, bucket_aggregate, default_nparts

    nparts = default_nparts()  # fixed at the driver: same key, same part
    _BIG = np.iinfo(np.int64).max

    def propagate_part(group: pa.Table) -> pa.Table:
        # one call per salt partition: per node-run, v = min own label;
        # emit (neighbour, v) for every adjacency row + (node, v) — all
        # reduceat/repeat vectorized (the old shape was one Python call
        # per NODE, twice per round)
        srt = group.take(
            pc.sort_indices(group, sort_keys=[("node", "ascending")])
        )
        node = srt.column("node").to_numpy()
        src = srt.column("src").to_numpy()
        lbl = srt.column("label").to_numpy()
        n = len(node)
        if n == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                }
            )
        starts = np.flatnonzero(np.concatenate([[True], node[1:] != node[:-1]]))
        L = np.diff(np.concatenate([starts, [n]]))
        run_id = np.repeat(np.arange(len(starts)), L)
        own = src == -1
        vown = np.minimum.reduceat(np.where(own, lbl, _BIG), starts)
        valid = vown != _BIG  # defensive: edges to a node outside `nodes`
        neigh = (~own) & valid[run_id]
        out_nodes = np.concatenate([src[neigh], node[starts[valid]]])
        out_lbl = np.concatenate([vown[run_id[neigh]], vown[valid]])
        return pa.table(
            {
                "node": pa.array(out_nodes, pa.int64()),
                "label": pa.array(out_lbl, pa.int64()),
            }
        )

    def readd_src(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": b.column("node"),
                "src": pa.array(np.full(len(b), -1), pa.int64()),
                "label": b.column("label"),
            }
        )

    prev_sum = None
    for _ in range(max_rounds):
        prop = (
            edges.union(lab)
            .map_batches(
                lambda b: _salt_parts(b, ["node"], nparts),
                batch_format="pyarrow",
            )
            .groupby("__part")
            .map_groups(propagate_part, batch_format="pyarrow")
        )
        lab = (
            bucket_aggregate(prop, ["node"], [("label", "min", "label")])
            .map_batches(readd_src, batch_format="pyarrow")
            .materialize()
        )
        s = lab.sum("label")
        if s == prev_sum:
            break
        prev_sum = s

    return lab.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("node"), "cluster_id": b.column("label")}
        ),
        batch_format="pyarrow",
    )


def dedup_clusters(
    ds: ray.data.Dataset,
    shingle_k: int = 3,
    threshold: float = 0.2,
    max_df: int = 10_000,
) -> ray.data.Dataset:
    """ngram-Jaccard pairs → connected components → (doc_id, cluster_id).
    Keep `cluster_id == doc_id` rows (component minimum) to dedup."""
    pairs = ngram_jaccard_pairs(
        ds, shingle_k=shingle_k, threshold=threshold, max_df=max_df
    )
    nodes = ds.map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow"
    )
    return connected_components(pairs, nodes)


def dedup_clusters_sql(
    shingle_k: int = 3, threshold: float = 0.2, max_df: int = 10_000
) -> str:
    """Recursive-CTE transitive closure mirror of dedup_clusters."""
    pairs = ngram_jaccard_sql(shingle_k, threshold, max_df).strip()
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
  SELECT doc_id_a u, doc_id_b v FROM pairs
  UNION ALL SELECT doc_id_b, doc_id_a FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
lab AS (SELECT u doc_id, LEAST(u, MIN(v)) cid FROM reach GROUP BY u)
SELECT d.doc_id, COALESCE(lab.cid, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN lab USING (doc_id) ORDER BY 1
"""
