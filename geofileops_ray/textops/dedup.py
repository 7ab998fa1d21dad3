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

    def first(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy()
        keep = int(np.argmin(ids))
        return pa.table({"doc_id": pa.array([int(ids[keep])], pa.int64())})

    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__key")
        .map_groups(first, batch_format="pyarrow")
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


def minhash_signatures(
    ds: ray.data.Dataset,
    num_hashes: int = 16,
    shingle_k: int = 3,
    band_size: int = 4,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-doc MinHash signature + LSH band keys.

    signature[i] = min over 3-token shingles of md5(f"{i}|{shingle}")
    (lexicographic min of hex digests — identical in DuckDB). Output:
    (doc_id, band_id, band_key) with band_key = md5 of the band's
    concatenated min-hashes; docs sharing any (band_id, band_key) are
    LSH near-dup candidates.
    """
    nb = num_hashes // band_size

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column("doc_id").to_numpy()
        out_id, out_band, out_key = [], [], []
        for d, t in zip(ids, texts):
            sh = _shingles(_norm_tokens(t), shingle_k)
            if not sh:
                continue
            sig = [
                min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in sh)
                for i in range(num_hashes)
            ]
            for b in range(nb):
                band = "".join(sig[b * band_size : (b + 1) * band_size])
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
) -> ray.data.Dataset:
    """LSH candidate pairs verified with exact n-gram Jaccard:
    shingle → minhash → band → bucket groupby → per-bucket pairs →
    exact verification. Returns (doc_id_a, doc_id_b, jaccard)."""
    sigs = minhash_signatures(ds, num_hashes, shingle_k, band_size, text_col)
    texts = ds.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id"), "text": b.column(text_col)}),
        batch_format="pyarrow",
    )
    joined = sigs.join(texts, join_type="inner", num_partitions=8, on=("doc_id",))

    def per_bucket(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy()
        txt = group.column("text").to_pylist()
        uniq: dict[int, str] = {}
        for d, t in zip(ids, txt):
            uniq[int(d)] = t
        items = sorted(uniq)
        a_out, b_out, j_out = [], [], []
        for x in range(len(items)):
            sx = set(_shingles(_norm_tokens(uniq[items[x]]), shingle_k))
            for y in range(x + 1, len(items)):
                sy = set(_shingles(_norm_tokens(uniq[items[y]]), shingle_k))
                inter = len(sx & sy)
                un = len(sx | sy)
                j = inter / un if un else 0.0
                if j >= jaccard_threshold:
                    a_out.append(items[x])
                    b_out.append(items[y])
                    j_out.append(round(j, 6))
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

    pairs = (
        joined.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )

    # a pair can surface from several bands → dedup by (a, b)
    def first(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    keyed = pairs.map_batches(
        lambda b: b.append_column(
            "__pair",
            pc.binary_join_element_wise(
                pc.cast(b.column("doc_id_a"), pa.string()),
                pc.cast(b.column("doc_id_b"), pa.string()),
                "_",
            ),
        ),
        batch_format="pyarrow",
    )
    return (
        keyed.groupby("__pair")
        .map_groups(first, batch_format="pyarrow")
        .drop_columns(["__pair"])
    )


def minhash_sql(num_hashes: int = 16, band_size: int = 4, shingle_k: int = 3) -> str:
    """DuckDB mirror of minhash_signatures (same md5 min semantics)."""
    nb = num_hashes // band_size
    band_rows = []
    for b in range(nb):
        cols = "||".join(f"s{i}" for i in range(b * band_size, (b + 1) * band_size))
        band_rows.append(f"SELECT doc_id, {b} AS band_id, md5({cols}) AS band_key FROM sig")
    bands_sql = " UNION ALL ".join(band_rows)
    sig_cols = ", ".join(
        f"min(CASE WHEN k = {i} THEN h END) AS s{i}" for i in range(num_hashes)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents),
sh AS (
  SELECT doc_id,
         array_to_string(list_slice(t, i, i + {shingle_k - 1}), ' ') AS shingle
  FROM (SELECT doc_id, t, unnest(range(1, GREATEST(len(t) - {shingle_k - 1}, 1) + 1)) i
        FROM toks WHERE len(t) > 0)),
hs AS (
  SELECT doc_id, k, md5(CAST(k AS VARCHAR) || '|' || shingle) h
  FROM sh, generate_series(0, {num_hashes - 1}) ks(k)),
sig AS (
  SELECT doc_id, {sig_cols} FROM hs GROUP BY doc_id)
SELECT * FROM ({bands_sql}) ORDER BY doc_id, band_id
"""


# ----------------------------------------------------------------- simhash


def simhash(
    ds: ray.data.Dataset, bits: int = 32, text_col: str = "text"
) -> ray.data.Dataset:
    """32-bit SimHash over unique tokens: bit b of md5(token) votes ±1;
    sign of the vote sum sets bit b of the fingerprint. (doc_id, sh)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        out = []
        for t in texts:
            toks = sorted(set(_norm_tokens(t)))
            votes = np.zeros(bits, dtype=np.int64)
            for tok in toks:
                h = int(hashlib.md5(tok.encode()).hexdigest()[: bits // 4], 16)
                for b in range(bits):
                    votes[b] += 1 if (h >> b) & 1 else -1
            sh = 0
            for b in range(bits):
                if votes[b] > 0:
                    sh |= 1 << b
            out.append(sh)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "sh": pa.array(out, pa.int64())}
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
) -> ray.data.Dataset:
    """All-pairs n-gram Jaccard ≥ threshold via inverted-index shuffle:
    explode (shingle → doc), groupby shingle emits co-occurring doc
    pairs with counts, then groupby pair sums intersections and computes
    J = |∩| / (|A| + |B| − |∩|). Exact — no LSH approximation."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column(text_col).to_pylist()
        out_id, out_sh, out_n = [], [], []
        for d, t in zip(ids, texts):
            sh = set(_shingles(_norm_tokens(t), shingle_k))
            for s in sh:
                out_id.append(int(d))
                out_sh.append(s)
                out_n.append(len(sh))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "shingle": pa.array(out_sh, pa.string()),
                "n_shingles": pa.array(out_n, pa.int64()),
            }
        )

    def pairs_of_shingle(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy()
        ns = group.column("n_shingles").to_numpy()
        order = np.argsort(ids)
        ids, ns = ids[order], ns[order]
        a_out, b_out, na, nb_ = [], [], [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a_out.append(int(ids[x]))
                b_out.append(int(ids[y]))
                na.append(int(ns[x]))
                nb_.append(int(ns[y]))
        return pa.table(
            {
                "doc_id_a": pa.array(a_out, pa.int64()),
                "doc_id_b": pa.array(b_out, pa.int64()),
                "na": pa.array(na, pa.int64()),
                "nb": pa.array(nb_, pa.int64()),
            }
        )

    def jaccard_of_pair(group: pa.Table) -> pa.Table:
        inter = len(group)
        na = int(group.column("na")[0].as_py())
        nb_ = int(group.column("nb")[0].as_py())
        j = inter / (na + nb_ - inter)
        if j < threshold:
            return pa.table(
                {
                    "doc_id_a": pa.array([], pa.int64()),
                    "doc_id_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "doc_id_a": group.column("doc_id_a").slice(0, 1),
                "doc_id_b": group.column("doc_id_b").slice(0, 1),
                "jaccard": pa.array([round(j, 6)], pa.float64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    pairs = exploded.groupby("shingle").map_groups(
        pairs_of_shingle, batch_format="pyarrow"
    )
    keyed = pairs.map_batches(
        lambda b: b.append_column(
            "__pair",
            pc.binary_join_element_wise(
                pc.cast(b.column("doc_id_a"), pa.string()),
                pc.cast(b.column("doc_id_b"), pa.string()),
                "_",
            ),
        ),
        batch_format="pyarrow",
    )
    return (
        keyed.groupby("__pair")
        .map_groups(jaccard_of_pair, batch_format="pyarrow")
        .drop_columns([])
    )


def ngram_jaccard_sql(shingle_k: int = 3, threshold: float = 0.2) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(t, i, i + {shingle_k - 1}), ' ') AS shingle
  FROM (SELECT doc_id, t, unnest(range(1, GREATEST(len(t) - {shingle_k - 1}, 1) + 1)) i
        FROM toks WHERE len(t) > 0)),
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
