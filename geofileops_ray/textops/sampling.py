"""Corpus-curation stages: text normalization, PII scrubbing,
deterministic stratified sampling, per-group sampling, TF-IDF term
selection.

These are the selection / cleaning front of a training-data pipeline
(complementing dedup.py / analysis.py). All hot paths are vectorized —
Arrow C++ regex kernels (`pc.replace_substring_regex`,
`pc.split_pattern_regex`) or numpy over dictionary-encoded columns; the
only per-row Python is one C-speed md5 per row in the sampling hash
(the same bit-reproducible-in-DuckDB choice as dedup.py, so every op
here has an EXACT SQL oracle).

Scale notes:
* sampling / scrubbing / normalization are stateless maps — no shuffle.
* tfidf_topk shuffles once by term hash into ~2×CPU salt partitions
  (document frequencies via run lengths, no per-term Python) and once
  by doc for the final top-k, with the per-batch partial-top-k
  combiner bounding that exchange to O(#docs · k).
  Partitioning assumption: one salt partition (≈ tf rows / (2 · pool
  CPUs)) must fit in a worker's heap — on a 256-node/8k-core cluster
  that is ~10^12 tokens / 16k parts ≈ tens of millions of (doc, term,
  tf) rows per task, a few GB of Arrow. For larger corpora raise
  ``nparts`` (it is independent of correctness — only co-location of
  equal terms matters).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..util import md5_u64 as _md5_u64

# RE2-compatible patterns (no lookaround/backrefs) — pyarrow and DuckDB
# both run RE2, so replacement and counting semantics match exactly.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"

# 2^53 — largest power of two whose quotients are exact in float64, so
# (h % MOD) / MOD is bit-identical between numpy and DuckDB.
_U53 = 9007199254740992


def _round6(x: np.ndarray) -> np.ndarray:
    # DuckDB ROUND: half away from zero (positives: half-up).
    return np.floor(np.asarray(x, np.float64) * 1e6 + 0.5) / 1e6


def normalize_text(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """(doc_id, text_norm, n_chars_norm): lowercase, collapse whitespace
    runs (RE2 ``\\s`` = ASCII ``[\\t\\n\\f\\r ]``) to single spaces,
    strip edge SPACES — the same normalization the document fingerprint
    hashes (analysis.py `fingerprint`). Pure Arrow C++ kernels; every
    step (incl. the space-only trim) has identical semantics in the
    DuckDB mirror — Arrow's whitespace-trim and DuckDB's ``trim()``
    disagree on \\v / NEL / Zl / Zp edges, so both sides trim ``' '``
    explicitly."""

    def fn(batch: pa.Table) -> pa.Table:
        x = pc.utf8_lower(batch.column(text_col))
        x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
        x = pc.utf8_trim(x, characters=" ")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_norm": x,
                "n_chars_norm": pc.utf8_length(x).cast(pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pii_scrub(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Mask emails → <EMAIL>, phone-like runs → <PHONE>, IPv4 → <IP>
    (applied in that fixed order); per-doc match counts are taken on the
    ORIGINAL text so they are order-independent. Output:
    (doc_id, text_scrubbed, n_emails, n_phones, n_ipv4)."""

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col)
        ne = pc.count_substring_regex(t, EMAIL_RE).cast(pa.int64())
        np_ = pc.count_substring_regex(t, PHONE_RE).cast(pa.int64())
        ni = pc.count_substring_regex(t, IPV4_RE).cast(pa.int64())
        x = pc.replace_substring_regex(t, pattern=EMAIL_RE, replacement="<EMAIL>")
        x = pc.replace_substring_regex(x, pattern=PHONE_RE, replacement="<PHONE>")
        x = pc.replace_substring_regex(x, pattern=IPV4_RE, replacement="<IP>")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_scrubbed": x,
                "n_emails": ne,
                "n_phones": np_,
                "n_ipv4": ni,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _hash_bucket_column(ids: np.ndarray, mod: int) -> np.ndarray:
    """md5_number_lower(str(id)) % mod per row — one C-speed digest per
    row, bit-identical to the DuckDB expression. Callers must have
    dropped NULL ids first (SQL semantics: a NULL id never samples)."""
    return np.fromiter(
        (_md5_u64(str(int(i))) % mod for i in ids), np.int64, len(ids)
    )


def _drop_null_ids(batch: pa.Table, id_col: str) -> pa.Table:
    """Mirror the SQL oracles' NULL semantics (NULL id / comparison is
    never TRUE, so the row is silently dropped) instead of crashing the
    hash on NaN."""
    col = batch.column(id_col)
    if col.null_count:
        batch = batch.filter(pc.is_valid(col))
    return batch


def stratified_sample(
    ds: ray.data.Dataset,
    rates_permille: dict[str, int],
    default_permille: int = 0,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic stratified sampling: keep a row iff
    md5_number_lower(str(id)) % 1000 < rate(stratum). Content-hash
    based, so the sample is stable under re-runs, repartitioning and
    input reordering (the property a resumable 100-TB curation run
    needs — re-executing a lost block reselects the same rows).
    Stateless map, no shuffle. Output keeps all input columns plus the
    sampling bucket."""

    def fn(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ids(batch, id_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        bucket = _hash_bucket_column(ids, 1000)
        strata = batch.column(stratum_col).to_numpy(zero_copy_only=False)
        thr = np.fromiter(
            (rates_permille.get(s, default_permille) for s in strata),
            np.int64,
            len(strata),
        )
        keep = bucket < thr
        out = batch.filter(pa.array(keep))
        return out.append_column(
            "sample_bucket", pa.array(bucket[keep], pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sample_k_per_group(
    ds: ray.data.Dataset,
    key_col: str = "lang",
    k: int = 10,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic "random" k rows per group: score each row with a
    content-hash uniform in [0,1) and keep the per-group top-k — a
    reservoir sample whose result is independent of partitioning and
    arrival order. Reuses the partial-top-k combiner (analysis.py
    `topk_per_group`), so the shuffle carries O(#groups · k · #blocks)
    rows. Output: (key, doc_id, score, rank)."""
    from .analysis import topk_per_group

    def score(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ids(batch, id_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = _hash_bucket_column(ids, _U53).astype(np.float64) / float(_U53)
        return pa.table(
            {
                key_col: batch.column(key_col),
                id_col: batch.column(id_col),
                "score": pa.array(h, pa.float64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return topk_per_group(scored, key_col, "score", k=k, id_col=id_col)


def _tf_batch(batch: pa.Table, text_col: str) -> pa.Table:
    """(doc_id, term, tf) — complete per document (a document is one
    row, so its term frequencies never span batches). Tokenization is
    one Arrow C++ split kernel; counting is numpy over the
    dictionary-encoded flat term array."""
    col = pc.utf8_lower(batch.column(text_col))
    lists = pc.split_pattern_regex(col, pattern="[^a-z0-9]+")
    la = (
        lists.combine_chunks()
        if isinstance(lists, pa.ChunkedArray)
        else lists
    )
    flat = la.flatten()
    lens = pc.list_value_length(la).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
    parent = np.repeat(np.arange(len(la)), lens)
    keepmask = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    flat = flat.filter(pa.array(keepmask))
    parent = parent[keepmask]
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            }
        )
    enc = pc.dictionary_encode(flat)
    tid = enc.indices.to_numpy().astype(np.int64)
    vocab = enc.dictionary
    key = parent * len(vocab) + tid
    uk, counts = np.unique(key, return_counts=True)
    pdoc = uk // len(vocab)
    pterm = uk % len(vocab)
    return pa.table(
        {
            "doc_id": pa.array(ids[pdoc].astype(np.int64), pa.int64()),
            "term": vocab.take(pa.array(pterm)),
            "tf": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def tfidf_topk(
    ds: ray.data.Dataset,
    k: int = 5,
    text_col: str = "text",
    n_docs: int | None = None,
) -> ray.data.Dataset:
    """Per-document top-k TF-IDF terms: score = ROUND(tf · ln(N/df), 6),
    ties broken by term ascending. Output (doc_id, term, score, rank).

    Shape: tf rows are complete per batch (no shuffle); df needs each
    term's rows co-located once — ONE hash shuffle of the (doc, term,
    tf) stream into ~2×CPU salt partitions, document frequency = run
    length per term inside the partition (tf rows are unique per
    (doc, term)), score vectorized; then the standard partial-top-k
    combiner + groupby(doc) finishes. No broadcast of the vocabulary,
    no driver materialization — both unbounded at corpus scale.

    ``n_docs`` (the corpus size for idf) is taken from ``ds.count()``
    when not given — a metadata-only pass for parquet-backed inputs,
    but a FULL extra execution if ``ds`` already has transforms on it;
    pass the known count in that case."""
    from ..stages.agg import _salt_parts, default_nparts
    from .analysis import topk_per_group

    nd = float(n_docs if n_docs is not None else ds.count())
    nparts = default_nparts()

    tf = ds.map_batches(
        lambda b: _tf_batch(b, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def score_part(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["__part"])
        if len(g) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                }
            )
        enc = pc.dictionary_encode(
            g.column("term").combine_chunks()
            if isinstance(g.column("term"), pa.ChunkedArray)
            else g.column("term")
        )
        tid = enc.indices.to_numpy().astype(np.int64)
        order = np.argsort(tid, kind="stable")
        ts = tid[order]
        newrun = np.empty(len(ts), dtype=bool)
        newrun[0] = True
        newrun[1:] = ts[1:] != ts[:-1]
        starts = np.flatnonzero(newrun)
        runlen = np.diff(np.append(starts, len(ts)))
        df_sorted = np.repeat(runlen, runlen).astype(np.float64)
        df = np.empty(len(ts), np.float64)
        df[order] = df_sorted
        tfv = g.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        # idf via libm math.log over the DISTINCT df values: bit-exact
        # vs DuckDB's ln (np.log's SIMD path differs by 1 ulp on ~20%
        # of inputs — measured — which could flip ROUND(x, 6) on a
        # boundary and break the exact-oracle contract)
        uniq_df = np.unique(runlen).astype(np.float64)
        idf_vals = np.array([math.log(nd / d) for d in uniq_df], np.float64)
        idf = idf_vals[np.searchsorted(uniq_df, df)]
        score = _round6(tfv * idf)
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "term": g.column("term"),
                "score": pa.array(score, pa.float64()),
            }
        )

    scored = (
        tf.map_batches(
            lambda b: _salt_parts(b, ["term"], nparts),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("__part")
        .map_groups(score_part, batch_format="pyarrow")
    )
    return topk_per_group(scored, "doc_id", "score", k=k, id_col="term")


# ---------------------------------------------------------------------------
# SQL mirrors (DuckDB)

NORMALIZE_SQL = """
SELECT doc_id,
       trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS text_norm,
       CAST(length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '))
            AS BIGINT) AS n_chars_norm
FROM documents ORDER BY doc_id
"""

PII_SCRUB_SQL = f"""
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
    '{EMAIL_RE}', '<EMAIL>', 'g'),
    '{PHONE_RE}', '<PHONE>', 'g'),
    '{IPV4_RE}', '<IP>', 'g') AS text_scrubbed,
  CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT) AS n_ipv4
FROM documents ORDER BY doc_id
"""


def stratified_sample_sql(
    rates_permille: dict[str, int],
    default_permille: int = 0,
    stratum_col: str = "lang",
) -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {r}" for s, r in sorted(rates_permille.items())
    )
    return f"""
SELECT *,
  CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 AS BIGINT)
    AS sample_bucket
FROM documents
WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000
  < CASE {stratum_col} {cases} ELSE {default_permille} END
ORDER BY doc_id
"""


def sample_k_per_group_sql(key_col: str = "lang", k: int = 10) -> str:
    u = (
        f"(md5_number_lower(CAST(doc_id AS VARCHAR)) % {_U53}) / {_U53}.0"
    )
    return f"""
SELECT {key_col}, doc_id, score, rank FROM (
  SELECT {key_col}, doc_id, {u} AS score,
    CAST(ROW_NUMBER() OVER (PARTITION BY {key_col}
         ORDER BY {u} DESC, doc_id) AS BIGINT) AS rank
  FROM documents)
WHERE rank <= {k}
ORDER BY {key_col}, rank
"""


def tfidf_topk_sql(k: int = 5) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(CAST(tf.tf AS DOUBLE) * ln(n.n / CAST(df.df AS DOUBLE)), 6)
           AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, score, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
       ORDER BY score DESC, term) AS BIGINT) AS rank
  FROM scored)
WHERE rank <= {k}
ORDER BY doc_id, rank
"""
