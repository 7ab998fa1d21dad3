"""Benchmark decontamination and repetition/diversity metrics.

Two training-data curation fronts the corpus pipeline needs beyond
dedup (dedup.py) and quality scoring (analysis.py):

* ``ngram_decontaminate`` — flag documents sharing any word n-gram with
  a benchmark/eval set (the standard "did the training corpus leak the
  test set" check). The benchmark n-gram set is built once, collected
  to the driver and **broadcast via ``ray.put``** — read zero-copy from
  the object store by every task, never re-shipped per batch. The scan
  itself is a stateless map: no shuffle at any corpus size.
* ``repetition_metrics`` — Gopher-style per-document repetition /
  diversity fractions (duplicate-word mass, top-bigram share,
  duplicate-trigram mass). Every fraction is a single IEEE division of
  two int64 counts, so ``ROUND(x, 6)`` is bit-identical between numpy
  and the DuckDB oracle — no float-summation-order hazard.

Both are stateless vectorized ``map_batches``: tokenization is one
Arrow C++ regex split per batch; n-grams are built by joining
zero-copy slices of the flat token array
(``pc.binary_join_element_wise``); per-document grouping is
``np.unique`` / ``np.bincount`` over integer keys (a document is one
row, so its stats never span batches).

Reference parity note: geofileops has no text ops — these extend the
engine for the 100-TB training-data use case (brief: dedup /
similarity / text analysis are first-class alongside SURVEY §2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def _round6(x: np.ndarray) -> np.ndarray:
    # DuckDB ROUND: half away from zero (positives: half-up).
    return np.floor(np.asarray(x, np.float64) * 1e6 + 0.5) / 1e6


def _flat_tokens(
    batch: pa.Table, text_col: str
) -> tuple[pa.Array, np.ndarray]:
    """Lowercased alnum tokens of every row, flattened: returns
    (flat tokens, parent row index per token). One Arrow C++ split
    kernel; empty tokens (regexp split artifacts) removed. NULL text
    yields zero tokens for that row (SQL: regexp over NULL → NULL)."""
    col = pc.utf8_lower(batch.column(text_col))
    lists = pc.split_pattern_regex(col, pattern=TOKEN_SPLIT_RE)
    la = (
        lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    )
    flat = la.flatten()
    lens = pc.list_value_length(la).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
    parent = np.repeat(np.arange(len(la), dtype=np.int64), lens)
    keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        parent = parent[keep]
    return flat, parent


def _ngrams(
    flat: pa.Array, parent: np.ndarray, n: int
) -> tuple[pa.Array, np.ndarray]:
    """Word n-grams (space-joined) from the flat token stream, built by
    joining n zero-copy slices; positions spanning two documents are
    masked out (parent is non-decreasing, so parent[i] == parent[i+n-1]
    ⇔ all n tokens share a document). Returns (ngram strings, parent
    row index per n-gram position)."""
    L = len(flat)
    if L < n:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    m = L - n + 1
    parts = [flat.slice(i, m) for i in range(n)]
    joined = pc.binary_join_element_wise(*parts, " ")
    mask = parent[: m] == parent[n - 1 :]
    if mask.all():
        return joined, parent[:m]
    return joined.filter(pa.array(mask)), parent[:m][mask]


def build_benchmark_ngrams(
    ds: ray.data.Dataset,
    n: int = 3,
    benchmark_mod: int = 97,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> np.ndarray:
    """Distinct word n-grams of the benchmark slice
    (``id % benchmark_mod == 0`` — the deterministic stand-in for "the
    eval set" on the synthetic corpus; real deployments pass their own
    n-gram list to :func:`ngram_decontaminate`).

    The per-batch combiner emits DISTINCT n-grams only, so the driver
    collect is bounded by the benchmark vocabulary — benchmarks are
    eval sets (10^4–10^6 n-grams), small by definition; the 100-TB
    corpus never flows through this path."""

    def bench_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sel = np.asarray(ids, np.int64) % benchmark_mod == 0
        batch = batch.filter(pa.array(sel))
        flat, parent = _flat_tokens(batch, text_col)
        ng, _ = _ngrams(flat, parent, n)
        return pa.table({"ng": pc.unique(ng)})

    parts = ds.map_batches(
        bench_batch, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    vals = [r["ng"] for r in parts]
    return np.unique(np.asarray(vals, dtype=object))


def ngram_decontaminate(
    ds: ray.data.Dataset,
    n: int = 3,
    benchmark_mod: int = 97,
    benchmark_ngrams: "np.ndarray | list[str] | None" = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-document benchmark-contamination check → (doc_id, n_ngrams,
    n_contaminated, is_contaminated).

    ``n_contaminated`` counts n-gram POSITIONS whose n-gram is in the
    benchmark set (a position matches at most one distinct benchmark
    n-gram, mirroring the SQL ``JOIN bench USING (ng)``). Benchmark
    docs themselves are naturally flagged. The benchmark set is
    broadcast once (``ray.put``) and read zero-copy per task —
    ``pc.is_in`` hashes it in C++ per batch."""
    if benchmark_ngrams is None:
        benchmark_ngrams = build_benchmark_ngrams(
            ds, n=n, benchmark_mod=benchmark_mod,
            text_col=text_col, id_col=id_col,
        )
    bench_arr = pa.array(list(benchmark_ngrams), pa.string())
    bench_ref = ray.put(bench_arr)

    def fn(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        flat, parent = _flat_tokens(batch, text_col)
        ng, gparent = _ngrams(flat, parent, n)
        nrows = len(batch)
        n_ng = np.bincount(gparent, minlength=nrows).astype(np.int64)
        hit = pc.is_in(ng, value_set=bench).to_numpy(zero_copy_only=False)
        n_hit = np.bincount(
            gparent[hit.astype(bool)], minlength=nrows
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column(id_col),
                "n_ngrams": pa.array(n_ng, pa.int64()),
                "n_contaminated": pa.array(n_hit, pa.int64()),
                "is_contaminated": pa.array(n_hit > 0),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def repetition_metrics(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Per-document repetition / diversity fractions → (doc_id,
    n_words, n_distinct_words, dup_word_frac, top_bigram_frac,
    dup_trigram_frac), each ROUND(·, 6):

    * ``dup_word_frac`` — fraction of word positions whose word occurs
      more than once in the document (duplicate-word mass).
    * ``top_bigram_frac`` — share of bigram positions taken by the most
      frequent bigram.
    * ``dup_trigram_frac`` — fraction of trigram positions whose
      trigram occurs more than once.

    Zero-denominator documents score 0.0 (GREATEST(·, 1) in the SQL
    mirror). Every fraction is one int64/int64 IEEE division — exact
    vs the oracle."""

    def _per_doc_counts(
        grams: pa.Array, gparent: np.ndarray, nrows: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(total, n_distinct, dup_mass, max_count) per document."""
        total = np.bincount(gparent, minlength=nrows).astype(np.int64)
        if len(grams) == 0:
            z = np.zeros(nrows, np.int64)
            return total, z.copy(), z.copy(), z.copy()
        enc = pc.dictionary_encode(grams)
        gid = enc.indices.to_numpy().astype(np.int64)
        V = len(enc.dictionary)
        key = gparent * V + gid
        uk, cnt = np.unique(key, return_counts=True)
        pdoc = (uk // V).astype(np.int64)
        n_distinct = np.bincount(pdoc, minlength=nrows).astype(np.int64)
        dup_mass = np.bincount(
            pdoc, weights=np.where(cnt > 1, cnt, 0), minlength=nrows
        ).astype(np.int64)
        mx = np.zeros(nrows, np.int64)
        np.maximum.at(mx, pdoc, cnt)
        return total, n_distinct, dup_mass, mx

    def fn(batch: pa.Table) -> pa.Table:
        nrows = len(batch)
        flat, parent = _flat_tokens(batch, text_col)
        nw, ndw, dupw, _ = _per_doc_counts(flat, parent, nrows)
        bg, bparent = _ngrams(flat, parent, 2)
        nbg, _, _, mxbg = _per_doc_counts(bg, bparent, nrows)
        tg, tparent = _ngrams(flat, parent, 3)
        ntg, _, duptg, _ = _per_doc_counts(tg, tparent, nrows)
        d_w = np.maximum(nw, 1).astype(np.float64)
        d_bg = np.maximum(nbg, 1).astype(np.float64)
        d_tg = np.maximum(ntg, 1).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch.column(id_col),
                "n_words": pa.array(nw, pa.int64()),
                "n_distinct_words": pa.array(ndw, pa.int64()),
                "dup_word_frac": pa.array(_round6(dupw / d_w), pa.float64()),
                "top_bigram_frac": pa.array(
                    _round6(mxbg / d_bg), pa.float64()
                ),
                "dup_trigram_frac": pa.array(
                    _round6(duptg / d_tg), pa.float64()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# SQL mirrors (DuckDB)


def _ngram_cte(n: int) -> str:
    """CTEs w (token lists) and g (one row per n-gram position).
    DuckDB list slicing is 1-based inclusive: ws[i:i+n-1] is the n-gram
    at position i; range(1, k+1) enumerates positions 1..k."""
    return f"""
w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents
),
g AS (
  SELECT doc_id,
         array_to_string(ws[CAST(i AS BIGINT):CAST(i + {n - 1} AS BIGINT)],
                         ' ') AS ng
  FROM w, UNNEST(range(1, greatest(len(ws) - {n - 1}, 0) + 1)) AS t(i)
)"""


def decontaminate_sql(n: int = 3, benchmark_mod: int = 97) -> str:
    return f"""
WITH {_ngram_cte(n)},
bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % {benchmark_mod} = 0),
hits AS (
  SELECT g.doc_id, COUNT(*) AS n_hits
  FROM g JOIN bench USING (ng) GROUP BY g.doc_id
)
SELECT w.doc_id,
  CAST(greatest(len(w.ws) - {n - 1}, 0) AS BIGINT) AS n_ngrams,
  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_contaminated,
  COALESCE(h.n_hits, 0) > 0 AS is_contaminated
FROM w LEFT JOIN hits h ON w.doc_id = h.doc_id
ORDER BY w.doc_id
"""


REPETITION_SQL = f"""
WITH {_ngram_cte(2).replace('g AS (', 'bg AS (')},
tg AS (
  SELECT doc_id,
         array_to_string(ws[CAST(i AS BIGINT):CAST(i + 2 AS BIGINT)],
                         ' ') AS ng
  FROM w, UNNEST(range(1, greatest(len(ws) - 2, 0) + 1)) AS t(i)
),
tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
wc AS (SELECT doc_id, word, COUNT(*) AS c FROM tok GROUP BY 1, 2),
wstats AS (
  SELECT doc_id, SUM(c) AS nw, COUNT(*) AS ndw,
         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupw
  FROM wc GROUP BY 1
),
bgc AS (SELECT doc_id, ng, COUNT(*) AS c FROM bg GROUP BY 1, 2),
bgstats AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM bgc GROUP BY 1),
tgc AS (SELECT doc_id, ng, COUNT(*) AS c FROM tg GROUP BY 1, 2),
tgstats AS (
  SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
         SUM(c) AS tot
  FROM tgc GROUP BY 1
)
SELECT w.doc_id,
  CAST(COALESCE(ws.nw, 0) AS BIGINT) AS n_words,
  CAST(COALESCE(ws.ndw, 0) AS BIGINT) AS n_distinct_words,
  ROUND(CAST(COALESCE(ws.dupw, 0) AS DOUBLE)
        / CAST(greatest(COALESCE(ws.nw, 0), 1) AS DOUBLE), 6)
    AS dup_word_frac,
  ROUND(CAST(COALESCE(b.mx, 0) AS DOUBLE)
        / CAST(greatest(COALESCE(b.tot, 0), 1) AS DOUBLE), 6)
    AS top_bigram_frac,
  ROUND(CAST(COALESCE(t.dup, 0) AS DOUBLE)
        / CAST(greatest(COALESCE(t.tot, 0), 1) AS DOUBLE), 6)
    AS dup_trigram_frac
FROM w
LEFT JOIN wstats ws ON w.doc_id = ws.doc_id
LEFT JOIN bgstats b ON w.doc_id = b.doc_id
LEFT JOIN tgstats t ON w.doc_id = t.doc_id
ORDER BY w.doc_id
"""
