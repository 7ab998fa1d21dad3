"""BM25 full-text retrieval over the ``documents`` table.

Ray shape (two streaming passes, no shuffle):

1. **Stats pass** — per-batch combiner emits ONE partial row
   (n_docs, sum_dl, df per query term); the driver reduction is
   bounded by block count. Integer partials → the merged stats are
   partition-invariant and exact.
2. **Score pass** — stats broadcast in the task closure; every batch
   tokenizes once (the shared Arrow split kernel from contamination's
   ``_flat_tokens``), computes tf per query term with vectorized
   compares + bincount, and emits scored rows (optionally only its
   local top-k, brute_topk-style, so the driver merge stays tiny).

Scoring is the Lucene-robust BM25 variant:
    idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
with avgdl averaged over ALL docs (empty docs count as dl = 0).
Every stage is SQL-expressible, so :func:`bm25_sql` is an EXACT
DuckDB mirror (round-6 on the emitted score).

Reference scope note: geofileops has no text retrieval; this operator
belongs to the training-data-pipeline surface (corpus triage /
benchmark-leak search) layered on the same engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .contamination import _flat_tokens

_K1 = 1.2
_B = 0.75
_TOKEN_SQL = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _query_terms(query: str) -> list[str]:
    """Distinct lowercased alnum terms, first-seen order (BM25 over
    DISTINCT query terms — duplicated words in the query don't double
    their contribution)."""
    import re

    seen: dict[str, None] = {}
    for t in re.findall(r"[a-z0-9]+", query.lower()):
        seen.setdefault(t, None)
    return list(seen)


def bm25_score(
    ds: ray.data.Dataset,
    query: str,
    k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = _K1,
    b: float = _B,
    round_digits: int = 6,
) -> pa.Table:
    """Score every document containing ≥1 query term; return
    (id_col, score) sorted score-desc then id, truncated to ``k`` when
    given. ``k=None`` returns all matching docs (the oracle-checked
    registry shape — no rank column, so round-6 near-ties can't flip
    row content)."""
    terms = _query_terms(query)
    if not terms:
        return pa.table(
            {id_col: pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    term_arr = pa.array(terms, pa.string())

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(batch, text_col)
        dl = np.bincount(parent, minlength=len(batch))
        cols: dict = {
            "n_docs": pa.array([len(batch)], pa.int64()),
            "sum_dl": pa.array([int(dl.sum())], pa.int64()),
        }
        for i, t in enumerate(terms):
            m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            m = np.nan_to_num(m.astype(np.float64)).astype(bool)
            tf = np.bincount(parent[m], minlength=len(batch))
            cols[f"df{i}"] = pa.array([int((tf > 0).sum())], pa.int64())
        return pa.table(cols)

    parts = ds.map_batches(
        stats_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    n_docs = sum(r["n_docs"] for r in parts)
    sum_dl = sum(r["sum_dl"] for r in parts)
    if n_docs == 0:
        return pa.table(
            {id_col: pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    avgdl = sum_dl / n_docs
    df = np.array(
        [sum(r[f"df{i}"] for r in parts) for i in range(len(terms))],
        dtype=np.float64,
    )
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score_batch(batch: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(batch, text_col)
        dl = np.bincount(parent, minlength=len(batch)).astype(np.float64)
        denom_dl = k1 * (1.0 - b + b * dl / avgdl) if avgdl > 0 else k1
        score = np.zeros(len(batch), dtype=np.float64)
        matched = np.zeros(len(batch), dtype=bool)
        for i in range(len(terms)):
            m = pc.equal(flat, term_arr[i]).to_numpy(zero_copy_only=False)
            m = np.nan_to_num(m.astype(np.float64)).astype(bool)
            tf = np.bincount(parent[m], minlength=len(batch)).astype(
                np.float64
            )
            hit = tf > 0
            matched |= hit
            score += np.where(
                hit, idf[i] * tf * (k1 + 1.0) / (tf + denom_dl), 0.0
            )
        idx = np.flatnonzero(matched)
        if k is not None and len(idx) > k:
            # per-batch partial top-k (full-precision rank, ties by id)
            ids_np = (
                batch.column(id_col).to_numpy(zero_copy_only=False)[idx]
            )
            order = np.lexsort((ids_np, -score[idx]))[:k]
            idx = idx[order]
        return pa.table(
            {
                id_col: batch.column(id_col).take(pa.array(idx)),
                "score": pa.array(score[idx], pa.float64()),
            }
        )

    cand = ds.map_batches(
        score_batch, batch_format="pyarrow", zero_copy_batch=True
    ).take_all() if k is not None else None
    if k is not None:
        rows = sorted(cand, key=lambda r: (-r["score"], r[id_col]))[:k]
        return pa.table(
            {
                id_col: pa.array([r[id_col] for r in rows], pa.int64()),
                "score": pa.array(
                    [round(r["score"], round_digits) for r in rows],
                    pa.float64(),
                ),
            }
        )

    scored = ds.map_batches(
        score_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("score").to_numpy(zero_copy_only=False)
        return batch.set_column(
            batch.schema.get_field_index("score"),
            "score",
            pa.array(np.round(s, round_digits), pa.float64()),
        )

    out = scored.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )
    rows = out.take_all()
    if not rows:  # zero matches: keep the (id, score) schema
        return pa.table(
            {id_col: pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    return pa.Table.from_pylist(rows).sort_by(
        [("score", "descending"), (id_col, "ascending")]
    )


def bm25_sql(
    query: str,
    k1: float = _K1,
    b: float = _B,
    round_digits: int = 6,
) -> str:
    """DuckDB mirror of ``bm25_score(..., k=None)`` (all matching
    docs, rounded score, no rank column)."""
    terms = _query_terms(query)
    values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKEN_SQL}) AS tok FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n,
         (SELECT SUM(COALESCE(dl.dl, 0)) / COUNT(*)
          FROM documents LEFT JOIN dl USING (doc_id)) AS avgdl),
q(term) AS (VALUES {values}),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df
  FROM toks JOIN q ON tok = term GROUP BY term),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM toks JOIN q ON tok = term GROUP BY doc_id, term),
sc AS (
  SELECT tf.doc_id,
         SUM(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * ({k1} + 1.0)
           / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / stats.avgdl))
         ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, stats
  GROUP BY tf.doc_id)
SELECT doc_id, ROUND(score, {round_digits}) AS score
FROM sc ORDER BY score DESC, doc_id
"""
