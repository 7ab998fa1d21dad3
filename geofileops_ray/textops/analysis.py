"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

All stateless vectorized ``map_batches`` over zero-copy Arrow string
columns; regex kernels are `pyarrow.compute` (C++) where possible. Every
op has an exact DuckDB SQL mirror (same regexes, md5 for hashes) used by
``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyarrow.compute import dictionary_encode as _pc_dictionary_encode

import ray.data

TOKEN_RE = r"[a-z0-9]+"
# tiny stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "as"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
}


def token_count(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_tokens, n_chars_seen): whitespace-token counting via an
    Arrow C++ regex kernel — no Python loop."""

    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.count_substring_regex(batch.column(text_col), r"\S+")
        chars = pc.utf8_length(batch.column(text_col))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": toks.cast(pa.int64()),
                "n_chars_seen": chars.cast(pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_score(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Quality components + composite score:
    n_tokens, n_alpha_tokens, alpha_ratio, stop_ratio, quality.
    quality = alpha_ratio * 0.5 + stop_ratio * 0.5 (rounded 6)."""
    return _quality_score(ds, text_col)


def _quality_score(
    ds: ray.data.Dataset, text_col: str = "text", keep_cols: tuple = ()
) -> ray.data.Dataset:
    def _round6(x: np.ndarray) -> np.ndarray:
        # DuckDB ROUND semantics: half away from zero (positives: half-up)
        return np.floor(x * 1e6 + 0.5) / 1e6

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        lower = pc.utf8_lower(text)
        n_tok = pc.count_substring_regex(text, r"\S+").cast(pa.float64()).to_numpy()
        n_alpha = (
            pc.count_substring_regex(text, r"\b[A-Za-z]+\b")
            .cast(pa.float64())
            .to_numpy()
        )
        stop_hits = None
        for w in STOPWORDS["en"]:
            c = pc.count_substring_regex(lower, rf"\b{w}\b").cast(pa.float64())
            stop_hits = c if stop_hits is None else pc.add(stop_hits, c)
        stop_hits = stop_hits.to_numpy()
        denom = np.maximum(n_tok, 1.0)
        alpha_ratio = _round6(n_alpha / denom)
        stop_ratio = _round6(stop_hits / denom)
        quality = _round6(alpha_ratio * 0.5 + stop_ratio * 0.5)
        cols = {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tok.astype(np.int64), pa.int64()),
            "n_alpha_tokens": pa.array(n_alpha.astype(np.int64), pa.int64()),
            "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
            "stop_ratio": pa.array(stop_ratio, pa.float64()),
            "quality": pa.array(quality, pa.float64()),
        }
        for c in keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def topk_per_group(
    ds: ray.data.Dataset,
    key_col: str,
    score_col: str,
    k: int = 10,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Distributed top-k rows per key (the data-selection primitive:
    "keep the k best documents per language/domain/source").

    Shape: vectorized per-batch PARTIAL top-k (at most k rows per
    (key, block) enter the shuffle — the combiner that keeps the
    exchange O(#keys · k · #blocks) instead of O(rows)) → one
    groupby(key) final top-k. Ties break deterministically by
    (score DESC, id ASC) — mirroring SQL
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY score DESC, id)``.
    """

    def _select_topk(
        kidx: np.ndarray, s: np.ndarray, ids: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Row indices of the per-key top-k plus each row's 0-based rank,
        ordered (key, score desc, id asc); fully vectorized."""
        order = np.lexsort((ids, -s, kidx))
        ks = kidx[order]
        newkey = np.empty(len(ks), dtype=bool)
        if len(ks):
            newkey[0] = True
            newkey[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(newkey)
        run = np.repeat(starts, np.diff(np.append(starts, len(ks))))
        rank = np.arange(len(ks)) - run
        keep = rank < k
        return order[keep], rank[keep]

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        col = batch.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = (
                col.chunk(0)
                if col.num_chunks == 1
                else pa.concat_arrays(col.chunks)
                if col.num_chunks
                else pa.array([], type=col.type)
            )
        enc = _pc.dictionary_encode(col)
        kidx = enc.indices.to_numpy().astype(np.int64)
        s = batch.column(score_col).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        take, _ = _select_topk(kidx, s, ids)
        return batch.take(pa.array(take)).select([key_col, id_col, score_col])

    def final_part(group: pa.Table) -> pa.Table:
        # one call per salt partition, ALL its keys at once: the same
        # vectorized per-key top-k as the combiner (a groupby(key)
        # map_groups would cost ~100-200 µs of Python PER KEY — the key
        # here can be a doc id, i.e. row-cardinality)
        group = group.drop_columns(["__part"])
        if len(group) == 0:
            return group.append_column("rank", pa.array([], pa.int64()))
        col = group.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = (
                col.combine_chunks()
                if col.num_chunks != 1
                else col.chunk(0)
            )
        enc = _pc_dictionary_encode(col)
        kidx = enc.indices.to_numpy().astype(np.int64)
        s = group.column(score_col).to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        take, rank = _select_topk(kidx, s, ids)
        out = group.take(pa.array(take))
        return out.append_column("rank", pa.array(rank + 1, pa.int64()))

    from ..stages.agg import _salt_parts, default_nparts

    nparts = default_nparts()  # fixed at the driver: same key, same part
    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda b: _salt_parts(b, [key_col], nparts),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(final_part, batch_format="pyarrow")
    )


def language_id(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Stopword-hit language heuristic → (doc_id, lang_pred). Ties break
    in the fixed order en > de > fr (>= comparisons)."""

    def fn(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch.column(text_col))
        hits = {}
        for lang, words in STOPWORDS.items():
            h = None
            for w in words:
                c = pc.count_substring_regex(lower, rf"\b{w}\b").cast(pa.int64())
                h = c if h is None else pc.add(h, c)
            hits[lang] = h.to_numpy(zero_copy_only=False)
        en, de, fr = hits["en"], hits["de"], hits["fr"]
        pred = np.where(
            (en >= de) & (en >= fr), "en", np.where(de >= fr, "de", "fr")
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(pred.tolist(), pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def fingerprint(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Document fingerprint = md5 of whitespace-normalized lowercase text
    → (doc_id, fp). md5 is reproducible bit-for-bit in DuckDB's md5().

    Normalization runs through the Arrow C++ kernels (NOT Python
    ``re``): RE2's ``\\s`` is ASCII ``[\\t\\n\\f\\r ]`` while Python's
    is full Unicode, and DuckDB's bare ``trim()`` strips Zs-category
    spaces but not ``\\v`` — so both sides collapse with RE2 and trim
    ``' '`` explicitly, keeping the fp oracle exact on any corpus."""

    def fn(batch: pa.Table) -> pa.Table:
        x = pc.utf8_lower(batch.column(text_col))
        x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
        x = pc.utf8_trim(x, characters=" ")
        fps = [
            hashlib.md5((t or "").encode()).hexdigest() for t in x.to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fp": pa.array(fps, pa.string())}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# SQL mirrors (DuckDB) — kept adjacent to the kernels they mirror.
TOKEN_COUNT_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_seen
FROM documents ORDER BY doc_id
"""

_STOP_EN = "|".join(STOPWORDS["en"])

QUALITY_SQL = f"""
WITH q AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) n_tok,
    CAST(len(regexp_extract_all(text, '\\b[A-Za-z]+\\b')) AS DOUBLE) n_alpha,
    CAST(len(regexp_extract_all(lower(text), '\\b({_STOP_EN})\\b')) AS DOUBLE) stop_hits
  FROM documents)
SELECT doc_id,
  CAST(n_tok AS BIGINT) AS n_tokens,
  CAST(n_alpha AS BIGINT) AS n_alpha_tokens,
  ROUND(n_alpha / GREATEST(n_tok, 1), 6) AS alpha_ratio,
  ROUND(stop_hits / GREATEST(n_tok, 1), 6) AS stop_ratio,
  ROUND(ROUND(n_alpha / GREATEST(n_tok, 1), 6) * 0.5
      + ROUND(stop_hits / GREATEST(n_tok, 1), 6) * 0.5, 6) AS quality
FROM q ORDER BY doc_id
"""


def topk_quality_sql(k: int = 10) -> str:
    """Oracle for topk_per_group over the quality score, keyed on lang."""
    return f"""
WITH q AS (
  SELECT doc_id, lang,
    CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) n_tok,
    CAST(len(regexp_extract_all(text, '\\b[A-Za-z]+\\b')) AS DOUBLE) n_alpha,
    CAST(len(regexp_extract_all(lower(text), '\\b({_STOP_EN})\\b')) AS DOUBLE) stop_hits
  FROM documents),
s AS (
  SELECT doc_id, lang,
    ROUND(ROUND(n_alpha / GREATEST(n_tok, 1), 6) * 0.5
        + ROUND(stop_hits / GREATEST(n_tok, 1), 6) * 0.5, 6) AS quality
  FROM q)
SELECT lang, doc_id, quality,
  CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id)
       AS BIGINT) AS rank
FROM s QUALIFY rank <= {k} ORDER BY 1, 4
"""


def _lang_hits_sql(lang: str) -> str:
    words = "|".join(STOPWORDS[lang])
    return f"CAST(len(regexp_extract_all(lower(text), '\\b({words})\\b')) AS BIGINT)"


LANG_ID_SQL = f"""
WITH h AS (
  SELECT doc_id, {_lang_hits_sql('en')} he, {_lang_hits_sql('de')} hd,
         {_lang_hits_sql('fr')} hf
  FROM documents)
SELECT doc_id,
  CASE WHEN he >= hd AND he >= hf THEN 'en'
       WHEN hd >= hf THEN 'de' ELSE 'fr' END AS lang_pred
FROM h ORDER BY doc_id
"""

FINGERPRINT_SQL = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')) AS fp
FROM documents ORDER BY doc_id
"""
