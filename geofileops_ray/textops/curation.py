"""End-to-end corpus curation pipeline — the headline composition of the
training-data operators: normalize → quality + repetition filter →
exact dedup (by content fingerprint) → benchmark decontamination →
deterministic stratified sampling.

Shape (the 100-TB plan):
* ONE fused stateless ``map_batches`` computes normalization, the
  quality score, the duplicate-word fraction and the content
  fingerprint per document and applies the threshold filter — four
  front stages of the reference-style chain collapsed into one pass
  over the text column, no intermediate datasets, no joins.
* ONE hash shuffle (by fingerprint, into ~2×CPU salt partitions)
  dedups exact duplicates — first (smallest doc_id) per fingerprint,
  vectorized run-boundary pick inside each partition.
* Decontamination is a stateless map against the ``ray.put``-broadcast
  benchmark n-gram set (pc.is_in, C++); sampling is a stateless
  content-hash filter — deterministic under re-runs/repartitioning,
  which is what makes the whole pipeline resumable per partition.

Every arithmetic step reuses the bit-exact-vs-DuckDB kernels of
analysis/contamination/sampling, so the WHOLE pipeline has one chained
SQL oracle (``curate_corpus_sql``)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .analysis import STOPWORDS
from .contamination import _flat_tokens, _ngrams, build_benchmark_ngrams
from .sampling import _U53, _hash_bucket_column, _round6

_STOP_EN = "|".join(STOPWORDS["en"])

# defaults tuned so each stage bites on the synthetic corpus (quality
# median ≈ 0.515, dup-word-frac median ≈ 0.85, n_tok median ≈ 56)
DEFAULT_MIN_QUALITY = 0.51
DEFAULT_MAX_DUP_WORD_FRAC = 0.92
DEFAULT_MIN_TOKENS = 20
DEFAULT_RATES = {"en": 800, "de": 500, "fr": 250}


def curate_corpus(
    ds: ray.data.Dataset,
    min_quality: float = DEFAULT_MIN_QUALITY,
    max_dup_word_frac: float = DEFAULT_MAX_DUP_WORD_FRAC,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    rates_permille: dict[str, int] | None = None,
    default_permille: int = 100,
    decontam_n: int = 5,
    benchmark_mod: int = 97,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Curated corpus → (doc_id, lang, n_tokens, quality, dup_word_frac,
    sample_bucket, text_norm). See module docstring for the plan."""
    rates = dict(rates_permille or DEFAULT_RATES)

    def prep(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        # normalization (identical to sampling.normalize_text /
        # analysis.fingerprint: RE2 \s, explicit space-only trim)
        norm = pc.utf8_trim(
            pc.replace_substring_regex(
                pc.utf8_lower(text), pattern=r"\s+", replacement=" "
            ),
            characters=" ",
        )
        # quality components (identical to analysis.quality_score)
        n_tok = pc.count_substring_regex(text, r"\S+").cast(pa.float64())
        n_tok = n_tok.to_numpy(zero_copy_only=False)
        n_alpha = (
            pc.count_substring_regex(text, r"\b[A-Za-z]+\b")
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        lower = pc.utf8_lower(text)
        stop_hits = (
            pc.count_substring_regex(lower, rf"\b({_STOP_EN})\b")
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        denom = np.maximum(n_tok, 1.0)
        quality = _round6(
            _round6(n_alpha / denom) * 0.5 + _round6(stop_hits / denom) * 0.5
        )
        # duplicate-word mass (identical to contamination.repetition_metrics)
        flat, parent = _flat_tokens(batch, text_col)
        nrows = len(batch)
        nw = np.bincount(parent, minlength=nrows).astype(np.int64)
        if len(flat):
            enc = pc.dictionary_encode(flat)
            tid = enc.indices.to_numpy().astype(np.int64)
            V = len(enc.dictionary)
            uk, cnt = np.unique(parent * V + tid, return_counts=True)
            dupw = np.bincount(
                (uk // V).astype(np.int64),
                weights=np.where(cnt > 1, cnt, 0),
                minlength=nrows,
            ).astype(np.int64)
        else:
            dupw = np.zeros(nrows, np.int64)
        dup_frac = _round6(dupw / np.maximum(nw, 1).astype(np.float64))
        keep = (
            (quality >= min_quality)
            & (dup_frac <= max_dup_word_frac)
            & (n_tok >= min_tokens)
        )
        idx = np.flatnonzero(keep)
        take = pa.array(idx, pa.int64())
        kept_norm = norm.take(take) if isinstance(norm, pa.Array) else norm.combine_chunks().take(take)
        fps = [
            hashlib.md5((t or "").encode()).hexdigest()
            for t in kept_norm.to_pylist()
        ]
        return pa.table(
            {
                id_col: batch.column(id_col).take(take),
                "lang": batch.column("lang").take(take),
                "n_tokens": pa.array(n_tok[idx].astype(np.int64), pa.int64()),
                "quality": pa.array(quality[idx], pa.float64()),
                "dup_word_frac": pa.array(dup_frac[idx], pa.float64()),
                "text_norm": kept_norm,
                "__fp": pa.array(fps, pa.string()),
            }
        )

    filtered = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    # exact dedup: one fp-hash shuffle, first (min doc_id) per fingerprint
    from ..stages.agg import _salt_parts, default_nparts

    nparts = default_nparts()  # fixed at the driver

    def first_per_fp(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__part"])
        if len(group) == 0:
            return group.drop_columns(["__fp"])
        srt = group.take(
            pc.sort_indices(
                group,
                sort_keys=[("__fp", "ascending"), (id_col, "ascending")],
            )
        )
        k = srt.column("__fp").to_numpy(zero_copy_only=False)
        first = np.ones(len(k), dtype=bool)
        first[1:] = k[1:] != k[:-1]
        return srt.filter(pa.array(first)).drop_columns(["__fp"])

    deduped = (
        filtered.map_batches(
            lambda b: _salt_parts(b, ["__fp"], nparts), batch_format="pyarrow"
        )
        .groupby("__part")
        .map_groups(first_per_fp, batch_format="pyarrow")
    )

    # decontamination against the benchmark slice of the ORIGINAL corpus
    # (tokenization ignores whitespace, so text_norm tokens == text tokens)
    bench = build_benchmark_ngrams(
        ds, n=decontam_n, benchmark_mod=benchmark_mod,
        text_col=text_col, id_col=id_col,
    )
    bench_ref = ray.put(pa.array(list(bench), pa.string()))

    def decontam(batch: pa.Table) -> pa.Table:
        b = ray.get(bench_ref)
        flat, parent = _flat_tokens(batch, "text_norm")
        ng, gparent = _ngrams(flat, parent, decontam_n)
        hit = np.zeros(len(batch), dtype=bool)
        if len(ng):
            m = pc.is_in(ng, value_set=b).to_numpy(zero_copy_only=False)
            hit[gparent[m.astype(bool)]] = True
        return batch.filter(pa.array(~hit))

    clean = deduped.map_batches(decontam, batch_format="pyarrow")

    # deterministic stratified sample (content-hash bucket per doc id)
    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        bucket = _hash_bucket_column(ids, 1000)
        strata = batch.column("lang").to_numpy(zero_copy_only=False)
        thr = np.fromiter(
            (rates.get(s, default_permille) for s in strata),
            np.int64,
            len(strata),
        )
        keep = bucket < thr
        out = batch.filter(pa.array(keep))
        return out.append_column(
            "sample_bucket", pa.array(bucket[keep], pa.int64())
        )

    return clean.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def curate_corpus_sql(
    min_quality: float = DEFAULT_MIN_QUALITY,
    max_dup_word_frac: float = DEFAULT_MAX_DUP_WORD_FRAC,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    rates_permille: dict[str, int] | None = None,
    default_permille: int = 100,
    decontam_n: int = 5,
    benchmark_mod: int = 97,
) -> str:
    rates = dict(rates_permille or DEFAULT_RATES)
    cases = " ".join(f"WHEN '{s}' THEN {r}" for s, r in sorted(rates.items()))
    n1 = decontam_n - 1
    return f"""
WITH q AS (
  SELECT doc_id, lang,
    trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ') AS text_norm,
    regexp_extract_all(lower(text), '[a-z0-9]+') AS ws,
    CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS n_tok,
    CAST(len(regexp_extract_all(text, '\\b[A-Za-z]+\\b')) AS DOUBLE) AS n_alpha,
    CAST(len(regexp_extract_all(lower(text), '\\b({_STOP_EN})\\b')) AS DOUBLE)
      AS stop_hits
  FROM documents
),
wc AS (
  SELECT doc_id, word, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(ws) AS word FROM q) GROUP BY 1, 2
),
dup AS (
  SELECT doc_id,
    SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupw, SUM(c) AS nw
  FROM wc GROUP BY 1
),
scored AS (
  SELECT q.doc_id, q.lang, q.text_norm, q.ws,
    CAST(q.n_tok AS BIGINT) AS n_tokens,
    ROUND(ROUND(q.n_alpha / GREATEST(q.n_tok, 1), 6) * 0.5
        + ROUND(q.stop_hits / GREATEST(q.n_tok, 1), 6) * 0.5, 6) AS quality,
    ROUND(CAST(COALESCE(d.dupw, 0) AS DOUBLE)
        / CAST(greatest(COALESCE(d.nw, 0), 1) AS DOUBLE), 6) AS dup_word_frac
  FROM q LEFT JOIN dup d USING (doc_id)
),
filtered AS (
  SELECT * FROM scored
  WHERE quality >= {min_quality} AND dup_word_frac <= {max_dup_word_frac}
    AND n_tokens >= {min_tokens}
),
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY md5(text_norm) ORDER BY doc_id) AS rn
    FROM filtered)
  WHERE rn = 1
),
g AS (
  SELECT doc_id,
    array_to_string(ws[CAST(i AS BIGINT):CAST(i + {n1} AS BIGINT)], ' ') AS ng
  FROM q, UNNEST(range(1, greatest(len(ws) - {n1}, 0) + 1)) AS t(i)
),
bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % {benchmark_mod} = 0),
hits AS (
  SELECT DISTINCT g.doc_id FROM g JOIN bench USING (ng)
),
clean AS (
  SELECT d.* FROM deduped d LEFT JOIN hits h USING (doc_id)
  WHERE h.doc_id IS NULL
)
SELECT doc_id, lang, n_tokens, quality, dup_word_frac,
  CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 AS BIGINT)
    AS sample_bucket,
  text_norm
FROM clean
WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000
  < CASE lang {cases} ELSE {default_permille} END
ORDER BY doc_id
"""
