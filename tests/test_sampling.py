"""Unit tests for textops/sampling.py — semantics beyond the oracle
comparison in test_registry.py (which covers the five registry entries
end-to-end at sf0.001)."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from geofileops_ray.textops import sampling as sm


def _docs_tbl():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "  Mail ME at Bob.smith+x@EXample.org  today ",
                    "call +32 495 12 34 56 or 10.0.0.1",
                    "",
                    "the the the cat",
                ]
            ),
            "lang": pa.array(["en", "en", "de", "fr"]),
        }
    )


def _ds():
    return ray.data.from_arrow(_docs_tbl())


def test_normalize_text_semantics(ray_session):
    out = {r["doc_id"]: r for r in sm.normalize_text(_ds()).take_all()}
    assert out[1]["text_norm"] == "mail me at bob.smith+x@example.org today"
    assert out[3]["text_norm"] == ""
    assert out[3]["n_chars_norm"] == 0


def test_pii_scrub_masks_and_counts(ray_session):
    out = {r["doc_id"]: r for r in sm.pii_scrub(_ds()).take_all()}
    assert "<EMAIL>" in out[1]["text_scrubbed"]
    assert "Bob.smith" not in out[1]["text_scrubbed"]
    assert out[1]["n_emails"] == 1
    assert out[2]["text_scrubbed"] == "call <PHONE> or <IP>"
    assert out[2]["n_phones"] == 1 and out[2]["n_ipv4"] == 1
    assert out[4]["n_emails"] == out[4]["n_phones"] == out[4]["n_ipv4"] == 0


def test_stratified_sample_deterministic_and_rate(ray_session):
    n = 4000
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "lang": pa.array(["en", "de"] * (n // 2)),
        }
    )
    rates = {"en": 500, "de": 100}
    a = sorted(
        r["doc_id"]
        for r in sm.stratified_sample(
            ray.data.from_arrow(tbl), rates
        ).take_all()
    )
    # identical under a different partitioning
    b = sorted(
        r["doc_id"]
        for r in sm.stratified_sample(
            ray.data.from_arrow(tbl).repartition(7), rates
        ).take_all()
    )
    assert a == b
    en = sum(1 for d in a if d % 2 == 0)
    de = len(a) - en
    # md5 uniformity: expect ~1000 en (50%), ~200 de (10%)
    assert abs(en - 1000) < 150 and abs(de - 200) < 80
    # membership matches the md5 rule exactly
    for d in a[:50]:
        h = int.from_bytes(hashlib.md5(str(d).encode()).digest()[8:], "little")
        rate = 500 if d % 2 == 0 else 100
        assert h % 1000 < rate


def test_sample_k_per_group_is_partition_invariant(ray_session):
    n = 300
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "lang": pa.array(["en", "de", "fr"] * (n // 3)),
        }
    )
    a = sorted(
        (r["lang"], r["rank"], r["doc_id"])
        for r in sm.sample_k_per_group(
            ray.data.from_arrow(tbl), "lang", k=5
        ).take_all()
    )
    b = sorted(
        (r["lang"], r["rank"], r["doc_id"])
        for r in sm.sample_k_per_group(
            ray.data.from_arrow(tbl).repartition(11), "lang", k=5
        ).take_all()
    )
    assert a == b and len(a) == 15


def test_tfidf_topk_scores(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["cat cat dog", "dog bird"]),
        }
    )
    rows = sm.tfidf_topk(ray.data.from_arrow(tbl), k=2).take_all()
    by = {(r["doc_id"], r["term"]): r for r in rows}
    # 'dog' appears in both docs -> idf 0 -> score 0; cat/bird idf ln(2)
    assert by[(1, "cat")]["score"] == round(2 * np.log(2.0), 6)
    assert by[(1, "cat")]["rank"] == 1
    assert by[(2, "bird")]["score"] == round(np.log(2.0), 6)
    # doc 1's second term is dog at score 0
    assert by[(1, "dog")]["score"] == 0.0


def test_normalize_and_fingerprint_unicode_whitespace_parity(ray_session):
    """\\v and NBSP edges: Python re's Unicode \\s and Arrow's
    trim-whitespace both diverge from DuckDB here — the kernels must
    match the SQL mirror exactly on such corpora."""
    import duckdb

    from geofileops_ray.textops import analysis as ta

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["\x0bHello\tWorld\x0b", "\xa0 padded \xa0", "A\x85B C"]
            ),
        }
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    got = {
        r["doc_id"]: r["text_norm"]
        for r in sm.normalize_text(ray.data.from_arrow(tbl)).take_all()
    }
    want = dict(
        con.execute(
            "SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g'),"
            " ' ') FROM documents"
        ).fetchall()
    )
    assert got == want
    got_fp = {
        r["doc_id"]: r["fp"]
        for r in ta.fingerprint(ray.data.from_arrow(tbl)).take_all()
    }
    want_fp = dict(con.execute(ta.FINGERPRINT_SQL.replace("ORDER BY doc_id", "")).fetchall())
    assert got_fp == want_fp


def test_sampling_null_doc_id_dropped(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, None, 3], pa.int64()),
            "lang": pa.array(["en", "en", "en"]),
        }
    )
    out = sm.stratified_sample(
        ray.data.from_arrow(tbl), {"en": 1000}
    ).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 3]
    out2 = sm.sample_k_per_group(ray.data.from_arrow(tbl), "lang", k=5).take_all()
    assert sorted(r["doc_id"] for r in out2) == [1, 3]
