"""pack_sequences / shuffle_shards — training-sequence assembly ops."""

import numpy as np
import pyarrow as pa


def test_pack_sequences_matches_duckdb_and_edges(ray_session, oracle):
    """Concat-then-chunk placement is exact vs the window-function
    oracle, including docs longer than the budget (straddle several
    sequences), zero-token docs, and NULL doc ids (excluded)."""
    import ray.data

    from geofileops_ray.textops.packing import pack_sequences, pack_sequences_sql

    texts = [
        "a b c",                      # 3 tokens
        "",                           # 0 tokens
        " ".join(["t"] * 23),         # straddles 3 sequences at B=8
        "x y",                        # 2
        "one",                        # 1
        None if False else "p q r s"  # 4
    ]
    t = pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13, None, 15], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = pa.Table.from_pylist(
        pack_sequences(ray.data.from_arrow(t).repartition(4), budget=8)
        .take_all()
    ).sort_by("doc_id")
    want = oracle.execute(pack_sequences_sql(8, table="t")).arrow()
    assert got.to_pylist() == want.to_pylist()
    rows = {r["doc_id"]: r for r in got.to_pylist()}
    assert None not in rows and len(rows) == 5
    # the 23-token doc starts in seq 0 (offset 3) and ends in seq 3
    assert rows[12]["seq_id"] == 0 and rows[12]["seq_offset"] == 3
    assert rows[12]["end_seq_id"] == 3
    # the zero-token doc occupies no tokens: end == start
    assert rows[11]["end_seq_id"] == rows[11]["seq_id"]


def test_pack_sequences_deterministic_across_partitioning(ray_session):
    """Placement depends on content only — 1-block and many-block runs
    agree exactly (the resumability property a 100-TB pack needs)."""
    import ray.data

    from geofileops_ray.textops.packing import pack_sequences

    rng = np.random.default_rng(5)
    n = 3000
    t = pa.table(
        {
            "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
            "text": pa.array(
                [" ".join(["w"] * int(k)) for k in rng.integers(0, 40, n)]
            ),
        }
    )
    a = pa.Table.from_pylist(
        pack_sequences(ray.data.from_arrow(t), budget=256).take_all()
    ).sort_by("doc_id")
    b = pa.Table.from_pylist(
        pack_sequences(
            ray.data.from_arrow(t).repartition(17), budget=256
        ).take_all()
    ).sort_by("doc_id")
    assert a.to_pylist() == b.to_pylist()
    # the packed stream is gap-free: sorted by doc_id, each doc's global
    # start equals the previous doc's start + previous tokens
    start = (
        np.asarray(a.column("seq_id")) * 256 + np.asarray(a.column("seq_offset"))
    )
    tok = np.asarray(a.column("n_tokens"))
    assert (start[1:] == start[:-1] + tok[:-1]).all()


def test_shuffle_shards_deterministic_and_balanced(ray_session, oracle):
    import ray.data

    from geofileops_ray.textops.packing import shuffle_shards, shuffle_shards_sql

    t = pa.table({"doc_id": pa.array(range(2000), pa.int64())})
    got = pa.Table.from_pylist(
        shuffle_shards(
            ray.data.from_arrow(t).repartition(7), n_shards=16, seed=9
        ).take_all()
    ).sort_by("doc_id")
    want = oracle.execute(shuffle_shards_sql(16, 9, table="t")).arrow()
    assert got.to_pylist() == want.to_pylist()
    counts = np.bincount(np.asarray(got.column("shard_id")), minlength=16)
    assert counts.min() > 0.5 * counts.mean()  # roughly balanced
    # a different seed produces a different permutation
    got2 = pa.Table.from_pylist(
        shuffle_shards(ray.data.from_arrow(t), n_shards=16, seed=10).take_all()
    ).sort_by("doc_id")
    assert got2.column("shard_id").to_pylist() != got.column("shard_id").to_pylist()


def test_pack_interleaved_span_costs(ray_session):
    """Interleaved packing: text spans cost their token count, media
    spans a fixed budget; empty span lists cost 0; null text is 0."""
    import ray.data

    from geofileops_ray.textops.packing import pack_interleaved

    span_t = pa.list_(
        pa.struct(
            [("kind", pa.string()), ("text", pa.string()),
             ("media_ref", pa.string()), ("offset", pa.int32())]
        )
    )

    def sp(kind, text=""):
        return {"kind": kind, "text": text, "media_ref": "", "offset": 0}

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "spans": pa.array(
                [
                    [sp("text", "a b c"), sp("media"), sp("text", "d")],
                    [],
                    [sp("media"), sp("media")],
                    [sp("text", None)],
                ],
                type=span_t,
            ),
        }
    )
    got = {
        r["doc_id"]: r
        for r in pack_interleaved(
            ray.data.from_arrow(t).repartition(3), budget=10, media_token_cost=7
        ).take_all()
    }
    assert got[1]["n_tokens"] == 3 + 7 + 1  # 11: straddles seqs 0-1
    assert got[1]["seq_id"] == 0 and got[1]["end_seq_id"] == 1
    assert got[2]["n_tokens"] == 0 and got[2]["seq_offset"] == 1
    assert got[3]["n_tokens"] == 14
    assert got[4]["n_tokens"] == 0


def test_shuffle_shards_fast_hash_path(ray_session):
    """exact_oracle=False keeps determinism + rough balance with a
    vectorized hash (no md5); seeds still decorrelate."""
    import ray.data

    from geofileops_ray.textops.packing import shuffle_shards

    t = pa.table({"doc_id": pa.array(range(4000), pa.int64())})
    a = pa.Table.from_pylist(
        shuffle_shards(
            ray.data.from_arrow(t).repartition(5), 32, seed=1, exact_oracle=False
        ).take_all()
    ).sort_by("doc_id")
    b = pa.Table.from_pylist(
        shuffle_shards(
            ray.data.from_arrow(t), 32, seed=1, exact_oracle=False
        ).take_all()
    ).sort_by("doc_id")
    assert a.to_pylist() == b.to_pylist()
    counts = np.bincount(np.asarray(a.column("shard_id")), minlength=32)
    assert counts.min() > 0.5 * counts.mean()
    c = pa.Table.from_pylist(
        shuffle_shards(
            ray.data.from_arrow(t), 32, seed=2, exact_oracle=False
        ).take_all()
    ).sort_by("doc_id")
    assert c.column("shard_id").to_pylist() != a.column("shard_id").to_pylist()


def test_write_training_shards_resumable_and_ordered(ray_session, tmp_path):
    """The composed shard writer: every row lands in exactly one shard
    file, each file is sorted by shuffle_key, a rerun skips everything
    (lineage resume), and two fresh writes produce identical content."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from geofileops_ray.textops.packing import write_training_shards

    t = pa.table(
        {
            "doc_id": pa.array(range(300), pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(300)]),
        }
    )
    out = str(tmp_path / "shards")
    s1 = write_training_shards(
        ray.data.from_arrow(t).repartition(5), out, n_shards=8, seed=3
    )
    assert sum(r["rows_out"] for r in s1) == 300
    assert len(s1) == 8
    seen = []
    for part in sorted(os.listdir(os.path.join(out, "data"))):
        f = pq.read_table(os.path.join(out, "data", part, "part.parquet"))
        keys = f.column("shuffle_key").to_pylist()
        assert keys == sorted(keys), part  # within-shard order
        seen += f.column("doc_id").to_pylist()
    assert sorted(seen) == list(range(300))

    # rerun: all shards committed → nothing written
    s2 = write_training_shards(
        ray.data.from_arrow(t).repartition(5), out, n_shards=8, seed=3
    )
    assert s2 == []

    # fresh write elsewhere: identical per-shard content (determinism)
    out2 = str(tmp_path / "shards2")
    write_training_shards(ray.data.from_arrow(t), out2, n_shards=8, seed=3)
    for part in sorted(os.listdir(os.path.join(out, "data"))):
        a = pq.read_table(os.path.join(out, "data", part, "part.parquet"))
        b = pq.read_table(os.path.join(out2, "data", part, "part.parquet"))
        assert a.equals(b), part


def test_pack_sequences_clustered_id_space(ray_session, oracle):
    """Quantile (sample-based) bucketing: a heavily clustered id space
    (99% of ids in a tiny range + a far 10^17 cluster) still places
    exactly — value-range buckets would have put nearly all rows in one
    bucket; balance never affects placement correctness, only task
    sizing."""
    import ray.data

    from geofileops_ray.textops.packing import pack_sequences, pack_sequences_sql

    rng = np.random.default_rng(2)
    ids = np.concatenate(
        [np.arange(5000), np.array([10**17 + i * 999 for i in range(50)])]
    )
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(
                [" ".join(["w"] * int(k)) for k in rng.integers(0, 30, len(ids))]
            ),
        }
    )
    got = pa.Table.from_pylist(
        pack_sequences(ray.data.from_arrow(t).repartition(7), budget=64)
        .take_all()
    ).sort_by("doc_id")
    want = oracle.execute(pack_sequences_sql(64, table="t")).arrow()
    assert got.to_pylist() == want.to_pylist()
