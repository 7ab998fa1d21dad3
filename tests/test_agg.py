"""bucket_aggregate vs DuckDB on random data — the combiner-first
vectorized replacement for Ray's per-key groupby aggregates."""

import numpy as np
import pyarrow as pa


def test_bucket_aggregate_matches_duckdb(ray_session, oracle):
    import ray.data

    from geofileops_ray.stages.agg import bucket_aggregate

    rng = np.random.default_rng(11)
    n = 30_000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 9_000, n), pa.int64()),
            "v": pa.array(rng.uniform(-5, 5, n)),
            "m": pa.array(rng.integers(-100, 100, n).astype(np.int8), pa.int8()),
        }
    )
    out = pa.Table.from_pylist(
        bucket_aggregate(
            ray.data.from_arrow(t),
            ["k"],
            [
                ("v", "sum", "sv"),
                ("v", "min", "mnv"),
                ("m", "max", "mxm"),
                ("m", "sum", "sm"),  # int8 sum must widen, not wrap
                ("k", "count", "n"),
            ],
        ).take_all()
    ).sort_by("k")
    want = oracle.execute(
        "SELECT k, SUM(v) sv, MIN(v) mnv, MAX(m) mxm, SUM(m) sm, COUNT(*) n "
        "FROM t GROUP BY 1 ORDER BY 1"
    ).arrow()
    assert out.column("k").to_pylist() == want.column("k").to_pylist()
    assert np.allclose(out.column("sv").to_numpy(), want.column("sv").to_numpy())
    assert out.column("mnv").to_pylist() == want.column("mnv").to_pylist()
    assert out.column("mxm").to_pylist() == want.column("mxm").to_pylist()
    assert out.column("sm").to_pylist() == [
        int(x) for x in want.column("sm").to_pylist()
    ]
    assert out.column("n").to_pylist() == want.column("n").to_pylist()


def test_bucket_aggregate_multikey_binary(ray_session):
    import ray.data

    from geofileops_ray.stages.agg import bucket_aggregate

    t = pa.table(
        {
            "a": pa.array([b"x", b"y", b"x", b"x", b"y"], pa.binary()),
            "b": pa.array([1, 1, 2, 1, 1], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 0.5]),
        }
    )
    out = sorted(
        bucket_aggregate(
            ray.data.from_arrow(t), ["a", "b"], [("v", "sum", "sv")]
        ).take_all(),
        key=lambda r: (r["a"], r["b"]),
    )
    assert out == [
        {"a": b"x", "b": 1, "sv": 5.0},
        {"a": b"x", "b": 2, "sv": 3.0},
        {"a": b"y", "b": 1, "sv": 2.5},
    ]


def test_agg_block_empty_batch_schema_matches_nonempty():
    """The empty-batch branch must emit the SAME widened dtypes as the
    non-empty branch (sum of bool/int8 → int64), or mixed-schema blocks
    feed the downstream groupby (block-order-dependent schemas)."""
    from geofileops_ray.stages.agg import _agg_block

    specs = [("v", "sum", "s"), ("v", "count", "c"), ("v", "max", "m")]
    for typ in (pa.bool_(), pa.int8(), pa.int32()):
        empty = pa.table(
            {"k": pa.array([], pa.int64()), "v": pa.array([], typ)}
        )
        vals = [True, False] if typ == pa.bool_() else [1, 2]
        full = pa.table(
            {"k": pa.array([1, 1], pa.int64()), "v": pa.array(vals, typ)}
        )
        se = _agg_block(empty, ["k"], specs).schema
        sf = _agg_block(full, ["k"], specs).schema
        assert se == sf, f"{typ}: {se} != {sf}"


def test_salt_parts_requires_driver_nparts():
    """nparts is a required argument: the modulus must be fixed once at
    the driver, never probed per batch inside workers (an autoscaled
    pool would split one key across partitions)."""
    import pytest

    from geofileops_ray.stages.agg import _salt_parts

    t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    with pytest.raises(TypeError):
        _salt_parts(t, ["k"])  # noqa — missing nparts must be an error
    p8 = _salt_parts(t, ["k"], 8).column("__part").to_pylist()
    assert _salt_parts(t, ["k"], 8).column("__part").to_pylist() == p8
    assert all(0 <= v < 8 for v in p8)


def test_salt_parts_nullable_int_key_consistent():
    """A nullable int key column converts to float64 in batches that
    contain a null and int64 in batches that don't; the hash must not
    depend on which batch a key landed in."""
    from geofileops_ray.stages.agg import _salt_parts

    with_null = pa.table({"k": pa.array([5, None], pa.int64())})
    without = pa.table({"k": pa.array([5, 7], pa.int64())})
    pA = _salt_parts(with_null, ["k"], 64).column("__part").to_pylist()
    pB = _salt_parts(without, ["k"], 64).column("__part").to_pylist()
    assert pA[0] == pB[0]


def test_agg_block_schema_parity_unsigned_count_largestring():
    """Empty and non-empty batches must emit identical schemas for
    unsigned sums (numpy promotes to uint64), count with a placeholder
    value column (must not be resolved), and large_string keys (no
    numpy round-trip re-inference)."""
    from geofileops_ray.stages.agg import _agg_block

    for typ in (pa.uint8(), pa.uint32()):
        e = _agg_block(
            pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], typ)}),
            ["k"], [("v", "sum", "s")],
        ).schema
        f = _agg_block(
            pa.table({"k": pa.array([1, 1], pa.int64()),
                      "v": pa.array([1, 2], typ)}),
            ["k"], [("v", "sum", "s")],
        ).schema
        assert e == f
    # count ignores its value column even on the empty branch
    t = _agg_block(
        pa.table({"k": pa.array([], pa.int64())}), ["k"],
        [("placeholder", "count", "n")],
    )
    assert t.schema.field("n").type == pa.int64()
    ls = pa.table(
        {"k": pa.array(["a", "a", "b"], pa.large_string()),
         "v": pa.array([1.0, 2.0, 3.0])}
    )
    assert (
        _agg_block(ls, ["k"], [("v", "sum", "s")]).schema
        == _agg_block(ls.slice(0, 0), ["k"], [("v", "sum", "s")]).schema
    )
