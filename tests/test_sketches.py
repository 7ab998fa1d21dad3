"""HLL distinct-count + quantile sketch: error bounds, merge
invariance under repartitioning, determinism."""

import numpy as np
import pyarrow as pa


def test_hll_error_bound_and_partition_invariance(ray_session):
    import ray.data

    from geofileops_ray.textops.sketches import approx_distinct

    n = 200_000
    rng = np.random.default_rng(7)
    # 120k distinct values, skewed repetition
    vals = rng.integers(0, 120_000, n).astype(np.int64)
    truth = len(np.unique(vals))
    t = pa.table({"v": pa.array(vals)})
    est1 = approx_distinct(ray.data.from_arrow(t), "v")
    est13 = approx_distinct(ray.data.from_arrow(t).repartition(13), "v")
    # register maxima are partition-invariant → identical estimates
    assert est1 == est13
    assert abs(est1 - truth) / truth < 0.03, (est1, truth)  # ~0.8% typical
    # string column path
    st = pa.table({"s": pa.array([f"k{v}" for v in vals[:50_000]])})
    ts = len(set(st.column("s").to_pylist()))
    es = approx_distinct(ray.data.from_arrow(st).repartition(5), "s")
    assert abs(es - ts) / ts < 0.03, (es, ts)


def test_hll_small_range_linear_counting(ray_session):
    import ray.data

    from geofileops_ray.textops.sketches import approx_distinct

    t = pa.table({"v": pa.array(np.arange(500, dtype=np.int64))})
    est = approx_distinct(ray.data.from_arrow(t).repartition(4), "v")
    assert abs(est - 500) <= 10  # linear counting regime is near-exact


def test_approx_quantiles_bound_and_invariance(ray_session):
    import ray.data

    from geofileops_ray.textops.sketches import approx_quantiles

    rng = np.random.default_rng(11)
    v = np.concatenate(
        [rng.lognormal(0, 2, 150_000), rng.uniform(-50, -40, 50_000)]
    )
    t = pa.table({"v": pa.array(v)})
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    got = approx_quantiles(ray.data.from_arrow(t).repartition(9), "v", qs)
    exact = np.quantile(v, qs)
    for g, q in zip(got, qs):
        # rank error: |F(got) - q| small (value error is meaningless for
        # a lognormal tail; rank error is the sketch's contract)
        rank = float((v <= g).mean())
        assert abs(rank - q) < 0.01, (q, g, rank)
    # deterministic across partitionings
    got2 = approx_quantiles(ray.data.from_arrow(t).repartition(9), "v", qs)
    assert got == got2
    # tiny input: exact
    small = pa.table({"v": pa.array([3.0, 1.0, 2.0])})
    assert approx_quantiles(ray.data.from_arrow(small), "v", [0.5])[0] == 2.0


def test_bloom_superset_invariance_and_fp(ray_session):
    import ray.data

    from geofileops_ray.textops.sketches import (
        _bloom_positions,
        bloom_membership,
        build_bloom,
        filter_by_bloom,
    )

    keys = [f"block{i}" for i in range(200)]
    probe = keys[:50] + [f"clean{i}" for i in range(2000)]
    kt = pa.table({"k": pa.array(keys)})
    pt = pa.table({"doc_id": pa.array(np.arange(len(probe), dtype=np.int64)),
                   "k": pa.array(probe)})
    m, h = 1 << 12, 3
    b1 = build_bloom(ray.data.from_arrow(kt), "k", n_bits=m, n_hashes=h)
    b7 = build_bloom(ray.data.from_arrow(kt).repartition(7), "k",
                     n_bits=m, n_hashes=h)
    assert b1 == b7  # OR-merge is partition-invariant → identical bytes

    out = pa.Table.from_pylist(
        bloom_membership(ray.data.from_arrow(pt).repartition(5), b1, "k",
                         n_bits=m, n_hashes=h).take_all()
    ).sort_by("doc_id")
    hits = np.asarray(out.column("bloom_hit"))
    assert hits[:50].all()  # no false negatives, ever

    # reference simulation: value hits iff ALL its bit positions are set
    bits = np.frombuffer(b1, dtype=np.uint8)
    pos = _bloom_positions(probe, m, h)
    want = ((bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0).all(
        axis=1
    )
    assert (hits == want).all()

    # tiny filter → the FP regime actually fires, and stays one-sided
    m2 = 256
    b2 = build_bloom(ray.data.from_arrow(kt), "k", n_bits=m2, n_hashes=2)
    out2 = pa.Table.from_pylist(
        bloom_membership(ray.data.from_arrow(pt), b2, "k",
                         n_bits=m2, n_hashes=2).take_all()
    ).sort_by("doc_id")
    hits2 = np.asarray(out2.column("bloom_hit"))
    assert hits2[:50].all()
    assert hits2[50:].sum() > 0  # false positives occur at 256 bits...
    kept = pa.Table.from_pylist(
        filter_by_bloom(ray.data.from_arrow(pt), b2, "k",
                        n_bits=m2, n_hashes=2, keep="miss").take_all()
    )
    # ...and keep='miss' survivors are guaranteed clean (no blocked key)
    assert not (set(kept.column("k").to_pylist()) & set(keys))
    assert kept.num_rows == int((~hits2).sum())


def test_misra_gries_saturated_exact_and_bound(ray_session):
    import ray.data

    from geofileops_ray.textops.sketches import approx_topk_values

    # saturated regime: distinct ≤ capacity → exact GROUP BY counts,
    # identical across partitionings
    rng = np.random.default_rng(3)
    vals = rng.choice([f"t{i}" for i in range(20)], 10_000,
                      p=np.arange(20, 0, -1) / np.arange(20, 0, -1).sum())
    t = pa.table({"v": pa.array(vals)})
    import collections

    truth = collections.Counter(vals.tolist())
    for parts in (1, 9):
        ds = ray.data.from_arrow(t).repartition(parts)
        out = approx_topk_values(ds, "v", k=100, capacity=64)
        got = dict(zip(out.column("value").to_pylist(),
                       out.column("est_count").to_pylist()))
        assert got == dict(truth)

    # approximate regime: distinct >> capacity; every estimate
    # undercounts by at most N/(capacity+1), heavy hitter survives
    n = 50_000
    heavy = np.full(n // 2, "HEAVY", dtype=object)
    tail = np.asarray([f"u{i}" for i in range(n // 2)], dtype=object)
    stream = np.concatenate([heavy, tail])
    rng.shuffle(stream)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(list(stream))})
                             ).repartition(11)
    cap = 50
    out = approx_topk_values(ds, "v", k=5, capacity=cap)
    got = dict(zip(out.column("value").to_pylist(),
                   out.column("est_count").to_pylist()))
    assert "HEAVY" in got
    err = n // 2 - got["HEAVY"]
    assert 0 <= err <= n / (cap + 1), (err, n / (cap + 1))
