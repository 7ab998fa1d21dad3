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
