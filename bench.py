#!/usr/bin/env python
"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": rows_per_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the headline sjoin+dissolve pipeline twice in FRESH
processes (num_cpus=8 then num_cpus=32) on the same input and reports
both throughputs + scaling efficiency = (T8/T32)/4 — the sandbox
evidence for the north rule's N vs 4N cluster criterion.

The parcel layer is scaled with the deterministic ``repeat`` expander to
≈500k rows (BENCH_REPEAT, default sized against the reference's 515k
parcel benchmark, benchmark/results/benchmark_results.csv).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("BENCH_REPEAT", "0"))  # 0 = auto


def _auto_repeat(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return max(1, 500_000 // n)


def run_benchmarks(num_cpus: int, only_flagship: bool = False) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            log_to_driver=False,
        )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data

    from geofileops_ray.io.synth import (
        parcels_dataset,
        points_dataset,
        zones_dataset,
    )
    from geofileops_ray.pipelines.queries import flagship
    from geofileops_ray.stages import single_layer as sl
    from geofileops_ray.stages.dissolve import dissolve
    from geofileops_ray.stages.knn import join_nearest
    from geofileops_ray.stages.overlay_ops import intersection
    from geofileops_ray.stages.spatial_join import (
        export_by_location,
        join_by_location,
    )
    from geofileops_ray.textops import dedup as td
    from geofileops_ray.textops import similarity as ts

    repeat = REPEAT or _auto_repeat(SF_DIR)
    n_parcels = None

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return out, time.perf_counter() - t0

    results: dict[str, float] = {}

    # headline: sjoin + dissolve at repeat scale
    def run_flagship():
        joined = join_by_location(
            parcels_dataset(SF_DIR, repeat), zones_dataset(SF_DIR), "intersects is True",
            cols1=["GEWASGROEP", "OPPERVL"], cols2=["naam"], salt=True,
        )
        import pyarrow as pa

        def rewrap(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch.column("l1_doc_id"),
                    "GEWASGROEP": batch.column("l1_GEWASGROEP"),
                    "naam": batch.column("l2_naam"),
                    "OPPERVL": batch.column("l1_OPPERVL"),
                    "geometry": batch.column("l1_geometry"),
                }
            )

        out = dissolve(
            joined.map_batches(rewrap, batch_format="pyarrow"),
            groupby=["GEWASGROEP", "naam"],
            agg_columns=[("OPPERVL", "sum", "sum_oppervl"), ("doc_id", "count", "nb_rows")],
        )
        return out.count()

    n_parcels, _ = timed(lambda: parcels_dataset(SF_DIR, repeat).count())
    _, t_flag = timed(run_flagship)
    results["sjoin_dissolve"] = round(t_flag, 3)

    if not only_flagship:
        _, t = timed(lambda: sl.buffer(parcels_dataset(SF_DIR, repeat), 2.0).count())
        results["buffer"] = round(t, 3)
        _, t = timed(
            lambda: join_by_location(
                parcels_dataset(SF_DIR, repeat), zones_dataset(SF_DIR),
                "intersects is True", cols1=["OIDN"], cols2=["naam"], salt=True,
            ).count()
        )
        results["join_by_location"] = round(t, 3)
        _, t = timed(
            lambda: export_by_location(
                parcels_dataset(SF_DIR, repeat), zones_dataset(SF_DIR),
                "intersects is True",
            ).count()
        )
        results["export_by_location"] = round(t, 3)
        _, t = timed(
            lambda: intersection(
                parcels_dataset(SF_DIR, repeat), zones_dataset(SF_DIR),
                cols1=["OIDN"], cols2=["naam"],
            ).count()
        )
        results["intersection"] = round(t, 3)
        _, t = timed(
            lambda: dissolve(
                parcels_dataset(SF_DIR, repeat), groupby=["GEWASGROEP"],
                agg_columns=[("OPPERVL", "sum", "sum_oppervl")],
            ).count()
        )
        results["dissolve"] = round(t, 3)
        _, t = timed(
            lambda: join_nearest(
                points_dataset(SF_DIR, repeat), zones_dataset(SF_DIR),
                nb_nearest=1, cols1=[], cols2=[],
            ).count()
        )
        results["join_nearest"] = round(t, 3)
        # text ops at native table size
        docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
        _, t = timed(lambda: td.minhash_signatures(docs).count())
        results["minhash"] = round(t, 3)
        import numpy as np
        import pyarrow.parquet as pq

        qv = (
            pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
            .column("embedding")[0]
            .as_py()
        )
        emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
        _, t = timed(lambda: ts.brute_topk(emb, np.array([qv]), k=10))
        results["embedding_topk"] = round(t, 3)

    return {
        "metric": "sjoin+dissolve rows/sec (parcels rows / wall sec)",
        "value": round(n_parcels / t_flag, 1),
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR,
        "num_cpus": num_cpus,
        "n_parcels": n_parcels,
        "repeat": repeat,
    }


def main():
    if "--scaling" in sys.argv:
        # two fresh processes at 8 and 32 cpus on the same input
        outs = {}
        for cpus in (8, 32):
            env = dict(os.environ)
            env["RAY_GRAFT_CPUS"] = str(cpus)
            p = subprocess.run(
                [sys.executable, __file__, "--flagship-only"],
                capture_output=True, text=True, env=env,
            )
            line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
            outs[cpus] = json.loads(line)
        th8 = outs[8]["value"]
        th32 = outs[32]["value"]
        eff = (th32 / th8) / 4.0
        print(
            json.dumps(
                {
                    "metric": "scaling efficiency (8 vs 32 cpus)",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "throughput_8cpu": th8,
                    "throughput_32cpu": th32,
                    "queries": {
                        "t_8cpu": outs[8]["queries"]["sjoin_dissolve"],
                        "t_32cpu": outs[32]["queries"]["sjoin_dissolve"],
                    },
                    "sf": SF_DIR,
                    "num_cpus": 32,
                }
            )
        )
        return
    only = "--flagship-only" in sys.argv
    out = run_benchmarks(NUM_CPUS, only_flagship=only)
    print(json.dumps(out))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
