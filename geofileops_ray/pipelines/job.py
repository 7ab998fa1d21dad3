"""``ray job submit`` entry point.

North-rule requirement: "run via ray job submit on a fixed-size
multi-node Ray cluster ... resumable from checkpoint with per-partition
lineage + metrics". This module is the submittable driver:

    ray job submit --working-dir . -- \
        python -m geofileops_ray.pipelines.job \
            --pipeline sjoin_dissolve \
            --sf-dir /data/sf1 \
            --checkpoint-dir /data/out/run1

or, single-node / CI:

    python -m geofileops_ray.pipelines.job --pipeline buffer_area \
        --sf-dir /root/testdata/sf0.01 --output /tmp/out

* ``--pipeline`` is either the flagship ``sjoin_dissolve`` or ANY name
  from the query registry (pipelines.queries.QUERIES) — one CLI for the
  whole operator surface.
* With ``--checkpoint-dir`` the result is written through
  ``state.checkpointed_write``: hash-partitioned on a spatial cell,
  one parquet fragment + one lineage JSON per partition, committed
  write-then-rename — re-submitting the same job after a failure skips
  every finished partition (state/lineage.py).
* Without it the result streams to ``--output`` via write_parquet.
* A metrics record (row counts, wall time, per-stage ds.stats() text)
  lands in ``<dir>/metrics.json`` either way.

Never calls ray.init when a session exists (the job-submission runtime
owns the session); standalone runs init a local one.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)


def _flagship(sf_dir: str):
    """sjoin(parcels × zones) → dissolve by (GEWASGROEP, naam) — the
    headline composite (reference benchmark join_by_location +
    dissolve_groupby, benchmark/benchmarks/geofileops_benchmarks.py)."""
    import pyarrow as pa

    from ..io.synth import parcels_dataset, zones_dataset
    from ..stages.dissolve import dissolve
    from ..stages.spatial_join import join_by_location

    joined = join_by_location(
        parcels_dataset(sf_dir), zones_dataset(sf_dir),
        "intersects is True",
        cols1=["GEWASGROEP", "OPPERVL"], cols2=["naam"], salt=True,
    )

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

    return dissolve(
        joined.map_batches(rewrap, batch_format="pyarrow"),
        groupby=["GEWASGROEP", "naam"],
        agg_columns=[
            ("OPPERVL", "sum", "sum_oppervl"),
            ("doc_id", "count", "nb_rows"),
        ],
    )


def _add_partition_cell(ds, size: float):
    """Attach a ``__cell`` partition key (owner cell of the bbox center)
    for checkpointed writes; geometry-less results partition on a hash
    of the first column."""
    import numpy as np
    import pyarrow as pa

    from ..stages.geometry_batch import decode_geometry
    from ..tiling.cells import CELL_OFFSET, CELL_SHIFT

    names = ds.schema().base_schema.names

    if "geometry" in names:
        def fn(batch: pa.Table) -> pa.Table:
            ga = decode_geometry(batch)
            b = ga.bounds()
            cx = np.floor((b[:, 0] + b[:, 2]) * 0.5 / size).astype(np.int64)
            cy = np.floor((b[:, 1] + b[:, 3]) * 0.5 / size).astype(np.int64)
            cell = ((cx + CELL_OFFSET) << CELL_SHIFT) | (cy + CELL_OFFSET)
            return batch.append_column("__cell", pa.array(cell, pa.int64()))
    else:
        key = names[0]

        def fn(batch: pa.Table) -> pa.Table:
            # geometry-less results are small aggregates; a splitmix of
            # the first column when numeric, else one partition
            col = batch.column(key)
            if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
                from ..stages.compound import _splitmix64_np

                v = col.to_numpy(zero_copy_only=False)
                h = _splitmix64_np(
                    np.nan_to_num(v).astype(np.int64)
                ) % 64
            else:
                h = np.zeros(len(batch), np.int64)
            return batch.append_column(
                "__cell", pa.array(h.astype(np.int64), pa.int64())
            )

    return ds.map_batches(fn, batch_format="pyarrow")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="geofileops_ray.pipelines.job")
    ap.add_argument("--pipeline", required=True,
                    help="'sjoin_dissolve' or any pipelines.queries name")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--output", default=None,
                    help="plain parquet output dir (streaming write)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="resumable partitioned output + lineage records")
    ap.add_argument("--cell-size", type=float, default=None,
                    help="partition cell edge for --checkpoint-dir")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="standalone only; under ray job submit the "
                         "cluster session is used as-is")
    args = ap.parse_args(argv)

    _ensure_ray(args.num_cpus)

    from ..config import OPTIONS

    t0 = time.perf_counter()
    if args.pipeline == "sjoin_dissolve":
        ds = _flagship(args.sf_dir)
    else:
        from .queries import QUERIES

        if args.pipeline not in QUERIES:
            raise SystemExit(
                f"unknown pipeline {args.pipeline!r}; choose "
                f"'sjoin_dissolve' or one of {sorted(QUERIES)}"
            )
        ds = QUERIES[args.pipeline](args.sf_dir)

    metrics: dict = {"pipeline": args.pipeline, "sf_dir": args.sf_dir}
    if args.checkpoint_dir:
        from ..state import checkpointed_write, finished_partitions

        pre_done = len(finished_partitions(args.checkpoint_dir))
        cell = args.cell_size or OPTIONS.cell_size * 8
        ds = _add_partition_cell(ds, cell)
        summaries = checkpointed_write(ds, args.checkpoint_dir)
        metrics.update(
            partitions_written=len(summaries),
            partitions_skipped_resume=pre_done,
            rows_out=int(sum(s["rows_out"] for s in summaries)),
        )
        out_dir = args.checkpoint_dir
    elif args.output:
        ds = ds.materialize()
        metrics["rows_out"] = ds.count()
        ds.write_parquet(args.output)
        out_dir = args.output
    else:
        ds = ds.materialize()
        metrics["rows_out"] = ds.count()
        out_dir = None
    metrics["wall_seconds"] = round(time.perf_counter() - t0, 3)
    try:
        metrics["stats"] = ds.stats()
    except Exception:
        pass
    line = json.dumps({k: v for k, v in metrics.items() if k != "stats"})
    print(line, flush=True)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
