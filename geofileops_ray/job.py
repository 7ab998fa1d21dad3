"""Cluster job entry point — the ``ray job submit`` surface of the
north rule:

    ray job submit --working-dir . -- \
        python -m geofileops_ray.job --query sjoin_intersects \
        --sf-dir /data/sf1 --output /out/sjoin --resume

Runs any registry pipeline (``--list`` enumerates them) against a table
directory and writes the result as a partitioned parquet layer. With
``--resume`` the write goes through the per-partition lineage
checkpoint (state/lineage.py): partitions committed by a previous
(killed) run are skipped BEFORE compute, so a resubmitted job continues
instead of recomputing.

Ray session ownership: when submitted via ``ray job submit`` the
cluster runtime provides the address and ``ray.init()`` connects to it;
standalone runs auto-init local. The module never calls ``ray.init``
when a session already exists (the driver-contract rule)."""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m geofileops_ray.job")
    ap.add_argument("--query", help="registry pipeline name (see --list)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="input table directory (documents/events/... parquet)")
    ap.add_argument("--output", help="output layer directory (omit = count only)")
    ap.add_argument("--resume", action="store_true",
                    help="checkpointed write: skip partitions a previous "
                         "run already committed (needs --partition-col)")
    ap.add_argument("--range-col", default=None,
                    help="id column whose min/max/count is recorded per "
                         "partition in the lineage records (provenance)")
    ap.add_argument("--partition-col", default=None,
                    help="partition column for --resume lineage commits")
    ap.add_argument("--list", action="store_true", help="list pipelines")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():  # job-submit/cluster provides the session
        ray.init(include_dashboard=False)

    from .pipelines.queries import QUERIES

    if args.list:
        for name in QUERIES:
            print(name)
        return 0
    if not args.query:
        ap.error("--query is required (or --list)")
    if args.query not in QUERIES:
        ap.error(f"unknown query {args.query!r}; see --list")

    t0 = time.time()
    res = QUERIES[args.query](args.sf_dir)
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, pd.DataFrame):
        res = ray.data.from_pandas(res)
    elif isinstance(res, pa.Table):
        res = ray.data.from_arrow(res)

    if args.output and args.resume:
        if not args.partition_col:
            ap.error("--resume needs --partition-col")
        from .state.lineage import checkpointed_write

        summaries = checkpointed_write(
            res, args.output, partition_col=args.partition_col,
            range_col=args.range_col,
        )
        rows = int(sum(s["rows_out"] for s in summaries))
        partitions = len(summaries)
    elif args.output:
        from .io.readwrite import write_layer

        write_layer(res, args.output)
        rows, partitions = -1, -1  # streamed; count below if cheap
        rows = ray.data.read_parquet(args.output).count()
    else:
        rows, partitions = res.count(), -1

    print(json.dumps({
        "query": args.query,
        "rows": rows,
        "partitions_written": partitions,
        "seconds": round(time.time() - t0, 3),
        "sf_dir": args.sf_dir,
        "output": args.output,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
