"""Checkpointing / lineage state (north rule: per-partition lineage —
cell id, input batch range, output row counts, stage metrics — written
alongside the output so any partition can resume without recomputing
upstream shuffles)."""

from .lineage import (  # noqa: F401
    LineageWriter,
    checkpointed_write,
    finished_partitions,
)
