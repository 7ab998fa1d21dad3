"""Runtime fix for Ray Data's empty-block schema loss (Ray 2.49.x).

Two Ray internals conspire to turn a TYPED 0-row block into a
column-less one whenever it crosses a ``map_batches`` stage, producing
the "Operator produced a RefBundle with a different schema" warnings
seen in pipeline logs (and, under schema-strict consumers such as
unions on a real cluster, hard errors):

1. ``BlocksToBatchesMapTransformFn.__call__`` builds its
   all-inputs-empty fallback batch with ``builder().build()`` — a block
   with NO columns — instead of a 0-row slice of the first input block
   (ray/data/_internal/execution/operators/map_transformer.py:443).
2. ``_generate_transform_fn_for_map_batches`` skips the UDF for 0-row
   batches and passes the (column-less) batch straight through
   (ray/data/_internal/planner/plan_udf_map_op.py:456), so even a
   schema-stable UDF never gets the chance to emit its output schema.

The patch below therefore

(a) preserves the input schema in the empty fallback batch, and
(b) calls the UDF on typed empty batches — every stage in this engine
    is schema-stable on 0-row input (that IS the engine's empty-block
    contract) — while keeping Ray's skip for column-less batches (the
    all-to-all-operator case the upstream ``TODO(hchen)`` notes).

Application notes:

* ``apply()`` is idempotent and runs at package import, so BOTH the
  driver (where transform fns are generated at plan time) and every
  worker process (which imports this package while unpickling our
  UDFs, before the transform chain runs) are patched.
* Everything is guarded: on any import/attribute mismatch from a
  future Ray refactor the engine silently degrades to stock behavior.
* ``GFR_RAYFIX=0`` disables the patch.
"""

from __future__ import annotations

import collections.abc
import itertools
import os
from types import GeneratorType

_applied = False


def _num_cols(batch) -> int:
    """Column count of a non-Mapping batch; 0 = schema-less."""
    ncols = getattr(batch, "num_columns", None)  # pyarrow.Table
    if ncols is not None:
        return int(ncols)
    shape = getattr(batch, "shape", None)  # pandas.DataFrame
    if shape is not None and len(shape) == 2:
        return int(shape[1])
    return 0


def apply() -> bool:
    """Install the patches (idempotent). Returns True if active."""
    global _applied
    if _applied:
        return True
    if os.environ.get("GFR_RAYFIX", "1") == "0":
        return False
    try:
        from ray.data._internal.execution.operators import (
            map_transformer as mt,
        )
        from ray.data._internal.planner import plan_udf_map_op as pm
        from ray.data.block import BlockAccessor

        # touch every name the patches rely on so a renamed internal
        # fails HERE (clean fallback) and not mid-pipeline
        mt.BlocksToBatchesMapTransformFn.__call__
        mt.batch_blocks
        pm._generate_transform_fn_for_map_batches
        pm._is_async_udf
        pm._validate_batch_output
    except (ImportError, AttributeError):  # pragma: no cover
        return False

    # ---- (a) typed empty fallback batch --------------------------------
    def _b2b_call(self, blocks, _ctx):
        block_iter = iter(blocks)
        first = next(block_iter, None)
        if first is None:
            return []
        blocks = itertools.chain([first], block_iter)
        # 0-row SLICE of the first block: same schema, no payload
        # (stock Ray uses builder().build() — column-less)
        empty_block = BlockAccessor.for_block(first).slice(0, 0, copy=True)
        first = None
        formatted_batch_iter = mt.batch_blocks(
            blocks=blocks,
            stats=None,
            batch_size=self._batch_size,
            batch_format=self._batch_format,
            ensure_copy=self._ensure_copy,
        )
        head = next(formatted_batch_iter, None)
        if head is None:
            return [
                BlockAccessor.for_block(empty_block).to_batch_format(
                    self._batch_format
                )
            ]
        return itertools.chain([head], formatted_batch_iter)

    # ---- (b) run schema-stable UDFs on typed empty batches -------------
    _orig_generate = pm._generate_transform_fn_for_map_batches

    def _generate(fn):
        if pm._is_async_udf(fn):
            return _orig_generate(fn)

        def transform_fn(batches, _):
            for batch in batches:
                try:
                    if (
                        not isinstance(batch, collections.abc.Mapping)
                        and BlockAccessor.for_block(batch).num_rows() == 0
                        and _num_cols(batch) == 0
                    ):
                        # column-less empty batch (all-to-all/Sort output
                        # for an empty partition): TRY the UDF — a
                        # schema-stable fn that guards len==0 before any
                        # column access emits its typed output schema;
                        # one that touches columns falls back to stock
                        # pass-through (UDFs here are pure per-batch
                        # transforms, so a partial attempt has no side
                        # effects to undo)
                        try:
                            res = fn(batch)
                            if not isinstance(res, GeneratorType):
                                res = [res]
                            res = list(res)  # force lazy fns inside try
                        except Exception:
                            res = [batch]
                    else:
                        res = fn(batch)
                        if not isinstance(res, GeneratorType):
                            res = [res]
                except ValueError as e:
                    read_only_msgs = [
                        "assignment destination is read-only",
                        "buffer source array is read-only",
                    ]
                    err_msg = str(e)
                    if any(msg in err_msg for msg in read_only_msgs):
                        raise ValueError(
                            f"Batch mapper function {fn.__name__} tried to "
                            "mutate a zero-copy read-only batch. To be able "
                            "to mutate the batch, pass zero_copy_batch=False "
                            "to map_batches(); this will create a writable "
                            "copy of the batch before giving it to fn."
                        ) from e
                    else:
                        raise e from None
                else:
                    for out_batch in res:
                        pm._validate_batch_output(out_batch)
                        yield out_batch

        return transform_fn

    # ---- (c) map_groups on an empty partition ---------------------------
    # _apply_udf_to_groups yields no groups for a 0-row block, so the
    # task's output buffer finalizes a column-less block (the
    # has_next-after-finalize "always emit one block" contract in
    # output_buffer.py). Call the group UDF once with the empty batch —
    # a len==0-guarded fn emits its typed output schema; anything else
    # falls back to yielding nothing (stock shape).
    try:
        from ray.data import grouped_data as gd

        _orig_apply = gd._apply_udf_to_groups

        def _apply_udf_to_groups(udf, block, keys, batch_format,
                                 *args, **kwargs):
            acc = BlockAccessor.for_block(block)
            if acc.num_rows() == 0:
                try:
                    out = udf(
                        acc.to_batch_format(batch_format), *args, **kwargs
                    )
                except Exception:
                    return
                yield out
                return
            yield from _orig_apply(
                udf, block, keys, batch_format, *args, **kwargs
            )

        gd._apply_udf_to_groups = _apply_udf_to_groups
    except (ImportError, AttributeError):  # pragma: no cover
        pass

    # ---- (d) typed empty sort/groupby reduce partitions ----------------
    # merge_sorted_blocks drops 0-row inputs and falls back to
    # _empty_table() — column-less — when a reduce partition received
    # only empty slices (arrow_block.py:407-409), even though the typed
    # mapper slices are right there. Return a 0-row slice of one of
    # them instead: every empty groupby/sort partition then carries the
    # real schema, and the downstream map_groups/map_batches stages
    # (patches b/c) can do their work.
    try:
        from ray.data._internal import arrow_block as ab

        _orig_merge = ab.ArrowBlockAccessor.merge_sorted_blocks

        def _merge_sorted_blocks(blocks, sort_key):
            nonempty = [
                b for b in blocks if getattr(b, "num_rows", 0) > 0
            ]
            if not nonempty:
                ref = next(
                    (
                        b
                        for b in blocks
                        if getattr(b, "num_columns", 0) > 0
                    ),
                    None,
                )
                if ref is not None:
                    stats = ab.BlockExecStats.builder()
                    ret = ref.slice(0, 0)
                    return ret, ab.BlockMetadataWithSchema.from_block(
                        ret, stats=stats.build()
                    )
            return _orig_merge(blocks, sort_key)

        # touch the names the patch needs so a rename degrades cleanly
        ab.BlockExecStats
        ab.BlockMetadataWithSchema
        ab.ArrowBlockAccessor.merge_sorted_blocks = staticmethod(
            _merge_sorted_blocks
        )
    except (ImportError, AttributeError):  # pragma: no cover
        pass

    mt.BlocksToBatchesMapTransformFn.__call__ = _b2b_call
    pm._generate_transform_fn_for_map_batches = _generate
    _applied = True
    return True
