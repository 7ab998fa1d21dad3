"""Interleaved-span operators over documents with a
``spans: list<struct<kind,text,media_ref,offset>>`` column — the
BASELINE.json input_hint's core data model. The per-row invariant every
transform here must honour: span-sequence equality (kind, text,
media_ref, ORDER) — reassembly is always offset-ordered.

All four operators are stateless vectorized ``map_batches`` stages over
Arrow list/struct buffers (list offsets → parent indices, flat struct
children; no per-row Python in the hot path except Arrow's own
kernels). Only ``media_ref_fanout`` shuffles, and it pre-aggregates
per batch so the exchange carries one row per distinct (ref, doc) pair
per block, never one per span — at 10^12 docs the shuffle is bounded by
the ref-vocabulary × block count, not the span count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _spans_list(batch: pa.Table, col: str = "spans") -> pa.ListArray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def _flat_parts(spans: pa.ListArray):
    """(parent row index, within-list index, flat struct children)."""
    parent = pc.list_parent_indices(spans).to_numpy().astype(np.int64)
    counts = pc.list_value_length(spans).fill_null(0).to_numpy().astype(np.int64)
    if len(counts) == 0:  # 0-row batch: starts would be [0] vs counts ()
        return parent, np.empty(0, dtype=np.int64), spans.flatten()
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    idx = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(starts, counts)
    flat = spans.flatten()
    return parent, idx, flat


def explode_spans(
    ds: ray.data.Dataset, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """One output row per span: (id, span_idx, kind, piece, media_ref,
    span_off), in original sequence order. Embarrassingly parallel."""

    def fn(batch: pa.Table) -> pa.Table:
        spans = _spans_list(batch)
        parent, idx, flat = _flat_parts(spans)
        ids = batch.column(id_col).to_numpy()
        return pa.table(
            {
                id_col: pa.array(ids[parent], pa.int64()),
                "span_idx": pa.array(idx, pa.int64()),
                "kind": flat.field("kind"),
                "piece": flat.field("text"),
                "media_ref": flat.field("media_ref"),
                "span_off": flat.field("offset"),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def filter_spans(
    ds: ray.data.Dataset, kind: str, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep only spans of ``kind`` per doc, PRESERVING sequence order —
    output schema identical to the input (id, spans). Flat boolean mask
    + list-offset rebuild; no per-row Python."""

    def fn(batch: pa.Table) -> pa.Table:
        spans = _spans_list(batch)
        parent, _, flat = _flat_parts(spans)
        keep = pc.equal(flat.field("kind"), kind).to_numpy(zero_copy_only=False)
        kept_parent = parent[keep]
        new_counts = np.zeros(len(batch), dtype=np.int64)
        np.add.at(new_counts, kept_parent, 1)
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(new_counts)]).astype(np.int32)
        )
        new_flat = flat.filter(pa.array(keep))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "spans": pa.ListArray.from_arrays(offsets, new_flat),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def reassemble_text(
    ds: ray.data.Dataset, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Concatenate the text of the 'text'-kind spans per doc in offset
    order → (id, n_text_spans, text_joined). The order-preservation
    invariant made observable: any reordering of the flat buffers
    changes text_joined. Join is Arrow's ``binary_join`` kernel."""

    def fn(batch: pa.Table) -> pa.Table:
        spans = _spans_list(batch)
        parent, _, flat = _flat_parts(spans)
        kinds = flat.field("kind")
        offs = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pc.equal(kinds, "text").to_numpy(zero_copy_only=False)
        # offset-order within doc: stable sort by (parent, offset)
        order = np.lexsort((offs[keep], parent[keep]))
        kept_parent = parent[keep][order]
        pieces = flat.field("text").filter(pa.array(keep)).take(
            pa.array(order, pa.int64())
        )
        n_kept = np.zeros(len(batch), dtype=np.int64)
        np.add.at(n_kept, kept_parent, 1)
        offsets = pa.array(np.concatenate([[0], np.cumsum(n_kept)]).astype(np.int32))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(offsets, pieces), ""
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_text_spans": pa.array(n_kept, pa.int64()),
                "text_joined": joined,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def span_dedup(
    ds: ray.data.Dataset, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Global text-span dedup (boilerplate removal for interleaved
    corpora): for every distinct non-empty text piece among the
    'text'-kind spans of the WHOLE corpus, keep only its FIRST
    occurrence (smallest (doc_id, span_idx)); later occurrences are
    removed from their documents' span lists. Media spans and
    empty-text spans pass through untouched; surviving spans keep their
    original order and offsets (the input_hint's span-sequence
    invariant). Output schema = input schema (id, spans).

    Scale shape — two bounded shuffles, no driver materialization:
    1. exploded (piece, doc, idx) rows hash-shuffle by PIECE into ~2×CPU
       salt partitions; inside each, one arrow sort + run-boundary mask
       marks every non-first row a loser (equal pieces always co-locate;
       the loser stream is at most the span count);
    2. losers + the original docs hash-shuffle by DOC id (tagged union,
       same salt partitioning); per partition the kept-span mask and the
       list rebuild are one vectorized pass over the flat buffers."""
    from ..stages.agg import _salt_parts, default_nparts

    nparts = default_nparts()  # fixed at the driver: same key, same part

    def explode_text(batch: pa.Table) -> pa.Table:
        spans = _spans_list(batch)
        parent, idx, flat = _flat_parts(spans)
        keep = (
            pc.and_(
                pc.equal(flat.field("kind"), "text"),
                pc.invert(pc.equal(flat.field("text"), "")),
            )
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        ids = batch.column(id_col).to_numpy()
        return pa.table(
            {
                "piece": flat.field("text").filter(pa.array(keep)),
                id_col: pa.array(ids[parent[keep]], pa.int64()),
                "span_idx": pa.array(idx[keep], pa.int64()),
            }
        )

    def losers_part(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__part"])
        if len(group) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "span_idx": pa.array([], pa.int64()),
                }
            )
        srt = group.take(
            pc.sort_indices(
                group,
                sort_keys=[
                    ("piece", "ascending"),
                    (id_col, "ascending"),
                    ("span_idx", "ascending"),
                ],
            )
        )
        p = srt.column("piece").to_numpy(zero_copy_only=False)
        first = np.ones(len(p), dtype=bool)
        first[1:] = p[1:] != p[:-1]
        out = srt.filter(pa.array(~first))
        return out.select([id_col, "span_idx"])

    losers = (
        ds.map_batches(explode_text, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda b: _salt_parts(b, ["piece"], nparts), batch_format="pyarrow"
        )
        .groupby("__part")
        .map_groups(losers_part, batch_format="pyarrow")
    )

    spans_type = None
    for f in ds.schema().base_schema:
        if f.name == "spans":
            spans_type = f.type
    if spans_type is None:
        raise ValueError("span_dedup needs a 'spans' column")

    def tag_docs(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "spans": _spans_list(batch),
                "span_idx": pa.nulls(n, pa.int64()),
                "__isdoc": pa.array(np.ones(n, dtype=bool)),
            }
        )

    def tag_losers(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "spans": pa.nulls(n, spans_type),
                "span_idx": batch.column("span_idx"),
                "__isdoc": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    tagged = ds.map_batches(
        tag_docs, batch_format="pyarrow", zero_copy_batch=True
    ).union(losers.map_batches(tag_losers, batch_format="pyarrow"))

    # (doc, idx) pairs pack into one int64 via PARTITION-LOCAL doc
    # ranks (a raw ``doc_id << 32`` would overflow int64 at doc ids
    # ≥ 2^31 — real at the 10^12-doc design point); ranks are bounded
    # by the partition's distinct docs and span_idx by int32 offsets
    _SHIFT = np.int64(32)

    def rebuild_part(group: pa.Table) -> pa.Table:
        isdoc = group.column("__isdoc").to_numpy(zero_copy_only=False).astype(bool)
        docs = group.filter(pa.array(isdoc))
        if len(docs) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "spans": pa.array([], spans_type),
                }
            )
        all_ids = group.column(id_col).to_numpy()
        uniq = np.unique(all_ids)
        lid = all_ids[~isdoc]
        lidx = (
            group.column("span_idx")
            .to_numpy(zero_copy_only=False)[~isdoc]
            .astype(np.int64)
        )
        lrank = np.searchsorted(uniq, lid).astype(np.int64)
        lkey = np.sort((lrank << _SHIFT) | lidx)
        spans = _spans_list(docs)
        parent, idx, flat = _flat_parts(spans)
        ids = docs.column(id_col).to_numpy()
        drank = np.searchsorted(uniq, ids).astype(np.int64)
        key = (drank[parent] << _SHIFT) | idx
        if len(lkey):
            pos = np.clip(np.searchsorted(lkey, key), 0, len(lkey) - 1)
            drop = lkey[pos] == key
        else:
            drop = np.zeros(len(key), dtype=bool)
        keep = ~drop
        counts = np.zeros(len(docs), dtype=np.int64)
        np.add.at(counts, parent[keep], 1)
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        )
        return pa.table(
            {
                id_col: docs.column(id_col),
                "spans": pa.ListArray.from_arrays(
                    offsets, flat.filter(pa.array(keep))
                ),
            }
        )

    return (
        tagged.map_batches(
            lambda b: _salt_parts(b, [id_col], nparts), batch_format="pyarrow"
        )
        .groupby("__part")
        .map_groups(
            lambda g: rebuild_part(g.drop_columns(["__part"])),
            batch_format="pyarrow",
        )
    )


def media_ref_fanout(
    ds: ray.data.Dataset, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Invert the doc→media relation: per media_ref, how many spans
    reference it and from how many distinct docs — the shape of a
    media-dedup / hot-asset audit over interleaved corpora.

    Per-batch combiner emits distinct (media_ref, doc) pairs with local
    span counts; the final groupby sums spans and counts distinct docs.
    """

    def partial(batch: pa.Table) -> pa.Table:
        spans = _spans_list(batch)
        parent, _, flat = _flat_parts(spans)
        refs = flat.field("media_ref")
        keep = pc.invert(pc.equal(refs, "")).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy()[parent[keep]]
        sub = pa.table(
            {
                "media_ref": refs.filter(pa.array(keep)),
                id_col: pa.array(ids, pa.int64()),
            }
        )
        grp = sub.group_by(["media_ref", id_col]).aggregate([([], "count_all")])
        return grp.rename_columns(["media_ref", id_col, "n_spans_part"])

    def final_part(group: pa.Table) -> pa.Table:
        # one call per salt partition (the media_ref key space is as big
        # as the asset catalogue): sort by (ref, doc); span sums via
        # reduceat per ref run; distinct docs per ref = count of (ref,
        # doc) boundaries inside the run — all vectorized
        srt = group.take(
            pc.sort_indices(
                group,
                sort_keys=[("media_ref", "ascending"), (id_col, "ascending")],
            )
        )
        refs = srt.column("media_ref").to_numpy(zero_copy_only=False)
        docs = srt.column(id_col).to_numpy()
        nsp = srt.column("n_spans_part").to_numpy()
        n = len(refs)
        if n == 0:
            return pa.table(
                {
                    "media_ref": pa.array([], pa.string()),
                    "n_spans": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        new_ref = np.concatenate([[True], refs[1:] != refs[:-1]])
        starts = np.flatnonzero(new_ref)
        L = np.diff(np.concatenate([starts, [n]]))
        run_id = np.repeat(np.arange(len(starts)), L)
        new_doc = new_ref | np.concatenate([[True], docs[1:] != docs[:-1]])
        return pa.table(
            {
                "media_ref": pa.array(refs[starts].tolist(), pa.string()),
                "n_spans": pa.array(
                    np.add.reduceat(nsp.astype(np.int64), starts), pa.int64()
                ),
                "n_docs": pa.array(
                    np.bincount(run_id[new_doc], minlength=len(starts)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    from ..stages.agg import _salt_parts, default_nparts

    nparts = default_nparts()  # fixed at the driver: same key, same part
    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda b: _salt_parts(b, ["media_ref"], nparts),
            batch_format="pyarrow",
        )
        .groupby("__part")
        .map_groups(final_part, batch_format="pyarrow")
    )
