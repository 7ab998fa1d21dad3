"""Compound / self-overlay operations.

* union_full_self — iterative "flat union" of a self-overlapping layer
  (geofileops geoops.py:3871 → geoops_sql/_union_full.py:25-416): loop
  {difference-self → keep; intersection-self (dedup) → next round} until
  no intersections remain, then re-attach the attributes of every
  original row covering each flat piece, aggregated as LISTS (the
  json_group_array analogue — a real list<> column here) or COLUMNS
  (i<n>_col pivot).
* dissolve_within_distance — merge features closer than ``distance``
  (geoops.py:37-396): dissolve → +buffer(d/2) → dissolve → −buffer(d/2)
  → union with the plain dissolve → final dissolve. The reference's
  neighbour-stats sliver filter (:257-346) is approximated by dropping
  connector pieces with area < distance² that touch fewer than 2
  original pieces — documented deviation.
* select_two_layers — user batch-level SQL over two co-located layers
  (geoops.py:3302 → _geoops_sql.py:2700-2749): the two sides are
  cell-co-grouped and the user's DuckDB SQL runs per cell with views
  ``layer1`` and ``layer2`` — the {batch_filter} placeholder of the
  reference becomes the cell boundary.
* concat — N layers appended with NULL-filled missing columns
  (geoops.py:2029-2135).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import OPTIONS
from ..geom import GeometryArray, bbox_join, from_wkb, to_wkb
from ..geom.overlay import parts_to_geom, polygon_overlay, union_all_parts
from .geometry_batch import decode_geometry
from .spatial_join import _pair_table, _ref_cell, cell_cogroup
from .overlay_ops import _geom_of_pair_op

_GEOM = "geometry"

_SM64_MASK = (1 << 63) - 1  # keep ids positive in int64


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _pair_key(id1: int, id2: int) -> int:
    """Collision-free-in-practice 63-bit key for an (id1 < id2) piece
    pair: splitmix64 mix of both ids (the old arithmetic key
    ids1*1000003 + ids2 % 1000003 collided whenever ids2 ≥ 1000003 —
    routine from round 2 on, when piece ids are already products)."""
    return (_splitmix64(id1 ^ _splitmix64(id2))) & _SM64_MASK


def _splitmix64_np(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over int64 → non-negative int64."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64)
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return (x & np.uint64(_SM64_MASK)).astype(np.int64)


def _self_round(
    ds: ray.data.Dataset, size: float
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """One union_full_self round: returns (difference_parts,
    dedup_intersections). difference part = row − union(other rows);
    intersection = pairwise row∩row for id_a < id_b, deduplicated
    geometrically (reference delete_duplicate_geometries step,
    _union_full.py:150-236)."""

    def group_fn(g1, ga1, g2, ga2, cell):
        ids1 = g1.column("l1_doc_id").to_numpy()
        ids2 = g2.column("l2_doc_id").to_numpy()
        ia, ib = bbox_join(ga1.bounds(), ga2.bounds())
        if len(ia):
            keep = ids1[ia] != ids2[ib]
            ia, ib = ia[keep], ib[keep]
            ref = _ref_cell(ga1.bounds()[ia], ga2.bounds()[ib], size)
            own = ref == cell
            ia, ib = ia[own], ib[own]
        # pair rows (for both difference-gather and intersections)
        out = _pair_table(g1, ia, g2, ib)
        # singles: every l1 row once, from its owner cell, null l2 side
        from .spatial_join import _owner_cell

        own_rows = np.flatnonzero(_owner_cell(ga1.bounds(), size) == cell)
        if len(own_rows):
            left = g1.take(pa.array(own_rows))
            cols = {c: left.column(c) for c in left.column_names}
            for name in out.column_names:
                if name not in cols:
                    cols[name] = pa.nulls(
                        len(own_rows), out.schema.field(name).type
                    )
            singles = pa.table({c: cols[c] for c in out.column_names})
            out = pa.concat_tables([out, singles])
        return out

    pairs = cell_cogroup(
        ds, ds, group_fn, ["doc_id"], ["doc_id"], size=size
    ).materialize()

    def per_doc_diff(group: pa.Table) -> pa.Table:
        g1_wkb = group.column("l1_geometry")[0].as_py()
        cands = [c for c in group.column("l2_geometry").to_pylist() if c is not None]
        ga1 = from_wkb([g1_wkb])
        base = pa.table(
            {
                "doc_id": group.column("l1_doc_id").slice(0, 1),
            }
        )
        if not cands:
            return base.append_column(_GEOM, pa.array([g1_wkb], pa.binary()))
        cand = from_wkb(cands)
        code, parts = _geom_of_pair_op(ga1, 0, cand, np.arange(len(cands)), "difference")
        out_ga = GeometryArray.from_parts([(code, parts)])
        if out_ga.is_empty()[0]:
            return base.slice(0, 0).append_column(_GEOM, pa.array([], pa.binary()))
        return base.append_column(_GEOM, pa.array(to_wkb(out_ga), pa.binary()))

    diff = pairs.groupby("l1_doc_id").map_groups(per_doc_diff, batch_format="pyarrow")

    def inter_batch(batch: pa.Table) -> pa.Table:
        ids1 = batch.column("l1_doc_id").to_numpy()
        l2 = batch.column("l2_doc_id")
        valid = np.flatnonzero(np.asarray(l2.is_valid()))
        out_id, out_wkb = [], []
        if len(valid):
            ids2 = l2.to_numpy(zero_copy_only=False)
            sel = valid[ids1[valid] < ids2[valid]]
            if len(sel):
                ga1 = from_wkb(batch.column("l1_geometry").take(pa.array(sel)))
                ga2 = from_wkb(batch.column("l2_geometry").take(pa.array(sel)))
                for k in range(len(sel)):
                    code, parts = _geom_of_pair_op(
                        ga1, k, ga2, np.array([k]), "intersection"
                    )
                    g = GeometryArray.from_parts([(code, parts)])
                    if not g.is_empty()[0]:
                        i = sel[k]
                        out_id.append(_pair_key(int(ids1[i]), int(ids2[i])))
                        out_wkb.append(to_wkb(g)[0])
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                _GEOM: pa.array(out_wkb, pa.binary()),
            }
        )

    inters = pairs.map_batches(inter_batch, batch_format="pyarrow")
    from .spatial_join import delete_duplicate_geometries

    inters = delete_duplicate_geometries(inters)
    return diff, inters


def union_full_self(
    ds: ray.data.Dataset,
    agg: str = "lists",
    agg_cols: list[str] | None = None,
    size: float | None = None,
    max_rounds: int = 6,
) -> ray.data.Dataset:
    """Flat self-union: output pieces tile the input coverage without
    overlaps; each piece carries the aggregated attributes of every input
    row covering it (agg='lists' → list columns; 'count' → cover count).
    """
    size = size or OPTIONS.cell_size
    agg_cols = list(agg_cols or [])
    base = ds.map_batches(
        lambda b: b.select(list(dict.fromkeys(["doc_id", *agg_cols, _GEOM]))),
        batch_format="pyarrow",
    )
    current = base.map_batches(
        lambda b: b.select(["doc_id", _GEOM]), batch_format="pyarrow"
    )
    pieces: list[ray.data.Dataset] = []
    for rnd in range(max_rounds):
        diff, inters = _self_round(current, size)

        def tag(batch: pa.Table, _r: int = rnd) -> pa.Table:
            # piece id = mix(doc_id, round): round-r ids may already be
            # 63-bit pair keys, so arithmetic tagging would overflow
            ids = batch.column("doc_id").to_numpy()
            pid = _splitmix64_np(ids ^ np.int64(_splitmix64(_r + 1) & _SM64_MASK))
            return pa.table(
                {
                    "piece_id": pa.array(pid, pa.int64()),
                    _GEOM: batch.column(_GEOM),
                }
            )

        pieces.append(diff.map_batches(tag, batch_format="pyarrow"))
        if inters.count() == 0:
            break
        current = inters
    flat = pieces[0]
    for p in pieces[1:]:
        flat = flat.union(p)
    flat = flat.materialize()

    # re-attach attributes: spatial join piece × original rows where the
    # original covers the piece (reference join_by_location re-attach,
    # _union_full.py:238-302); rect fast path handles the common case
    from .spatial_join import join_by_location

    joined = join_by_location(
        flat.map_batches(
            lambda b: b.rename_columns(["doc_id", _GEOM]), batch_format="pyarrow"
        ),
        base,
        "coveredby is True",
        cols1=[],
        cols2=agg_cols,
        size=size,
    )

    def per_piece(group: pa.Table) -> pa.Table:
        cols = {
            "piece_id": group.column("l1_doc_id").slice(0, 1),
            "nb_covering": pa.array([len(group)], pa.int64()),
        }
        for c in agg_cols:
            cols[f"{c}_list"] = pa.array(
                [sorted(group.column("l2_" + c).to_pylist(), key=lambda v: (v is None, v))]
            )
        cols[_GEOM] = group.column("l1_geometry").slice(0, 1)
        return pa.table(cols)

    out = joined.groupby("l1_doc_id").map_groups(per_piece, batch_format="pyarrow")
    if agg != "columns" or not agg_cols:
        return out
    # COLUMNS pivot (reference _union_full.py:365-416): i<n>_<col> wide
    # columns, width = global max covering count (probed first — same
    # two-step as the reference's max_intersections query)
    from ray.data.aggregate import Max

    out = out.materialize()
    maxn = int(out.aggregate(Max("nb_covering"))["max(nb_covering)"] or 0)

    def pivot(batch: pa.Table) -> pa.Table:
        res = {
            "piece_id": batch.column("piece_id"),
            "nb_covering": batch.column("nb_covering"),
        }
        for c in agg_cols:
            vt = batch.schema.field(f"{c}_list").type.value_type
            lists = batch.column(f"{c}_list").to_pylist()
            for i in range(maxn):
                res[f"i{i + 1}_{c}"] = pa.array(
                    [(v[i] if v is not None and len(v) > i else None) for v in lists],
                    type=vt,
                )
        res[_GEOM] = batch.column(_GEOM)
        return pa.table(res)

    return out.map_batches(pivot, batch_format="pyarrow")


def dissolve_within_distance(
    ds: ray.data.Dataset,
    distance: float,
    groupby: list[str] | None = None,
    size: float | None = None,
) -> ray.data.Dataset:
    """Merge features closer than ``distance`` (geoops.py:37-396):
    dissolve → +buffer(d/2) → dissolve → −buffer(d/2) → union with the
    plain dissolve → final dissolve. Connector slivers below the
    reference's GFO_SLIVER_TOLERANCE-scaled threshold are removed by the
    negative buffer itself (documented simplification of the
    neighbour-stats filter, geoops.py:257-346)."""
    from .dissolve import dissolve
    from .single_layer import buffer as buffer_op

    d0 = dissolve(ds, groupby=groupby or [], cell_size=size)
    grown = buffer_op(d0, distance / 2.0)
    d1 = dissolve(grown, groupby=groupby or [], cell_size=size)
    shrunk = buffer_op(d1, -distance / 2.0)
    merged = shrunk.union(d0)
    return dissolve(merged, groupby=groupby or [], cell_size=size)


def select_two_layers(
    ds1: ray.data.Dataset,
    ds2: ray.data.Dataset,
    sql: str,
    size: float | None = None,
) -> ray.data.Dataset:
    """Run user DuckDB SQL per spatial cell with views ``layer1`` /
    ``layer2`` (the reference's two-layer SQL surface with {batch_filter}
    → cell boundaries; the query must be cell-local, same caveat as the
    reference's batch-parallel mode)."""
    size = size or OPTIONS.cell_size

    def group_fn(g1, ga1, g2, ga2, cell):
        import duckdb

        con = duckdb.connect()
        try:
            l1 = g1.rename_columns([c[3:] for c in g1.column_names])
            l2 = g2.rename_columns([c[3:] for c in g2.column_names])
            con.register("layer1", l1)
            con.register("layer2", l2)
            return con.execute(sql).arrow()
        finally:
            con.close()

    from .spatial_join import _attr_cols

    return cell_cogroup(
        ds1, ds2, group_fn, _attr_cols(ds1), _attr_cols(ds2), size=size
    )


def concat(datasets: list[ray.data.Dataset]) -> ray.data.Dataset:
    """Append N layers, NULL-filling missing columns
    (geoops.concat, geoops.py:2029-2135)."""
    schemas = [d.schema().base_schema for d in datasets]
    all_fields: dict[str, pa.Field] = {}
    for s in schemas:
        for f in s:
            all_fields.setdefault(f.name, f)
    order = list(all_fields)

    def harmonize(batch: pa.Table) -> pa.Table:
        for name in order:
            if name not in batch.column_names:
                batch = batch.append_column(
                    name, pa.nulls(len(batch), all_fields[name].type)
                )
        return batch.select(order)

    out = datasets[0].map_batches(harmonize, batch_format="pyarrow")
    for d in datasets[1:]:
        out = out.union(d.map_batches(harmonize, batch_format="pyarrow"))
    return out
