"""Dissolve family: groupby-union aggregation.

Reference semantics (SURVEY.md §2.5, §3.3):
* points/lines (or no groupby tiling needed) — one SQL
  ``SELECT ST_Union(geom) … GROUP BY cols`` with attribute aggregates
  (geofileops _geoops_sql.py:4600-4881);
* polygons — the flagship multi-pass tiled dissolve
  (_geoops_gpd.py:1301-1474): per tile union → explode → clip to tile →
  split onborder/notonborder; notonborder rows final, onborder rows
  re-dissolved on a strictly coarser grid next pass; attributes
  accumulated as row lists deduped by original fid (JSON in the
  reference, list<struct> here) so rows split across tile borders
  collapse back to one contribution.

Ray shape: driver loop over passes; each pass =
``map_batches(assign cell) → groupby(cell).map_groups(union + clip +
border-split)``. The notonborder stream accumulates via dataset union;
onborder becomes the next pass input at 4× coarser cells (parent cells,
the H3-parent analogue). Aggregates (count/sum/min/max/mean/concat) are
computed from the accumulated contribution lists in the final groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import OPTIONS
from ..geom import GeometryArray, from_wkb, to_wkb
from ..geom.array import LINESTRING, MULTILINESTRING, POINT, POLYGON
from ..geom.overlay import (
    clip_ring_rect,
    parts_to_geom,
    ring_signed_area,
    union_all_parts,
)
from ..tiling.cells import CELL_OFFSET, CELL_SHIFT, cell_bounds
from .geometry_batch import decode_geometry

_GEOM = "geometry"

AGG_FUNCS = ("count", "sum", "min", "max", "mean", "concat", "count_distinct", "concat_distinct")


def _agg_from_lists(values: list, func: str):
    vals = [v for v in values if v is not None]
    if func == "count":
        return len(vals)
    if func == "count_distinct":
        return len(set(vals))
    if not vals:
        return None
    if func == "sum":
        return float(np.sum(vals))
    if func == "min":
        return min(vals)
    if func == "max":
        return max(vals)
    if func == "mean":
        return float(np.mean(vals))
    if func == "concat":
        return ",".join(str(v) for v in vals)
    if func == "concat_distinct":
        return ",".join(sorted({str(v) for v in vals}))
    raise ValueError(f"unknown agg {func}")


def _dissolve_lines_points(
    ds: ray.data.Dataset,
    groupby: list[str],
    agg_columns: list[tuple[str, str, str]],
) -> ray.data.Dataset:
    """Single-shuffle dissolve for point/line layers
    (_geoops_sql.py:4600-4881: ST_Union + aggregates in one GROUP BY)."""

    def per_group(group: pa.Table) -> pa.Table:
        ga = from_wkb(group.column(_GEOM).to_pylist())
        # union of points = unique coords; lines = concatenation of parts
        # (ST_Union of lines merges at nodes; we keep multiline of all
        # parts — ST_LineMerge analogue applied on output)
        t = ga.part_types(0) if len(ga) else POINT
        if t == POINT:
            pts = np.unique(np.round(ga.coords, 12), axis=0)
            if len(pts) == 1:
                geom = (POINT, [[pts]])
            else:
                geom = (4, [[pts[k : k + 1]] for k in range(len(pts))])  # MULTIPOINT
        else:
            rings = []
            for i in range(len(ga)):
                for part in ga._parts_of(i):
                    rings.extend(part)
            geom = (
                (LINESTRING, [[rings[0]]])
                if len(rings) == 1
                else (MULTILINESTRING, [[r] for r in rings])
            )
        out_ga = GeometryArray.from_parts([geom])
        cols = {k: group.column(k).slice(0, 1) for k in groupby}
        for src, func, out_name in agg_columns:
            v = _agg_from_lists(group.column(src).to_pylist(), func)
            cols[out_name] = pa.array([v])
        cols[_GEOM] = pa.array(to_wkb(out_ga), pa.binary())
        return pa.table(cols)

    if groupby:
        return ds.groupby(groupby).map_groups(per_group, batch_format="pyarrow")
    tagged = ds.map_batches(
        lambda b: b.append_column("__g", pa.array(np.zeros(len(b), np.int8))),
        batch_format="pyarrow",
    )
    return (
        tagged.groupby("__g")
        .map_groups(per_group, batch_format="pyarrow")
        .map_batches(
            lambda b: b.drop_columns(["__g"]) if "__g" in b.column_names else b,
            batch_format="pyarrow",
        )
    )


def _union_group_polygons(
    ga: GeometryArray, idx: np.ndarray
) -> list[list[np.ndarray]]:
    """Union the polygons idx of ga — with a connected-component fast
    path: only polygons whose bboxes overlap can interact, so we sweep
    each overlap component separately and pass singletons through
    untouched. In sparse cells (the common case) this skips the boolean
    sweep entirely; in dense cells it bounds sweep size to the component.
    """
    from ..geom import bbox_join

    if len(idx) == 0:
        return []
    if len(idx) == 1:
        return [p for p in ga._parts_of(int(idx[0]))]
    boxes = ga.bounds()[idx]
    ia, ib = bbox_join(boxes, boxes)
    # union-find over overlap pairs
    parent = np.arange(len(idx))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ia, ib):
        if a < b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
    comps: dict[int, list[int]] = {}
    for k in range(len(idx)):
        comps.setdefault(find(k), []).append(k)
    out: list[list[np.ndarray]] = []
    for members in comps.values():
        if len(members) == 1:
            out.extend(ga._parts_of(int(idx[members[0]])))
        else:
            out.extend(
                union_all_parts([ga._parts_of(int(idx[m])) for m in members])
            )
    return out


def _split_on_border(
    parts: list[list[np.ndarray]], rect: tuple[float, float, float, float]
) -> tuple[list, list]:
    """Split union result parts into (notonborder, onborder) by whether
    any vertex lies on the tile boundary (the reference splits via sjoin
    with the tile boundary lines, _geoops_gpd.py:2106-2115; after
    clip-to-tile, border contact ⟺ a vertex on the rect edge). Bbox
    pretest: a part strictly inside the rect never touches."""
    minx, miny, maxx, maxy = rect
    noton, on = [], []
    for part in parts:
        outer = part[0]
        x, y = outer[:, 0], outer[:, 1]
        x0, x1, y0, y1 = x.min(), x.max(), y.min(), y.max()
        if x0 > minx and x1 < maxx and y0 > miny and y1 < maxy:
            noton.append(part)
            continue
        touches = False
        for ring in part:
            rx, ry = ring[:, 0], ring[:, 1]
            if (
                (rx == minx).any() or (rx == maxx).any()
                or (ry == miny).any() or (ry == maxy).any()
            ):
                touches = True
                break
        (on if touches else noton).append(part)
    return noton, on


def _clip_parts(parts: list[list[np.ndarray]], rect) -> list[list[np.ndarray]]:
    minx, miny, maxx, maxy = rect
    out = []
    for part in parts:
        outer = part[0]
        x, y = outer[:, 0], outer[:, 1]
        # fully inside → no clipping work
        if x.min() >= minx and x.max() <= maxx and y.min() >= miny and y.max() <= maxy:
            out.append(part)
            continue
        # fully outside → gone
        if x.min() >= maxx or x.max() <= minx or y.min() >= maxy or y.max() <= miny:
            continue
        rings = [clip_ring_rect(r, rect) for r in part]
        rings = [r for r in rings if len(r) >= 4]
        if rings and abs(ring_signed_area(rings[0])) > 0:
            out.append(rings)
    return out


def dissolve(
    ds: ray.data.Dataset,
    groupby: list[str] | None = None,
    agg_columns: list[tuple[str, str, str]] | None = None,
    explodecollections: bool = False,
    cell_size: float | None = None,
    max_passes: int = 8,
) -> ray.data.Dataset:
    """Polygon dissolve via recursive tiled union with border
    reconciliation (geoops.dissolve → _geoops_gpd.py:1115-1716); point/
    line layers take the single-shuffle path.

    agg_columns: list of (src_column, func, out_name) with func in
    AGG_FUNCS (reference agg_columns dict, _geoops_sql.py:4685-4759).
    """
    groupby = list(groupby or [])
    agg_columns = list(agg_columns or [])
    size0 = cell_size or OPTIONS.cell_size

    # inspect geometry type from a sample row (layer type is uniform)
    sample = ds.limit(1).take_all()
    if not sample:
        return ds
    t = from_wkb([sample[0][_GEOM]]).part_types(0)
    if t != POLYGON:
        return _dissolve_lines_points(ds, groupby, agg_columns)

    carry = sorted({c for c, _, _ in agg_columns} | {"doc_id"})

    def assign(size):
        # replicate each row to every cell its bbox overlaps — like the
        # reference's bbox-filtered per-tile read (_geoops_gpd.py:1971-1977);
        # the per-cell clip then makes ∪(clip(g, cell)) == g exactly, and
        # attribute duplication is undone by the final doc_id dedup
        from ..tiling.cells import assign_cells

        def fn(batch: pa.Table) -> pa.Table:
            ga = decode_geometry(batch)
            rows, cells = assign_cells(ga.bounds(), size)
            out = batch.take(pa.array(rows))
            if "__cell" in out.column_names:
                out = out.drop_columns(["__cell"])
            return out.append_column("__cell", pa.array(cells, pa.int64()))

        return fn

    def pass_fn(size, last: bool):
        def per_group(group: pa.Table) -> pa.Table:
            cell = int(group.column("__cell")[0].as_py())
            rect = cell_bounds(cell, size)
            ga = from_wkb(group.column(_GEOM).to_pylist())
            if groupby:
                key_cols = [group.column(k).to_pylist() for k in groupby]
                keys = list(zip(*key_cols))
            else:
                keys = [()] * len(group)
            out_rows: dict[str, list] = {
                **{k: [] for k in groupby},
                **{c: [] for c in carry},
                "__border": [],
                _GEOM: [],
            }
            for key in sorted(set(keys)):
                idx = np.array([i for i, k in enumerate(keys) if k == key])
                unioned = _union_group_polygons(ga, idx)
                if not last:
                    unioned = _clip_parts(unioned, rect)
                    noton, on = _split_on_border(unioned, rect)
                else:
                    noton, on = unioned, []
                for border_flag, plist in ((0, noton), (1, on)):
                    if not plist:
                        continue
                    code, parts = parts_to_geom(plist)
                    g = GeometryArray.from_parts([(code, parts)])
                    for kname, kval in zip(groupby, key):
                        out_rows[kname].append(kval)
                    for c in carry:
                        # accumulate contribution lists flat (deduped by
                        # doc_id at final aggregation — the JSON-DISTINCT
                        # analogue); rows are list-typed after listify, so
                        # flatten exactly one level every pass
                        nested = group.column(c).take(pa.array(idx)).to_pylist()
                        out_rows[c].append([x for sub in nested for x in sub])
                    out_rows["__border"].append(border_flag)
                    out_rows[_GEOM].append(to_wkb(g)[0])
            arrs = {}
            for kname in groupby:
                arrs[kname] = pa.array(out_rows[kname])
            for c in carry:
                arrs[c] = pa.array(out_rows[c])
            arrs["__border"] = pa.array(out_rows["__border"], pa.int8())
            arrs[_GEOM] = pa.array(out_rows[_GEOM], pa.binary())
            return pa.table(arrs)

        return per_group

    # pass 0 works on raw rows; contributions become lists after pass 0,
    # so normalize raw rows to single-element lists first
    def listify(batch: pa.Table) -> pa.Table:
        for c in carry:
            col = batch.column(c)
            offsets = pa.array(np.arange(len(batch) + 1, dtype=np.int32))
            lst = pa.ListArray.from_arrays(offsets, col.combine_chunks())
            batch = batch.set_column(batch.schema.get_field_index(c), c, lst)
        return batch

    def flatten_lists(group_col: pa.ChunkedArray) -> list:
        out = []
        for row in group_col.to_pylist():
            out.extend(row)
        return out

    current = ds.map_batches(
        lambda b: listify(b.select(list(dict.fromkeys([*groupby, *carry, _GEOM])))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    finals: list[ray.data.Dataset] = []
    size = size0
    for p in range(max_passes):
        last = p == max_passes - 1
        staged = current.map_batches(assign(size), batch_format="pyarrow")
        result = staged.groupby("__cell").map_groups(
            pass_fn(size, last), batch_format="pyarrow"
        ).materialize()
        on = result.filter(expr="__border == 1")
        noton = result.filter(expr="__border == 0").drop_columns(["__border"])
        finals.append(noton)
        n_on = on.count()
        if n_on == 0:
            break
        if n_on <= 4096 or last:
            # residual is small — the final per-groupkey union absorbs it
            # directly instead of another full shuffle pass (the
            # reference's "last pass" collapse, _geoops_gpd.py:1389-1392)
            finals.append(on.drop_columns(["__border"]))
            break
        current = on.drop_columns(["__border"])
        size *= 4  # coarser pass — parent cells (strictly decreasing
        # tile count, termination guarantee like _geoops_gpd.py:1396-1399)

    merged = finals[0]
    for f in finals[1:]:
        merged = merged.union(f)

    # final: one more groupby over group keys to merge cross-pass pieces
    def final_group(group: pa.Table) -> pa.Table:
        ga = from_wkb(group.column(_GEOM).to_pylist())
        unioned = _union_group_polygons(ga, np.arange(len(ga)))
        code, parts = parts_to_geom(unioned)
        g = GeometryArray.from_parts([(code, parts)])
        cols = {k: group.column(k).slice(0, 1) for k in groupby}
        # dedup contributions by doc_id (rows split across tiles appear
        # in several pieces — fid_orig-dedup analogue _geoops_gpd.py:2288)
        doc_lists = flatten_lists(group.column("doc_id"))
        seen: dict = {}
        keep_mask = []
        for d in doc_lists:
            keep_mask.append(d not in seen)
            seen[d] = True
        for src, func, out_name in agg_columns:
            vals = flatten_lists(group.column(src))
            vals = [v for v, k in zip(vals, keep_mask) if k]
            cols[out_name] = pa.array([_agg_from_lists(vals, func)])
        cols[_GEOM] = pa.array(to_wkb(g), pa.binary())
        return pa.table(cols)

    if groupby:
        out = merged.groupby(groupby).map_groups(final_group, batch_format="pyarrow")
    else:
        tagged = merged.map_batches(
            lambda b: b.append_column("__g", pa.array(np.zeros(len(b), np.int8))),
            batch_format="pyarrow",
        )
        out = tagged.groupby("__g").map_groups(
            lambda g: final_group(g.drop_columns(["__g"])), batch_format="pyarrow"
        )
    if explodecollections:
        from .geometry_batch import explode_batch

        def explode_fn(batch: pa.Table) -> pa.Table:
            ga = decode_geometry(batch)
            out_b, out_ga = explode_batch(batch, ga)
            from .geometry_batch import encode_geometry

            return encode_geometry(out_b, out_ga)

        out = out.map_batches(explode_fn, batch_format="pyarrow")
    return out
