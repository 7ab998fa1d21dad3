"""join_nearest — kNN spatial join via cell-ring expansion.

Reference: geoops.join_nearest (geoops.py:3190-3301) runs spatialite
``knn2`` seeded at ST_Centroid(g1) with ``radius`` (initial search
distance), ``max_items`` (=nb_nearest) and an ``expand`` flag, emitting
``pos`` rank + distance (_geoops_sql.py:2581-2697).

Ray shape (SURVEY.md §7.1 step 5): driver loop of rounds with doubling
search radius. In a round with radius E: layer1 rows are assigned to the
single cell holding their centroid; layer2 rows are replicated to every
cell within E of their bbox. A layer1 row finalizes when its k-th
candidate distance is ≤ E — then no unseen layer2 row can be nearer
(any geometry within d ≤ E of the centroid has a bbox overlapping the
centroid's cell expanded by E, hence is present in the group). Unfinished
rows re-enter the next round at 2E. With ``expand=False`` a single round
at ``radius`` runs and only neighbours within ``radius`` are returned —
exactly knn2's radius-limited mode.

Candidate ranking inside a group is exact: bbox lower-bound distances
sort the candidates, exact geometry distances are computed in increasing
lower-bound order until the lower bound exceeds the current k-th exact
distance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import OPTIONS
from ..geom import GeometryArray, from_wkb
from ..geom.measure import centroid
from ..geom.predicates import pair_distance
from ..tiling.cells import CELL_OFFSET, CELL_SHIFT, assign_cells, cell_of_point
from .geometry_batch import decode_geometry
from .relation import detect_rects
from .spatial_join import _attr_cols, _prefixed_schema

_GEOM = "geometry"


def _exact_knn(
    ga1: GeometryArray,
    i: int,
    cen: np.ndarray,
    ga2: GeometryArray,
    k: int,
    rects2: np.ndarray,
    ids2: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(indices, distances) of the ≤k nearest layer2 rows to geometry i,
    exact, via lower-bound ordering; ties broken by layer2 doc_id."""
    b2 = ga2.bounds()
    dx = np.maximum(np.maximum(b2[:, 0] - cen[0], cen[0] - b2[:, 2]), 0)
    dy = np.maximum(np.maximum(b2[:, 1] - cen[1], cen[1] - b2[:, 3]), 0)
    lb = np.hypot(dx, dy)
    tie = ids2 if ids2 is not None else np.arange(len(lb))
    order = np.lexsort((tie, lb))
    out_i: list[int] = []
    out_d: list[float] = []
    kth = np.inf
    for j in order:
        if lb[j] > kth and len(out_i) >= k:
            break
        if rects2[j]:
            d = lb[j]  # bbox distance is exact for rects/points
        else:
            d = pair_distance(ga1, i, ga2, int(j))
        if len(out_i) < k or d < kth:
            out_i.append(int(j))
            out_d.append(float(d))
            srt = sorted(range(len(out_i)), key=lambda s: (out_d[s], tie[out_i[s]]))[:k]
            out_i = [out_i[s] for s in srt]
            out_d = [out_d[s] for s in srt]
            kth = out_d[-1] if len(out_i) >= k else np.inf
    return np.asarray(out_i, dtype=np.int64), np.asarray(out_d)


def _broadcast_knn(
    ds1: ray.data.Dataset,
    ds2: ray.data.Dataset,
    k: int,
    radius: float,
    expand: bool,
    ordered1: list[str],
    ordered2: list[str],
    f2: list[pa.Field],
) -> ray.data.Dataset:
    """Exact kNN with the whole layer2 broadcast once (ray.put): per
    batch, vectorized bbox lower-bound distances + exact refinement."""
    import ray as _ray

    tbl2 = pa.concat_tables(_ray.get(ds2.to_arrow_refs())).combine_chunks()
    tbl2 = tbl2.select(ordered2)
    ga2 = from_wkb(tbl2.column(_GEOM))
    rects2 = detect_rects(ga2)
    ids2 = tbl2.column("doc_id").to_numpy()
    ga2.bounds()  # precompute cache before broadcast
    ref = _ray.put((tbl2, ga2, rects2, ids2))

    def fn(batch: pa.Table) -> pa.Table:
        t2, ga2_local, r2, i2 = _ray.get(ref)
        ga1 = from_wkb(batch.column(_GEOM))
        cens = centroid(ga1) if len(ga1) else np.empty((0, 2))
        rows1, rows2, poss, dists = [], [], [], []
        for i in range(len(ga1)):
            js, ds_ = _exact_knn(ga1, i, cens[i], ga2_local, k, r2, i2)
            if not expand:
                keep = ds_ <= radius
                js, ds_ = js[keep], ds_[keep]
            for rank, (j, d) in enumerate(zip(js, ds_), start=1):
                rows1.append(i)
                rows2.append(int(j))
                poss.append(rank)
                dists.append(float(d))
        left = batch.select(ordered1).take(pa.array(rows1, pa.int64()))
        right = t2.take(pa.array(rows2, pa.int64()))
        cols = {"l1_" + c: left.column(c) for c in ordered1}
        cols.update({"l2_" + c: right.column(c) for c in ordered2})
        cols["pos"] = pa.array(poss, pa.int64())
        cols["distance"] = pa.array(dists, pa.float64())
        return pa.table(cols)

    return ds1.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=OPTIONS.batch_size,
    )


def join_nearest(
    ds1: ray.data.Dataset,
    ds2: ray.data.Dataset,
    nb_nearest: int = 1,
    radius: float | None = None,
    expand: bool = True,
    cols1: list[str] | None = None,
    cols2: list[str] | None = None,
    size: float | None = None,
    max_rounds: int = 6,
    broadcast_threshold: int = 100_000,
) -> ray.data.Dataset:
    """kNN join emitting (l1_*, l2_*, pos, distance); pos is the 1-based
    rank by planar distance (ties broken by layer2 doc_id via the stable
    lower-bound ordering)."""
    size = size or OPTIONS.cell_size
    radius = radius or size
    cols1 = list(cols1 or _attr_cols(ds1))
    cols2 = list(cols2 or _attr_cols(ds2))
    ordered1 = list(dict.fromkeys(["doc_id", *cols1, _GEOM]))
    ordered2 = list(dict.fromkeys(["doc_id", *cols2, _GEOM]))
    f1 = _prefixed_schema(ds1.schema().base_schema, "l1_", ordered1)
    f2 = _prefixed_schema(ds2.schema().base_schema, "l2_", ordered2)
    all_fields = f1 + f2

    # broadcast fast path: a small layer2 (≲100k rows) is shipped ONCE
    # via ray.put and every batch runs exact kNN against it — no rounds,
    # no shuffle (the broadcast-small-side rule; the cell-ring path below
    # is the both-sides-large scale path)
    n2 = ds2.count()
    if n2 <= broadcast_threshold:
        return _broadcast_knn(
            ds1, ds2, nb_nearest, radius, expand, ordered1, ordered2, f2
        )

    def project(ds, side, expand_dist):
        prefix = f"l{side + 1}_"

        def fn(batch: pa.Table) -> pa.Table:
            ga = decode_geometry(batch)
            cols = {}
            n = len(batch)
            for f in all_fields:
                if f.name.startswith(prefix):
                    cols[f.name] = batch.column(f.name[len(prefix):]).combine_chunks()
                else:
                    cols[f.name] = pa.nulls(n, f.type)
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            out = pa.table(cols)
            if side == 0:
                cen = centroid(ga)
                cells = cell_of_point(cen[:, 0], cen[:, 1], size)
                return out.append_column("__cell", pa.array(cells, pa.int64()))
            b = ga.bounds().copy()
            b[:, :2] -= expand_dist
            b[:, 2:] += expand_dist
            rows, cells = assign_cells(b, size)
            out = out.take(pa.array(rows))
            return out.append_column("__cell", pa.array(cells, pa.int64()))

        return ds.map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=OPTIONS.batch_size,
        )

    remaining = ds1
    results: list[ray.data.Dataset] = []
    E = radius
    n_rounds = max_rounds if expand else 1
    for rnd in range(n_rounds):
        t1 = project(remaining, 0, 0.0)
        t2 = project(ds2, 1, E)
        tagged = t1.union(t2)
        bound = E
        # on the LAST round, emit the best-effort top-k for rows that
        # still aren't provably complete instead of silently dropping
        # them (reference knn2 keeps expanding until max_items found)
        last_round = rnd == n_rounds - 1

        def per_group(group: pa.Table) -> pa.Table:
            g1 = group.filter(pc.equal(group.column("__side"), 0)).select(
                [f.name for f in f1]
            )
            g2 = group.filter(pc.equal(group.column("__side"), 1)).select(
                [f.name for f in f2]
            )
            ga1 = from_wkb(g1.column("l1_" + _GEOM).to_pylist())
            ga2 = from_wkb(g2.column("l2_" + _GEOM).to_pylist())
            rects2 = detect_rects(ga2)
            ids2 = g2.column("l2_doc_id").to_numpy()
            cens = centroid(ga1) if len(ga1) else np.empty((0, 2))
            rows1, rows2, poss, dists, done_flags = [], [], [], [], []
            for i in range(len(ga1)):
                js, ds_ = _exact_knn(ga1, i, cens[i], ga2, nb_nearest, rects2, ids2)
                if not expand:
                    keep = ds_ <= bound
                    js, ds_ = js[keep], ds_[keep]
                    done = True
                else:
                    done = last_round or (
                        len(js) >= nb_nearest and (len(ds_) == 0 or ds_[-1] <= bound)
                    )
                if done:
                    for rank, (j, d) in enumerate(zip(js, ds_), start=1):
                        rows1.append(i)
                        rows2.append(int(j))
                        poss.append(rank)
                        dists.append(float(d))
                done_flags.append(done)
            out1 = g1.take(pa.array(rows1, pa.int64()))
            out2 = g2.take(pa.array(rows2, pa.int64()))
            cols = {c: out1.column(c) for c in out1.column_names}
            cols.update({c: out2.column(c) for c in out2.column_names})
            cols["pos"] = pa.array(poss, pa.int64())
            cols["distance"] = pa.array(dists, pa.float64())
            cols["__done"] = pa.array(
                [True] * len(rows1), pa.bool_()
            )
            done_t = pa.table(cols)
            # unfinished layer1 rows re-emitted bare for the next round
            undone = np.flatnonzero(~np.asarray(done_flags, dtype=bool))
            if len(undone):
                u1 = g1.take(pa.array(undone))
                ucols = {c: u1.column(c) for c in u1.column_names}
                for f in f2:
                    ucols[f.name] = pa.nulls(len(undone), f.type)
                ucols["pos"] = pa.nulls(len(undone), pa.int64())
                ucols["distance"] = pa.nulls(len(undone), pa.float64())
                ucols["__done"] = pa.array([False] * len(undone), pa.bool_())
                done_t = pa.concat_tables(
                    [done_t, pa.table({k: ucols[k] for k in cols})]
                )
            return done_t

        round_out = (
            tagged.groupby("__cell")
            .map_groups(per_group, batch_format="pyarrow")
            .materialize()
        )
        results.append(round_out.filter(expr="__done == True").drop_columns(["__done"]))
        undone_ds = round_out.filter(expr="__done == False")
        if not expand or undone_ds.count() == 0:
            break
        # rebuild a bare layer1 dataset for the next round
        remaining = undone_ds.map_batches(
            lambda b: pa.table(
                {c: b.column("l1_" + c) for c in ordered1}
            ),
            batch_format="pyarrow",
        )
        E *= 2.0

    merged = results[0]
    for r in results[1:]:
        merged = merged.union(r)
    return merged
