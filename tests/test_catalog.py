import numpy as np
import pyarrow as pa

from geofileops_ray.geom import from_wkb
from geofileops_ray.geom.measure import area
from geofileops_ray.io.synth import parcels_dataset
from geofileops_ray.stages.catalog import (
    add_column,
    drop_column,
    layer_info,
    rename_column,
    subdivide,
)

SF = "/root/testdata/sf0.001"


def test_layer_info(ray_session):
    info = layer_info(parcels_dataset(SF))
    assert info.featurecount == 500
    assert info.geometrytypename == "POLYGON"
    assert info.total_bounds[0] >= 0.0
    assert "GEWASGROEP" in info.columns


def test_column_ops(ray_session):
    ds = parcels_dataset(SF)
    ds = add_column(ds, "flag", 7)
    ds = rename_column(ds, "flag", "flag2")
    rows = drop_column(ds, "OIDN").take_all()
    assert rows[0]["flag2"] == 7
    assert "OIDN" not in rows[0]


def test_subdivide_preserves_area(ray_session):
    # one complex sawtooth polygon (202 coords) — the reference's
    # subdivide trigger shape (complex geometries, not small rects)
    import ray.data

    from geofileops_ray.geom import to_wkb
    from geofileops_ray.geom.array import GeometryArray

    xs = np.arange(50, dtype=float)
    top = np.stack([xs, 10 + (xs % 2)], axis=1)
    bot = np.stack([xs[::-1], np.zeros(50)], axis=1)
    ring = np.concatenate([top, bot, top[:1]], axis=0)
    ga = GeometryArray.from_parts([(3, [[ring]])])
    wkb = to_wkb(ga)[0]
    ds = ray.data.from_items([{"doc_id": 1, "geometry": wkb}])
    rows = subdivide(ds, max_coords=30).take_all()
    assert len(rows) > 1
    out = from_wkb([r["geometry"] for r in rows])
    assert abs(float(np.sum(area(out))) - float(area(ga)[0])) < 1e-6
    assert {r["orig_doc_id"] for r in rows} == {1}
    # small geometries pass through untouched
    small = subdivide(parcels_dataset(SF), max_coords=2000).take_all()
    assert len(small) == 500


def test_layer_store_catalog(ray_session, tmp_path):
    """The api façade's store-level catalog surface: listlayers /
    get_only_layer / rename_layer / file utils / attribute-only reads /
    geometry-type probe / add_columns / spatial-index analogues."""
    from geofileops_ray import api as gfo

    p = parcels_dataset("/root/testdata/sf0.001")
    store = tmp_path / "store"
    store.mkdir()
    gfo.to_file(p.limit(50), str(store / "parcels.parquet"))
    assert gfo.listlayers(str(store)) == ["parcels"]
    assert gfo.get_only_layer(str(store)) == "parcels"
    assert gfo.get_default_layer(str(store / "parcels.parquet")) == "parcels"
    assert gfo.is_geofile(str(store / "parcels.parquet"))

    gfo.rename_layer(str(store), "parcels", "fields")
    assert gfo.listlayers(str(store)) == ["fields"]
    gfo.copy(str(store / "fields.parquet"), str(store / "fields2.parquet"))
    assert sorted(gfo.listlayers(str(store))) == ["fields", "fields2"]
    assert gfo.cmp(
        gfo.read_file(str(store / "fields.parquet")),
        gfo.read_file(str(store / "fields2.parquet")),
    )
    gfo.remove(str(store / "fields2.parquet"))
    assert gfo.listlayers(str(store)) == ["fields"]

    ng = gfo.read_file_nogeom(str(store / "fields.parquet"))
    assert "geometry" not in ng.schema().names and ng.count() == 50
    sq = gfo.read_file_sql(
        str(store / "fields.parquet"),
        "SELECT doc_id, OPPERVL * 2 AS opp2 FROM batch",
    )
    t = pa.Table.from_pylist(sq.take_all())
    assert t.num_rows == 50 and "opp2" in t.column_names

    assert gfo.get_layer_geometrytypes(p.limit(50)) == ["POLYGON"]

    ds2 = gfo.add_columns(p.limit(10), {"tag": "x", "v": 7})
    row = ds2.take(1)[0]
    assert row["tag"] == "x" and row["v"] == 7

    sm = gfo.create_spatial_index(p.limit(50))
    assert isinstance(sm, dict)
    assert gfo.has_spatial_index(p) is False
    assert gfo.remove_spatial_index(p) is None


def test_layer_roundtrip_and_lance_gate(ray_session, tmp_path):
    """read_layer/write_layer round-trip (bbox pushdown on stats
    columns) and the Lance format gate: a .lance path must raise a clear
    ImportError in this sandbox (no pylance), never silently fall back."""
    import numpy as np
    import pytest
    import ray.data

    from geofileops_ray.io.readwrite import read_layer, write_layer
    from geofileops_ray.stages.geometry_batch import add_bounds

    import geofileops_ray.io as gio

    p = gio.parcels_dataset("/root/testdata/sf0.001").limit(50)
    with_bounds = p.map_batches(add_bounds, batch_format="pyarrow")
    out = tmp_path / "layer"
    write_layer(with_bounds, str(out))
    back = read_layer(str(out))
    assert back.count() == 50
    # bbox pushdown prunes on the stats columns
    got = read_layer(str(out), bbox=(-1e9, -1e9, 1e9, 1e9)).count()
    assert got == 50
    # Lance path: explicit error, not a silent parquet fallback
    with pytest.raises(ImportError, match="[Ll]ance"):
        read_layer(str(out) + ".lance")
    with pytest.raises(ImportError, match="[Ll]ance"):
        write_layer(p, str(tmp_path / "x.lance"))


def test_update_column_centroid_helpers(ray_session):
    """ST_Centroid analogue columns in the update_column SQL surface:
    for axis-aligned rectangles the centroid is the bbox center."""
    import pyarrow as pa

    import geofileops_ray.io as gio
    from geofileops_ray.stages.single_layer import update_column

    p = gio.parcels_dataset("/root/testdata/sf0.001").limit(30)
    out = update_column(p, "cx", "centroid_x + 0")
    out = update_column(out, "cy", "centroid_y + 0")
    from geofileops_ray.geom import from_wkb

    for r in out.take_all():
        b = from_wkb([r["geometry"]]).bounds()[0]
        assert abs(r["cx"] - (b[0] + b[2]) / 2) < 1e-9
        assert abs(r["cy"] - (b[1] + b[3]) / 2) < 1e-9


def test_api_facade_resolves_reference_namespace():
    """A geofileops user switching imports must find every public
    geoops.py / fileops.py / helpers.layerstyles name on the facade."""
    from geofileops_ray import api

    names = [
        "zip_geofile", "unzip_geofile",
        "get_layerstyles", "add_layerstyle", "remove_layerstyle",
        "buffer", "convexhull", "simplify", "makevalid", "isvalid",
        "apply", "apply_vectorized", "warp", "warp_gcps", "reproject",
        "select", "select_two_layers", "clip_by_geometry",
        "export_by_bounds", "intersection", "difference", "erase",
        "clip", "identity", "split", "symmetric_difference", "union",
        "union_full_self", "join", "join_by_location",
        "export_by_location", "export_by_distance", "join_nearest",
        "delete_duplicate_geometries", "dissolve",
        "dissolve_within_distance", "concat", "read_file", "to_file",
        "copy_layer", "convert", "append_to", "listlayers",
        "get_layerinfo", "get_only_layer", "get_default_layer",
        "rename_layer", "add_column", "add_columns", "drop_column",
        "rename_column", "update_column", "create_spatial_index",
        "has_spatial_index", "remove_spatial_index", "cmp", "copy",
        "move", "remove", "is_geofile", "get_crs", "execute_sql",
        "read_file_nogeom", "read_file_sql", "subdivide",
        "get_layer_geometrytypes",
    ]
    missing = [n for n in names if not hasattr(api, n)]
    assert missing == [], missing


def test_zip_unzip_geofile_roundtrip(tmp_path):
    """zip_geofile → unzip_geofile round-trips a fragment-directory
    store byte-for-byte, and the archive is deterministic (fixed
    timestamps, sorted entries — resumable runs reproduce it exactly)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from geofileops_ray.io.readwrite import unzip_geofile, zip_geofile

    store = tmp_path / "parcels"
    os.makedirs(store / "part_1")
    pq.write_table(pa.table({"a": [1, 2]}), store / "part_0.parquet")
    pq.write_table(pa.table({"a": [3]}), store / "part_1" / "frag.parquet")

    z1, z2 = tmp_path / "s1.zip", tmp_path / "s2.zip"
    zip_geofile(str(store), str(z1))
    zip_geofile(str(store), str(z2))
    assert z1.read_bytes() == z2.read_bytes()

    out = unzip_geofile(str(z1), str(tmp_path / "restored"))
    assert os.path.basename(out) == "parcels"
    got = pq.read_table(os.path.join(out, "part_0.parquet"))
    assert got.column("a").to_pylist() == [1, 2]
    got2 = pq.read_table(os.path.join(out, "part_1", "frag.parquet"))
    assert got2.column("a").to_pylist() == [3]

    # single-file store round-trip
    single = tmp_path / "zones.parquet"
    pq.write_table(pa.table({"b": [9]}), single)
    z3 = tmp_path / "s3.zip"
    zip_geofile(str(single), str(z3))
    out3 = unzip_geofile(str(z3), str(tmp_path / "restored3"))
    assert out3.endswith("zones.parquet")
    assert pq.read_table(out3).column("b").to_pylist() == [9]


def test_layerstyles_add_get_remove(tmp_path):
    """QGIS layer_styles analogue: add/get/remove with the extension's
    column layout; duplicate (layer, name) errors; remove on a store
    without styles is a silent no-op (reference layerstyles.py)."""
    import os

    import pytest as _pytest

    from geofileops_ray.stages.catalog import (
        add_layerstyle,
        get_layerstyles,
        remove_layerstyle,
    )

    store = str(tmp_path / "store")
    os.makedirs(store)
    remove_layerstyle(store, 1)  # no styles table yet: no-op
    assert len(get_layerstyles(store)) == 0

    add_layerstyle(store, "parcels", "default", qml="<qml/>",
                   use_as_default=True, owner="me")
    add_layerstyle(store, "parcels", "alt", qml="<qml2/>")
    add_layerstyle(store, "zones", "default", qml="<qml3/>")
    with _pytest.raises(ValueError, match="already exists"):
        add_layerstyle(store, "parcels", "default", qml="<dup/>")

    df = get_layerstyles(store)
    assert df.index.name == "id" and len(df) == 3
    p = get_layerstyles(store, layer="parcels")
    assert sorted(p["styleName"]) == ["alt", "default"]
    d = get_layerstyles(store, layer="parcels", name="default")
    assert len(d) == 1
    assert d.iloc[0]["styleQML"] == "<qml/>"
    assert d.iloc[0]["useAsDefault"] == 1

    remove_layerstyle(store, int(d.index[0]))
    assert len(get_layerstyles(store, layer="parcels")) == 1


def test_read_layer_where_and_rows(ray_session, tmp_path):
    """read_file's `where` (per-batch SQL predicate) and `rows` (bounded
    row window in layer order) parameters — reference fileops.py
    read_file semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from geofileops_ray.io.readwrite import read_layer

    t = pa.table(
        {"a": pa.array(range(100), pa.int64()),
         "b": pa.array([f"v{i}" for i in range(100)])}
    )
    path = tmp_path / "layer.parquet"
    pq.write_table(t, path)

    got = read_layer(str(path), where="a % 10 = 3").take_all()
    assert sorted(r["a"] for r in got) == [3, 13, 23, 33, 43, 53, 63, 73, 83, 93]

    win = read_layer(str(path), rows=slice(10, 15)).take_all()
    assert [r["a"] for r in win] == [10, 11, 12, 13, 14]

    both = read_layer(str(path), where="a >= 50", rows=slice(0, 3)).take_all()
    assert [r["a"] for r in both] == [50, 51, 52]

    with pytest.raises(ValueError, match="step"):
        read_layer(str(path), rows=slice(0, 10, 2))
