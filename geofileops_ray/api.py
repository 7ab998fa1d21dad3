"""Reference-shaped public API façade.

One namespace with the geofileops public names (geoops.py / fileops.py
surface) so a user of the reference can switch imports:

    import geofileops as gfo            →  from geofileops_ray import api as gfo
    gfo.buffer(input_path, output_path) →  gfo.buffer(ds, distance) -> Dataset

The reference operates file→file; this engine operates
Dataset→Dataset (file endpoints via read_layer/write_layer/copy_layer).
Every callable cites the reference dispatch point it mirrors.
"""

from __future__ import annotations

# single layer (geoops.py:399-1905)
from .stages.single_layer import (  # noqa: F401
    apply,
    apply_vectorized,
    buffer,
    clip_by_geometry,
    convexhull,
    export_by_bounds,
    isvalid,
    makevalid,
    reproject,
    select,
    simplify,
    update_column,
    warp_gcps,
)
from .stages.single_layer import warp as warp_affine  # noqa: F401


def warp(ds, gcps=None, algorithm="polynomial", order=None,
         matrix=None, **post):
    """Reference geoops.warp surface: GCP-based rubbersheeting
    (geoops.py:1561-1612) — ``gcps`` is a list of
    (x_orig, y_orig, x_dest, y_dest[, elevation]) tuples, ``algorithm``
    "polynomial" (order 1-3) or "tps". The engine's extra affine path
    is reachable via ``matrix=(a, b, c, d, e, f)`` or warp_affine."""
    if matrix is not None:
        return warp_affine(ds, matrix, **post)
    if gcps is not None and len(gcps) and isinstance(gcps[0], (int, float)):
        # a flat 6-tuple: the engine's affine spelling
        return warp_affine(ds, tuple(gcps), **post)
    if gcps is None:
        raise TypeError("warp() needs gcps=[...] (or matrix=(a..f))")
    return warp_gcps(ds, list(gcps), algorithm=algorithm, order=order,
                     **post)

# two layer (geoops.py:1908-3871)
from .stages.overlay_ops import (  # noqa: F401
    clip,
    difference,
    identity,
    intersection,
    symmetric_difference,
    union,
)
from .stages.spatial_join import (  # noqa: F401
    delete_duplicate_geometries,
    export_by_distance,
    export_by_location,
    join_attributes as join,
    join_by_location,
)
from .stages.knn import join_nearest  # noqa: F401
from .stages.compound import (  # noqa: F401
    concat,
    dissolve_within_distance,
    select_two_layers,
    union_full_self,
)

# aggregations (geoops.py:37-1259)
from .stages.dissolve import dissolve  # noqa: F401

# catalog / files (fileops.py)
from .io.readwrite import read_layer as read_file  # noqa: F401
from .io.geojson import (  # noqa: F401
    geojson_crs,
    read_csv_wkt,
    read_geojson,
    write_csv_wkt,
    write_geojson,
)
from .io.gpkg import (  # noqa: F401
    gpkg_crs,
    read_gpkg,
    write_gpkg,
)
from .io.shapefile import read_shapefile, write_shapefile  # noqa: F401
from .io.readwrite import write_layer as to_file  # noqa: F401
from .io.readwrite import (  # noqa: F401
    copy,
    is_geofile,
    is_geofile_ext,
    move,
    read_file_nogeom,
    read_file_sql,
    remove,
    unzip_geofile,
    zip_geofile,
)
from .stages.catalog import (  # noqa: F401
    add_column,
    add_columns,
    add_layerstyle,
    get_layerstyles,
    remove_layerstyle,
    cmp_layers as cmp,
    copy_layer,
    create_spatial_index,
    has_spatial_index,
    remove_spatial_index,
    drop_column,
    get_default_layer,
    get_layer_geometrytypes,
    get_only_layer,
    layer_info as get_layerinfo,
    listlayers,
    rename_column,
    rename_layer,
    subdivide,
)
# CRS support (geom/crs.py): the sandbox has no pyproj, so only the
# EPSG families with from-scratch Snyder formulas resolve — 4326,
# 3857 (spherical mercator), 3812 (Belgian Lambert 2008), 31370
# (Belgian Lambert 72 incl. the published BD72→WGS84 7-parameter
# Helmert shift — the reference test corpus's default CRS), 2154
# (RGF93 / Lambert-93), 5070 (NAD83 Conus Albers), 3035 (ETRS89 LAEA
# Europe), 27700 (OSGB36 British National Grid incl. towgs84 Helmert;
# OSTN15 grid shifts need external data — ±2 m class, documented),
# 28992 (Amersfoort / RD New oblique stereographic + towgs84),
# 32601-32660 / 32701-32760 (WGS84 UTM
# north/south) and 25828-25838 (ETRS89 UTM), plus the bundled public
# EPSG parameter table (geom/epsg_table.py: ~130 more common codes —
# NAD83 UTM, GDA94/GDA2020 MGA, SWEREF99, Norwegian NTM, RGF93 CC,
# DHDN/MGI Gauss-Krueger, national TM/LCC grids, common longlat
# datums — auto-registered at import). Any other code raises
# ValueError (never a silent None); geodesic distances are spherical
# (R_MEAN). Additionally, ANY CRS expressible in the implemented
# projection engines (lcc / tm / sterea / longlat + towgs84 Helmert)
# can be registered at runtime with register_crs(epsg, name, proj,
# params, ellps, towgs84) and then used everywhere a builtin can.
from .geom.crs import get_crs, register_crs  # noqa: F401

# deprecated aliases kept by the reference (geoops.py:2267, :2683, :2917)
erase = difference
split = identity
intersect = intersection

# legacy copy/append spellings (fileops.py:2909-3042) — same engine path
convert = copy_layer
append_to = copy_layer

# the reference's execute_sql mutates a file in place (fileops.py:577-620);
# the Dataset-native analogue is the batch-safe SQL select stage
execute_sql = select
