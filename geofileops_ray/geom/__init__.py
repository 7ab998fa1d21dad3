"""Numpy-from-scratch geometry kernel (no GEOS in this environment).

Public surface re-exported here mirrors the Spatialite/Shapely function
set the reference engine uses (SURVEY.md §2.7).
"""

from .array import (  # noqa: F401
    GEOMETRYCOLLECTION,
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    GeometryArray,
    concat,
)
from .algorithms import (  # noqa: F401
    buffer,
    collection_extract,
    convex_hull,
    explode,
    is_valid_detail,
    make_valid,
    set_precision,
    simplify,
)
from .measure import area, centroid, length, perimeter  # noqa: F401
from .overlay import (  # noqa: F401
    clip_ring_rect,
    parts_to_geom,
    polygon_overlay,
    union_all_parts,
)
from .predicates import (  # noqa: F401
    PREDICATES,
    pair_contains,
    pair_distance,
    pair_intersects,
)
from .strtree import BoxGrid, PackedRTree, bbox_join, bbox_join_auto  # noqa: F401
from .wkb import from_wkb, to_wkb, to_wkb_arrow, to_wkt  # noqa: F401
from .wkt import from_wkt  # noqa: F401  (full-array WKT codec: geom.wkt)
