from .synth import (  # noqa: F401
    PARCELS_CTE,
    POINTS_CTE,
    ZONES_CTE,
    read_documents,
    synth_parcels_batch,
    synth_points_batch,
    synth_zones_batch,
    parcels_dataset,
    points_dataset,
    zones_dataset,
)
from .readwrite import read_layer, write_layer  # noqa: F401
from .geojson import (  # noqa: F401
    geojson_crs,
    read_csv_wkt,
    read_geojson,
    write_csv_wkt,
    write_geojson,
)
from .gpkg import (  # noqa: F401
    gpkg_crs,
    listlayers_gpkg,
    read_gpkg,
    write_gpkg,
)
from .shapefile import read_shapefile, write_shapefile  # noqa: F401
