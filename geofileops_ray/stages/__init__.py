from .single_layer import (  # noqa: F401
    apply,
    apply_vectorized,
    buffer,
    clip_by_geometry,
    convexhull,
    export_by_bounds,
    isvalid,
    makevalid,
    select,
    simplify,
    update_column,
    warp,
)
from .geometry_batch import (  # noqa: F401
    add_bounds,
    decode_geometry,
    encode_geometry,
    explode_batch,
)
