"""geofileops_ray — a Ray-Data-native spatial-join + tiling engine.

Brand-new engine with the query/data-processing capabilities of
geofileops/geofileops (reference, read-only at /root/reference), built on
ray.data.Dataset pipelines of map_batches over zero-copy Arrow batches.
Geometry kernels are from-scratch numpy (no GEOS in this environment);
geometries travel as WKB binary columns extracted from interleaved
text+media document spans.
"""

__version__ = "0.1.0"

# schema-stable empty blocks across map stages (see rayfix docstring);
# must run at import so driver AND workers (which import this package
# while unpickling UDFs) are patched before any transform chain runs
from . import rayfix as _rayfix

_rayfix.apply()
