"""Named end-to-end pipelines + the driver-facing query/oracle registry."""

from .queries import ORACLES, QUERIES, flagship  # noqa: F401
