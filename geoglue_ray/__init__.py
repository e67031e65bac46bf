"""geoglue_ray — a Ray-Data-native spatial-join + zonal-aggregation engine.

A from-scratch re-expression of kraemer-lab/geoglue's capabilities (admin-
level aggregation of geospatial observations; see SURVEY.md) as streaming
``ray.data.Dataset`` pipelines: zero-copy Arrow ``map_batches`` stages,
stateful actor pools for polygon/raster indexes, partial/final groupby
shuffles, broadcast small sides, and resumable partitioned output.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (driver, tests' conftest fixture, bench.py).
"""

from geoglue_ray.geom import Bbox, PolygonSet  # noqa: F401
from geoglue_ray.grid import GridSpec  # noqa: F401
from geoglue_ray.ops import OpSpec, parse_op, parse_ops  # noqa: F401

__version__ = "0.1.0"
