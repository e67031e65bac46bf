"""ERA5-shaped synthetic raster source (FIXTURES.md F3).

The reference's raster fixtures are hourly ERA5 netCDF pairs — instant
``t2m`` + accum ``tp`` on a 0.25 deg grid (``cds.py:97-106``,
``attrs.py:3-19``; VNM grid 33x65 at ``tests/test_griddes.py:89-107``).
The engine's data model for rasters is a **long-form Arrow table** —
one row per (valid_time, cell, variable) — generated deterministically
(integer-valued measures, dyadic cell centers chosen so no cell center
falls on an admin edge or triangle diagonal; lat-frac granularity 2^-4
vs lon-frac 2^-3, so fx+fy = 1 is impossible by parity).

NaN "ocean" holes ((r*33+c) % 11 == 0) exercise null-skipping
aggregation and the sparse-resample path (``resample.py:19-78``).

Generation itself is a Dataset pipeline: ``rd.range(n_days)`` ->
one generator task per day, so raster synthesis parallelizes and
streams exactly like a partitioned read would.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from geoglue_ray import fixtures as fx
from geoglue_ray.grid import GridSpec

RXSIZE, RYSIZE = 33, 64
RXFIRST = 102.125  # col-0 center; frac-of-admin-cell = odd * 2**-3... safe
RYFIRST = 23.9375  # row-0 (north-first) center; yinc < 0 canonical
RINC = 0.25
N_DAYS = 30  # hourly, starting fx.T0 (Monday 2020-01-06)
VARS = [("t2m", "instant", 0), ("tp", "accum", 1)]
VAL_MOD = 997
HOLE_MOD = 11


def raster_grid_spec() -> GridSpec:
    return GridSpec(
        xsize=RXSIZE, ysize=RYSIZE, xfirst=RXFIRST, xinc=RINC, yfirst=RYFIRST, yinc=-RINC
    )


def raster_value(t: np.ndarray, r: np.ndarray, c: np.ndarray, vk: int) -> np.ndarray:
    """Integer-valued measure; NaN on ocean-hole cells."""
    v = ((t * 31 + r * 7 + c * 13 + vk * 101) % VAL_MOD).astype(np.float64)
    return np.where((r * RXSIZE + c) % HOLE_MOD == 0, np.nan, v)


def _day_table(day: int) -> pa.Table:
    hours = day * 24 + np.arange(24, dtype=np.int64)
    t, r, c = np.meshgrid(
        hours, np.arange(RYSIZE, dtype=np.int64), np.arange(RXSIZE, dtype=np.int64),
        indexing="ij",
    )
    t, r, c = t.ravel(), r.ravel(), c.ravel()
    parts = []
    for name, vartype, vk in VARS:
        parts.append(
            pa.table(
                {
                    "valid_time": pa.array(
                        fx.T0 + (t * 3_600_000_000).astype("timedelta64[us]"),
                        type=pa.timestamp("us"),
                    ),
                    "cell_row": r.astype(np.int32),
                    "cell_col": c.astype(np.int32),
                    "latitude": RYFIRST - r * RINC,
                    "longitude": RXFIRST + c * RINC,
                    "variable": pa.array(np.repeat(name, len(t))),
                    "vartype": pa.array(np.repeat(vartype, len(t))),
                    "value": raster_value(t, r, c, vk),
                }
            )
        )
    return pa.concat_tables(parts)


class RasterGen:
    """Day-index -> day table generator as an actor-pool stage.

    A callable class (not a bare function) on purpose: a function stage
    would fuse with downstream actor pools and inherit their row-based
    batch_size, bundling all day indices into one task (measured: the
    whole 3M-row synthesis serialized onto a single actor).  The actor
    boundary preserves per-day task granularity.
    """

    def __init__(self, start_day: int = 0):
        self.start_day = start_day

    def __call__(self, batch: pa.Table):
        for d in batch["id"].to_numpy():
            yield _day_table(int(d) + self.start_day)


def read_raster(n_days: int = N_DAYS, concurrency=None, start_day: int = 0) -> rd.Dataset:
    """Synthetic hourly raster as a streaming Dataset (one generator task
    per day — the stand-in for a partitioned raster-table read).

    ``start_day`` may be negative (days before T0) so fixtures can span a
    year boundary, exercising the timezone-halo paths (``cds.py:876-931``).
    """
    from geoglue_ray.runtime import pool_size

    return rd.range(n_days).map_batches(
        RasterGen,
        fn_constructor_args=(start_day,),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency or (1, pool_size(4, reserve=2)),
    )


# ----------------------------------------------------------------- SQL side
def sql_raster_cte() -> str:
    """DuckDB CTE generating the identical raster (range() cross joins)."""
    return f"""
SELECT g.t, g.r, g.c,
       v.variable, v.vartype,
       CASE WHEN (g.r*{RXSIZE} + g.c) % {HOLE_MOD} = 0 THEN NULL
            ELSE CAST((g.t*31 + g.r*7 + g.c*13 + v.vk*101) % {VAL_MOD} AS DOUBLE) END AS value,
       {RXFIRST} + g.c*{RINC} AS lon,
       {RYFIRST} - g.r*{RINC} AS lat,
       {fx.T0_SQL} + INTERVAL 1 HOUR * g.t AS valid_time
FROM (SELECT t.range AS t, r.range AS r, c.range AS c
      FROM range({N_DAYS * 24}) t, range({RYSIZE}) r, range({RXSIZE}) c) g
CROSS JOIN (SELECT 't2m' AS variable, 'instant' AS vartype, 0 AS vk
            UNION ALL SELECT 'tp', 'accum', 1) v
"""
