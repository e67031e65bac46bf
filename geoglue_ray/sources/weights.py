"""Worldpop-shaped weights raster (FIXTURES.md F4).

The reference loads a 1-km population GeoTIFF as zonal weights
(``zonalstats.py:112-117``); here the equivalent is a deterministic
integer-valued grid at 0.125 deg.  Two forms:

- :func:`build_weights_grid`: the dense (WNY, WNX) float64 array, broadcast
  once via ``ray.put`` and indexed per batch inside actors (never a shuffle
  join — the weight side is small relative to the corpus).
- :func:`build_weights_table`: the long-form Arrow table (cell_row,
  cell_col, latitude, longitude, weight) matching the reference's raster
  data model, used by the raster pipelines and goldens.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geoglue_ray import fixtures as fx
from geoglue_ray.grid import GridSpec


def weights_grid_spec() -> GridSpec:
    return GridSpec(
        xsize=fx.WNX,
        ysize=fx.WNY,
        xfirst=fx.WLON0 + fx.WCELL / 2,
        xinc=fx.WCELL,
        yfirst=fx.WLAT0 + fx.WCELL * (fx.WNY - 0.5),
        yinc=-fx.WCELL,  # descending latitude, as the reference stores rasters
    )


def build_weights_grid() -> np.ndarray:
    """Dense weight array indexed [wy, wx] with wy ascending from WLAT0."""
    wx = np.arange(fx.WNX, dtype=np.int64)[None, :]
    wy = np.arange(fx.WNY, dtype=np.int64)[:, None]
    return ((wx * 31 + wy * 17 + 7) % 101).astype(np.float64)


def lookup_weight(lon: np.ndarray, lat: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Vectorized point -> weight lookup (bit-exact vs fixtures.sql_weight)."""
    wx = np.floor((lon - fx.WLON0) / fx.WCELL).astype(np.int64)
    wy = np.floor((lat - fx.WLAT0) / fx.WCELL).astype(np.int64)
    wx = np.clip(wx, 0, grid.shape[1] - 1)
    wy = np.clip(wy, 0, grid.shape[0] - 1)
    return grid[wy, wx]


def build_weights_table() -> pa.Table:
    grid = build_weights_grid()
    wy, wx = np.indices(grid.shape)
    wy, wx = wy.ravel(), wx.ravel()
    return pa.table(
        {
            "cell_row": wy.astype(np.int32),
            "cell_col": wx.astype(np.int32),
            "latitude": fx.WLAT0 + (wy + 0.5) * fx.WCELL,
            "longitude": fx.WLON0 + (wx + 0.5) * fx.WCELL,
            "weight": grid.ravel(),
        }
    )
