"""Regular grid spec — the engine's ``CdoGriddes`` equivalent.

The reference round-trips grid schemas through the external ``cdo griddes``
subprocess (``types.py:183-277``); here the spec is a frozen dataclass
derived from data with one aggregation pass (:meth:`GridSpec.from_table`)
and carried to workers as a broadcast object.  It defines the affine
``cell (row, col) <-> (lat, lon)`` transform used by crop, resample and the
raster pipelines.  Latitude rows are stored north-first (yinc < 0), the
reference's canonical orientation (``util.py:165-172``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa


@dataclass(frozen=True)
class GridSpec:
    xsize: int
    ysize: int
    xfirst: float  # center of col 0
    xinc: float
    yfirst: float  # center of row 0
    yinc: float  # negative = descending latitude (canonical)

    gridtype: str = "lonlat"

    @property
    def gridsize(self) -> int:
        return self.xsize * self.ysize

    def lons(self) -> np.ndarray:
        return self.xfirst + np.arange(self.xsize) * self.xinc

    def lats(self) -> np.ndarray:
        return self.yfirst + np.arange(self.ysize) * self.yinc

    def cell_lonlat(self, row: np.ndarray, col: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return self.xfirst + np.asarray(col) * self.xinc, self.yfirst + np.asarray(row) * self.yinc

    def lonlat_cell(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Nearest-cell (row, col) for points; clipped to the grid."""
        col = np.rint((np.asarray(lon) - self.xfirst) / self.xinc).astype(np.int64)
        row = np.rint((np.asarray(lat) - self.yfirst) / self.yinc).astype(np.int64)
        return (
            np.clip(row, 0, self.ysize - 1),
            np.clip(col, 0, self.xsize - 1),
        )

    def bbox(self) -> tuple[float, float, float, float]:
        """Cell-edge bounding box (minx, miny, maxx, maxy)."""
        xs = sorted([self.xfirst - self.xinc / 2, self.xfirst + (self.xsize - 0.5) * self.xinc])
        ys = sorted([self.yfirst - self.yinc / 2, self.yfirst + (self.ysize - 0.5) * self.yinc])
        return xs[0], ys[0], xs[1], ys[1]

    def approx_equal(self, other: "GridSpec", tol: float = 1e-9) -> bool:
        """Structural grid compatibility (``types.py:263-274`` semantics)."""
        return (
            self.xsize == other.xsize
            and self.ysize == other.ysize
            and abs(self.xfirst - other.xfirst) < tol
            and abs(self.xinc - other.xinc) < tol
            and abs(self.yfirst - other.yfirst) < tol
            and abs(self.yinc - other.yinc) < tol
        )

    @staticmethod
    def from_table(t: pa.Table, lat_col: str = "latitude", lon_col: str = "longitude") -> "GridSpec":
        """Infer the spec from a long-form raster table (one agg pass;
        replaces the reference's ``cdo griddes`` subprocess)."""
        lons = np.unique(t[lon_col].to_numpy())
        lats = np.unique(t[lat_col].to_numpy())[::-1]  # descending
        xinc = float(np.diff(lons).mean()) if len(lons) > 1 else 1.0
        yinc = float(np.diff(lats).mean()) if len(lats) > 1 else -1.0
        return GridSpec(
            xsize=len(lons),
            ysize=len(lats),
            xfirst=float(lons[0]),
            xinc=xinc,
            yfirst=float(lats[0]),
            yinc=yinc,
        )
