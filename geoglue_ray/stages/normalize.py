"""Coordinate normalization — the engine's ``fix_lonlat`` / ``sort_lonlat``
(``util.py:53-61``, ``util.py:165-172``).

Canonical form: longitude wrapped to [-180, 180) via ``(lon+180) % 360 -
180``, latitude untouched; column names normalized to ``lon``/``lat``.
Ordering (lat descending, lon ascending) is an *output* concern under
unordered block execution — applied only at materialization via
:func:`canonical_sort`, never mid-pipeline (SURVEY.md §7 hard part (c)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from geoglue_ray.schema import lonlat_columns


def wrap_longitude(lon: np.ndarray) -> np.ndarray:
    """``(lon + 180) % 360 - 180`` (``util.py:168``)."""
    return (np.asarray(lon, dtype=np.float64) + 180.0) % 360.0 - 180.0


def normalize_lonlat(batch: pa.Table) -> pa.Table:
    """Wrap longitudes and rename coordinate columns to lon/lat."""
    lon_col, lat_col = lonlat_columns(batch.schema)
    lon = wrap_longitude(batch[lon_col].to_numpy(zero_copy_only=False))
    i = batch.schema.get_field_index(lon_col)
    batch = batch.set_column(i, "lon", pa.array(lon))
    if lat_col != "lat":
        j = batch.schema.get_field_index(lat_col)
        batch = batch.set_column(j, "lat", batch[lat_col])
    return batch


def normalize(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(normalize_lonlat, batch_format="pyarrow")


def canonical_sort(ds: rd.Dataset, lat_col: str = "lat", lon_col: str = "lon") -> rd.Dataset:
    """Reference output ordering: latitude descending, longitude ascending
    (``util.py:165-172``) — final materialization only."""
    return ds.sort([lat_col, lon_col], descending=[True, False])
