"""Crop — bbox selection over point or raster tables.

The reference's ``geoglue crop RASTER BOUNDS`` (``cli.py:136-188``,
``util.py:144-162`` ``crop_dataset_to_geometry``): select by bbox with an
optional iterative ``enlarge`` loop until the cropped region covers another
raster's bbox, and a guard that the source actually contains the requested
bounds.  In the engine the selection is a vectorized Arrow filter that Ray
pushes down per block; at a partitioned read the same predicate prunes
row groups via ``read_parquet(filter=...)``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from geoglue_ray.geom import Bbox


def crop_filter(bbox: Bbox, lon_col: str = "lon", lat_col: str = "lat"):
    """Vectorized half-open bbox predicate for map_batches."""

    def _f(batch: pa.Table) -> pa.Table:
        lon, lat = batch[lon_col], batch[lat_col]
        mask = pc.and_(
            pc.and_(pc.greater_equal(lon, bbox.minx), pc.less(lon, bbox.maxx)),
            pc.and_(pc.greater_equal(lat, bbox.miny), pc.less(lat, bbox.maxy)),
        )
        return batch.filter(mask)

    return _f


def crop(
    ds: rd.Dataset, bbox: Bbox, lon_col: str = "lon", lat_col: str = "lat"
) -> rd.Dataset:
    return ds.map_batches(crop_filter(bbox, lon_col, lat_col), batch_format="pyarrow")


def crop_parquet(
    path: str, bbox: Bbox, columns: list[str] | None = None,
    lon_col: str = "lon", lat_col: str = "lat",
) -> rd.Dataset:
    """Crop at the read: pyarrow dataset expression -> row-group pruning."""
    expr = (
        (pc.field(lon_col) >= bbox.minx)
        & (pc.field(lon_col) < bbox.maxx)
        & (pc.field(lat_col) >= bbox.miny)
        & (pc.field(lat_col) < bbox.maxy)
    )
    return rd.read_parquet(path, columns=columns, filter=expr)


def crop_to_cover(
    src_bbox: Bbox, bbox: Bbox, cover: Bbox, step: float = 0.1, max_iter: int = 100
) -> Bbox:
    """Iteratively enlarge ``bbox`` until it covers ``cover``
    (``cli.py:159-167``); raises if the source cannot contain the result
    (``cli.py:168-170`` exit-1 guard)."""
    cur = bbox
    for _ in range(max_iter):
        if cur >= cover:
            break
        cur = cur.enlarge(step)
    if not cur >= cover:
        raise ValueError(f"could not enlarge {bbox} to cover {cover}")
    if not src_bbox >= cur:
        raise ValueError(f"source bbox {src_bbox} does not contain crop {cur}")
    return cur
