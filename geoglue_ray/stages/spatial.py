"""Spatial-join stages: GGrid cell encode + stateful polygon-index refine.

The engine's equivalent of the reference's raster-cell x polygon join inside
``exactextract`` (``zonalstats.py:44-62``), re-expressed Ray-Data-first per
the north_star:

1. ``encode_cells`` — stateless ``map_batches``: (lon, lat) -> GGrid cell id
   (H3-substitute), pure numpy, zero-copy Arrow in/out.
2. ``SpatialJoiner`` — **actor-pool** ``map_batches`` class: ``__init__``
   fetches the broadcast :class:`AdminIndex` (one ``ray.get`` per actor,
   never per batch) and ``__call__`` does candidate lookup -> vectorized
   point-in-polygon -> kNN nearest-centroid fallback, appending
   ``admin_id`` / ``admin1_id`` / ``via_knn``.

Use :func:`spatial_join` to wire both onto a Dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from geoglue_ray import cells as gcells
from geoglue_ray.sources.admin import AdminIndex

DEFAULT_CELL_RES = 11


CELL_COL = "gg_cell"  # namespaced: never collides with user cell-id columns


def encode_cells(batch: pa.Table, res: int = DEFAULT_CELL_RES) -> pa.Table:
    cell = gcells.encode(batch["lon"].to_numpy(), batch["lat"].to_numpy(), res)
    return batch.append_column(CELL_COL, pa.array(cell))


class SpatialJoiner:
    """Actor-pool stage holding the pickled polygon index (ST1/J1 analogue).

    ``index_ref`` is an ``ray.ObjectRef`` from ``ray.put(AdminIndex)`` (or a
    plain AdminIndex in unit tests).  State is resolved once per actor.
    With ``weights_ref`` (broadcast dense weight grid) the stage also
    appends the per-point ``weight`` column — one actor pool instead of
    two keeps plan overhead down and the batch in cache.
    """

    def __init__(self, index_ref, weights_ref=None, emit_names: bool = True):
        self.index: AdminIndex = (
            ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        )
        self.weights = (
            ray.get(weights_ref)
            if isinstance(weights_ref, ray.ObjectRef)
            else weights_ref
        )
        self.emit_names = emit_names
        # dictionary-encoded name columns: build the string pools once
        self._admin_pool = pa.array(self.index.admin_id, type=pa.string())
        self._admin1_pool = pa.array(self.index.admin1_id, type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        cell = None
        if CELL_COL in batch.column_names and len(batch):
            c = batch[CELL_COL].to_numpy(zero_copy_only=False)
            # our own namespaced column; still verify the encoded resolution
            if c.dtype.kind == "i" and int(gcells.res_of(c[0])) == self.index.res:
                cell = c
        feat, via_knn = self.index.assign(lon, lat, cell=cell)
        out = batch.append_column("admin_idx", pa.array(feat.astype(np.int32)))
        if self.emit_names:
            idx = pa.array(feat, type=pa.int64())
            out = out.append_column("admin_id", self._admin_pool.take(idx))
            out = out.append_column("admin1_id", self._admin1_pool.take(idx))
        out = out.append_column("via_knn", pa.array(via_knn))
        if self.weights is not None:
            from geoglue_ray.sources.weights import lookup_weight

            out = out.append_column(
                "weight", pa.array(lookup_weight(lon, lat, self.weights))
            )
        return out


def spatial_join(
    ds: rd.Dataset,
    index: AdminIndex | None = None,
    *,
    index_ref=None,
    weights_ref=None,
    emit_names: bool = True,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int | None = 32768,
) -> rd.Dataset:
    """Attach admin assignment (and optionally weights) to a corpus Dataset.

    The polygon index is broadcast via ``ray.put`` exactly once; the actor
    pool autoscales within ``concurrency``.  ``emit_names=False`` keeps the
    hot path integer-only (``admin_idx``) — names are attached after
    aggregation from the broadcast pool (narrow-shuffle principle,
    SURVEY.md §7 hard part (e)).
    """
    if index_ref is None:
        index_ref = ray.put(index)
    return ds.map_batches(
        SpatialJoiner,
        fn_constructor_args=(index_ref, weights_ref, emit_names),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        # half-CPU reservation: join actors frequently wait on upstream, and
        # full-CPU pools can starve shuffle tasks in tiny sessions (a
        # 2-CPU session with two pipelines deadlocked on 2x min-1 pools)
        num_cpus=0.5,
    )
