"""Named query pipelines — the driver-facing `queries()` implementations.

Each function takes ``sf_dir`` and returns a ``ray.data.Dataset`` whose
rows/columns match the DuckDB oracle in :mod:`geoglue_ray.oracles`
bit-exactly.  All pipelines are streaming Dataset compositions; none calls
``ray.init``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from geoglue_ray import fixtures as fx
from geoglue_ray.pipelines.zonal import DEFAULT_OPS, corpus_with_admin, zonal_pipeline
from geoglue_ray.sources.corpus import read_corpus
from geoglue_ray.stages.spatial import encode_cells, spatial_join
from geoglue_ray.stages.zonal import zonal_aggregate


def corpus_derive(sf_dir: str) -> rd.Dataset:
    """Derived interleaved corpus incl. n_spans computed from the real
    spans column (validates list<struct> construction end to end)."""
    ds = read_corpus(sf_dir, with_spans=True)

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lon": b["lon"],
                "lat": b["lat"],
                "value": b["value"],
                "event_time": b["event_time"],
                "n_spans": pc.cast(pc.list_value_length(b["spans"]), pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow").sort("doc_id")


def spatial_join_query(sf_dir: str) -> rd.Dataset:
    ds = corpus_with_admin(sf_dir)
    return ds.select_columns(["doc_id", "admin_id", "admin1_id", "via_knn"]).sort("doc_id")


def knn_outside(sf_dir: str) -> rd.Dataset:
    ds = corpus_with_admin(sf_dir)
    ds = ds.map_batches(
        lambda b: b.filter(b["via_knn"]), batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "admin_id"]).sort("doc_id")


def zonal_stats(sf_dir: str) -> rd.Dataset:
    return zonal_pipeline(sf_dir, ops=DEFAULT_OPS)


def zonal_stats_admin1(sf_dir: str) -> rd.Dataset:
    ds = corpus_with_admin(sf_dir)
    out = zonal_aggregate(ds, ["sum", "count", "min", "max"], keys=["admin1_id"])
    return out.sort("admin1_id")


class DeriveEventObservations:
    """events table -> geospatial observations keyed by event_id.

    The measure is ``floor(value)`` — integer-valued, so distributed sums
    match the serial SQL oracle exactly (see fixtures module docstring).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        lon, lat = fx.derive_lonlat(ids)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "value": pa.array(np.floor(batch["value"].to_numpy())),
            }
        )


def events_zonal(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    ds = ds.map_batches(DeriveEventObservations(), batch_format="pyarrow")
    ds = ds.map_batches(encode_cells, batch_format="pyarrow")
    import ray

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table

    index = AdminIndex.build(build_admin_table())
    ds = spatial_join(ds, index_ref=ray.put(index))
    out = zonal_aggregate(ds, ["count", "sum", "min", "max"], keys=["admin_id"])

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "admin_id": b["admin_id"],
                "count": b["count"],
                "sum_val": b["sum"],
                "min_val": b["min"],
                "max_val": b["max"],
            }
        )

    return out.map_batches(rename, batch_format="pyarrow").sort("admin_id")
