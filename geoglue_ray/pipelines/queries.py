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


def daily_admin1(sf_dir: str) -> rd.Dataset:
    """Corpus -> daily counts/sums per admin-1 (hierarchy roll-up)."""
    from geoglue_ray.stages.timeagg import add_time_key, key_to_timestamp

    ds = corpus_with_admin(sf_dir, emit_names=False)

    def a1(b: pa.Table) -> pa.Table:
        idx = b["admin_idx"].to_numpy().astype(np.int64)
        return b.append_column("a1_idx", pa.array(fx.admin1_of(idx).astype(np.int32)))

    ds = add_time_key(ds.map_batches(a1, batch_format="pyarrow"), "D")
    out = zonal_aggregate(ds, ["count", "sum"], keys=["a1_idx", "time_key"])
    out = key_to_timestamp(out)
    pool = pa.array(np.char.mod("ADM1-%02d", np.arange(fx.NX1 * fx.NY1)).tolist())

    def project(b: pa.Table) -> pa.Table:
        idx = pa.compute.cast(b["a1_idx"], "int64")
        return pa.table(
            {
                "admin1_id": pool.take(idx),
                "day": b["time_key"],
                "count": b["count"],
                "sum": b["sum"],
            }
        )

    return out.map_batches(project, batch_format="pyarrow").sort(["admin1_id", "day"])


def weekly_events(sf_dir: str) -> rd.Dataset:
    """events -> (event_type, W-MON week): count + sum(floor(value))."""
    from geoglue_ray.stages.timeagg import add_time_key, key_to_timestamp

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "ts": b["ts"],
                "value": pa.array(np.floor(b["value"].to_numpy())),
            }
        )

    ds = add_time_key(ds.map_batches(prep, batch_format="pyarrow"), "W-MON", time_col="ts")
    out = zonal_aggregate(ds, ["count", "sum"], keys=["event_type", "time_key"])
    out = key_to_timestamp(out)

    def rename(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("time_key")
        return b.set_column(i, "week", b["time_key"])

    return out.map_batches(rename, batch_format="pyarrow").sort(["event_type", "week"])


def timeshift_local_daily(sf_dir: str) -> rd.Dataset:
    """Corpus shifted UTC->+07:00 with the instant/accum off-by-one
    (``cds.py:298-356``), then daily counts/sums per vartype."""
    from geoglue_ray.stages.timeagg import add_time_key, key_to_timestamp, timeshift_hours

    ds = read_corpus(sf_dir, with_spans=False)

    def vt(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        return b.append_column("vt_code", pa.array((ids % 2).astype(np.int8)))

    ds = ds.map_batches(vt, batch_format="pyarrow")
    pool = pa.array(["instant", "accum"])

    def vt_name(b: pa.Table) -> pa.Table:
        return b.append_column("vartype", pool.take(pa.compute.cast(b["vt_code"], "int64")))

    ds = ds.map_batches(vt_name, batch_format="pyarrow")
    ds = timeshift_hours(ds, 7, vartype_col="vartype")
    ds = add_time_key(ds, "D")
    out = zonal_aggregate(ds, ["count", "sum"], keys=["vt_code", "time_key"])
    out = key_to_timestamp(out)

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vartype": pool.take(pa.compute.cast(b["vt_code"], "int64")),
                "local_day": b["time_key"],
                "count": b["count"],
                "sum": b["sum"],
            }
        )

    return out.map_batches(project, batch_format="pyarrow").sort(["vartype", "local_day"])


def hourly_check(sf_dir: str) -> rd.Dataset:
    """Distinct observation hours per day (``cds.py:53-55`` invariant)."""
    from geoglue_ray.stages.timeagg import key_to_timestamp
    from geoglue_ray.stages.validate import count_distinct

    ds = read_corpus(sf_dir, with_spans=False)

    def keys(b: pa.Table) -> pa.Table:
        ts = b["event_time"].to_numpy()
        day = ts.astype("datetime64[D]").astype(np.int32)
        hour = (ts.astype("datetime64[h]").astype(np.int64) % 24).astype(np.int32)
        return pa.table({"time_key": day, "hour": hour})

    out = count_distinct(
        ds.map_batches(keys, batch_format="pyarrow"), ["time_key"], ["hour"], "n_hours"
    )
    out = key_to_timestamp(out)

    def rename(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("time_key")
        return b.set_column(i, "day", b["time_key"])

    return out.map_batches(rename, batch_format="pyarrow").sort("day")


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
