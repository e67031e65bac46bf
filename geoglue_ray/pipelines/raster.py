"""Raster pipelines: daily reduce, zonal aggregation, weekly zonal covariates.

The engine's equivalents of the reference's raster lifecycle
(``cds.py:933-1016`` ``weekly_reduce``; ``cds.py:140-153`` daily;
``zonalstats.py:71-100`` zonal) over the long-form raster table:

- per-vartype reducers: instant -> mean, accum -> sum (``cds.py:972-986``)
- weekly accum = weekly mean of daily sums, computed exactly as
  ``sum / (count/24)`` under the hourly-completeness invariant the
  reference asserts (``cds.py:53-55``) — a single division over exact
  integer partials, so distributed execution matches serial SQL bit-exactly
- raster -> vector: cell centers spatial-joined to admin polygons through
  the same GGrid/PIP actor pool as the document corpus
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from geoglue_ray.sources.admin import AdminIndex, build_admin_table
from geoglue_ray.sources.raster import VARS, read_raster
from geoglue_ray.stages.spatial import encode_cells, spatial_join
from geoglue_ray.stages.timeagg import add_time_key, key_to_timestamp
from geoglue_ray.stages.zonal import zonal_aggregate

_VAR_NAMES = pa.array([v[0] for v in VARS])
_VAR_IS_ACCUM = np.array([v[1] == "accum" for v in VARS])


def _add_var_code(batch: pa.Table) -> pa.Table:
    """variable/vartype strings -> int8 var_code for the int-key fast path."""
    var = np.asarray(batch["variable"])
    code = np.full(len(var), -1, dtype=np.int8)
    for i, (name, _, _) in enumerate(VARS):
        code[var == name] = i
    return batch.append_column("var_code", pa.array(code))


def _lonlat_alias(batch: pa.Table) -> pa.Table:
    out = batch.append_column("lon", batch["longitude"])
    return out.append_column("lat", batch["latitude"])


def _attach_var(batch: pa.Table, drop: str = "var_code") -> pa.Table:
    code = pa.compute.cast(batch[drop], "int64")
    batch = batch.drop_columns([drop])
    return batch.add_column(0, "variable", _VAR_NAMES.take(code))


def _vartype_stat(batch: pa.Table, weekly: bool) -> pa.Table:
    """stat = mean for instant vars; sum (daily) or sum/(cnt/24) (weekly
    mean-of-daily-sums) for accum vars."""
    code = batch["var_code"].to_numpy()
    s = batch["sum"].to_numpy()
    c = batch["count"].to_numpy()
    accum = _VAR_IS_ACCUM[code]
    with np.errstate(divide="ignore", invalid="ignore"):
        stat = np.where(accum, s / (c / 24.0) if weekly else s, s / c)
    return batch.append_column("stat", pa.array(stat))


def raster_daily(n_days: int | None = None) -> rd.Dataset:
    """Hourly -> daily per (variable, cell): instant mean / accum sum."""
    ds = read_raster(**({"n_days": n_days} if n_days else {}))
    ds = ds.map_batches(_add_var_code, batch_format="pyarrow")
    ds = add_time_key(ds, "D", time_col="valid_time")
    agg = zonal_aggregate(
        ds,
        ["sum", "count"],
        keys=["var_code", "cell_row", "cell_col", "time_key"],
        skip_nulls=True,
    )
    agg = agg.map_batches(lambda b: _vartype_stat(b, weekly=False), batch_format="pyarrow")
    agg = key_to_timestamp(agg)

    def project(b: pa.Table) -> pa.Table:
        b = _attach_var(b)
        return b.select(["variable", "cell_row", "cell_col", "time_key", "stat"]).rename_columns(
            ["variable", "cell_row", "cell_col", "day", "stat"]
        )

    return agg.map_batches(project, batch_format="pyarrow").sort(
        ["variable", "cell_row", "cell_col", "day"]
    )


def _raster_with_admin(concurrency: int | None = None) -> rd.Dataset:
    # library default: AUTOSCALING pool capped to the session's CPUs —
    # a fixed pool can deadlock small sessions (two fixed pools once
    # consumed all 4 test CPUs leaving no task slots); throughput-tuned
    # fixed pools live in bench.py, which owns its session
    from geoglue_ray.runtime import pool_size

    concurrency = concurrency or (1, pool_size(8, reserve=2))
    ds = read_raster()
    ds = ds.map_batches(_add_var_code, batch_format="pyarrow")
    ds = ds.map_batches(_lonlat_alias, batch_format="pyarrow")
    ds = ds.map_batches(encode_cells, batch_format="pyarrow")
    index = AdminIndex.build(build_admin_table())
    return spatial_join(
        ds, index_ref=ray.put(index), emit_names=False, concurrency=concurrency
    )


def raster_zonal() -> rd.Dataset:
    """Whole-period zonal stats per (admin, variable) — the reference's core
    zonal output shape (``zonalstats.py:92-100``) from the raster table."""
    ds = _raster_with_admin()
    agg = zonal_aggregate(
        ds, ["count", "sum", "mean"], keys=["admin_idx", "var_code"], skip_nulls=True
    )
    names = build_admin_table()["admin_id"].combine_chunks()

    def project(b: pa.Table) -> pa.Table:
        b = _attach_var(b)
        idx = pa.compute.cast(b["admin_idx"], "int64")
        b = b.drop_columns(["admin_idx"])
        return b.add_column(0, "admin_id", names.take(idx))

    return agg.map_batches(project, batch_format="pyarrow").sort(["admin_id", "variable"])


def raster_zonal_majority() -> rd.Dataset:
    """Categorical zonal statistics — land-cover-style majority /
    minority / variety per admin-2 of the hour-0 t2m CLASS field
    (``class = int(value) // 16``): raster cells become points, assign
    through the same broadcast PIP pool as every zonal path (kNN for the
    east-of-bbox column), then the majority_minority histogram pipeline
    (smallest-class tie-break, bit-exact vs the row_number twin)."""
    from geoglue_ray import fixtures as fx
    from geoglue_ray.runtime import pool_size
    from geoglue_ray.stages.sketch import majority_minority

    t0 = pa.scalar(np.datetime64(fx.T0, "us"), pa.timestamp("us"))
    t2m = pa.scalar("t2m")

    def slice_cls(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(
            pc.and_(pc.equal(b["valid_time"], t0), pc.equal(b["variable"], t2m))
        )
        v = b["value"].to_numpy(zero_copy_only=False)
        fin = np.isfinite(v)
        cls = np.where(fin, v, 0.0).astype(np.int64) // 16
        return pa.table(
            {
                "lon": b["longitude"],
                "lat": b["latitude"],
                "cls": pa.array(cls),
            }
        ).filter(pa.array(fin))

    ds = read_raster(n_days=1)
    ds = ds.map_batches(slice_cls, batch_format="pyarrow")
    ds = ds.map_batches(encode_cells, batch_format="pyarrow")
    index = AdminIndex.build(build_admin_table())
    ds = spatial_join(
        ds,
        index_ref=ray.put(index),
        emit_names=True,
        concurrency=(1, pool_size(4, reserve=2)),
    )
    ds = ds.select_columns(["admin_id", "cls"])
    out = majority_minority(ds, "admin_id", "cls")

    def cast_cls(b: pa.Table) -> pa.Table:
        # _hist_pipeline carries values as float64 (uint64-view bucketing);
        # the class labels are small exact integers, and the SQL twin's
        # `CAST(value AS BIGINT) // 16` is BIGINT — cast the projection
        # explicitly (driver value-hash is dtype-KIND-sensitive).
        for col in ("majority_val", "minority_val"):
            i = b.schema.get_field_index(col)
            b = b.set_column(i, col, pa.compute.cast(b[col], pa.int64()))
        return b

    return out.map_batches(cast_cls, batch_format="pyarrow").sort("admin_id")


def raster_weekly_zonal() -> rd.Dataset:
    """Weekly zonal covariates per (admin, variable, week) — the engine's
    ``DatasetPool.weekly_reduce`` + zonalstats composition (A4 + A1)."""
    ds = _raster_with_admin()
    ds = add_time_key(ds, "W-MON", time_col="valid_time")
    agg = zonal_aggregate(
        ds,
        ["sum", "count"],
        keys=["admin_idx", "var_code", "time_key"],
        skip_nulls=True,
    )
    agg = agg.map_batches(lambda b: _vartype_stat(b, weekly=True), batch_format="pyarrow")
    agg = key_to_timestamp(agg)
    names = build_admin_table()["admin_id"].combine_chunks()

    def project(b: pa.Table) -> pa.Table:
        b = _attach_var(b)
        idx = pa.compute.cast(b["admin_idx"], "int64")
        b = b.drop_columns(["admin_idx"])
        b = b.add_column(0, "admin_id", names.take(idx))
        return b.select(["admin_id", "variable", "time_key", "stat"]).rename_columns(
            ["admin_id", "variable", "week", "stat"]
        )

    return agg.map_batches(project, batch_format="pyarrow").sort(
        ["admin_id", "variable", "week"]
    )


COVERAGE_OPS = {
    # exactextract op strings as the reference's CLI accepts them
    # (cli.py:269-274; zonalstats goldens tests/test_zonalstats.py:57-72);
    # aliases keep output column names SQL-friendly
    "count": "count(default_value=0)",
    "sum": "sum(default_value=0)",
    "mean": "mean(default_value=0)",
    "weighted_sum": "weighted_sum(default_value=0,default_weight=0)",
    "weighted_mean": "weighted_mean(default_value=0,default_weight=0)",
    "area_weighted_sum": "area_weighted_sum(default_value=0,default_weight=0)",
}


def zonal_coverage(broadcast_pairs_below: int = 10_000_000) -> rd.Dataset:
    """Coverage-fraction zonal statistics — exactextract's defining
    semantic (``zonalstats.py:44-62``): every raster cell contributes to
    every overlapping admin polygon by the *fraction* of the cell the
    polygon covers (boundary cells split pro-rata, not 100%/0%), with
    NODATA handled by ``default_value=0``/``default_weight=0``.

    ``broadcast_pairs_below`` selects the coverage-attach topology
    (broadcast CSR lookup vs distributed cell-key hash join — see
    :func:`geoglue_ray.stages.coverage.attach_coverage`); results are
    bit-identical through both paths (tested).

    Scale shape: coverage and the weight raster are TIME-INVARIANT, so
    the per-cell time series collapses FIRST (partial/final groupby on
    (cell, variable): exact integer sums) and only then fans out through
    the broadcast (cell, admin, fraction) lookup — the explode touches
    cells, not cell-hours, shrinking the exploded volume by the number of
    time slices (720 here).  The factorization is exact:
    Σ_{cell,t} cov·w·v  =  Σ_cell cov·w·(Σ_t v), every term a dyadic
    rational, so the result stays bit-identical to the per-cell-hour
    DuckDB oracle.
    """
    from geoglue_ray import fixtures as fx
    from geoglue_ray.runtime import pool_size
    from geoglue_ray.sources.raster import raster_grid_spec
    from geoglue_ray.stages.coverage import attach_coverage

    ds = read_raster()
    ds = ds.map_batches(_add_var_code, batch_format="pyarrow")
    # per-(cell, variable) collapse over time; default_value=0 fills the
    # NODATA holes BEFORE the sum (exactextract default semantics)
    cell = zonal_aggregate(
        ds,
        ["sum(default_value=0)", "count(default_value=0)"],
        keys=["cell_row", "cell_col", "var_code"],
    )

    def add_cell_attrs(b: pa.Table) -> pa.Table:
        grid = raster_grid_spec()
        lon = grid.xfirst + b["cell_col"].to_numpy().astype(np.float64) * grid.xinc
        lat = grid.yfirst + b["cell_row"].to_numpy().astype(np.float64) * grid.yinc
        return pa.table(
            {
                "cell_row": b["cell_row"],
                "cell_col": b["cell_col"],
                "var_code": b["var_code"],
                "v_sum": b["sum(default_value=0)"],
                "v_cnt": b["count(default_value=0)"],
                "weight": pa.array(fx.derive_weight(lon, lat)),
            }
        )

    cell = cell.map_batches(add_cell_attrs, batch_format="pyarrow")
    grid = raster_grid_spec()
    index = AdminIndex.build(build_admin_table())
    exploded = attach_coverage(
        cell,
        ray.put(index),
        grid,
        broadcast_pairs_below=broadcast_pairs_below,
        attach_concurrency=(1, pool_size(4, reserve=2)),
    )

    def partial(b: pa.Table) -> pa.Table:
        """Per-batch partial of the four sufficient sums (all exact):
        cnt = Σcov·n_t, sum = Σcov·Σv, wsum = Σcov·w·Σv, wcnt = Σcov·w·n_t."""
        cov_a = b["cov"].to_numpy()
        w = b["weight"].to_numpy()
        vs = b["v_sum"].to_numpy()
        vc = b["v_cnt"].to_numpy()
        key = (
            b["admin_idx"].to_numpy().astype(np.int64) * 8
            + b["var_code"].to_numpy().astype(np.int64)
        )
        uniq, inv = np.unique(key, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(len(uniq)))
        red = lambda x: np.add.reduceat(x[order], starts)  # noqa: E731
        return pa.table(
            {
                "k": pa.array(uniq),
                "cnt": pa.array(red(cov_a * vc)),
                "sum": pa.array(red(cov_a * vs)),
                "wsum": pa.array(red(cov_a * w * vs)),
                "wcnt": pa.array(red(cov_a * w * vc)),
            }
        )

    from ray.data.aggregate import Sum

    merged = (
        exploded.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(*[Sum(c, alias_name=c) for c in ["cnt", "sum", "wsum", "wcnt"]])
    )
    names = build_admin_table()["admin_id"].combine_chunks()

    def finalize(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy()
        cnt = b["cnt"].to_numpy()
        s = b["sum"].to_numpy()
        wsum = b["wsum"].to_numpy()
        wcnt = b["wcnt"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            return pa.table(
                {
                    "admin_id": names.take(pa.array(k // 8)),
                    "variable": _VAR_NAMES.take(pa.array(k % 8)),
                    "count": pa.array(cnt),
                    "sum": pa.array(s),
                    "mean": pa.array(s / cnt),
                    "weighted_sum": pa.array(wsum),
                    "weighted_mean": pa.array(wsum / wcnt),
                    "area_weighted_sum": pa.array(wsum / cnt),
                }
            )

    return merged.map_batches(finalize, batch_format="pyarrow").sort(
        ["admin_id", "variable"]
    )


def weekly_variation() -> rd.Dataset:
    """Per-(variable, week) variation ACROSS regions — the reference's
    per-slice ``stats`` (``validate.py:46-74``: stats over the region dim
    for each non-region index).  Ops restricted to count/min/max, which are
    order-independent and therefore exact under distributed execution
    (a cross-region mean of non-integer stats would be rounding-order
    dependent)."""
    weekly = raster_weekly_zonal()
    agg = zonal_aggregate(
        weekly, ["count", "min", "max"], keys=["variable", "week"], value_col="stat"
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "variable": b["variable"],
                "week": b["week"],
                "n_regions": b["count"],
                "stat_min": b["min"],
                "stat_max": b["max"],
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort(["variable", "week"])


def raster_stats() -> rd.Dataset:
    """Global per-variable stats (``validate.py:37-43`` ``minimal_stats``)."""
    ds = read_raster().map_batches(_add_var_code, batch_format="pyarrow")
    agg = zonal_aggregate(
        ds, ["count", "mean", "min", "max"], keys=["var_code"], skip_nulls=True
    )
    return agg.map_batches(_attach_var, batch_format="pyarrow").sort("variable")
