"""Checkpoint-resumable flagship run: zonal stats partitioned by day.

The production shape of the engine (north_rule): corpus -> spatial join ->
zonal aggregates keyed (admin, day), written one partition per day with
per-partition lineage and logfmt metrics; a rerun skips committed days and
recomputes only the declared open partitions (the reference's ``_part``
current-month semantics, ``cds.py:591-610``).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import ray
import ray.data as rd

from geoglue_ray.lineage import resumable_write
from geoglue_ray.pipelines.zonal import corpus_with_admin
from geoglue_ray.stages.timeagg import add_time_key, key_to_timestamp
from geoglue_ray.stages.zonal import zonal_aggregate


def zonal_daily_resumable(
    sf_dir: str,
    out_dir: str | Path,
    days: list[str] | None = None,
    open_days: set[str] = frozenset(),
    replicas: int = 1,
    concurrency=(1, 8),
) -> dict:
    """Write per-day zonal aggregates resumably; returns the write summary.

    Each partition's Dataset filters the corpus to its day before the
    aggregate — at a real deployment the corpus read is day-partitioned so
    this filter is partition pruning, not a scan.
    """

    def build(pid: str) -> rd.Dataset:
        ds = corpus_with_admin(
            sf_dir, replicas=replicas, with_spans=False,
            concurrency=concurrency, emit_names=False,
        )
        ds = add_time_key(ds, "D")
        day = int(pid)

        def keep(b: pa.Table) -> pa.Table:
            return b.filter(pa.compute.equal(b["time_key"], day))

        part = ds.map_batches(keep, batch_format="pyarrow")
        agg = zonal_aggregate(
            part, ["count", "sum", "mean"], keys=["admin_idx", "time_key"]
        )
        return key_to_timestamp(agg)

    if days is None:
        # derive the represented day range from the fixture clock (T0 + 30d)
        from geoglue_ray import fixtures as fx
        import numpy as np

        d0 = fx.T0.astype("datetime64[D]").astype(np.int64)
        base_days = [str(int(d0 + i)) for i in range(fx.N_HOURS // 24)]
    else:
        base_days = list(days)  # [] is a valid no-op

    return resumable_write(
        base_days, build, out_dir, open_partitions=set(open_days),
        inputs=lambda pid: [f"{sf_dir}/documents.parquet"],
    )
