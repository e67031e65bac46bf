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


def corpus_daily_write(
    sf_dir: str,
    out_dir: str | Path,
    replicas: int = 1,
    concurrency=(1, 8),
    derive_concurrency=None,
    open_days: set[str] = frozenset(),
) -> dict:
    """ONE-PASS day-partitioned write of the derived curated corpus —
    the THROUGHPUT shape of S12/S13 (``write_parquet(partition_cols)``
    + per-partition lineage manifests), complementing
    :func:`zonal_daily_resumable` (which re-executes one pipeline per
    partition — right when partitions are expensive and fail
    independently, wrong when the corpus derive dominates: 30 day
    partitions would re-derive the corpus 30x).

    Here the whole derived corpus streams through Ray's partitioned
    parquet write ONCE (workers hash rows to ``day=*`` directories as
    they go — no driver materialization, no extra shuffle), then the
    driver commits one lineage record per written day directory (rows,
    files, content checksum, code version).  Resume is whole-pass: if
    every day is committed and none is open, the pass short-circuits
    (rerun cost = one manifest scan); a partial/dirty output re-runs the
    single pass (atomic at the pass level, not the day level — use
    zonal_daily_resumable for per-day crash granularity).
    """
    import time as _time

    import numpy as np
    import pyarrow.parquet as pq

    from geoglue_ray import fixtures as fx
    from geoglue_ray.lineage import PartitionManifest, sha256_file
    from geoglue_ray import __version__
    from geoglue_ray.functions.logfmt import logfmt_line

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    # data under out/data so the overwrite-mode write never touches the
    # manifest/metrics siblings
    data = out / "data"
    manifest = PartitionManifest(out)
    d0 = fx.T0.astype("datetime64[D]").astype(np.int64)
    days = [str(int(d0 + i)) for i in range(fx.N_HOURS // 24)]
    done = manifest.done()
    if all(d in done and (data / f"day={d}").exists() for d in days) and not (
        set(open_days) & set(days)
    ):
        return {"written": [], "skipped": days, "rows_written": 0}

    t0 = _time.time()
    ds = corpus_with_admin(
        sf_dir, replicas=replicas, with_spans=False,
        concurrency=concurrency, emit_names=False,
        # two concurrent FIXED pools must SUM within the session's CPUs
        # (round-4 lesson) — callers size derive:join like bench's 1/3:2/3
        derive_concurrency=derive_concurrency,
    )
    ds = add_time_key(ds, "D")

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "admin_idx": b["admin_idx"],
                "value": b["value"],
                "day": b["time_key"],
            }
        )

    for d in days:
        manifest.invalidate(d)
    ds.map_batches(project, batch_format="pyarrow").write_parquet(
        str(data), partition_cols=["day"], mode="overwrite"
    )
    elapsed = _time.time() - t0
    written, rows_total = [], 0
    with open(out / "metrics.log", "a") as mf:
        for d in sorted(p.name.split("=", 1)[1] for p in data.glob("day=*")):
            pdir = data / f"day={d}"
            files = sorted(pdir.glob("*.parquet"))
            rows = sum(pq.read_metadata(f).num_rows for f in files)
            import hashlib

            checksum = hashlib.sha256()
            for f in files:
                checksum.update(sha256_file(f, prefix=False).encode())
            manifest.commit(
                d,
                {
                    "partition": d,
                    "rows": rows,
                    "files": [f.name for f in files],
                    "checksum": "sha256:" + checksum.hexdigest(),
                    "inputs": [f"{sf_dir}/documents.parquet"],
                    "code_version": __version__,
                    "elapsed_s": round(elapsed, 4),
                    "open": d in open_days,
                },
            )
            mf.write(
                logfmt_line(event="end", partition=d, rows=rows, elapsed=elapsed)
                + "\n"
            )
            rows_total += rows
            written.append(d)
    return {"written": written, "skipped": [], "rows_written": rows_total}
