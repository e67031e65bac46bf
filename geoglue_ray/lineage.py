"""Checkpoint-resumable partitioned output with per-partition lineage.

The reference resumes at file granularity — ``skip_exists=True`` on every
producer (``resample.py:145-146``, ``cds.py:617-664``) and an always-
rewritten ``_part`` partition for the open month (``cds.py:591-610``).
The engine generalizes this (north_rule: "resumable from checkpoint with
per-partition lineage + metrics"):

- Output is a directory per partition, written to ``<name>.tmp`` and
  atomically renamed — a crash never leaves a half-written committed
  partition.
- A ``_manifest/`` directory holds one JSON lineage record per completed
  partition: inputs, row count, value checksum, code version, wall time.
- On rerun, committed partitions are skipped (``skip_exists`` semantics);
  partitions listed as *open* are always recomputed (``_part`` semantics).
- A logfmt ``metrics.log`` accumulates begin/end/elapsed lines
  (``cli.py:296-305`` style).

Each partition is produced by one Dataset pipeline (``build_ds(pid)``),
so failures re-execute only that partition's lineage.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable
from pathlib import Path

import ray.data as rd

from geoglue_ray import __version__
from geoglue_ray.functions.logfmt import logfmt_line


def sha256_file(path: str | Path, prefix: bool = True) -> str:
    """Streaming file checksum (``util.py:120-141``)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return ("sha256:" if prefix else "") + h.hexdigest()


class PartitionManifest:
    """Per-partition lineage records under ``out_dir/_manifest``."""

    def __init__(self, out_dir: str | Path):
        self.dir = Path(out_dir) / "_manifest"
        self.dir.mkdir(parents=True, exist_ok=True)

    def done(self) -> set[str]:
        return {p.stem for p in self.dir.glob("*.json")}

    def record(self, pid: str) -> dict | None:
        p = self.dir / f"{pid}.json"
        return json.loads(p.read_text()) if p.exists() else None

    def commit(self, pid: str, lineage: dict) -> None:
        tmp = self.dir / f"{pid}.json.tmp"
        tmp.write_text(json.dumps(lineage, sort_keys=True))
        os.replace(tmp, self.dir / f"{pid}.json")

    def invalidate(self, pid: str) -> None:
        (self.dir / f"{pid}.json").unlink(missing_ok=True)


def resumable_write(
    partitions: list[str],
    build_ds: Callable[[str], rd.Dataset],
    out_dir: str | Path,
    open_partitions: set[str] | frozenset[str] = frozenset(),
    inputs: Callable[[str], list[str]] | None = None,
) -> dict:
    """Write one parquet directory per partition, resumably.

    Committed partitions are skipped; ``open_partitions`` (the reference's
    ``_part`` month) are recomputed and re-committed every run.  Returns a
    summary dict {written, skipped, rows_written}.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest = PartitionManifest(out)
    metrics = out / "metrics.log"
    done = manifest.done()
    written, skipped, rows_total = [], [], 0

    with open(metrics, "a") as mf:
        for pid in partitions:
            pdir = out / f"part={pid}"
            if pid in done and pid not in open_partitions and pdir.exists():
                skipped.append(pid)
                continue
            t0 = time.time()
            mf.write(logfmt_line(event="begin", partition=pid, ts=t0) + "\n")
            tmp = out / f"part={pid}.tmp"
            if tmp.exists():
                shutil.rmtree(tmp)
            ds = build_ds(pid)
            ds.write_parquet(str(tmp))
            # lineage: rows + content checksum over the partition's files
            files = sorted(Path(tmp).glob("*.parquet"))
            import pyarrow.parquet as pq

            rows = sum(pq.read_metadata(f).num_rows for f in files)
            checksum = hashlib.sha256()
            for f in files:
                checksum.update(sha256_file(f, prefix=False).encode())
            if pdir.exists():
                shutil.rmtree(pdir)
            os.replace(tmp, pdir)
            elapsed = time.time() - t0
            manifest.commit(
                pid,
                {
                    "partition": pid,
                    "rows": rows,
                    "files": [f.name for f in files],
                    "checksum": "sha256:" + checksum.hexdigest(),
                    "inputs": inputs(pid) if inputs else [],
                    "code_version": __version__,
                    "elapsed_s": round(elapsed, 4),
                    "open": pid in open_partitions,
                },
            )
            mf.write(
                logfmt_line(
                    event="end", partition=pid, rows=rows, elapsed=elapsed
                )
                + "\n"
            )
            rows_total += rows
            written.append(pid)
    return {"written": written, "skipped": skipped, "rows_written": rows_total}


def read_resumable(out_dir: str | Path, columns: list[str] | None = None) -> rd.Dataset:
    """Read back only committed partitions (manifest-gated)."""
    out = Path(out_dir)
    manifest = PartitionManifest(out)
    paths = [
        str(out / f"part={pid}" / fname)
        for pid in sorted(manifest.done())
        for fname in manifest.record(pid)["files"]
    ]
    return rd.read_parquet(paths, columns=columns)
