"""jobs/zonal_job.py — the ray-job-submit entrypoint — driven in a fresh
process exactly as the Jobs runner would: first run writes all partitions,
a rerun skips every committed one, an --open-days rerun recommits just
that partition."""

from __future__ import annotations

import json
import subprocess
import sys


def _run(out_dir, extra=()):
    cmd = [
        sys.executable,
        "jobs/zonal_job.py",
        "--sf-dir",
        "/root/testdata/sf0.001",
        "--out-dir",
        str(out_dir),
        "--days",
        "18267",
        "18268",
        "18269",
        *extra,
    ]
    res = subprocess.run(
        cmd, capture_output=True, text=True, timeout=300, cwd="/root/repo"
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return json.loads(res.stdout.strip().splitlines()[-1])


def test_job_submit_resume_cycle(tmp_path):
    out = tmp_path / "zonal"
    first = _run(out)
    assert first["job"] == "zonal_daily"
    assert first["rows_written"] > 0
    assert len(first["written"]) > 0 and not first["skipped"]

    rerun = _run(out)
    assert not rerun["written"]
    assert sorted(rerun["skipped"]) == sorted(first["written"])

    reopened = _run(out, extra=["--open-days", first["written"][0]])
    assert reopened["written"] == [first["written"][0]]
    assert len(reopened["skipped"]) == len(first["written"]) - 1


def test_corpus_daily_write_one_pass(tmp_path):
    """The throughput write path (S12/S13): one pass through
    write_parquet(partition_cols=['day']) + per-day lineage manifests;
    a rerun with every day committed short-circuits to a manifest scan."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from geoglue_ray.lineage import PartitionManifest
    from geoglue_ray.pipelines.resumable import corpus_daily_write

    out = tmp_path / "corpus"
    s1 = corpus_daily_write(
        "/root/testdata/sf0.001", out, replicas=2,
        concurrency=2, derive_concurrency=1,
    )
    assert len(s1["written"]) == 30 and not s1["skipped"]
    assert s1["rows_written"] == 2 * 500

    # manifests carry rows + checksum per day and agree with the files
    man = PartitionManifest(out)
    assert len(man.done()) == 30
    for pid in man.done():
        rec = man.record(pid)
        files = sorted((out / "data" / f"day={pid}").glob("*.parquet"))
        assert [f.name for f in files] == sorted(rec["files"])
        assert rec["rows"] == sum(pq.read_metadata(f).num_rows for f in files)
        assert rec["checksum"].startswith("sha256:")

    # full read-back row count matches
    total = rd.read_parquet(str(out / "data")).count()
    assert total == s1["rows_written"]

    # rerun: full skip, nothing rewritten
    s2 = corpus_daily_write(
        "/root/testdata/sf0.001", out, replicas=2,
        concurrency=2, derive_concurrency=1,
    )
    assert not s2["written"] and len(s2["skipped"]) == 30

    # an open day forces the pass to re-run
    s3 = corpus_daily_write(
        "/root/testdata/sf0.001", out, replicas=2,
        concurrency=2, derive_concurrency=1,
        open_days={s1["written"][0]},
    )
    assert len(s3["written"]) == 30
