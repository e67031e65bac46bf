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
