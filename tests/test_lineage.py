"""Checkpoint/resume, lineage manifests, logfmt metrics."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest
import ray.data as rd

from geoglue_ray.functions.logfmt import logfmt_escape, logfmt_line, parse_logfmt
from geoglue_ray.lineage import PartitionManifest, read_resumable, resumable_write


def test_logfmt_roundtrip():
    line = logfmt_line(event="end", msg='has "quotes" and spaces', n=3, ok=True, f=1.5)
    d = parse_logfmt(line)
    assert d == {"event": "end", "msg": 'has "quotes" and spaces', "n": "3", "ok": "true", "f": "1.5"}
    assert logfmt_escape("plain") == "plain"
    assert logfmt_escape("") == '""'


def _build(calls):
    def build_ds(pid: str) -> rd.Dataset:
        calls.append(pid)
        n = 10 * (int(pid) + 1)
        return rd.from_arrow(
            pa.table({"part": [pid] * n, "x": list(range(n))})
        )

    return build_ds


def test_resumable_write_and_skip(tmp_path):
    out = tmp_path / "zout"
    parts = [str(i) for i in range(4)]
    calls: list[str] = []
    res1 = resumable_write(parts, _build(calls), out)
    assert res1["written"] == parts and not res1["skipped"]
    assert sorted(calls) == parts

    # rerun: everything committed -> nothing recomputed
    calls2: list[str] = []
    res2 = resumable_write(parts, _build(calls2), out)
    assert res2["skipped"] == parts and not calls2

    # read back only committed partitions
    total = read_resumable(out).count()
    assert total == 10 + 20 + 30 + 40

    # lineage records carry rows/checksum/version
    man = PartitionManifest(out)
    rec = man.record("2")
    assert rec["rows"] == 30
    assert rec["checksum"].startswith("sha256:")
    assert rec["code_version"]


def test_resume_after_partial_failure(tmp_path):
    out = tmp_path / "zout"
    parts = [str(i) for i in range(4)]

    boom: list[str] = []

    def flaky(pid: str) -> rd.Dataset:
        if pid == "2" and not boom:
            boom.append(pid)
            raise RuntimeError("simulated crash")
        return _build([])(pid)

    with pytest.raises(RuntimeError):
        resumable_write(parts, flaky, out)
    man = PartitionManifest(out)
    assert man.done() == {"0", "1"}  # partitions before the crash committed
    # no half-written committed dir for the crashed partition
    assert not (out / "part=2").exists()

    # resume: only 2 and 3 run
    calls: list[str] = []
    res = resumable_write(parts, _build(calls), out)
    assert sorted(calls) == ["2", "3"]
    assert res["skipped"] == ["0", "1"]
    assert read_resumable(out).count() == 100


def test_open_partition_always_recomputed(tmp_path):
    """The reference re-downloads the current month's `_part` chunk every
    run (cds.py:591-610); open partitions mirror that."""
    out = tmp_path / "zout"
    parts = ["0", "1"]
    resumable_write(parts, _build([]), out)
    calls: list[str] = []
    res = resumable_write(parts, _build(calls), out, open_partitions={"1"})
    assert calls == ["1"] and res["skipped"] == ["0"]
    rec = json.loads((out / "_manifest" / "1.json").read_text())
    assert rec["open"] is True


def test_metrics_log_lines(tmp_path):
    out = tmp_path / "zout"
    resumable_write(["0"], _build([]), out)
    lines = (out / "metrics.log").read_text().strip().splitlines()
    events = [parse_logfmt(ln)["event"] for ln in lines]
    assert events == ["begin", "end"]
    assert parse_logfmt(lines[1])["rows"] == "10"
