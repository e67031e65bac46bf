"""Ingest converters (S10/S11): zip extraction with member renames,
vartype splitting, per-file Ray fan-out; reference error contracts
(cds.py:359-414)."""

from __future__ import annotations

import zipfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geoglue_ray.pipelines.ingest import (
    ACCUM_MEMBER,
    INSTANT_MEMBER,
    VartypePaths,
    convert_files,
    extract_hourly,
    split_vartypes,
)


def _mixed_table(n: int = 48) -> pa.Table:
    return pa.table(
        {
            "valid_time": pa.array(
                np.datetime64("2020-01-06", "us") + np.arange(n) * np.timedelta64(1, "h")
            ),
            "cell_row": np.zeros(n, dtype=np.int32),
            "cell_col": np.zeros(n, dtype=np.int32),
            "variable": ["t2m" if i % 2 == 0 else "tp" for i in range(n)],
            "vartype": ["instant" if i % 2 == 0 else "accum" for i in range(n)],
            "value": np.arange(n, dtype=np.float64),
        }
    )


def test_extract_hourly_zip(tmp_path):
    t = _mixed_table()
    inst = t.filter(pa.compute.equal(t["vartype"], "instant"))
    acc = t.filter(pa.compute.equal(t["vartype"], "accum"))
    pq.write_table(inst, tmp_path / INSTANT_MEMBER)
    pq.write_table(acc, tmp_path / ACCUM_MEMBER)
    z = tmp_path / "vnm-2020-era5.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.write(tmp_path / INSTANT_MEMBER, INSTANT_MEMBER)
        zf.write(tmp_path / ACCUM_MEMBER, ACCUM_MEMBER)
    out = extract_hourly(z, tmp_path / "x")
    assert out.exists()
    assert out.instant.endswith("vnm-2020-era5.instant.parquet")
    assert pq.read_table(out.instant).equals(inst)
    assert pq.read_table(out.accum).equals(acc)
    # reference error contract: non-zip rejected
    with pytest.raises(ValueError, match="Not a valid zip"):
        extract_hourly(tmp_path / INSTANT_MEMBER, tmp_path)
    # neither member present -> error
    bad = tmp_path / "empty.zip"
    with zipfile.ZipFile(bad, "w") as zf:
        zf.writestr("other.txt", "x")
    with pytest.raises(ValueError, match="Error extracting"):
        extract_hourly(bad, tmp_path / "y")


def test_split_vartypes(tmp_path):
    t = _mixed_table()
    pq.write_table(t, tmp_path / "raw.parquet")
    out = split_vartypes(tmp_path / "raw.parquet")
    assert pq.read_table(out.instant).num_rows == 24
    assert pq.read_table(out.accum).num_rows == 24
    # instant-only source -> accum is None (CdsPath semantics)
    inst = t.filter(pa.compute.equal(t["vartype"], "instant"))
    pq.write_table(inst, tmp_path / "only.parquet")
    out2 = split_vartypes(tmp_path / "only.parquet")
    assert out2.accum is None and out2.instant is not None
    # GRIB decode falls back to an honest stub while cfgrib is absent
    (tmp_path / "x.grib").write_bytes(b"GRIB")
    with pytest.raises(NotImplementedError, match="cfgrib"):
        split_vartypes(tmp_path / "x.grib")


def test_split_grib_with_cfgrib_present(tmp_path, monkeypatch):
    """The cfgrib decode branch (cds.py:389-414): exercised via an
    injected cfgrib stand-in exposing the two API points the code uses
    (open_datasets -> objects with .attrs / .to_dataframe), since the
    sandbox has no real cfgrib.  Hypercubes are classified by
    GRIB_stepType and land in per-vartype long-form parquet."""
    import sys
    import types

    import pandas as pd

    from geoglue_ray.pipelines.ingest import split_vartypes

    class _Cube:
        def __init__(self, step, n):
            self.attrs = {"GRIB_stepType": step}
            self._df = pd.DataFrame(
                {
                    "valid_time": pd.date_range("2020-01-06", periods=n, freq="h"),
                    "latitude": np.linspace(8.25, 9.25, n),
                    "longitude": np.linspace(102.25, 103.25, n),
                    "value": np.arange(n, dtype=np.float64),
                }
            )

        def to_dataframe(self):
            return self._df

    fake = types.ModuleType("cfgrib")
    fake.open_datasets = lambda path: [_Cube("instant", 6), _Cube("accum", 4)]
    monkeypatch.setitem(sys.modules, "cfgrib", fake)

    (tmp_path / "era5.grib").write_bytes(b"GRIB")
    out = split_vartypes(tmp_path / "era5.grib")
    inst = pq.read_table(out.instant)
    acc = pq.read_table(out.accum)
    assert inst.num_rows == 6 and acc.num_rows == 4
    assert set(inst.column_names) >= {"valid_time", "latitude", "longitude", "value", "vartype"}
    assert acc["vartype"].to_pylist() == ["accum"] * 4


def test_convert_files_fanout(tmp_path):
    files = []
    for i in range(3):
        p = tmp_path / f"dl-{i}.parquet"
        pq.write_table(_mixed_table(), p)
        files.append(str(p))
    res = convert_files(files, tmp_path)
    assert len(res) == 3
    assert all(isinstance(r, VartypePaths) and r.exists() for r in res)
    assert sum(pq.read_table(r.instant).num_rows for r in res) == 72
