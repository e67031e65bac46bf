from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from geoglue_ray.stages.merge import concat_time, variable_merge


def _var_ds(name: str, n: int, offset: float) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "time_key": np.arange(n, dtype=np.int32),
                "cell": np.arange(n, dtype=np.int32) % 3,
                "value": np.arange(n, dtype=np.float64) + offset,
            }
        )
    )


def test_variable_merge_outer_join():
    a = _var_ds("t2m", 5, 100.0)
    b = _var_ds("tp", 3, 0.5)  # shorter: outer join leaves NaNs
    out = (
        variable_merge({"t2m": a, "tp": b}, keys=["time_key", "cell"])
        .to_pandas()
        .sort_values(["time_key", "cell"])
        .reset_index(drop=True)
    )
    assert len(out) == 5
    assert out.loc[0, "t2m"] == 100.0 and out.loc[0, "tp"] == 0.5
    assert np.isnan(out.loc[4, "tp"])  # missing in the shorter variable


def test_concat_time_union():
    a = _var_ds("x", 4, 0.0)
    b = _var_ds("x", 4, 10.0)
    out = concat_time([a, b])
    assert out.count() == 8


def test_write_variables_partitioned(tmp_path):
    """S12 write_variables analogue: one parquet partition per variable."""
    t = pa.table(
        {
            "variable": ["t2m"] * 3 + ["tp"] * 3,
            "value": [1.0, 2.0, 3.0, 0.1, 0.2, 0.3],
        }
    )
    rd.from_arrow(t).write_parquet(str(tmp_path / "out"), partition_cols=["variable"])
    back = rd.read_parquet(str(tmp_path / "out" / "variable=tp")).to_pandas()
    assert len(back) == 3 and set(back["value"]) == {0.1, 0.2, 0.3}
