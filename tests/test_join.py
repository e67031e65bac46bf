from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from geoglue_ray.stages.join import asof_join


def _ts(vals):
    return pa.array(np.array(vals, dtype="datetime64[us]"), type=pa.timestamp("us"))


def test_asof_join_backward_semantics():
    left = rd.from_arrow(
        pa.table(
            {
                "k": [1, 1, 1, 2],
                "lt": _ts(["2020-01-01T05", "2020-01-01T10", "2020-01-01T00", "2020-01-01T05"]),
                "ev": [10, 11, 12, 13],
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": [1, 1, 2],
                "rt": _ts(["2020-01-01T02", "2020-01-01T08", "2020-01-01T06"]),
                "obs": [1.0, 2.0, 3.0],
            }
        )
    )
    out = (
        asof_join(left, right, key="k", left_ts="lt", right_ts="rt", right_cols=["obs"])
        .to_pandas()
        .sort_values("ev")
        .reset_index(drop=True)
    )
    # ev=10 (05:00) -> 02:00 obs=1; ev=11 (10:00) -> 08:00 obs=2;
    # ev=12 (00:00) -> no match (dropped); ev=13 key 2 (05:00) < 06:00 -> dropped
    assert out["ev"].tolist() == [10, 11]
    assert out["obs"].tolist() == [1.0, 2.0]


def test_asof_join_rejects_right_ties():
    left = rd.from_arrow(pa.table({"k": [1], "lt": _ts(["2020-01-02"]), "ev": [1]}))
    right = rd.from_arrow(
        pa.table({"k": [1, 1], "rt": _ts(["2020-01-01", "2020-01-01"]), "obs": [1.0, 2.0]})
    )
    with pytest.raises(Exception):  # surfaced through Ray as a task error
        asof_join(
            left, right, key="k", left_ts="lt", right_ts="rt", right_cols=["obs"]
        ).to_pandas()
