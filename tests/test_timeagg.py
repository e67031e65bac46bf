from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from geoglue_ray.stages.timeagg import (
    day_number,
    first_monday,
    last_sunday,
    timeshift_hours,
    week_start_number,
)


def test_first_monday_last_sunday():
    # golden ISO-week boundaries (util.py:106-117 semantics)
    assert first_monday(2020) == np.datetime64("2020-01-06")
    assert first_monday(2024) == np.datetime64("2024-01-01")  # Jan 1 2024 is Monday
    assert last_sunday(2020) == np.datetime64("2020-12-27")
    assert last_sunday(2023) == np.datetime64("2023-12-31")


def test_week_start_is_monday():
    ts = (
        np.datetime64("2024-01-01T00:00:00", "us")
        + np.arange(0, 40 * 24, 7).astype("timedelta64[h]")
    )
    wk = week_start_number(ts).astype("datetime64[D]")
    # every week start is a Monday ((day + 3) % 7 == 0)
    assert ((wk.astype(np.int64) + 3) % 7 == 0).all()
    # and never after the timestamp
    assert (wk.astype("datetime64[us]") <= ts).all()
    assert ((ts - wk.astype("datetime64[us]")).astype("timedelta64[D]").astype(int) < 7).all()


def test_day_number_roundtrip():
    ts = np.array(["2020-01-06T13:00:00", "2020-02-01T23:59:59"], dtype="datetime64[us]")
    d = day_number(ts)
    assert list(d.astype("datetime64[D]").astype(str)) == ["2020-01-06", "2020-02-01"]


def test_timeshift_instant_accum_offset():
    t = pa.table(
        {
            "event_time": pa.array(
                np.array(["2020-01-06T00:00:00"] * 2, dtype="datetime64[us]"),
                type=pa.timestamp("us"),
            ),
            "vartype": ["instant", "accum"],
        }
    )
    ds = timeshift_hours(rd.from_arrow(t), 7, vartype_col="vartype")
    out = ds.to_pandas()
    # instant shifts by h, accum by h-1 (cds.py:308-315)
    assert str(out["event_time"][0]) == "2020-01-06 07:00:00"
    assert str(out["event_time"][1]) == "2020-01-06 06:00:00"


def test_timeshift_range_validation():
    import pytest

    t = pa.table({"event_time": pa.array([0], type=pa.timestamp("us"))})
    with pytest.raises(ValueError):
        timeshift_hours(rd.from_arrow(t), 13)


def test_assert_hourly():
    from geoglue_ray.stages.validate import assert_hourly

    full = np.datetime64("2020-01-06T00", "us") + np.arange(48).astype("timedelta64[h]")
    ds = rd.from_arrow(pa.table({"valid_time": pa.array(full, type=pa.timestamp("us"))}))
    assert assert_hourly(ds)
    holey = full[:-1]  # last day missing hour 23
    ds2 = rd.from_arrow(pa.table({"valid_time": pa.array(holey, type=pa.timestamp("us"))}))
    assert not assert_hourly(ds2)


def test_pivot_counts_split_independent_and_strict(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from geoglue_ray.stages.reshape import pivot_counts

    rng = np.random.default_rng(4)
    cats = ["a", "b", "c"]
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, size=200),
            "p": np.asarray(cats, dtype=object)[rng.integers(0, 3, size=200)],
        }
    )
    ref = df.groupby(["k", "p"]).size().unstack(fill_value=0)
    for nparts in (1, 5):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(nparts)
        got = (
            pivot_counts(ds, "k", "p", cats)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        for c in cats:
            assert got[f"n_{c}"].tolist() == ref[c].reindex(got["k"]).tolist()
    bad = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame({"k": [1], "p": ["zz"]})))
    with pytest.raises(Exception, match="unknown"):
        pivot_counts(bad, "k", "p", cats).materialize()


def test_threshold_streaks_hand_series(ray_session):
    import pandas as pd

    from geoglue_ray.stages.timeagg import threshold_streaks

    # key 1: days 0,1,2, 5, 7,8 above -> runs 3,1,2; key 2: none above;
    # key 3: one day above; day order scrambled to exercise the lexsort
    rows = {
        "k": [1, 1, 1, 1, 1, 1, 1, 2, 3, 1],
        "day": [5, 0, 1, 2, 7, 8, 3, 4, 9, 6],
        "v": [9.0, 9.0, 9.0, 9.0, 9.0, 9.0, 1.0, 1.0, 9.0, 1.0],
    }
    out = (
        threshold_streaks(
            rd.from_pandas(pd.DataFrame(rows)), ["k"], "day", "v", threshold=5.0,
            n_shards=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 3]
    assert out["days_above"].tolist() == [6, 1]
    assert out["n_runs"].tolist() == [3, 1]
    assert out["longest_run"].tolist() == [3, 1]
    assert all(out[c].dtype.kind == "i" for c in out.columns)
