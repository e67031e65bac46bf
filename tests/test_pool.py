"""RasterPool: partitioned layout, timezone-halo timeshift round-trip
(reference pattern: shifted head equals neighbor-year tail,
``tests/test_cds.py:271-289``), windowed weekly reduce, error paths."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from geoglue_ray.pipelines.pool import RasterPool, write_pool
from geoglue_ray.sources.raster import raster_value, read_raster
from geoglue_ray.stages.timeagg import first_monday


@pytest.fixture(scope="module")
def pool_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pool")
    # 2019-12-27 .. 2020-02-04 (T0 = 2020-01-06; start 10 days earlier)
    ds = read_raster(n_days=40, start_day=-10)
    write_pool(ds, root)
    return root


def test_partition_layout(pool_root):
    pool = RasterPool(pool_root, tz_hours=7)
    assert pool.years == [2019, 2020]
    assert pool.partitions[2019] == [12]
    assert pool.partitions[2020] == [1, 2]


def test_open_year_timeshift_roundtrip(pool_root):
    """Local 2020 under +07:00: its first instant hours must equal the raw
    UTC values from late 2019-12-31 (head == neighbor tail)."""
    pool = RasterPool(pool_root, tz_hours=7)
    df = (
        pool.open_year(2020)
        .to_pandas()
        .query("variable == 't2m' and cell_row == 5 and cell_col == 5")
        .sort_values("valid_time")
    )
    # first local timestamp is exactly 2020-01-01 00:00 local
    assert str(df["valid_time"].iloc[0]) == "2020-01-01 00:00:00"
    # local 00:00..06:00 on Jan 1 = UTC 17:00..23:00 on Dec 31 (t = -5*24-7 .. -5*24-1 rel T0)
    utc_hours = np.arange(-5 * 24 - 7, -5 * 24)
    expect = raster_value(utc_hours, np.full(7, 5), np.full(7, 5), 0)
    got = df["value"].to_numpy()[:7]
    np.testing.assert_array_equal(got, expect)


def test_open_year_accum_offset(pool_root):
    """Accum variables shift by shift-1 (cds.py:308-315): tp's first local
    hour corresponds to UTC 18:00, not 17:00."""
    pool = RasterPool(pool_root, tz_hours=7)
    df = (
        pool.open_year(2020)
        .to_pandas()
        .query("variable == 'tp' and cell_row == 5 and cell_col == 5")
        .sort_values("valid_time")
    )
    expect = raster_value(np.array([-5 * 24 - 6]), np.array([5]), np.array([5]), 1)
    assert df["value"].iloc[0] == expect[0]


def test_missing_year_and_partition_errors(pool_root, tmp_path):
    pool = RasterPool(pool_root)
    with pytest.raises(KeyError):
        pool.open_year(2018)
    # a pool whose December needs the (absent) next-January halo
    t = pa.table(
        {
            "valid_time": pa.array(
                np.array(["2020-12-31T20:00:00"], dtype="datetime64[us]"),
                type=pa.timestamp("us"),
            ),
            "vartype": ["instant"],
            "value": [1.0],
        }
    )
    write_pool(rd.from_arrow(t), tmp_path / "dec")
    p2 = RasterPool(tmp_path / "dec")
    with pytest.raises(FileNotFoundError):
        p2.open_year(2020, shift=-7)
    with pytest.raises(FileNotFoundError):
        RasterPool(tmp_path / "nothing-here")


def test_hourly_validation(pool_root):
    pool = RasterPool(pool_root)
    assert pool.validate_hourly(2019)
    assert pool.validate_hourly(2020)


def test_weekly_reduce_missing_lookback_year_raises(pool_root):
    """A lookback window reaching into an absent year must raise, not
    silently aggregate a partial boundary week."""
    pool = RasterPool(pool_root)
    with pytest.raises(FileNotFoundError):
        pool.weekly_reduce(2019, "instant", window=1)  # needs 2018


def test_weekly_reduce_window(pool_root):
    pool = RasterPool(pool_root)
    out = pool.weekly_reduce(2020, "instant", window=1).to_pandas()
    weeks = np.sort(out["time_key"].unique())
    # every week starts on a Monday
    days = weeks.astype("datetime64[D]").astype(np.int64)
    assert ((days + 3) % 7 == 0).all()
    # window extends one week before first_monday(2020) = 2019-12-30
    assert str(np.datetime64(weeks[0], "D")) == str(first_monday(2020) - 7)
    # spot-check: full-week mean for one cell equals the formula mean
    wk = np.datetime64("2020-01-06", "us")
    row = out.query("cell_row == 3 and cell_col == 3 and variable == 't2m'")
    row = row[row["time_key"] == wk]
    t = np.arange(0, 7 * 24)  # hours rel T0 (= that Monday)
    expect = raster_value(t, np.full(len(t), 3), np.full(len(t), 3), 0).mean()
    assert row["stat"].iloc[0] == expect
