"""Config/attrs/reshape/merge/date-helper unit tests (error paths mirror
the reference: bad tz, out-of-range bbox, bad ISO3, shift ranges)."""

from __future__ import annotations

import numpy as np
import pytest

from geoglue_ray.attrs import attach_field_metadata, bounds_ok, VARIABLE_ATTRS
from geoglue_ray.config import (
    GeoglueConfig,
    RegionMeta,
    ShapefileConfig,
    VariableSpec,
    ZonalStatsConfig,
    parse_region_name,
)
from geoglue_ray.functions.dates import get_timezone_offset_hours, zero_padded_intrange
from geoglue_ray.stages.merge import combine_attrs
from geoglue_ray.stages.reshape import (
    collapse_step_to_month,
    days_in_nth_month,
    get_durations,
)


def test_variable_spec_validation():
    VariableSpec(0, 10, 0.5).validate()
    with pytest.raises(ValueError):
        VariableSpec(5, 1).validate()
    with pytest.raises(ValueError):
        VariableSpec(0, 1, 1.5).validate()


def test_shapefile_config_from_str():
    c = ShapefileConfig.from_str("/data/adm2.shp::GID_2")
    assert c.pk == "GID_2" and str(c.file) == "/data/adm2.shp"
    with pytest.raises(ValueError):
        ShapefileConfig.from_str("no-separator")


def test_zonalstats_config_logfmt_roundtrip():
    cfg = ZonalStatsConfig(
        raster="/tmp/a b.nc",  # space forces quoting
        shapefile="/tmp/adm.shp",
        shapefile_id="GID_2",
        output="/tmp/out.zs.nc",
        operation="weighted_mean(default_weight=0)",
        resample="remapbil",
    )
    rt = ZonalStatsConfig.from_str(str(cfg))
    assert rt == ZonalStatsConfig.from_str(str(rt))
    assert str(rt.raster) == "/tmp/a b.nc"
    with pytest.raises(KeyError):
        ZonalStatsConfig.from_str("raster=x output=y")


def test_region_meta_validation():
    RegionMeta("Vietnam", "VNM", "+07:00", (102, 8, 110, 24))
    with pytest.raises(ValueError):
        RegionMeta("X", "VNM", "+07:50", (102, 8, 110, 24))  # bad tz minutes
    with pytest.raises(ValueError):
        RegionMeta("X", "VNM", "+07:00", (102, 8, 190, 24))  # lon out of range
    with pytest.raises(ValueError):
        RegionMeta("X", "VNMX", "+07:00", (102, 8, 110, 24))  # bad ISO3
    assert RegionMeta("X", "VNM", "-03:00", (0, 0, 1, 1)).tz_hours == -3
    assert RegionMeta("X", "NPL", "+05:45", (0, 0, 1, 1)).tz_hours is None


def test_parse_region_name():
    assert parse_region_name("VNM-2") == ("VNM", 2)


def test_op_aliases():
    cfg = GeoglueConfig(operation={"popsum": "weighted_sum(default_weight=0)"})
    assert cfg.resolve_op("popsum").startswith("weighted_sum")
    assert cfg.resolve_op("mean") == "mean"


def test_zero_padded_intrange():
    assert zero_padded_intrange(1, 12) == [f"{i:02d}" for i in range(1, 13)]
    assert zero_padded_intrange(1, 10, inclusive=False) == [f"{i:02d}" for i in range(1, 10)]
    with pytest.raises(AssertionError):
        zero_padded_intrange(5, 5)


def test_tz_offset_hours():
    assert get_timezone_offset_hours("+05:00") == 5
    assert get_timezone_offset_hours("-11:00") == -11
    assert get_timezone_offset_hours("+05:45") is None


def test_bounds_ok():
    assert bounds_ok("t2m", 200, 300)
    assert not bounds_ok("t2m", 100, 300)
    assert not bounds_ok("tp", -1, 5)
    assert bounds_ok("unknown", -1e9, 1e9)


def test_attach_field_metadata():
    import pyarrow as pa

    t = pa.table({"t2m": [1.0], "x": [2.0]})
    out = attach_field_metadata(t, VARIABLE_ATTRS)
    meta = out.schema.field("t2m").metadata
    assert meta[b"units"] == b"K"
    assert out.schema.field("x").metadata is None


def test_collapse_step_to_month():
    """Sparse (time, step) -> dense (time, month) against a hand oracle
    (pattern of tests/test_apply_ufunc.py:6-54)."""
    import pyarrow as pa

    times = np.repeat(np.datetime64("2024-01-01", "us"), 6)
    steps = np.array([29, 30, 31, 60, 61, 62])
    vals = np.array([np.nan, np.nan, 1.0, np.nan, 2.0, np.nan])
    t = pa.table(
        {
            "valid_time": pa.array(times, type=pa.timestamp("us")),
            "cell_row": pa.array(np.zeros(6, dtype=np.int32)),
            "cell_col": pa.array(np.zeros(6, dtype=np.int32)),
            "step": pa.array(steps.astype(np.int32)),
            "value": pa.array(vals),
        }
    )
    out = collapse_step_to_month(t).to_pandas()
    assert out["month"].tolist() == [1, 2]
    assert out["value"].tolist() == [1.0, 2.0]

    # inconsistent survivor counts must raise (reshape.py fixed-count assumption)
    t2 = pa.table(
        {
            "valid_time": pa.array(np.concatenate([times, times[:2]]), type=pa.timestamp("us")),
            "cell_row": pa.array(np.array([0] * 6 + [1, 1], dtype=np.int32)),
            "cell_col": pa.array(np.zeros(8, dtype=np.int32)),
            "step": pa.array(np.concatenate([steps, steps[:2]]).astype(np.int32)),
            "value": pa.array(np.concatenate([vals, [3.0, np.nan]])),
        }
    )
    with pytest.raises(ValueError):
        collapse_step_to_month(t2, n_months=2)


def test_days_in_nth_month_and_durations():
    # reference docstring example: 2024-01-01 -> [31, 29, 31, 30, 31, 30]
    got = [days_in_nth_month("2024-01-01", n) for n in range(1, 7)]
    assert got == [31, 29, 31, 30, 31, 30]
    with pytest.raises(ValueError):
        days_in_nth_month("2024-01-15", 1)
    with pytest.raises(ValueError):
        days_in_nth_month("2024-01-01", 13)
    d = get_durations(np.array(["2024-01-01", "2024-02-01"], dtype="datetime64[D]"), np.arange(1, 4))
    assert d.tolist() == [[31, 29, 31], [29, 31, 30]]


def test_combine_attrs():
    a = {"units": "K", "geoglue_config": "cfg1"}
    b = {"units": "degC", "geoglue_config": "cfg2", "extra": 1}
    c = {"geoglue_config": "cfg1"}
    out = combine_attrs([a, b, c])
    assert out["units"] == "K"  # first wins
    assert out["geoglue_config"] == "cfg1\ncfg2"  # ordered unique concat
    assert out["extra"] == 1
