from __future__ import annotations

import pyarrow as pa
import pytest

from geoglue_ray.schema import (
    find_time_coords,
    find_unique_time_coord,
    get_timezone,
    is_lonlat,
    lonlat_columns,
)


def _schema(fields):
    return pa.schema(fields)


def test_is_lonlat():
    assert is_lonlat(_schema([("lon", pa.float64()), ("lat", pa.float64())]))
    assert is_lonlat(_schema([("longitude", pa.float64()), ("latitude", pa.float64())]))
    assert not is_lonlat(_schema([("x", pa.float64()), ("lat", pa.float64())]))
    assert lonlat_columns(
        _schema([("longitude", pa.float64()), ("latitude", pa.float64())])
    ) == ("longitude", "latitude")
    with pytest.raises(ValueError):
        lonlat_columns(_schema([("x", pa.float64())]))


def test_find_time_coords_by_dtype_and_metadata():
    s = pa.schema(
        [
            pa.field("valid_time", pa.timestamp("us")),
            pa.field("t", pa.float64(), metadata={"units": "hours since 1900-01-01"}),
            pa.field("tt", pa.int64(), metadata={"standard_name": "time"}),
            pa.field("value", pa.float64()),
        ]
    )
    assert find_time_coords(s) == ["valid_time", "t", "tt"]
    with pytest.raises(ValueError):
        find_unique_time_coord(s)
    s1 = pa.schema([pa.field("valid_time", pa.timestamp("us")), pa.field("v", pa.float64())])
    assert find_unique_time_coord(s1) == "valid_time"


def test_get_timezone():
    assert get_timezone("VNM") == "+07:00"
    assert get_timezone("SGP") == "+08:00"
    assert get_timezone("BRB") == "-04:00"
    assert get_timezone("NPL") == "+05:45"
    with pytest.raises(ValueError):  # spans multiple offsets
        get_timezone("USA")
    with pytest.raises(ValueError):
        get_timezone("XXX")
