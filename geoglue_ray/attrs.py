"""CF-compliant variable attributes and validity bounds
(``attrs.py:1-79``), applied as Arrow field metadata at write time — the
engine's equivalent of xarray attrs injection (``util.py:175-208``)."""

from __future__ import annotations

import pyarrow as pa

VARIABLE_ATTRS: dict[str, dict] = {
    "t2m": {
        "long_name": "2 meters air temperature",
        "units": "K",
        "standard_name": "air_temperature",
        "valid_min": 175,
        "valid_max": 335,
    },
    "tp": {
        "long_name": "Total precipitation",
        "units": "m",
        "valid_min": 0,
    },
    "rh": {
        "long_name": "Relative humidity",
        "standard_name": "relative_humidity",
        "units": "1",
        "valid_min": 0,
        "valid_max": 1,
    },
}

LONLAT_ATTRS = {
    "longitude": {"units": "degrees_east", "standard_name": "longitude"},
    "latitude": {"units": "degrees_north", "standard_name": "latitude"},
}


def attach_field_metadata(table: pa.Table, col_attrs: dict[str, dict]) -> pa.Table:
    """Set per-field Arrow metadata (survives parquet round trips)."""
    fields = []
    for f in table.schema:
        attrs = col_attrs.get(f.name)
        if attrs:
            meta = {str(k): str(v) for k, v in attrs.items()}
            fields.append(f.with_metadata(meta))
        else:
            fields.append(f)
    return table.cast(pa.schema(fields, metadata=table.schema.metadata))


def bounds_ok(variable: str, vmin: float, vmax: float) -> bool:
    """Check observed [vmin, vmax] against the variable's validity bounds
    (post-aggregation validation, ``config.py:26-38`` + ``attrs.py``)."""
    a = VARIABLE_ATTRS.get(variable, {})
    if "valid_min" in a and vmin < a["valid_min"]:
        return False
    if "valid_max" in a and vmax > a["valid_max"]:
        return False
    return True
