"""Schema predicates and timezone lookup.

- M13 (``util.py:211-250``): detect lon/lat columns and time columns on an
  Arrow schema/table — by dtype, by CF ``units: "... since ..."`` metadata,
  or by ``standard_name == "time"`` — and require uniqueness where the
  reference does.
- M14 (``region.py:174-208``): ISO3 -> unique UTC offset via pytz country
  zones localized at the fixed date 2022-01-01 for reproducibility
  (``region.py:36``); ambiguous countries (multiple distinct offsets)
  raise, as in the reference.
"""

from __future__ import annotations

import datetime

import pyarrow as pa

LON_NAMES = ("lon", "longitude")
LAT_NAMES = ("lat", "latitude")

TZ_REFERENCE_DATE = datetime.datetime(2022, 1, 1)  # region.py:36


def is_lonlat(schema: pa.Schema) -> bool:
    """True if the schema carries a lon/lat coordinate pair (``util.py:245-250``)."""
    names = set(schema.names)
    return any(n in names for n in LON_NAMES) and any(n in names for n in LAT_NAMES)


def lonlat_columns(schema: pa.Schema) -> tuple[str, str]:
    names = set(schema.names)
    lon = next((n for n in LON_NAMES if n in names), None)
    lat = next((n for n in LAT_NAMES if n in names), None)
    if lon is None or lat is None:
        raise ValueError("schema has no lon/lat coordinate pair")
    return lon, lat


def _field_is_time(field: pa.Field) -> bool:
    if pa.types.is_timestamp(field.type) or pa.types.is_date(field.type):
        return True
    meta = field.metadata or {}
    units = meta.get(b"units", b"").decode()
    if " since " in units:
        return True
    return meta.get(b"standard_name", b"").decode() == "time"


def find_time_coords(schema: pa.Schema) -> list[str]:
    """All time-like columns (dtype / CF units / standard_name,
    ``util.py:211-223``)."""
    return [f.name for f in schema if _field_is_time(f)]


def find_unique_time_coord(schema: pa.Schema) -> str:
    """Exactly one time column, else error (``util.py:226-235``)."""
    cols = find_time_coords(schema)
    if len(cols) != 1:
        raise ValueError(f"expected exactly one time coordinate, found {cols}")
    return cols[0]


def get_timezone(iso3: str) -> str:
    """ISO3 -> unique UTC offset string ``[+-]HH:MM`` (``region.py:174-208``).

    Uses pytz country zones localized at the fixed reference date; raises
    if the country spans multiple distinct offsets.
    """
    import pytz

    iso2 = _iso3_to_iso2(iso3)
    zones = pytz.country_timezones.get(iso2)
    if not zones:
        raise ValueError(f"no timezone data for {iso3!r}")
    offsets = set()
    for z in zones:
        off = pytz.timezone(z).utcoffset(TZ_REFERENCE_DATE)
        offsets.add(int(off.total_seconds()))
    if len(offsets) != 1:
        raise ValueError(f"{iso3} spans multiple UTC offsets: {sorted(offsets)}")
    total = offsets.pop()
    sign = "+" if total >= 0 else "-"
    total = abs(total)
    return f"{sign}{total // 3600:02d}:{(total % 3600) // 60:02d}"


_ISO3_TO_ISO2 = {
    "VNM": "VN",
    "SGP": "SG",
    "BRB": "BB",
    "GBR": "GB",
    "USA": "US",
    "NPL": "NP",
    "IND": "IN",
    "AUS": "AU",
    "FRA": "FR",
    "DEU": "DE",
    "BRA": "BR",
    "KEN": "KE",
}


def _iso3_to_iso2(iso3: str) -> str:
    try:
        return _ISO3_TO_ISO2[iso3.upper()]
    except KeyError:
        raise ValueError(f"unknown ISO3 code {iso3!r}") from None
