"""RasterPool — partitioned multi-year raster collection.

The engine's ``DatasetPool`` (``cds.py:680-756``): the reference indexes a
directory of ``{ISO3}-{year}[-{month}[_part]]-era5.{instant|accum}.nc``
files by filename regex; here the same partition keys are **real partition
columns** of a hive-partitioned parquet layout (``year=YYYY/month=MM``),
so partition pruning replaces filename parsing.

- ``open_year(year, shift)``: read one year ± the timezone halo — for a
  local-time offset of ``shift`` hours the first local hours of the year
  live in the *previous* UTC year (``cds.py:876-931``), so the adjacent
  year's boundary month is read too (partition-pruned), timestamps are
  shifted with the instant/accum off-by-one (``timeshift_hours``), and the
  result is filtered to the local year.  Missing adjacent years raise, as
  in the reference (``tests/test_cds.py:330-373``).
- ``weekly_reduce(year, vartype, window)``: ISO-week reduction over
  ``[first_monday(year) - 7*window, first_monday(year+1))``
  (``cds.py:933-1016``), with the per-vartype reducers of A3-A5.
- ``validate_hourly(year)``: 24-distinct-hours-per-day check (A11).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import ray.data as rd

from geoglue_ray.stages.timeagg import (
    add_time_key,
    first_monday,
    key_to_timestamp,
    timeshift_hours,
)
from geoglue_ray.stages.validate import assert_hourly
from geoglue_ray.stages.zonal import zonal_aggregate

_HOUR_US = 3_600_000_000


def write_pool(ds: rd.Dataset, root: str | Path) -> None:
    """Write a long-form raster Dataset as a (year, month)-partitioned pool."""

    def add_parts(b: pa.Table) -> pa.Table:
        ts = b["valid_time"].to_numpy()
        years = ts.astype("datetime64[Y]").astype(np.int64) + 1970
        months = (ts.astype("datetime64[M]").astype(np.int64) % 12) + 1
        b = b.append_column("year", pa.array(years.astype(np.int32)))
        return b.append_column("month", pa.array(months.astype(np.int32)))

    ds.map_batches(add_parts, batch_format="pyarrow").write_parquet(
        str(root), partition_cols=["year", "month"]
    )


class RasterPool:
    def __init__(self, root: str | Path, tz_hours: int = 0):
        self.root = Path(root)
        self.tz_hours = tz_hours
        self.partitions: dict[int, list[int]] = {}
        for ydir in sorted(self.root.glob("year=*")):
            y = int(ydir.name.split("=")[1])
            self.partitions[y] = sorted(
                int(m.name.split("=")[1]) for m in ydir.glob("month=*")
            )
        if not self.partitions:
            raise FileNotFoundError(f"no year=*/month=* partitions under {root}")

    @property
    def years(self) -> list[int]:
        return sorted(self.partitions)

    def _read(self, parts: list[tuple[int, int]]) -> rd.Dataset:
        paths = []
        for y, m in parts:
            p = self.root / f"year={y}" / f"month={m}"
            if not p.exists():
                raise FileNotFoundError(
                    f"missing partition year={y} month={m} (adjacent-year data "
                    "required for timezone shift, cds.py:876-931)"
                )
            # this Ray version treats list entries as files — glob explicitly
            paths.extend(str(f) for f in sorted(p.glob("*.parquet")))
        return rd.read_parquet(paths)

    def open_year(self, year: int, shift: int | None = None) -> rd.Dataset:
        """Read one local year, shifting UTC->local with halo partitions."""
        shift = self.tz_hours if shift is None else shift
        if year not in self.partitions:
            raise KeyError(f"year {year} not in pool (have {self.years})")
        parts = [(year, m) for m in self.partitions[year]]
        if shift > 0 and 1 in self.partitions[year]:
            parts.insert(0, (year - 1, 12))  # last UTC hours of prev year
        elif shift < 0 and 12 in self.partitions[year]:
            parts.append((year + 1, 1))
        ds = self._read(parts)
        if shift:
            ds = timeshift_hours(
                ds, shift, time_col="valid_time", vartype_col="vartype"
            )
        y0 = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
        y1 = np.datetime64(f"{year + 1}-01-01", "us").astype(np.int64)

        def in_year(b: pa.Table) -> pa.Table:
            ts = b["valid_time"].to_numpy().astype("datetime64[us]").astype(np.int64)
            return b.filter(pa.array((ts >= y0) & (ts < y1)))

        return ds.map_batches(in_year, batch_format="pyarrow")

    def validate_hourly(self, year: int) -> bool:
        return assert_hourly(self._read([(year, m) for m in self.partitions[year]]))

    def weekly_reduce(
        self, year: int, vartype: str, window: int = 0, keys: list[str] | None = None
    ) -> rd.Dataset:
        """ISO-week stats over [first_monday(year) - 7*window,
        first_monday(year+1)); instant -> mean, accum -> exact
        mean-of-daily-sums (``sum/(count/24)``)."""
        lo_day = first_monday(year) - 7 * window
        lo = lo_day.astype("datetime64[us]").astype(np.int64)
        hi = first_monday(year + 1).astype("datetime64[us]").astype(np.int64)
        # the lookback window explicitly reaches into year-1 -> that year's
        # data must exist (silently aggregating a partial boundary week
        # would be wrong); year+1 only tightens the upper clip, so its
        # absence just means the final weeks end with the data
        if lo_day < np.datetime64(f"{year}-01-01") and (year - 1) not in self.partitions:
            raise FileNotFoundError(
                f"weekly_reduce({year}, window={window}) needs year {year - 1} "
                f"(window starts {lo_day}) but the pool has {self.years}"
            )
        years = [y for y in (year - 1, year, year + 1) if y in self.partitions]
        ds = self._read([(y, m) for y in years for m in self.partitions[y]])

        def in_window(b: pa.Table) -> pa.Table:
            vt = np.asarray(b["vartype"]) == vartype
            ts = b["valid_time"].to_numpy().astype("datetime64[us]").astype(np.int64)
            return b.filter(pa.array(vt & (ts >= lo) & (ts < hi)))

        ds = ds.map_batches(in_window, batch_format="pyarrow")
        ds = add_time_key(ds, "W-MON", time_col="valid_time")
        agg = zonal_aggregate(
            ds,
            ["sum", "count"],
            keys=(keys or ["variable", "cell_row", "cell_col"]) + ["time_key"],
            skip_nulls=True,
        )

        def stat(b: pa.Table) -> pa.Table:
            s = b["sum"].to_numpy()
            c = b["count"].to_numpy()
            with np.errstate(divide="ignore", invalid="ignore"):
                v = s / (c / 24.0) if vartype == "accum" else s / c
            return b.append_column("stat", pa.array(v))

        return key_to_timestamp(agg.map_batches(stat, batch_format="pyarrow"))
