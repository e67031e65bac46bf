"""Event-stream parquet reader with scan-level predicate pushdown.

The reference engine's analogue is the bbox ``sel`` slice crop
(util.py:144-162): restrict WHAT leaves storage, not what reaches the
first operator.  ``read_events`` threads a time-window predicate into
``ray.data.read_parquet(filter=...)`` — pyarrow evaluates it inside the
fragment scan, so non-matching ROW GROUPS are pruned from decode via
their min/max statistics and non-matching rows never enter the object
store.  At 100 TB with day-partitioned event files this is the first
lever a real pipeline reaches for: a 3-day window over a 30-day corpus
reads ~1/10 of the data instead of filtering it in memory.

Row-group pruning needs time-clustered files (sorted or partitioned by
ts) to skip whole groups; on unsorted files the filter still applies at
scan (fewer rows OUT of the read op), just without the decode skip —
tests/test_pushdown.py measures both effects on a sorted multi-row-group
copy.
"""

from __future__ import annotations

import numpy as np
import ray.data as rd


def read_events(
    sf_dir: str,
    columns: list[str] | None = None,
    ts_lo: np.datetime64 | str | None = None,
    ts_hi: np.datetime64 | str | None = None,
    ts_col: str = "ts",
) -> rd.Dataset:
    """Read ``events.parquet`` with optional ``[ts_lo, ts_hi)`` window
    pushed into the parquet scan (row-group statistics pruning +
    in-scan row filtering).  ``None`` bounds read everything — identical
    to a plain column-pruned ``read_parquet``."""
    import pyarrow.dataset as pads

    expr = None
    if ts_lo is not None:
        expr = pads.field(ts_col) >= np.datetime64(ts_lo, "us").item()
    if ts_hi is not None:
        e2 = pads.field(ts_col) < np.datetime64(ts_hi, "us").item()
        expr = e2 if expr is None else (expr & e2)
    return rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=columns, filter=expr
    )
