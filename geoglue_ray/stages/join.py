"""Keyed joins the Dataset API lacks: bucketed as-of join.

The portable pattern for both-sides-large temporal joins (per the Ray Data
idiom): co-locate the two sides by key with one groupby over the tagged
union, then run ``pd.merge_asof`` within each key group — a sort-merge
as-of join whose shuffle payload is the two projected tables, partitioned
by the join key.  Matches DuckDB ``ASOF JOIN`` semantics (most recent
right row with ``right.ts <= left.ts``); right-side timestamps must be
unique per key (pre-aggregate ties first — enforced, since tie-breaking
order differs between engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_r",
) -> rd.Dataset:
    """For each left row, attach the most recent right row (same ``key``,
    ``right_ts <= left_ts``); left rows with no match are dropped (inner
    as-of, DuckDB ``ASOF JOIN`` default)."""

    def tag(side: int):
        def _t(b: pa.Table) -> pa.Table:
            return b.append_column("_side", pa.array(np.full(len(b), side, dtype=np.int8)))

        return _t

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0].drop(columns=["_side"]).dropna(axis=1, how="all")
        r = g[g["_side"] == 1].drop(columns=["_side"]).dropna(axis=1, how="all")
        if not len(l) or not len(r):
            return l.iloc[0:0]
        r = r[[key, right_ts, *right_cols]]
        if r[right_ts].duplicated().any():
            raise ValueError(
                f"as-of right side has duplicate {right_ts!r} per key; "
                "pre-aggregate ties (tie order is engine-specific)"
            )
        # normalize timestamp resolutions (Arrow->pandas conversion can
        # yield different datetime64 units per side)
        if str(l[left_ts].dtype).startswith("datetime64"):
            l = l.assign(**{left_ts: l[left_ts].astype("datetime64[us]")})
            r = r.assign(**{right_ts: r[right_ts].astype("datetime64[us]")})
        l = l.sort_values(left_ts, kind="mergesort")
        r = r.sort_values(right_ts, kind="mergesort")
        out = pd.merge_asof(
            l,
            r.drop(columns=[key]),
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            suffixes=("", suffix),
        )
        return out[out[right_ts].notna()]

    return tagged.groupby(key).map_groups(per_key, batch_format="pandas")
