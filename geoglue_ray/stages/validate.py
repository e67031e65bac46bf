"""Validation / stats stages (``validate.py:37-74``, ``cds.py:53-55``).

- :func:`count_distinct` — exact distinct-count per group with partial
  dedup inside ``map_batches`` before the shuffle (the engine's analogue of
  the reference's hourly-completeness and pk-uniqueness assertions, A10/A11).
- :func:`assert_hourly` — the ``cds.py:53-55`` invariant as a Dataset check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count

from geoglue_ray.stages.zonal import zonal_aggregate


def _unique_rows(batch: pa.Table, keys: list[str]) -> pa.Table:
    arrs = [batch[k].to_numpy(zero_copy_only=False) for k in keys]
    if all(a.dtype.kind in "iu" for a in arrs):
        if len(arrs) == 1:
            uniq = np.unique(arrs[0])
            return pa.table({keys[0]: uniq})
        stacked = np.stack(arrs, axis=1)
        uniq = np.unique(stacked, axis=0)
        return pa.table({k: uniq[:, i] for i, k in enumerate(keys)})
    return pa.table({k: batch[k] for k in keys}).to_pandas().drop_duplicates()


def count_distinct(
    ds: rd.Dataset,
    group_keys: list[str],
    distinct_keys: list[str],
    out_col: str = "n_distinct",
) -> rd.Dataset:
    """Exact COUNT(DISTINCT distinct_keys) GROUP BY group_keys.

    Two-stage: per-batch dedup -> global dedup groupby -> per-group count.
    Both shuffles move only already-deduped key tuples.
    """
    all_keys = group_keys + distinct_keys
    dedup = ds.map_batches(
        lambda b: _unique_rows(b, all_keys), batch_format="pyarrow"
    ).groupby(all_keys).aggregate(Count(alias_name="_c"))
    counted = zonal_aggregate(dedup, ["count"], keys=group_keys, value_col="_c")

    def rename(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("count")
        return b.set_column(i, out_col, b["count"])

    return counted.map_batches(rename, batch_format="pyarrow")


def assert_hourly(ds: rd.Dataset, time_col: str = "valid_time") -> bool:
    """True iff every represented day has all 24 hours (``cds.py:53-55``)."""

    def keys(b: pa.Table) -> pa.Table:
        ts = b[time_col].to_numpy()
        day = ts.astype("datetime64[D]").astype(np.int32)
        hour = ((ts.astype("datetime64[h]").astype(np.int64)) % 24).astype(np.int32)
        return pa.table({"day": day, "hour": hour})

    res = count_distinct(
        ds.map_batches(keys, batch_format="pyarrow"), ["day"], ["hour"], "n_hours"
    )
    n = res.map_batches(
        lambda b: pa.table({"bad": [int((b["n_hours"].to_numpy() != 24).sum())]}),
        batch_format="pyarrow",
    ).sum("bad")
    return n == 0
