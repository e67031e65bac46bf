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


_CD_MIX = np.uint64(0x9E3779B185EBCA87)


def _tuple_hash(t: pa.Table, keys: list[str]) -> np.ndarray:
    """Stable combined uint64 hash of a key-tuple per row (handles int /
    datetime / string-with-null columns)."""
    import pandas as pd

    h = np.zeros(len(t), dtype=np.uint64)
    for k in keys:
        arr = t[k].to_numpy(zero_copy_only=False)
        if arr.dtype.kind in "iu":
            v = arr.astype(np.uint64)
        elif arr.dtype.kind in "Mm":
            v = arr.view(np.int64).astype(np.uint64)
        else:
            v = pd.util.hash_array(arr).astype(np.uint64)
        h = h * _CD_MIX + v
    return h


def count_distinct(
    ds: rd.Dataset,
    group_keys: list[str],
    distinct_keys: list[str],
    out_col: str = "n_distinct",
    n_shards: int = 64,
) -> rd.Dataset:
    """Exact COUNT(DISTINCT distinct_keys) GROUP BY group_keys.

    Scale shape (round-3 rework): per-batch dedup inside ``map_batches``
    -> shuffle keyed on ``hash(full tuple) % n_shards`` — a FIXED group
    count; a native groupby on the raw tuple pays Ray's per-group Python
    overhead, measured pathological at 10^5+ distinct keys (CLAUDE.md) —
    -> per-shard exact dedup + partial per-group counts (each distinct
    tuple hashes to exactly one shard, so shard counts are disjoint) ->
    a small distributed sum per group key.  Shuffles move only deduped
    key tuples.
    """
    import pandas as pd

    all_keys = group_keys + distinct_keys

    def dedup_batch(b: pa.Table) -> pa.Table:
        u = _unique_rows(b, all_keys)
        if isinstance(u, pd.DataFrame):
            u = pa.Table.from_pandas(u, preserve_index=False)
        shard = (_tuple_hash(u, all_keys) % np.uint64(n_shards)).astype(np.int64)
        return u.append_column("_ds", pa.array(shard))

    def shard_counts(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(all_keys)
        s = u.groupby(group_keys, sort=False, dropna=False).size()
        out = s.reset_index(name="_c")
        # float64 partials: the final "sum" op propagates the value dtype,
        # and the driver's value hash is dtype-KIND-sensitive (counts are
        # DOUBLE in every oracle)
        out["_c"] = out["_c"].astype(np.float64)
        return out

    parted = (
        ds.map_batches(dedup_batch, batch_format="pyarrow")
        .groupby("_ds")
        .map_groups(shard_counts, batch_format="pandas")
    )
    counted = zonal_aggregate(parted, ["sum"], keys=group_keys, value_col="_c")

    def rename(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("sum")
        return b.set_column(i, out_col, b["sum"])

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
