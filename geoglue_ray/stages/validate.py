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


def column_stats(ds: rd.Dataset) -> pa.Table:
    """Global per-column stats with BOUNDED driver memory (the distributed
    twin of the reference's ``minimal_stats``, validate.py:37-43).

    Numeric columns stream through one ``map_batches`` pass that emits a
    fixed-width partial row per (block, column) — n / nna / nansum / min /
    max — reduced by a per-column ``map_groups`` (group count == #columns,
    each group one tiny row per block).  Non-numeric columns get an exact
    distinct count via the :func:`count_distinct` fixed-shard shape over
    per-batch-deduped 64-bit value hashes (null-dropped, matching pandas
    ``nunique``).  The driver only ever holds one row per column — never
    the input (the round-3 ``cmd_stats`` did ``to_pandas()`` on the whole
    input, fatal pointed at a corpus; this replaces it).
    """
    import pandas as pd

    schema = ds.schema()
    names = list(schema.names)
    numeric = [
        n
        for n, t in zip(schema.names, schema.types)
        if pa.types.is_integer(t) or pa.types.is_floating(t)
    ]
    other = [n for n in names if n not in numeric]

    def partials(b: pa.Table) -> pa.Table:
        rows = {"column": [], "n": [], "nna": [], "sum": [], "min": [], "max": []}
        for name in names:
            s = b[name].to_pandas()
            na = int(s.isna().sum())
            rows["column"].append(name)
            rows["n"].append(len(s))
            rows["nna"].append(na)
            if name in numeric and len(s) - na > 0:
                v = s.to_numpy(dtype=np.float64, na_value=np.nan)
                rows["sum"].append(float(np.nansum(v)))
                rows["min"].append(float(np.nanmin(v)))
                rows["max"].append(float(np.nanmax(v)))
            else:
                rows["sum"].append(None)
                rows["min"].append(None)
                rows["max"].append(None)
        return pa.table(
            {
                "column": pa.array(rows["column"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
                "nna": pa.array(rows["nna"], pa.int64()),
                "sum": pa.array(rows["sum"], pa.float64()),
                "min": pa.array(rows["min"], pa.float64()),
                "max": pa.array(rows["max"], pa.float64()),
            }
        )

    def reduce_col(g: pa.Table) -> pa.Table:
        # Arrow-native (NOT pandas): a pandas block whose float column is
        # all-NaN round-trips to Arrow type `null`, silently corrupting the
        # distributed block schema (CLAUDE.md second-review lesson).
        def _nanagg(col: str, fn) -> float:
            v = g[col].to_numpy(zero_copy_only=False)
            v = v[~np.isnan(v)]
            return float(fn(v)) if len(v) else np.nan

        return pa.table(
            {
                "column": pa.array([g["column"][0].as_py()], pa.string()),
                "n": pa.array([int(g["n"].to_numpy().sum())], pa.int64()),
                "nna": pa.array([int(g["nna"].to_numpy().sum())], pa.int64()),
                "sum": pa.array([_nanagg("sum", np.sum)], pa.float64()),
                "min": pa.array([_nanagg("min", np.min)], pa.float64()),
                "max": pa.array([_nanagg("max", np.max)], pa.float64()),
            }
        )

    num_tab = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("column")
        .map_groups(reduce_col, batch_format="pyarrow")
        .to_arrow_refs()
    )
    import ray

    num_parts = [t for t in ray.get(num_tab) if len(t)]
    if not num_parts:  # zero-block input
        num_parts = [partials(schema.empty_table())]
    num_df = pa.concat_tables(num_parts).to_pandas()  # one row/column: bounded

    out = {
        n: {
            "n": int(r["n"]),
            "nna": int(r["nna"]),
            "sum": float(r["sum"]),
            "min": float(r["min"]),
            "max": float(r["max"]),
        }
        for n, r in num_df.set_index("column").iterrows()
    }

    if other:
        idx = {n: i for i, n in enumerate(other)}

        def value_hashes(b: pa.Table) -> pa.Table:
            cols, hs = [], []
            for name in other:
                s = b[name].to_pandas().dropna()
                arr = s.to_numpy()
                if arr.dtype.kind in "Mm":
                    arr = arr.view(np.int64)
                h = np.unique(pd.util.hash_array(arr).astype(np.uint64))
                cols.append(np.full(len(h), idx[name], dtype=np.int32))
                hs.append(h)
            return pa.table(
                {
                    "_col": pa.array(np.concatenate(cols) if cols else [], pa.int32()),
                    "_h": pa.array(
                        np.concatenate(hs) if hs else [], pa.uint64()
                    ),
                }
            )

        dist = count_distinct(
            ds.map_batches(value_hashes, batch_format="pyarrow"),
            ["_col"],
            ["_h"],
            "distinct",
        ).take_all()  # <= #columns rows
        for row in dist:
            out[other[int(row["_col"])]]["distinct"] = int(row["distinct"])
        for name in other:
            out[name].setdefault("distinct", 0)

    return pa.table(
        {
            "column": pa.array(names, pa.string()),
            "kind": pa.array(
                ["numeric" if n in numeric else "other" for n in names], pa.string()
            ),
            "n": pa.array([out.get(n, {}).get("n", 0) for n in names], pa.int64()),
            "nna": pa.array([out.get(n, {}).get("nna", 0) for n in names], pa.int64()),
            "mean": pa.array(
                [
                    (
                        out[n]["sum"] / (out[n]["n"] - out[n]["nna"])
                        if n in numeric
                        and n in out
                        and out[n]["n"] - out[n]["nna"] > 0
                        else None
                    )
                    for n in names
                ],
                pa.float64(),
            ),
            "min": pa.array(
                [out[n]["min"] if n in numeric and n in out else None for n in names],
                pa.float64(),
            ),
            "max": pa.array(
                [out[n]["max"] if n in numeric and n in out else None for n in names],
                pa.float64(),
            ),
            "distinct": pa.array(
                [
                    out.get(n, {}).get("distinct") if n not in numeric else None
                    for n in names
                ],
                pa.int64(),
            ),
        }
    )


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
