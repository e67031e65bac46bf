"""Time-key derivation and temporal reduction stages.

Re-expresses the reference's time machinery (``cds.py:89-94`` ``_time_reduce``
daily/weekly resample; ``cds.py:933-1016`` ``weekly_reduce``;
``cds.py:237-356`` ``timeshift_hours``) as Ray-Data-first column arithmetic:

- Day / ISO-week keys are pure numpy datetime64 math inside ``map_batches``
  (weeks are Monday-start, left-closed left-labeled — ``W-MON`` semantics,
  ``cds.py:1016``).
- Reducers follow the instant/accum split: instant -> mean/min/max,
  accum -> sum (``cds.py:140-153, 972-986``).
- ``timeshift_hours`` applies the ERA5 accumulation off-by-one: instant
  variables shift by ``h``, accum variables by ``h - 1`` because accum
  timestamps label the *end* of the hour (``cds.py:308-315``).

All reductions reuse the partial/final zonal machinery — keys are plain
columns, so hourly->daily->weekly is two narrow shuffles over partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from geoglue_ray.stages.zonal import zonal_aggregate

_HOUR_US = 3_600_000_000


def day_number(ts: np.ndarray) -> np.ndarray:
    """timestamp[us] -> int32 days since epoch (floor)."""
    return ts.astype("datetime64[D]").astype(np.int32)


def week_start_number(ts: np.ndarray) -> np.ndarray:
    """timestamp[us] -> int32 days since epoch of the Monday starting the
    ISO week (W-MON, closed/label left).  Epoch day 0 = Thursday."""
    d = ts.astype("datetime64[D]").astype(np.int64)
    return (d - ((d + 3) % 7)).astype(np.int32)


def first_monday(year: int) -> np.datetime64:
    """First Monday of the year (``util.py:106-112`` analogue)."""
    d = np.datetime64(f"{year}-01-01", "D")
    i = d.astype(np.int64)
    off = (-(i + 3)) % 7
    return d + off


def last_sunday(year: int) -> np.datetime64:
    """Last Sunday of the year (``util.py:113-117`` analogue)."""
    d = np.datetime64(f"{year}-12-31", "D")
    i = d.astype(np.int64)
    # Sunday: (i + 3) % 7 == 6
    off = (i + 3 - 6) % 7
    return d - off


def add_time_key(
    ds: rd.Dataset, freq: str, time_col: str = "event_time", key_col: str = "time_key"
) -> rd.Dataset:
    """Append an int32 day-number time key at ``freq`` in {'D','W-MON'}."""
    if freq not in ("D", "W-MON"):
        raise ValueError(f"unsupported freq {freq!r} (use 'D' or 'W-MON')")

    def _key(batch: pa.Table) -> pa.Table:
        ts = batch[time_col].to_numpy()
        k = day_number(ts) if freq == "D" else week_start_number(ts)
        return batch.append_column(key_col, pa.array(k))

    return ds.map_batches(_key, batch_format="pyarrow")


def key_to_timestamp(ds: rd.Dataset, key_col: str = "time_key") -> rd.Dataset:
    """int32 day-number key -> timestamp[us] column (stable output schema)."""

    def _conv(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy().astype("datetime64[D]").astype("datetime64[us]")
        i = batch.schema.get_field_index(key_col)
        return batch.set_column(i, key_col, pa.array(k, type=pa.timestamp("us")))

    return ds.map_batches(_conv, batch_format="pyarrow")


def time_reduce(
    ds: rd.Dataset,
    freq: str,
    ops: list[str],
    keys: list[str] | None = None,
    time_col: str = "event_time",
    value_col: str = "value",
    weight_col: str | None = None,
) -> rd.Dataset:
    """Reduce to (keys..., time_key) at daily or weekly frequency.

    The reference's ``_time_reduce`` (``cds.py:89-94``) as key-derive ->
    partial/final aggregate; ``time_key`` comes back as timestamp[us].
    """
    keyed = add_time_key(ds, freq, time_col=time_col)
    out = zonal_aggregate(
        keyed,
        ops,
        keys=(keys or []) + ["time_key"],
        value_col=value_col,
        weight_col=weight_col,
    )
    return key_to_timestamp(out)


def timeshift_hours(
    ds: rd.Dataset,
    shift: int,
    time_col: str = "event_time",
    vartype_col: str | None = None,
) -> rd.Dataset:
    """Shift timestamps by ``shift`` hours (UTC -> local-time alignment).

    Valid range |shift| <= 12 as in the reference (``cds.py:253-258``).
    When ``vartype_col`` is given, rows with vartype ``'accum'`` shift by
    ``shift - 1`` (ERA5 accum labels the preceding hour, ``cds.py:308-315``).
    """
    if not -12 <= shift <= 12:
        raise ValueError(f"shift must be in [-12, 12], got {shift}")

    def _shift(batch: pa.Table) -> pa.Table:
        ts = batch[time_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        if vartype_col is None:
            sh = ts + shift * _HOUR_US
        else:
            accum = np.asarray(batch[vartype_col]) == "accum"
            sh = ts + np.where(accum, (shift - 1) * _HOUR_US, shift * _HOUR_US)
        i = batch.schema.get_field_index(time_col)
        return batch.set_column(
            i, time_col, pa.array(sh.astype("datetime64[us]"), type=pa.timestamp("us"))
        )

    return ds.map_batches(_shift, batch_format="pyarrow")


def threshold_streaks(
    ds: rd.Dataset,
    key_cols: list[str],
    day_col: str,
    value_col: str,
    threshold: float,
    n_shards: int = 32,
) -> rd.Dataset:
    """Per-key statistics of the maximal runs of CONSECUTIVE day numbers
    whose value meets ``threshold`` — the gaps-and-islands operator
    (heatwave / dry-spell duration in the climate toolbox): emits
    ``days_above``, ``n_runs`` and ``longest_run`` per key (keys with no
    qualifying day emit nothing).  Pure integer outputs, so the SQL
    ``day - row_number()`` island twin is bit-exact.

    Scale shape: the threshold filter runs streaming per batch; survivors
    co-locate by a FIXED key-hash shard (never a per-key groupby), and
    each shard task resolves ALL its keys' runs in one lexsort +
    run-detection pass.  Key columns must be integer-valued."""
    import pandas as pd
    import pyarrow.compute as pc

    def pick(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b[value_col], pa.scalar(float(threshold))))
        h = np.zeros(len(b), np.int64)
        for k in key_cols:
            h = h * np.int64(1_000_003) + b[k].to_numpy().astype(np.int64)
        shard = (h % n_shards + n_shards) % n_shards
        cols = {"_s": pa.array(shard)}
        for k in key_cols:
            cols[k] = pc.cast(b[k], pa.int64())
        cols[day_col] = pc.cast(b[day_col], pa.int64())
        return pa.table(cols)

    def shard_runs(g: pd.DataFrame) -> pd.DataFrame:
        base = {k: np.array([], dtype=np.int64) for k in key_cols}
        base.update(
            days_above=np.array([], dtype=np.int64),
            n_runs=np.array([], dtype=np.int64),
            longest_run=np.array([], dtype=np.int64),
        )
        if len(g) == 0:  # typed full-schema empty (block-schema rule)
            return pd.DataFrame(base)
        keys = [g[k].to_numpy().astype(np.int64) for k in key_cols]
        day = g[day_col].to_numpy().astype(np.int64)
        order = np.lexsort((day, *reversed(keys)))
        ks = [k[order] for k in keys]
        ds_ = day[order]
        newkey = np.zeros(len(ds_), dtype=bool)
        newkey[0] = True
        for k in ks:
            newkey[1:] |= k[1:] != k[:-1]
        brk = newkey.copy()
        brk[1:] |= (ds_[1:] - ds_[:-1]) != 1
        run_starts = np.flatnonzero(brk)
        run_len = np.diff(np.r_[run_starts, len(ds_)]).astype(np.int64)
        key_starts = np.flatnonzero(newkey)
        run_key = (np.cumsum(newkey) - 1)[run_starts]  # sorted by key
        first_run = np.flatnonzero(np.r_[True, run_key[1:] != run_key[:-1]])
        out = {k: ks[i][key_starts] for i, k in enumerate(key_cols)}
        out["days_above"] = np.add.reduceat(run_len, first_run)
        out["n_runs"] = np.diff(np.r_[first_run, len(run_key)]).astype(np.int64)
        out["longest_run"] = np.maximum.reduceat(run_len, first_run)
        return pd.DataFrame(out)

    return (
        ds.map_batches(pick, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(shard_runs, batch_format="pandas")
    )
