"""Forecast reshape: collapse sparse (time, step) to dense (time, month).

The reference's seasonal-forecast densification (``reshape.py:6-64``):
cdsapi monthly forecasts arrive with a ``step`` axis holding every possible
day-offset while only one per month is populated — collapse the non-NaN
entries per (time, cell) into ``month = 1..m`` rank order.  Plus the
calendar helpers ``days_in_nth_month`` / ``get_durations``
(``reshape.py:67-102``).

Engine shape: long-form (time, cell_row, cell_col, step, value) table ->
per-batch collapse (requires batches partition-aligned on (time, cell) —
guaranteed when the generator emits whole tiles, asserted otherwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def collapse_step_to_month(batch: pa.Table, n_months: int | None = None) -> pa.Table:
    """Within-batch collapse: for each (valid_time, cell_row, cell_col),
    drop NaN steps and re-key the survivors by rank -> month 1..m.

    The reference assumes a fixed survivor count per row
    (``reshape.py:41-44``); we assert the same.
    """
    t = batch.select(["valid_time", "cell_row", "cell_col", "step", "value"])
    vt = t["valid_time"].to_numpy()
    cr = t["cell_row"].to_numpy()
    cc = t["cell_col"].to_numpy()
    st = t["step"].to_numpy()
    v = t["value"].to_numpy(zero_copy_only=False)
    ok = ~np.isnan(v)
    vt, cr, cc, st, v = vt[ok], cr[ok], cc[ok], st[ok], v[ok]
    # lexsort + run detection (the repo idiom) — the round-3 audit flagged
    # the previous per-batch pandas groupby here
    def _key(a: np.ndarray) -> np.ndarray:
        return a.view(np.int64) if a.dtype.kind in "Mm" else a

    order = np.lexsort((_key(st), cc, cr, _key(vt)))
    vt, cr, cc, v = vt[order], cr[order], cc[order], v[order]
    brk = np.r_[
        True, (vt[1:] != vt[:-1]) | (cr[1:] != cr[:-1]) | (cc[1:] != cc[:-1])
    ] if len(vt) else np.zeros(0, dtype=bool)
    starts = np.flatnonzero(brk)
    counts = np.diff(np.r_[starts, len(vt)]) if len(starts) else np.zeros(0, np.int64)
    month = (
        np.arange(len(vt)) - np.repeat(starts, counts) + 1
    ).astype(np.int32) if len(starts) else np.zeros(0, np.int32)
    if len(counts) and not (counts == counts[0]).all():
        raise ValueError("variable number of valid steps per (time, cell)")
    if n_months is not None and len(counts) and counts[0] != n_months:
        raise ValueError(f"expected {n_months} valid steps, found {counts[0]}")
    return pa.table(
        {
            "valid_time": pa.array(vt),
            "cell_row": pa.array(cr),
            "cell_col": pa.array(cc),
            "month": pa.array(month),
            "value": pa.array(v),
        }
    )


def days_in_nth_month(t: np.datetime64 | str, n_month: int) -> int:
    """Days in the n-th month after ``t`` (``reshape.py:67-83``)."""
    ts = pd.Timestamp(t)
    if n_month < 1:
        raise ValueError("Negative n_month not supported")
    if n_month > 12:
        raise ValueError("Only supports n_month 1..12")
    if ts.day != 1:
        raise ValueError("Can only work with start of months")
    new_month = (ts.month + n_month - 1) % 12 + 1
    new_year = ts.year + (ts.month + n_month) // 12
    prev_month = (new_month - 2) % 12 + 1
    prev_month_year = new_year if prev_month != 12 else new_year - 1
    return (
        pd.Timestamp(new_year, new_month, 1) - pd.Timestamp(prev_month_year, prev_month, 1)
    ).days


def get_durations(times: np.ndarray, months: np.ndarray) -> np.ndarray:
    """(T, M) duration-in-days matrix (``reshape.py:86-102``)."""
    out = np.zeros((len(times), len(months)))
    for i, t in enumerate(times):
        for j, m in enumerate(months):
            out[i, j] = days_in_nth_month(t, int(m))
    return out


def collapse_dataset(ds: rd.Dataset, n_months: int | None = None) -> rd.Dataset:
    """Dataset-level collapse; batches must be (time, cell)-aligned (the
    raster generator emits whole days per batch, so they are)."""
    return ds.map_batches(
        lambda b: collapse_step_to_month(b, n_months), batch_format="pyarrow"
    )


def pivot_counts(
    ds: rd.Dataset,
    key_col: str,
    pivot_col: str,
    categories: list[str],
    n_buckets: int = 64,
) -> rd.Dataset:
    """Long -> wide pivot: one row per key, one ``n_<category>`` count
    column per category (the categories must be a KNOWN fixed vocabulary
    — run a distinct pass first for open vocabularies; unknown values
    raise rather than silently drop).

    Scale shape: each batch collapses to one wide partial row per key
    present in it (``np.add.at`` scatter — never a row-level shuffle),
    partials co-shuffle on ``hash(key) % n_buckets`` (FIXED group
    count), each bucket task sums ALL its keys in one vectorized pandas
    groupby.  Shuffle payload = keys-per-block x (1 + n_categories)
    floats.
    """
    cats = list(categories)
    cols = [f"n_{c}" for c in cats]

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            out = {"_pb": pa.array([], pa.int64()),
                   key_col: pa.array([], b.schema.field(key_col).type)}
            for c in cols:
                out[c] = pa.array([], pa.float64())
            return pa.table(out)
        k = b[key_col].to_numpy(zero_copy_only=False)
        p = b[pivot_col].to_numpy(zero_copy_only=False)
        cat_idx = pd.Categorical(p, categories=cats).codes
        if (cat_idx < 0).any():
            bad = p[cat_idx < 0][0]
            raise ValueError(f"unknown {pivot_col} value {bad!r}")
        codes, uniq = pd.factorize(k)
        counts = np.zeros((len(uniq), len(cats)), dtype=np.float64)
        np.add.at(counts, (codes, cat_idx.astype(np.int64)), 1.0)
        bucket = (
            pd.util.hash_array(np.ascontiguousarray(uniq)).astype(np.uint64)
            % np.uint64(n_buckets)
        ).astype(np.int64)
        out = {"_pb": pa.array(bucket), key_col: pa.array(uniq)}
        for j, c in enumerate(cols):
            out[c] = pa.array(counts[:, j])
        return pa.table(out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(key_col, sort=False, dropna=False)[cols].sum()
        return s.reset_index()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(merge, batch_format="pandas")
    )


def melt(
    ds: rd.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> rd.Dataset:
    """Wide -> long unpivot: each input row emits one output row per
    value column.  Pure per-batch Arrow concat (column fan-out is the
    known ``value_cols`` list — no shuffle, no per-row Python); the
    value columns must share one Arrow type."""
    types = None

    def unpivot(b: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {k: b[k] for k in id_cols}
            cols[var_name] = pa.array([c] * len(b), pa.string())
            cols[value_name] = b[c]
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(unpivot, batch_format="pyarrow")
