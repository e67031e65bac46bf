"""Merge operators: variable merge (coordinate join) and time concat.

The reference's ``merge.py``: ``variable_merge`` aligns single-variable
datasets on shared coordinates (xr.merge = outer coordinate join,
``merge.py:12-21``); ``merge_datasets`` concatenates along time with
attr combination — first value wins except ``geoglue_config`` which
accumulates unique values in order (``merge.py:24-75``).

Engine shape: long-form variable tables -> keyed outer merge into a wide
table (one column per variable); time concat is ``Dataset.union`` (blocks
append without a shuffle); lineage attrs accumulate as ordered unique
lists in schema metadata.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def variable_merge(
    datasets: dict[str, rd.Dataset],
    keys: list[str],
    value_col: str = "value",
) -> rd.Dataset:
    """Outer-join single-variable Datasets on shared coordinate keys ->
    one wide Dataset with a column per variable.

    Small/medium variable tables: per-variable pre-aggregation has already
    collapsed cardinality, so a pandas outer merge over co-grouped keys is
    fine; at full scale this becomes a partitioned hash join bucketed on
    ``keys`` (same co-location argument as the zonal shuffle).
    """
    names = list(datasets)
    renamed = []
    for name, ds in datasets.items():
        def _rn(b: pa.Table, name=name) -> pa.Table:
            i = b.schema.get_field_index(value_col)
            return b.set_column(i, name, b[value_col])

        renamed.append(ds.map_batches(_rn, batch_format="pyarrow"))

    # union + per-key pivot: each input row carries exactly one variable
    # column; group by keys and take the first non-null per variable.
    tagged = renamed[0].union(*renamed[1:]) if len(renamed) > 1 else renamed[0]

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        out = g.iloc[:1][keys].copy()
        for n in names:
            vals = g[n].dropna() if n in g else pd.Series(dtype="float64")
            out[n] = vals.iloc[0] if len(vals) else float("nan")
        return out

    return tagged.groupby(keys).map_groups(pivot, batch_format="pandas")


def combine_attrs(dicts: list[dict]) -> dict:
    """First-value-wins attr merge; ``geoglue_config`` accumulates ordered
    unique values joined by newlines (``merge.py:24-62``)."""
    keys: dict = {}
    for d in dicts:
        for k in d:
            keys.setdefault(k, True)
    out: dict = {}
    for key in keys:
        vals = [d[key] for d in dicts if key in d and d[key] is not None]
        if not vals:
            continue
        if key == "geoglue_config":
            seen, ordered = set(), []
            for v in vals:
                if isinstance(v, bytes):
                    v = v.decode("utf-8")
                if v not in seen:
                    seen.add(v)
                    ordered.append(str(v))
            out[key] = "\n".join(ordered)
        else:
            out[key] = vals[0]
    return out


def concat_time(datasets: list[rd.Dataset]) -> rd.Dataset:
    """Concatenate along time (``xr.concat`` analogue): a no-shuffle block
    union — ordering is carried by the time column, not block order."""
    return datasets[0].union(*datasets[1:]) if len(datasets) > 1 else datasets[0]
