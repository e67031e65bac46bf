"""Zonal aggregation — partial/final groupby over (admin_id, time_key, ...).

Reproduces the reference's zonal statistics semantics
(``zonalstats.py:23-100``): per (region, non-spatial index) ``mean / sum /
count / min / max / weighted_mean / weighted_sum`` plus geoglue's composite
``area_weighted_sum = weighted_sum / count`` (``zonalstats.py:43-63``).

Scale design (SURVEY.md §4): a bare ``groupby`` would shuffle every corpus
row — and the fixture (like the real world) has mega-cells holding ~30% of
rows.  Instead each batch is **partially aggregated inside map_batches**
(one output row per key per batch), so the all-to-all exchange moves only
key-cardinality-sized partials and hot keys are collapsed before they ever
reach the shuffle; the final ``groupby().aggregate(Sum…)`` merges partials.
This partial/final decomposition is exact because all measures are sums and
counts (integer-valued doubles → order-independent), with ratios computed
in a last stateless stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

from geoglue_ray.ops import OpSpec, parse_ops
from geoglue_ray.sources.weights import lookup_weight

_PARTIALS = ["sum_v", "cnt", "min_v", "max_v", "sum_w", "sum_wv"]


class AttachWeights:
    """Actor-pool stage: broadcast weight-grid lookup per point (the
    reference's weights raster, ``zonalstats.py:112-117``)."""

    def __init__(self, grid_ref):
        self.grid: np.ndarray = (
            ray.get(grid_ref) if isinstance(grid_ref, ray.ObjectRef) else grid_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = lookup_weight(batch["lon"].to_numpy(), batch["lat"].to_numpy(), self.grid)
        return batch.append_column("weight", pa.array(w))


def partial_zonal(
    batch: pa.Table,
    keys: list[str],
    value_col: str,
    weight_col: str | None,
    skip_nulls: bool = False,
):
    """Per-batch partial aggregation: one row per key combination.

    Fast path: when every key column is integer, groups are formed with one
    ``np.unique`` + argsort + ``reduceat`` pass (no pandas, no string
    hashing in the hot loop).  String keys fall back to pandas groupby.
    ``skip_nulls`` drops null/NaN values first (SQL ``WHERE v IS NOT NULL``
    semantics; the raster pipelines' NaN "ocean" holes).
    """
    if skip_nulls:
        col = batch[value_col]
        mask = pc.and_kleene(pc.is_valid(col), pc.invert(pc.is_nan(col)))
        batch = batch.filter(mask)
    v = batch[value_col].to_numpy(zero_copy_only=False)
    w = batch[weight_col].to_numpy(zero_copy_only=False) if weight_col else None
    key_arrays = [batch[k].to_numpy(zero_copy_only=False) for k in keys]

    if all(a.dtype.kind in "iu" for a in key_arrays) and len(v):
        if len(key_arrays) == 1:
            uniq, inv = np.unique(key_arrays[0], return_inverse=True)
            key_cols = {keys[0]: uniq}
            n_groups = len(uniq)
        else:
            # pack composite int keys into one int64 (np.unique(axis=0) is
            # ~20x slower than a 1D unique); falls back to axis-unique only
            # if the combined range would overflow
            arrs = [a.astype(np.int64) for a in key_arrays]
            mins = [int(a.min()) for a in arrs]
            spans = [int(a.max()) - m + 1 for a, m in zip(arrs, mins)]
            total_span = 1
            for s in spans:
                total_span *= s
            if total_span < (1 << 62):
                packed = np.zeros(len(v), dtype=np.int64)
                for a, m, s in zip(arrs, mins, spans):
                    packed = packed * s + (a - m)
                uniq_p, inv = np.unique(packed, return_inverse=True)
                key_cols = {}
                rem = uniq_p
                for k, m, s in zip(reversed(keys), reversed(mins), reversed(spans)):
                    key_cols[k] = (rem % s + m)
                    rem = rem // s
                key_cols = {k: key_cols[k] for k in keys}  # original order
                # restore original dtypes
                for k, a in zip(keys, key_arrays):
                    key_cols[k] = key_cols[k].astype(a.dtype)
                n_groups = len(uniq_p)
            else:  # pragma: no cover - astronomically wide key ranges
                stacked = np.stack(key_arrays, axis=1)
                uniq, inv = np.unique(stacked, axis=0, return_inverse=True)
                key_cols = {k: uniq[:, i] for i, k in enumerate(keys)}
                n_groups = uniq.shape[0]
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(n_groups))
        vs = v[order]
        out = dict(key_cols)
        out["sum_v"] = np.add.reduceat(vs, starts)
        out["cnt"] = np.diff(np.concatenate([starts, [len(vs)]])).astype(np.float64)
        out["min_v"] = np.minimum.reduceat(vs, starts)
        out["max_v"] = np.maximum.reduceat(vs, starts)
        if w is not None:
            ws = w[order]
            out["sum_w"] = np.add.reduceat(ws, starts)
            out["sum_wv"] = np.add.reduceat(ws * vs, starts)
        else:
            z = np.zeros(len(starts))
            out["sum_w"], out["sum_wv"] = z, z
        return pa.table(out)

    df = pa.table({k: batch[k] for k in keys}).to_pandas()
    df["_v"] = v
    if w is not None:
        df["_w"] = w
        df["_wv"] = w * v
    g = df.groupby(keys, sort=False, observed=True)
    out = g["_v"].agg(sum_v="sum", cnt="count", min_v="min", max_v="max")
    if w is not None:
        out["sum_w"] = g["_w"].sum()
        out["sum_wv"] = g["_wv"].sum()
    else:
        out["sum_w"] = 0.0
        out["sum_wv"] = 0.0
    out["cnt"] = out["cnt"].astype("float64")
    return pa.Table.from_pandas(out.reset_index(), preserve_index=False)


def zonal_aggregate(
    ds: rd.Dataset,
    ops: list[str],
    keys: list[str] | None = None,
    value_col: str = "value",
    weight_col: str | None = None,
    aliases: dict[str, str] | None = None,
    batch_size: int = 65536,
    skip_nulls: bool = False,
    salt: int | None = None,
) -> rd.Dataset:
    """Dataset -> one row per key combo with a column per requested op.

    Output column names are the op names (pre-alias), so they line up with
    the SQL oracles.

    ``salt=k`` enables explicit hot-key salting (north_star: skewed
    mega-cells): partials first merge under ``(keys..., _salt)`` — a
    deterministic per-batch value spreading one key's many partial rows
    over k reducers — then a second tiny groupby merges the k salted
    partials per key.  Exact for sums/counts/min/max; results are
    identical to the unsalted path (tested).
    """
    specs: list[OpSpec] = parse_ops(ops, aliases)
    keys = keys or ["admin_id"]
    if any(s.needs_weight for s in specs) and weight_col is None:
        raise ValueError("weighted op requested but no weight_col given")

    def _partial(b: pa.Table) -> pa.Table:
        out = partial_zonal(b, keys, value_col, weight_col, skip_nulls)
        if salt:
            # one deterministic salt per source batch: different batches of
            # the same hot key land on different reducers
            s = int(abs(out["sum_v"][0].as_py()) + len(b)) % salt if len(out) else 0
            out = out.append_column(
                "_salt", pa.array(np.full(len(out), s, dtype=np.int32))
            )
        return out

    partial = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    sum_aggs = lambda: [  # noqa: E731
        Sum(c, alias_name=c) for c in ["sum_v", "cnt", "sum_w", "sum_wv"]
    ]
    if salt:
        partial = partial.groupby(keys + ["_salt"]).aggregate(
            *sum_aggs(),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
        )
    merged = partial.groupby(keys).aggregate(
        *sum_aggs(),
        Min("min_v", alias_name="min_v"),
        Max("max_v", alias_name="max_v"),
    )

    out_names = [(o, parse_ops([o], aliases)[0]) for o in ops]

    def finalize(batch: pa.Table) -> pa.Table:
        sum_v = batch["sum_v"].to_numpy()
        cnt = batch["cnt"].to_numpy()
        sum_w = batch["sum_w"].to_numpy()
        sum_wv = batch["sum_wv"].to_numpy()
        cols: dict[str, pa.Array] = {k: batch[k] for k in keys}
        # 0/0 -> NaN is the defined result for zero-weight/empty groups
        # (matches SQL NULL semantics in the oracles)
        with np.errstate(divide="ignore", invalid="ignore"):
            for raw, spec in out_names:
                if spec.name == "mean":
                    v = sum_v / cnt
                elif spec.name == "sum":
                    v = sum_v
                elif spec.name == "count":
                    v = cnt
                elif spec.name == "min":
                    v = batch["min_v"].to_numpy()
                elif spec.name == "max":
                    v = batch["max_v"].to_numpy()
                elif spec.name == "weighted_sum":
                    v = sum_wv
                elif spec.name == "weighted_mean":
                    v = sum_wv / sum_w
                elif spec.name == "area_weighted_sum":
                    # geoglue's composite: weighted_sum / count (zonalstats.py:43-63)
                    v = sum_wv / cnt
                else:  # pragma: no cover
                    raise ValueError(spec.name)
                cols[raw] = pa.array(v)
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format="pyarrow")
