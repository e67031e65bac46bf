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
reach the shuffle; the final merge is a hash-bucketed vectorized reduction
(:func:`_merge_partials` — never a per-group-Python native aggregate).
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


def _factorize_keys(arrays: list[np.ndarray]):
    """Composite grouping over arbitrary-dtype key arrays, fully
    vectorized: per-column codes (pure ``np.unique`` for ints, factorize
    for the rest — null keys kept, SQL GROUP BY semantics), packed into
    one int64 and uniqued once.  Returns (per-key group values, per-row
    group index, n_groups)."""
    import pandas as pd

    codes, uniqs = [], []
    for arr in arrays:
        if arr.dtype.kind in "iu":  # pure-numpy hot path (no pandas): the
            # flagship shuffle keys are ints; a null-bearing int column
            # arrives as float64 and takes the factorize path below
            u_k, c_k = np.unique(arr, return_inverse=True)
        elif arr.dtype.kind in "Mm":  # factorize datetimes on the int64 view
            c_k, u_k = pd.factorize(arr.view(np.int64), use_na_sentinel=False)
            u_k = np.asarray(u_k).view(arr.dtype)
        else:
            c_k, u_k = pd.factorize(arr, use_na_sentinel=False)
            u_k = np.asarray(u_k)
        codes.append(c_k.astype(np.int64))
        uniqs.append(u_k)
    spans = [len(u) for u in uniqs]
    total_span = 1
    for s in spans:
        total_span *= s
    if len(arrays) == 1:  # codes are already dense group ids — no repack
        inv = codes[0]
        key_codes = [np.arange(spans[0])]
        n_groups = spans[0]
    elif total_span < (1 << 62):
        packed = codes[0]
        for c_k, s in zip(codes[1:], spans[1:]):
            packed = packed * s + c_k
        uniq_p, inv = np.unique(packed, return_inverse=True)
        key_codes, rem = [], uniq_p
        for s in reversed(spans):
            key_codes.append(rem % s)
            rem = rem // s
        key_codes = list(reversed(key_codes))
        n_groups = len(uniq_p)
    else:  # pragma: no cover - astronomically many distinct keys per batch
        stacked = np.stack(codes, axis=1)
        uniq_rows, inv = np.unique(stacked, axis=0, return_inverse=True)
        key_codes = [uniq_rows[:, i] for i in range(len(arrays))]
        n_groups = uniq_rows.shape[0]
    key_vals = []
    for i in range(len(arrays)):
        col = uniqs[i][key_codes[i]]
        if col.dtype == object:  # factorize encodes null keys as float NaN;
            col = col.copy()  # restore None so Arrow infers a string column
            col[pd.isna(col)] = None
        key_vals.append(col)
    return key_vals, inv, n_groups


def _fill_default(batch: pa.Table, col: str, default: float) -> pa.Table:
    """Replace null/NaN values with a default (exactextract's
    ``default_value`` / ``default_weight`` NODATA semantics,
    ``zonalstats.py:56-62``).  The cast to float64 happens BEFORE
    ``is_nan``: Arrow has no is_nan kernel for integer types, so an
    integer value/weight column would otherwise raise instead of
    null-filling (the cast is exact for the int range we aggregate)."""
    a = pc.cast(batch[col], pa.float64())
    mask = pc.or_kleene(pc.invert(pc.is_valid(a)), pc.is_nan(a))
    filled = pc.if_else(mask, pa.scalar(default, pa.float64()), a)
    return batch.set_column(batch.schema.get_field_index(col), col, filled)


def partial_zonal(
    batch: pa.Table,
    keys: list[str],
    value_col: str,
    weight_col: str | None,
    skip_nulls: bool = False,
    cov_col: str | None = None,
    default_value: float | None = None,
    default_weight: float | None = None,
):
    """Per-batch partial aggregation: one row per key combination.

    One unified vectorized path for every key dtype: each key column is
    factorized (``pd.factorize`` — null keys kept as their own group, SQL
    ``GROUP BY`` NULL semantics), the per-column codes are packed into one
    int64, and groups are formed with a single ``np.unique`` + argsort +
    ``reduceat`` pass.  No per-group Python, no pandas groupby.

    NaN semantics (both documented and uniform): with ``skip_nulls`` null/
    NaN values are dropped first; otherwise NaN propagates into sums/min/
    max and ``cnt`` counts all rows.  ``default_value``/``default_weight``
    replace NODATA before anything else (exactextract's defaults).

    ``cov_col`` switches to coverage-fraction semantics (exactextract):
    each row contributes with multiplicity ``cov`` — ``sum_v = Σ cov·v``,
    ``cnt = Σ cov``, ``sum_w = Σ cov·w``, ``sum_wv = Σ cov·w·v`` — while
    min/max stay over the (covered) values.
    """
    import pandas as pd

    if default_value is not None:
        batch = _fill_default(batch, value_col, default_value)
    if default_weight is not None and weight_col is not None:
        batch = _fill_default(batch, weight_col, default_weight)
    if skip_nulls:
        col = batch[value_col]
        mask = pc.and_kleene(pc.is_valid(col), pc.invert(pc.is_nan(col)))
        batch = batch.filter(mask)
    v = batch[value_col].to_numpy(zero_copy_only=False)
    w = batch[weight_col].to_numpy(zero_copy_only=False) if weight_col else None
    cov = batch[cov_col].to_numpy(zero_copy_only=False) if cov_col else None

    if len(v) == 0:  # typed empty: key dtypes straight from the batch schema
        t = batch.select(keys).slice(0, 0)
        for c in _PARTIALS:
            t = t.append_column(c, pa.array([], pa.float64()))
        return t

    key_vals, inv, n_groups = _factorize_keys(
        [batch[k].to_numpy(zero_copy_only=False) for k in keys]
    )
    key_cols = dict(zip(keys, key_vals))

    order = np.argsort(inv, kind="stable")
    starts = np.searchsorted(inv[order], np.arange(n_groups))
    vs = v[order]
    cv = cov[order] if cov is not None else None
    out = dict(key_cols)
    out["sum_v"] = np.add.reduceat(vs if cv is None else cv * vs, starts)
    if cv is None:
        out["cnt"] = np.diff(np.concatenate([starts, [len(vs)]])).astype(np.float64)
    else:
        out["cnt"] = np.add.reduceat(cv, starts)
    out["min_v"] = np.minimum.reduceat(vs, starts)
    out["max_v"] = np.maximum.reduceat(vs, starts)
    if w is not None:
        wm = w[order] if cv is None else cv * w[order]
        out["sum_w"] = np.add.reduceat(wm, starts)
        out["sum_wv"] = np.add.reduceat(wm * vs, starts)
    else:
        z = np.zeros(len(starts))
        out["sum_w"], out["sum_wv"] = z, z
    return pa.table(out)


def reduce_partials(t: pa.Table, keys: list[str]) -> pa.Table:
    """Re-reduce a table of partial rows to ONE row per key, vectorized
    (factorize + ``reduceat``, no per-group Python).  Used to collapse
    many per-slice partials inside a single task before they ship —
    the shuffle payload then stays key-cardinality sized no matter how
    many slices a task processed.  Exact: partial sums/counts are
    integer-valued doubles (order-independent), min/max order-free."""
    if len(t) == 0:
        return t
    key_vals, inv, n_groups = _factorize_keys(
        [t[k].to_numpy(zero_copy_only=False) for k in keys]
    )
    order = np.argsort(inv, kind="stable")
    starts = np.searchsorted(inv[order], np.arange(n_groups))
    out = dict(zip(keys, key_vals))
    for c in ("sum_v", "cnt", "sum_w", "sum_wv"):
        out[c] = np.add.reduceat(t[c].to_numpy()[order], starts)
    out["min_v"] = np.minimum.reduceat(t["min_v"].to_numpy()[order], starts)
    out["max_v"] = np.maximum.reduceat(t["max_v"].to_numpy()[order], starts)
    return pa.table(out)


_MERGE_MUL = np.uint64(0x9E3779B185EBCA87)


def _merge_partials(
    partial: rd.Dataset, keys: list[str], n_buckets: int = 32
) -> rd.Dataset:
    """Final merge of per-batch partials as a hash-bucketed vectorized
    reduction.  Ray's native sort-based ``groupby().aggregate`` pays
    per-group Python overhead — measured ~8 s to merge 127 k partial rows
    into 4 k groups, pathological at 10^5+ distinct keys (raster cells,
    daily series) — so the shuffle key here is a FIXED-cardinality bucket
    hashed from the group key, and each bucket task reduces its many
    groups in one factorize + ``reduceat`` pass.  Sums/counts stay exact
    (integer-valued partials are order-independent); min/max are
    order-free by definition."""
    import pandas as pd

    def add_bucket(b: pa.Table) -> pa.Table:
        h = np.zeros(len(b), dtype=np.uint64)
        for k in keys:
            arr = b[k].to_numpy(zero_copy_only=False)
            if arr.dtype.kind in "iu":
                v = arr.astype(np.uint64)
            elif arr.dtype.kind in "Mm":
                v = arr.view(np.int64).astype(np.uint64)
            else:  # strings/floats: stable elementwise hash (handles null)
                v = pd.util.hash_array(arr).astype(np.uint64)
            h = h * _MERGE_MUL + v
        return b.append_column("_mb", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        key_vals, inv, n_groups = _factorize_keys(
            [g[k].to_numpy() for k in keys]
        )
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(n_groups))
        out = dict(zip(keys, key_vals))
        for c in ("sum_v", "cnt", "sum_w", "sum_wv"):
            out[c] = np.add.reduceat(g[c].to_numpy()[order], starts)
        out["min_v"] = np.minimum.reduceat(g["min_v"].to_numpy()[order], starts)
        out["max_v"] = np.maximum.reduceat(g["max_v"].to_numpy()[order], starts)
        return pd.DataFrame(out)

    return (
        partial.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_mb")
        .map_groups(merge, batch_format="pandas")
    )


_ALLOWED_PARAMS = {"default_value", "default_weight", "coverage_weight"}


def _collect_param(specs: list[OpSpec], name: str) -> str | None:
    """One shared value for an op param across all requested ops (partials
    are shared, so per-op divergent defaults cannot be honored — error)."""
    vals = {s.param_dict[name] for s in specs if name in s.param_dict}
    if len(vals) > 1:
        raise ValueError(f"conflicting {name!r} across ops: {sorted(vals)}")
    return vals.pop() if vals else None


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
    cov_col: str | None = None,
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
    for s in specs:
        unknown = set(s.param_dict) - _ALLOWED_PARAMS
        if unknown:
            raise ValueError(f"unknown op params {sorted(unknown)} in {s.name!r}")
    dv = _collect_param(specs, "default_value")
    dw = _collect_param(specs, "default_weight")
    default_value = float(dv) if dv is not None else None
    default_weight = float(dw) if dw is not None else None
    if default_value is not None and skip_nulls:
        raise ValueError("default_value replaces NODATA; skip_nulls would drop it")
    cw = _collect_param(specs, "coverage_weight")
    if cw is not None and cov_col is None:
        raise ValueError(
            "coverage_weight requires coverage-fraction input: build the cov "
            "column with stages.coverage (coverage_weight=...) and pass cov_col"
        )

    def _partial(b: pa.Table) -> pa.Table:
        out = partial_zonal(
            b, keys, value_col, weight_col, skip_nulls,
            cov_col=cov_col, default_value=default_value, default_weight=default_weight,
        )
        if salt:
            # one deterministic salt per source batch: different batches of
            # the same hot key land on different reducers
            s = int(abs(out["sum_v"][0].as_py()) + len(b)) % salt if len(out) else 0
            out = out.append_column(
                "_salt", pa.array(np.full(len(out), s, dtype=np.int32))
            )
        return out

    partial = ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size)
    if salt:
        partial = _merge_partials(partial, keys + ["_salt"])
    merged = _merge_partials(partial, keys)

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
