"""Mergeable sketches: HyperLogLog approximate distinct count.

The reference has no approximate aggregates, but a 10^12-row engine needs
them (SURVEY.md §2.5 notes the gap); HLL is the canonical mergeable-sketch
pattern for Ray Data: each ``map_batches`` task emits ONE serialized
register array per group, sketches merge with an elementwise max in a tiny
groupby, and the estimate is computed in a final stateless step.  Standard
HLL with the Flajolet et al. bias corrections; p=12 -> 4096 registers,
~1.6% relative error.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

P = 12
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _registers(values: np.ndarray) -> np.ndarray:
    """One HLL register array (uint8[M]) from hashed values."""
    h = pd.util.hash_array(values).astype(np.uint64)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = (h << np.uint64(P)) | np.uint64((1 << P) - 1)
    # rank = leading zeros of `rest` + 1.  Exact vectorized bit-length via
    # 32-bit halves (32-bit ints are exactly representable in float64, so
    # frexp gives the true exponent; a direct u64->f64 frexp can round a
    # 53-ones mantissa up across a power of two and miscount by one).
    hi = (rest >> np.uint64(32)).astype(np.uint32)
    lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    def _bl32(x: np.ndarray) -> np.ndarray:
        e = np.frexp(x.astype(np.float64))[1]
        return np.where(x == 0, 0, e).astype(np.int64)

    bit_length = np.where(hi > 0, 32 + _bl32(hi), _bl32(lo))
    rank = (64 - bit_length + 1).astype(np.uint8)  # rest!=0 by construction
    regs = np.zeros(M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def merge_registers(regs: list[np.ndarray]) -> np.ndarray:
    out = np.zeros(M, dtype=np.uint8)
    for r in regs:
        np.maximum(out, r, out=out)
    return out


def estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL cardinality estimate."""
    e = _ALPHA * M * M / np.sum(2.0 ** (-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if e <= 2.5 * M and zeros:
        return M * np.log(M / zeros)  # linear counting, small range
    return float(e)


def deterministic_sample(
    ds: rd.Dataset, rate: float, key_col: str, seed: int = 0
) -> rd.Dataset:
    """Deterministic uniform sample: keep rows whose key hash falls below
    ``rate`` of the hash space.  Unlike ``ds.random_sample`` this is
    reproducible across runs/cluster sizes and consistent per key (the
    same key is always in or out — the property dedup/eval splits need).
    """
    threshold = np.uint64(int(rate * float(2**64 - 1)))
    salt = np.uint64(seed * 0x9E3779B97F4A7C15 % (1 << 64))

    def keep(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(b[key_col].to_numpy(zero_copy_only=False)).astype(np.uint64)
        return b.filter(pa.array((h ^ salt) <= threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def _bottomk(values: np.ndarray, hashes: np.ndarray, k: int):
    if len(values) <= k:
        return hashes, values
    part = np.argpartition(hashes, k - 1)[:k]
    return hashes[part], values[part]


def approx_quantiles(
    ds: rd.Dataset,
    value_col: str,
    quantiles: list[float],
    key_col: str,
    k: int = 4096,
) -> dict[float, float]:
    """Approximate quantiles via a mergeable bottom-k-by-hash sample.

    Each batch keeps the k (hash, value) pairs with the smallest row
    hashes; merged bottom-k of a union is the bottom-k of the union, so
    the sketch is order-independent and deterministic, and the surviving
    values are a uniform sample of the population (error ~ 1/sqrt(k)).
    ``key_col`` must be row-unique — hashing the values themselves would
    collapse duplicate values onto one hash and break sample uniformity.
    Returns a small driver-side dict — the canonical "tiny result" shape.

    Merge topology: per-batch bottom-k partials reduce through a
    ``groupby(shard)`` stage (shard = hash % n_shards, so each shard's
    bottom-k is a superset of its contribution to the global bottom-k)
    before the driver sees anything — the driver holds at most
    ``n_shards * k`` rows regardless of block count, instead of
    O(blocks * k).
    """

    n_shards = 16

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        basis = b[key_col].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.ascontiguousarray(basis)).astype(np.uint64)
        hh, vv = _bottomk(v, h, k)
        return pa.table(
            {
                "_shard": (hh % np.uint64(n_shards)).astype(np.int64),
                "_h": hh.view(np.int64),
                "_v": vv,
            }
        )

    def shard_merge(g: pd.DataFrame) -> pd.DataFrame:
        hh, vv = _bottomk(
            g["_v"].to_numpy(), g["_h"].to_numpy().view(np.uint64), k
        )
        return pd.DataFrame(
            {"_h": hh.view(np.int64).astype(np.int64), "_v": vv.astype(np.float64)}
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_merge, batch_format="pandas")
        .take_all()
    )
    h = np.array([r["_h"] for r in merged], dtype=np.int64).view(np.uint64)
    v = np.array([r["_v"] for r in merged])
    _, v = _bottomk(v, h, k)
    return {q: float(np.quantile(v, q)) for q in quantiles}


def approx_distinct(
    ds: rd.Dataset, group_keys: list[str], distinct_col: str, out_col: str = "approx_distinct"
) -> rd.Dataset:
    """Approximate COUNT(DISTINCT distinct_col) GROUP BY group_keys.

    partial: one sketch per (group x batch) -> shuffle moves 4 KiB
    sketches, never values -> merge by elementwise max -> estimate.
    """

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {**{k: pa.array([], b.schema.field(k).type) for k in group_keys},
                 "_sketch": pa.array([], pa.binary())}
            )
        df = pa.table({k: b[k] for k in group_keys}).to_pandas()
        df["_v"] = b[distinct_col].to_numpy(zero_copy_only=False)
        rows = []
        for key, g in df.groupby(group_keys, sort=False, dropna=False):
            key = key if isinstance(key, tuple) else (key,)
            rows.append((*key, _registers(g["_v"].to_numpy()).tobytes()))
        out = pd.DataFrame(rows, columns=[*group_keys, "_sketch"])
        return pa.Table.from_pandas(out, preserve_index=False)

    sketches = ds.map_batches(partial, batch_format="pyarrow")

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        regs = merge_registers([np.frombuffer(s, dtype=np.uint8) for s in g["_sketch"]])
        out = g.iloc[:1][group_keys].copy()
        out[out_col] = estimate(regs)
        return out

    return sketches.groupby(group_keys).map_groups(merge_group, batch_format="pandas")


_U64F = 18446744073709551616.0  # 2**64 as float64 (exact)


def kmv_distinct(
    ds: rd.Dataset,
    group_keys: list[str],
    distinct_col: str,
    k: int = 256,
    n_merge: int = 8,
    out_col: str = "approx_distinct",
) -> rd.Dataset:
    """KMV (bottom-k-by-hash) distinct-count sketch with a BIT-EXACT SQL
    twin — unlike HLL, whose linear-counting branch needs ``ln()``
    (DuckDB's ``ln`` differs from numpy in the last ulp, CLAUDE.md).

    Per group: hash ``distinct_col`` with :func:`kmv_hash64` (HUGEINT-
    reproducible, strong enough for order statistics), keep the k
    smallest distinct hashes.  Estimate =
    ``(k-1) * 2**64 / h_k`` where ``h_k`` is the k-th smallest — a single
    correctly-rounded division of exactly-mirrored operands — or the EXACT
    distinct count when fewer than k distinct hashes exist (bottom-k then
    holds the whole set; a shard can only truncate when the global count
    already exceeds k, so engine and oracle take the same branch).
    Relative error ~ 1/sqrt(k-2).

    Scale shape: per-batch vectorized dedup+bottom-k -> two-level merge
    keyed on (group, h % n_merge) so no task ever sees more than
    O(parts-per-shard * k) rows -> final per-group bottom-k + estimate.
    Shuffles move at most k 8-byte hashes per (group, batch).
    """
    import pandas as pd

    from geoglue_ray.functions.texthash import kmv_hash64

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {
                    **{g: pa.array([], b.schema.field(g).type) for g in group_keys},
                    "_ms": pa.array([], pa.int64()),
                    "_h": pa.array([], pa.int64()),
                }
            )
        h = kmv_hash64(b[distinct_col].to_numpy(zero_copy_only=False))
        gcols = {g: b[g].to_numpy(zero_copy_only=False) for g in group_keys}
        if len(group_keys) == 1:
            codes, uniq = pd.factorize(gcols[group_keys[0]], use_na_sentinel=False)
            uniqs = [uniq]
        else:
            mi_codes, uniq_tuples = pd.factorize(
                pd.MultiIndex.from_arrays(list(gcols.values())), use_na_sentinel=False
            )
            codes = mi_codes
            uniqs = [np.array([t[i] for t in uniq_tuples]) for i in range(len(group_keys))]
        order = np.lexsort((h, codes))
        cs, hs = codes[order], h[order]
        keep = np.r_[True, (cs[1:] != cs[:-1]) | (hs[1:] != hs[:-1])]  # dedup
        cs, hs = cs[keep], hs[keep]
        starts = np.r_[0, np.flatnonzero(cs[1:] != cs[:-1]) + 1]
        rank = np.arange(len(cs)) - np.repeat(starts, np.diff(np.r_[starts, len(cs)]))
        top = rank < k
        cs, hs = cs[top], hs[top]
        return pa.table(
            {
                **{
                    g: pa.array(uniqs[i][cs])
                    for i, g in enumerate(group_keys)
                },
                "_ms": pa.array((hs % np.uint64(n_merge)).astype(np.int64)),
                "_h": pa.array(hs.view(np.int64)),
            }
        )

    def shard_merge(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["_h"].to_numpy().view(np.uint64))[:k]
        out = pd.DataFrame({c: np.repeat(g[c].iloc[:1].to_numpy(), len(u)) for c in group_keys})
        out["_h"] = u.view(np.int64)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["_h"].to_numpy().view(np.uint64))
        if len(u) < k:
            est = float(len(u))
        else:
            hk = float(u[k - 1])  # round-to-nearest, mirrored in SQL
            est = (k - 1) * _U64F / hk
        out = g.iloc[:1][group_keys].copy()
        out[out_col] = np.float64(est)
        return out

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([*group_keys, "_ms"])
        .map_groups(shard_merge, batch_format="pandas")
    )
    return merged.groupby(group_keys).map_groups(final, batch_format="pandas")


def sql_kmv_distinct(
    table: str, group_col: str, distinct_col: str, k: int = 256, out_col: str = "approx_distinct"
) -> str:
    """DuckDB twin of :func:`kmv_distinct` (single group key): distinct
    :func:`sql_int_hash` values, k-th smallest per group, the identical
    estimate arithmetic.  The HUGEINT -> DOUBLE conversion is spelled as
    ``hi*2**32 + lo`` (exact halves, one rounded add) == numpy's
    round-to-nearest uint64 cast."""
    from geoglue_ray.functions.texthash import sql_kmv_hash

    hh_dbl = (
        "(CAST(hh // 4294967296 AS DOUBLE) * 4294967296.0"
        " + CAST(hh % 4294967296 AS DOUBLE))"
    )
    return f"""
WITH kmv_h AS (
  SELECT DISTINCT {group_col}, {sql_kmv_hash(distinct_col)} AS hh FROM {table}),
kmv_r AS (
  SELECT {group_col}, hh,
         row_number() OVER (PARTITION BY {group_col} ORDER BY hh) AS rk,
         count(*) OVER (PARTITION BY {group_col}) AS nd
  FROM kmv_h)
SELECT {group_col},
       CASE WHEN nd < {k} THEN CAST(nd AS DOUBLE)
            ELSE {float(k - 1)} * {_U64F} / {hh_dbl} END AS {out_col}
FROM kmv_r WHERE rk = LEAST(nd, {k})
"""


_HQ_MUL = np.uint64(0x9E3779B185EBCA87)


def _hist_reduce(df: pd.DataFrame, key_col: str) -> tuple:
    """Collapse (key, value, cnt) rows to one row per (key, value) —
    factorize + lexsort + run-detect + reduceat, no per-group Python.
    Returns (keys, values, counts) with values sorted within key."""
    codes, uniq = pd.factorize(df[key_col].to_numpy(), use_na_sentinel=False)
    v = df["_v"].to_numpy()
    cnt = df["_n"].to_numpy()
    order = np.lexsort((v, codes))
    cs, vs, cn = codes[order], v[order], cnt[order]
    brk = np.r_[True, (cs[1:] != cs[:-1]) | (vs[1:] != vs[:-1])]
    starts = np.flatnonzero(brk)
    return uniq[cs[starts]], vs[starts], np.add.reduceat(cn, starts)


def _hist_pipeline(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    shard_fn,
    n_buckets: int,
    n_shards: int,
) -> rd.Dataset:
    """Shared skeleton of the exact value-histogram aggregates
    (:func:`exact_quantiles` / :func:`gini` / :func:`outlier_counts`):
    per-batch (key, value, count) histograms -> (key, value)-bucketed
    merge -> key-sharded ``shard_fn`` computing the per-key statistic in
    one vectorized pass.  Shuffle payload is (key x distinct-value) rows
    at every stage."""

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:  # typed empty — untyped empties corrupt block schemas
            return pa.table(
                {
                    "_b": pa.array([], pa.int64()),
                    key_col: pa.array([], b.schema.field(key_col).type),
                    "_v": pa.array([], pa.float64()),
                    "_n": pa.array([], pa.float64()),
                }
            )
        df = pd.DataFrame(
            {
                key_col: b[key_col].to_numpy(zero_copy_only=False),
                "_v": b[value_col].to_numpy(zero_copy_only=False).astype(np.float64),
                "_n": np.ones(len(b), dtype=np.float64),
            }
        )
        k, v, n = _hist_reduce(df, key_col)
        kh = pd.util.hash_array(np.ascontiguousarray(k)).astype(np.uint64)
        bucket = ((kh ^ v.view(np.uint64)) * _HQ_MUL) % np.uint64(n_buckets)
        return pa.table(
            {
                "_b": pa.array(bucket.astype(np.int64)),
                key_col: pa.array(k),
                "_v": pa.array(v),
                "_n": pa.array(n),
            }
        )

    def merge_hist(g: pd.DataFrame) -> pd.DataFrame:
        k, v, n = _hist_reduce(g, key_col)
        kh = pd.util.hash_array(np.ascontiguousarray(k)).astype(np.uint64)
        shard = ((kh * _HQ_MUL) % np.uint64(n_shards)).astype(np.int64)
        return pd.DataFrame({"_s": shard, key_col: k, "_v": v, "_n": n})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge_hist, batch_format="pandas")
        .groupby("_s")
        .map_groups(shard_fn, batch_format="pandas")
    )


def exact_quantiles(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.75),
    n_buckets: int = 64,
    n_shards: int = 32,
) -> rd.Dataset:
    """EXACT per-key quantiles + median via a value histogram — the
    scale path for quantiles over a DISCRETE measure (integer-valued /
    binned doubles; for unbounded continuous values use
    :func:`approx_quantiles`).  Partitioning assumption: the shuffle
    payload is (key x distinct-value) histogram rows, never raw rows, so
    the distinct-value count per key must be bounded (here: fixture
    measures live in [0, 65536)).

    Quantile rule mirrors DuckDB ``quantile_disc`` exactly (probed:
    0-based index ``ceil(q*n) - 1`` == first position whose cumulative
    count reaches ``ceil(q*n)``); ``median_val`` averages the two middle
    elements for even n (exact: integer-valued doubles).  Both reduce
    stages are fixed-cardinality shuffles (hash % n_buckets / n_shards)
    with all of a task's keys processed in one lexsort + reduceat pass.
    The per-key search is one ``searchsorted`` on the GLOBAL cumulative
    count array with per-key offset targets — no per-key Python."""

    def shard_quantiles(g: pd.DataFrame) -> pd.DataFrame:
        k, v, n = _hist_reduce(g, key_col)
        codes, uniq = pd.factorize(k, use_na_sentinel=False)
        # _hist_reduce output is already (key, value)-sorted with stable
        # factorize codes in first-appearance == sorted-run order
        cum = np.cumsum(n)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], len(codes)] - 1
        base = np.r_[0.0, cum[ends[:-1]]][: len(starts)]
        nk = cum[ends] - base
        out = {key_col: uniq[codes[starts]], "n_rows": nk}
        for q in quantiles:
            t = np.ceil(q * nk)
            idx = np.searchsorted(cum, base + t, side="left")
            out[f"p{int(round(q * 100))}"] = v[idx]
        t1 = np.floor((nk + 1) / 2)
        t2 = np.floor(nk / 2) + 1
        lo = v[np.searchsorted(cum, base + t1, side="left")]
        hi = v[np.searchsorted(cum, base + t2, side="left")]
        out["median_val"] = (lo + hi) / 2.0
        return pd.DataFrame(out)

    return _hist_pipeline(ds, key_col, value_col, shard_quantiles, n_buckets, n_shards)




def weighted_median(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    weight_col: str,
    n_buckets: int = 64,
    n_shards: int = 32,
) -> rd.Dataset:
    """EXACT per-key weighted median over a discrete measure with
    integer-valued weights: smallest value whose cumulative weight
    reaches half the key's total (``2*cumw >= totw`` — all-integer
    comparisons, bit-exact vs the SQL window twin).

    Same scale shape as :func:`exact_quantiles`: per-batch (key, value)
    weight histograms -> two fixed-cardinality reduce stages -> one
    global searchsorted with per-key offset targets.  Shuffle payload is
    (key x distinct-value) rows, never raw rows."""

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {
                    "_b": pa.array([], pa.int64()),
                    key_col: pa.array([], b.schema.field(key_col).type),
                    "_v": pa.array([], pa.float64()),
                    "_n": pa.array([], pa.float64()),
                }
            )
        df = pd.DataFrame(
            {
                key_col: b[key_col].to_numpy(zero_copy_only=False),
                "_v": b[value_col].to_numpy(zero_copy_only=False).astype(np.float64),
                "_n": b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64),
            }
        )
        k, v, w = _hist_reduce(df, key_col)
        kh = pd.util.hash_array(np.ascontiguousarray(k)).astype(np.uint64)
        bucket = ((kh ^ v.view(np.uint64)) * _HQ_MUL) % np.uint64(n_buckets)
        return pa.table(
            {
                "_b": pa.array(bucket.astype(np.int64)),
                key_col: pa.array(k),
                "_v": pa.array(v),
                "_n": pa.array(w),
            }
        )

    def merge_hist(g: pd.DataFrame) -> pd.DataFrame:
        k, v, w = _hist_reduce(g, key_col)
        kh = pd.util.hash_array(np.ascontiguousarray(k)).astype(np.uint64)
        shard = ((kh * _HQ_MUL) % np.uint64(n_shards)).astype(np.int64)
        return pd.DataFrame({"_s": shard, key_col: k, "_v": v, "_n": w})

    def shard_wmedian(g: pd.DataFrame) -> pd.DataFrame:
        k, v, w = _hist_reduce(g, key_col)
        codes, uniq = pd.factorize(k, use_na_sentinel=False)
        cum = np.cumsum(w)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], len(codes)] - 1
        base = np.r_[0.0, cum[ends[:-1]]][: len(starts)]
        totw = cum[ends] - base
        idx = np.searchsorted(2.0 * cum, 2.0 * base + totw, side="left")
        return pd.DataFrame(
            {
                key_col: uniq[codes[starts]],
                "total_w": totw,
                "wmedian": v[idx],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge_hist, batch_format="pandas")
        .groupby("_s")
        .map_groups(shard_wmedian, batch_format="pandas")
    )


def gini(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    n_buckets: int = 64,
    n_shards: int = 32,
) -> rd.Dataset:
    """EXACT per-key Gini coefficient over an integer-valued non-negative
    measure: ``G = (2*sum(i*x_(i)) - (n+1)*sum(x)) / (n*sum(x))`` with x
    ascending, computed from the value HISTOGRAM — a run of c equal
    values v with S values below contributes ``v*(S*c + c*(c+1)/2)`` to
    the rank-weighted sum, so tie order never matters and the whole chain
    is exact int64 until ONE final division (bit-exact vs the SQL
    row_number twin).  Same scale shape as :func:`exact_quantiles`:
    per-batch histograms -> two fixed-cardinality reduces -> vectorized
    per-key closed form; shuffle payload is (key x distinct-value) rows.
    int64 bound: needs ``n_k * sum_k(x) < 2^63`` per key — holds to
    ~10^9 rows/key at fixture-scale measures; beyond that, split the
    rank-weighted sum into per-shard HUGEINT-style (hi, lo) pairs."""

    def shard_gini(g: pd.DataFrame) -> pd.DataFrame:
        k, v, n = _hist_reduce(g, key_col)
        c = n.astype(np.int64)
        vi = v.astype(np.int64)
        codes, uniq = pd.factorize(k, use_na_sentinel=False)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        seg_len = np.diff(np.r_[starts, len(codes)])
        cumc = np.cumsum(c)
        key_base = np.repeat(np.r_[0, cumc[starts[1:] - 1]], seg_len)
        below = (cumc - c) - key_base  # count strictly below each run, within key
        rank_sum = below * c + (c * (c + 1)) // 2
        contrib = vi * rank_sum
        ends = np.r_[starts[1:], len(codes)] - 1
        nk = cumc[ends] - np.r_[0, cumc[ends[:-1]]][: len(starts)]
        cumt = np.cumsum(vi * c)
        tot = cumt[ends] - np.r_[0, cumt[ends[:-1]]][: len(starts)]
        cumr = np.cumsum(contrib)
        rsum = cumr[ends] - np.r_[0, cumr[ends[:-1]]][: len(starts)]
        num = 2 * rsum - (nk + 1) * tot
        den = nk * tot
        with np.errstate(divide="ignore", invalid="ignore"):
            g_val = num.astype(np.float64) / den.astype(np.float64)
        return pd.DataFrame(
            {
                key_col: uniq[codes[starts]],
                "n_obs": nk,
                "total": tot,
                "gini": g_val,
            }
        )

    return _hist_pipeline(ds, key_col, value_col, shard_gini, n_buckets, n_shards)


def outlier_counts(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    n_sigma: int = 2,
    n_buckets: int = 64,
    n_shards: int = 32,
) -> rd.Dataset:
    """EXACT per-key two-sided n-sigma outlier counts over an
    integer-valued measure — the data-quality screen that normally needs
    mean/std, made bit-exact by clearing denominators:
    ``|x - mu| > s*sigma  <=>  (n*x - S)^2 > s^2 * (n*SS - S^2)`` with
    S = sum(x), SS = sum(x^2) — an all-integer comparison, no sqrt and no
    division until the single reported ``mean_val = S/n``.

    Same histogram scale shape as :func:`gini` (partials -> two
    fixed-cardinality reduces -> vectorized per-key closed form; the
    comparison runs once per (key, distinct value) RUN, and every row of
    a run shares the verdict).  int64 bound: needs
    ``s^2 * n_k * SS_k < 2^63`` per key — holds to ~10^7 rows/key at
    fixture-scale measures (the SQL twin computes the products in
    HUGEINT, so an engine-side overflow would redline the gate rather
    than pass silently)."""

    def shard_outliers(g: pd.DataFrame) -> pd.DataFrame:
        k, v, n = _hist_reduce(g, key_col)
        c = n.astype(np.int64)
        vi = v.astype(np.int64)
        codes, uniq = pd.factorize(k, use_na_sentinel=False)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        seg_len = np.diff(np.r_[starts, len(codes)])
        ends = np.r_[starts[1:], len(codes)] - 1

        def seg_sum(x: np.ndarray) -> np.ndarray:
            cs = np.cumsum(x)
            return cs[ends] - np.r_[0, cs[ends[:-1]]][: len(starts)]

        nk = seg_sum(c)
        S = seg_sum(c * vi)
        SS = seg_sum(c * vi * vi)
        n_r = np.repeat(nk, seg_len)
        S_r = np.repeat(S, seg_len)
        SS_r = np.repeat(SS, seg_len)
        d = n_r * vi - S_r
        flag = d * d > (n_sigma * n_sigma) * (n_r * SS_r - S_r * S_r)
        n_out = seg_sum(np.where(flag, c, 0))
        return pd.DataFrame(
            {
                key_col: uniq[codes[starts]],
                "n_obs": nk,
                "mean_val": S.astype(np.float64) / nk.astype(np.float64),
                "n_outliers": n_out,
            }
        )

    return _hist_pipeline(ds, key_col, value_col, shard_outliers, n_buckets, n_shards)


def majority_minority(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    n_buckets: int = 64,
    n_shards: int = 32,
) -> rd.Dataset:
    """Per-key MAJORITY (mode), MINORITY and VARIETY over a discrete
    measure — the exactextract zonal statistics the reference's op
    grammar doesn't reach (exactextract docs: majority/minority/variety;
    reference zonalstats.py drives exactextract ops).  Ties break to the
    SMALLEST value on both statistics — a total order, so the SQL
    row_number twin is deterministic and bit-exact.

    Same :func:`_hist_pipeline` scale shape; the per-key argmax/argmin
    is a reduceat + first-flagged-position pass, no per-group Python."""

    def shard_mode(g: pd.DataFrame) -> pd.DataFrame:
        k, v, n = _hist_reduce(g, key_col)
        c = n.astype(np.int64)
        codes, uniq = pd.factorize(k, use_na_sentinel=False)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        seg_len = np.diff(np.r_[starts, len(codes)])
        cmax = np.repeat(np.maximum.reduceat(c, starts), seg_len)
        cmin = np.repeat(np.minimum.reduceat(c, starts), seg_len)
        pos = np.arange(len(codes))
        # v ascends within a key, so the FIRST position hitting the
        # extreme count is the smallest-value tie-winner
        maj_idx = np.minimum.reduceat(np.where(c == cmax, pos, len(codes)), starts)
        min_idx = np.minimum.reduceat(np.where(c == cmin, pos, len(codes)), starts)
        return pd.DataFrame(
            {
                key_col: uniq[codes[starts]],
                "majority_val": v[maj_idx],
                "majority_n": c[maj_idx],
                "minority_val": v[min_idx],
                "minority_n": c[min_idx],
                "variety": seg_len.astype(np.int64),
            }
        )

    return _hist_pipeline(ds, key_col, value_col, shard_mode, n_buckets, n_shards)


def diversity(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    n_buckets: int = 64,
    n_shards: int = 32,
) -> rd.Dataset:
    """Per-key Simpson diversity index and dominance over a discrete
    measure — the standard zonal diversity statistics (landscape-ecology
    companion to exactextract's variety): ``simpson = 1 - sum(c_i^2)/n^2
    = (n^2 - sum(c_i^2))/n^2`` and ``dominance = c_max/n``, each ONE
    double division over exact int64 integers, so the SQL twin is
    bit-exact.  Same :func:`_hist_pipeline` scale shape."""

    def shard_div(g: pd.DataFrame) -> pd.DataFrame:
        k, v, n = _hist_reduce(g, key_col)
        c = n.astype(np.int64)
        codes, uniq = pd.factorize(k, use_na_sentinel=False)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], len(codes)] - 1

        def seg_sum(x: np.ndarray) -> np.ndarray:
            cs = np.cumsum(x)
            return cs[ends] - np.r_[0, cs[ends[:-1]]][: len(starts)]

        nk = seg_sum(c)
        sq = seg_sum(c * c)
        cmax = np.maximum.reduceat(c, starts)
        n2 = (nk * nk).astype(np.float64)
        return pd.DataFrame(
            {
                key_col: uniq[codes[starts]],
                "n_obs": nk,
                "variety": np.diff(np.r_[starts, len(codes)]).astype(np.int64),
                "simpson": (nk * nk - sq).astype(np.float64) / n2,
                "dominance": cmax.astype(np.float64) / nk.astype(np.float64),
            }
        )

    return _hist_pipeline(ds, key_col, value_col, shard_div, n_buckets, n_shards)


def comoment_stats(
    ds: rd.Dataset,
    key_col: str,
    x_col: str,
    y_col: str,
    n_shards: int = 32,
) -> rd.Dataset:
    """EXACT per-key bivariate second-moment profile over integer-valued
    measures: population variance and covariance with cleared
    denominators — ``var_x = (n*Sxx - Sx^2)/n^2``, ``cov_xy =
    (n*Sxy - Sx*Sy)/n^2`` — every sum and product exact int64, ONE double
    division per reported statistic, so the SQL twin is bit-exact
    (correlation needs sqrt and is deliberately absent; divide
    downstream if tolerance is acceptable)."""

    def project(keys, sums) -> pd.DataFrame:
        n, sx, sy = sums["_n"], sums["_sx"], sums["_sy"]
        nf, n2f = n.astype(np.float64), (n * n).astype(np.float64)
        return pd.DataFrame(
            {
                key_col: keys,
                "n_obs": n,
                "mean_x": sx.astype(np.float64) / nf,
                "mean_y": sy.astype(np.float64) / nf,
                "var_x": (n * sums["_sxx"] - sx * sx).astype(np.float64) / n2f,
                "var_y": (n * sums["_syy"] - sy * sy).astype(np.float64) / n2f,
                "cov_xy": (n * sums["_sxy"] - sx * sy).astype(np.float64) / n2f,
            }
        )

    empty = {"n_obs": np.int64, "mean_x": np.float64, "mean_y": np.float64,
             "var_x": np.float64, "var_y": np.float64, "cov_xy": np.float64}
    return _bivariate_sums(ds, key_col, x_col, y_col, n_shards, project, empty)


def trend_stats(
    ds: rd.Dataset,
    key_col: str,
    x_col: str,
    y_col: str,
    n_shards: int = 32,
) -> rd.Dataset:
    """EXACT per-key OLS linear trend ``y = slope*x + intercept`` over
    integer-valued (x, y): ``slope = (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2)``
    (one division of exact int64 sums), ``intercept = (Sy - slope*Sx)/n``
    (a fixed single-op chain) — the per-zone temporal-trend operator
    (e.g. warming rate per admin unit).  Same partial/merge skeleton and
    int64 bound as :func:`comoment_stats`; keys whose x is constant
    divide by zero (IEEE inf/NaN), mirroring SQL only when the fixture
    guarantees x varies per key."""

    def project(keys, sums) -> pd.DataFrame:
        n, sx, sy = sums["_n"], sums["_sx"], sums["_sy"]
        nf = n.astype(np.float64)
        slope = (n * sums["_sxy"] - sx * sy).astype(np.float64) / (
            n * sums["_sxx"] - sx * sx
        ).astype(np.float64)
        return pd.DataFrame(
            {
                key_col: keys,
                "n_obs": n,
                "slope": slope,
                "intercept": (sy.astype(np.float64) - slope * sx.astype(np.float64))
                / nf,
            }
        )

    empty = {"n_obs": np.int64, "slope": np.float64, "intercept": np.float64}
    return _bivariate_sums(ds, key_col, x_col, y_col, n_shards, project, empty)


def dispersion_stats(
    ds: rd.Dataset,
    key_col: str,
    x_col: str,
    y_col: str,
    x0: float = 102.0,
    y0: float = 8.0,
    scale: float = 1048576.0,
    n_shards: int = 32,
) -> rd.Dataset:
    """EXACT per-key spatial dispersion profile over INTEGER-SCALED
    planar coordinates (``ix = (lon - x0) * scale`` etc., exact because
    fixture coordinates are dyadic on a grid no finer than ``1/scale``):
    mean center, the standard-deviational-ellipse second moments
    (population var_x / var_y / cov_xy in degrees^2) and the radius of
    gyration ``rog = sqrt(var_x + var_y)`` — the movement-analysis /
    point-distribution operator pair (ArcGIS "standard distance" +
    "directional distribution"; mobility radius-of-gyration).

    Shares the :func:`comoment_stats` partial/merge skeleton (shuffle
    payload = key cardinality x 7 int64s per batch).  Projection keeps
    products in FLOAT (never the cleared-int form), so the only int64
    bound is the sums themselves (``Sxx_k <= n_k * (8.4e6)^2`` — holds
    to ~10^5 points per key); every division/multiply is one mirrored
    IEEE op and the final ``/ scale`` steps are exact powers of two, so
    the SQL twin is bit-exact.  The ellipse ORIENTATION (atan2) is
    deliberately absent — transcendental functions don't reproduce
    across engines (CLAUDE.md ln() lesson)."""
    s2 = scale * scale

    def project(keys, sums) -> pd.DataFrame:
        n = sums["_n"]
        nf = n.astype(np.float64)
        sxf = sums["_sx"].astype(np.float64)
        syf = sums["_sy"].astype(np.float64)
        mxs = sxf / nf  # scaled means (exact-sum ratios)
        mys = syf / nf
        var_x = (sums["_sxx"].astype(np.float64) / nf - mxs * mxs) / s2
        var_y = (sums["_syy"].astype(np.float64) / nf - mys * mys) / s2
        cov_xy = (sums["_sxy"].astype(np.float64) / nf - mxs * mys) / s2
        rog2 = var_x + var_y
        return pd.DataFrame(
            {
                key_col: keys,
                "n_obs": n,
                "mean_lon": x0 + mxs / scale,
                "mean_lat": y0 + mys / scale,
                "var_x": var_x,
                "var_y": var_y,
                "cov_xy": cov_xy,
                "rog": np.sqrt(np.maximum(rog2, 0.0)),
            }
        )

    empty = {"n_obs": np.int64, "mean_lon": np.float64, "mean_lat": np.float64,
             "var_x": np.float64, "var_y": np.float64, "cov_xy": np.float64,
             "rog": np.float64}
    return _bivariate_sums(ds, key_col, x_col, y_col, n_shards, project, empty)


def _bivariate_sums(
    ds: rd.Dataset,
    key_col: str,
    x_col: str,
    y_col: str,
    n_shards: int,
    project,
    empty_schema: dict,
) -> rd.Dataset:
    """Shared skeleton of the exact bivariate-moment family: per-batch
    (n, Sx, Sy, Sxx, Syy, Sxy) partials via one lexsort+reduceat pass
    (int64-exact, never float bincount), fixed-shard merge, then a
    caller-supplied closed-form projection per key.  Shuffle payload =
    key cardinality x 7 int64s per batch.  int64 bound: ``n_k * Sxy_k <
    2^63`` per key (and < 2^53 where the SQL twin must CAST the cleared
    numerator to DOUBLE without rounding)."""
    from geoglue_ray.functions.texthash import token_hash64

    part_cols = ("_n", "_sx", "_sy", "_sxx", "_syy", "_sxy")

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {
                    "_s": pa.array([], pa.int64()),
                    key_col: pa.array([], b.schema.field(key_col).type),
                    **{c: pa.array([], pa.int64()) for c in part_cols},
                }
            )
        k = b[key_col].to_numpy(zero_copy_only=False)
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes, uniq = pd.factorize(k, use_na_sentinel=False)
        o = np.argsort(codes, kind="stable")
        cs = codes[o]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])

        def rsum(a: np.ndarray) -> np.ndarray:
            return np.add.reduceat(a[o], starts)

        keys = uniq[cs[starts]]
        shard = (token_hash64(keys.astype(str)) % np.uint64(n_shards)).astype(np.int64)
        return pa.table(
            {
                "_s": pa.array(shard),
                key_col: pa.array(keys),
                "_n": pa.array(rsum(np.ones(len(k), np.int64))),
                "_sx": pa.array(rsum(x)),
                "_sy": pa.array(rsum(y)),
                "_sxx": pa.array(rsum(x * x)),
                "_syy": pa.array(rsum(y * y)),
                "_sxy": pa.array(rsum(x * y)),
            }
        )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:  # typed full-schema empty (block-schema corruption class)
            cols = {key_col: pd.Series([], dtype=object)}
            cols.update({c: pd.Series([], dtype=t) for c, t in empty_schema.items()})
            return pd.DataFrame(cols)
        codes, uniq = pd.factorize(g[key_col].to_numpy(), use_na_sentinel=False)
        o = np.argsort(codes, kind="stable")
        cs = codes[o]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        sums = {
            c: np.add.reduceat(g[c].to_numpy()[o], starts) for c in part_cols
        }
        return project(uniq[cs[starts]], sums)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(finalize, batch_format="pandas")
    )


def value_rank(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    rank_col: str = "rank",
    n_buckets: int = 64,
) -> rd.Dataset:
    """Per-key SQL ``RANK()`` for EVERY row without shuffling the rows —
    the window-function shape at scale.

    Pass 1 reduces the stream to the same bounded (key x distinct-value)
    histogram :func:`exact_quantiles` uses (per-batch ``_hist_reduce``
    partials, fixed-bucket merge); the merged histogram — bounded by
    key-cardinality x distinct values, never row count — is collected
    once, converted to per-key exclusive cumulative counts, and
    broadcast via ``ray.put``.  Pass 2 streams the rows and ranks each
    batch with one vectorized ``searchsorted`` per key PRESENT in the
    batch (key count bounded, not row count).
    ``rank = 1 + #(strictly smaller values in the partition)`` — exactly
    DuckDB ``rank() OVER (PARTITION BY key ORDER BY value)``.
    Partitioning assumption: the measure is discrete/binned, like
    :func:`exact_quantiles` (documented broadcast ceiling otherwise).
    """
    import ray

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {
                    "_b": pa.array([], pa.int64()),
                    key_col: pa.array([], b.schema.field(key_col).type),
                    "_v": pa.array([], pa.float64()),
                    "_n": pa.array([], pa.float64()),
                }
            )
        df = pd.DataFrame(
            {
                key_col: b[key_col].to_numpy(zero_copy_only=False),
                "_v": b[value_col].to_numpy(zero_copy_only=False).astype(np.float64),
                "_n": np.ones(len(b), dtype=np.float64),
            }
        )
        k, v, n = _hist_reduce(df, key_col)
        kh = pd.util.hash_array(np.ascontiguousarray(k)).astype(np.uint64)
        bucket = ((kh ^ v.view(np.uint64)) * _HQ_MUL) % np.uint64(n_buckets)
        return pa.table(
            {
                "_b": pa.array(bucket.astype(np.int64)),
                key_col: pa.array(k),
                "_v": pa.array(v),
                "_n": pa.array(n),
            }
        )

    def merge_hist(g: pd.DataFrame) -> pd.DataFrame:
        k, v, n = _hist_reduce(g, key_col)
        return pd.DataFrame({key_col: k, "_v": v, "_n": n})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge_hist, batch_format="pandas")
        .to_pandas()  # bounded: (key x distinct-value) histogram rows
    )
    k = hist[key_col].to_numpy()
    v = hist["_v"].to_numpy()
    n = hist["_n"].to_numpy()
    order = np.lexsort((v, k))
    k, v, n = k[order], v[order], n[order]
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    uniq = k[starts]
    off = np.r_[starts, len(k)]
    cum = np.cumsum(n)
    excl = np.r_[0.0, cum[:-1]]
    excl_within = (excl - np.repeat(excl[starts], np.diff(off))).astype(np.int64)
    ref = ray.put((uniq, off, v, excl_within))

    def rank_rows(b: pa.Table) -> pa.Table:
        uk, o, vals, ex = ray.get(ref)
        kr = b[key_col].to_numpy(zero_copy_only=False)
        vr = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ki = np.searchsorted(uk, kr)
        out = np.empty(len(b), np.int64)
        for kidx in np.unique(ki):  # bounded by key cardinality
            m = ki == kidx
            seg = vals[o[kidx] : o[kidx + 1]]
            pos = o[kidx] + np.searchsorted(seg, vr[m], side="left")
            out[m] = ex[pos] + 1
        return b.append_column(rank_col, pa.array(out))

    return ds.map_batches(rank_rows, batch_format="pyarrow")


_CMS_MULT = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)
_CMS_INC = np.array(
    [0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5, 0x94D049BB133111EB, 0xBF58476D1CE4E5B9],
    dtype=np.uint64,
)


def _cms_indices(vals: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(depth, n) cell indices: one multiply-add hash per row, top bits
    (width must be a power of two)."""
    from geoglue_ray.functions.texthash import int_hash64

    shift = np.uint64(64 - int(np.log2(width)))
    h = int_hash64(vals)
    return np.stack(
        [((h * _CMS_MULT[j] + _CMS_INC[j]) >> shift) for j in range(depth)]
    ).astype(np.int64)


def count_min_counts(
    ds: rd.Dataset,
    key_col: str,
    query_keys: np.ndarray,
    width: int = 4096,
    depth: int = 4,
    n_merge: int = 8,
) -> np.ndarray:
    """Distributed count-min sketch: per-batch partial sketches
    (depth x width int64, ~128 KiB blobs — the shuffle moves SKETCHES,
    never keys), two-level sum-merge (sketches are sum-mergeable), then
    point estimates ``min_j sk[j, idx_j(k)]`` for ``query_keys`` on the
    driver (bounded by the query-key count).  One-sided guarantee:
    estimate >= true count; overestimate <= e/width * N w.h.p. per the
    standard CMS bound."""
    if width & (width - 1):
        raise ValueError("width must be a power of two")

    def partial(b: pa.Table) -> pa.Table:
        sk = np.zeros((depth, width), dtype=np.int64)
        if len(b):
            v = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            idx = _cms_indices(v, width, depth)
            for j in range(depth):
                np.add.at(sk[j], idx[j], 1)
        raw = sk.tobytes()
        blob = pa.array([raw], pa.binary())
        # Content-derived merge shard: sk.sum() is just batch_rows*depth,
        # so with Ray's uniform batch sizes every partial would land in
        # ONE merge group, serializing the two-level merge.  crc32 of the
        # sketch bytes spreads partials across n_merge deterministically.
        shard = pa.array([zlib.crc32(raw) % n_merge], pa.int64())
        return pa.table({"_cm": shard, "_sk": blob})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        tot = np.zeros(depth * width, dtype=np.int64)
        for s in g["_sk"]:
            tot += np.frombuffer(s, dtype=np.int64)
        return pd.DataFrame({"_sk": [tot.tobytes()]})

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_cm")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: n_merge sketch blobs
    )
    sk = np.zeros(depth * width, dtype=np.int64)
    for s in parts["_sk"]:
        sk += np.frombuffer(s, dtype=np.int64)
    sk = sk.reshape(depth, width)
    qk = np.asarray(query_keys, dtype=np.int64)
    idx = _cms_indices(qk, width, depth)
    return np.min(np.stack([sk[j, idx[j]] for j in range(depth)]), axis=0)


def topk_counts(ds: rd.Dataset, key_col: str, k: int, n_shards: int = 64) -> rd.Dataset:
    """EXACT top-k (key, row count) for int64 keys — the vocab_topk shape
    (per-batch partial counts, fixed-shard exact merge, per-shard top-k
    superset, tiny global sort/limit) with the strict (n desc, key asc)
    tie order."""
    from geoglue_ray.functions.texthash import int_hash64

    def partial(b: pa.Table) -> pa.Table:
        v = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        shard = (int_hash64(u) % np.uint64(n_shards)).astype(np.int64)
        return pa.table(
            {key_col: pa.array(u), "n": pa.array(c.astype(np.int64)), "_shard": pa.array(shard)}
        )

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(key_col, sort=False)["n"].sum().reset_index()
        s = s.sort_values(["n", key_col], ascending=[False, True], kind="mergesort")
        return s.head(k)[[key_col, "n"]]

    parted = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(shard_topk, batch_format="pandas")
    )
    return parted.sort(["n", key_col], descending=[True, False]).limit(k)
