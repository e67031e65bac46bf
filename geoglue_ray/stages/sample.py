"""Deterministic splits and samples for training-data pipelines.

A 100-TB training pipeline needs reproducible, shuffle-free train/val/test
assignment and stratified subsampling: both are expressed here as pure
functions of the document id through the SQL-replicable
:func:`geoglue_ray.functions.texthash.int_hash64`, so the DuckDB oracle
recomputes every assignment bit-for-bit (reference analogue: geoglue keys
all partitioning on deterministic ids/dates, e.g. ``cds.py`` date
partitions — never on RNG state).

Scale shape:

- ``hash_split`` is a stateless per-batch map — no shuffle at any corpus
  size; the split decision rides with the row.
- ``split_summary`` ships 3-row per-batch partials and merges them in one
  final task (payload = n_splits rows per batch, never row-scale).
- ``stratified_sample`` is the two-level top-k pattern: each batch prunes
  to <= k rows per stratum (ordered by the id hash), the union of partials
  (<= k x strata x blocks rows) collapses in a single final task.  No
  sort/groupby shuffle of the full corpus; the only all-to-all is the
  bounded partial set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from geoglue_ray.functions.texthash import int_hash64

# split ids: hash mod N_BUCKETS, contiguous ranges -> names
N_BUCKETS = 10
SPLIT_EDGES = (8, 9)  # [0,8) train, [8,9) val, [9,10) test
SPLIT_NAMES = ("train", "val", "test")


def split_of(ids: np.ndarray) -> np.ndarray:
    """Deterministic split name per id: ``int_hash64(id) % 10`` ->
    0-7 train / 8 val / 9 test."""
    b = (int_hash64(ids) % np.uint64(N_BUCKETS)).astype(np.int64)
    out = np.full(len(b), "train", dtype=object)
    out[b >= SPLIT_EDGES[0]] = "val"
    out[b >= SPLIT_EDGES[1]] = "test"
    return out


def hash_split(ds: rd.Dataset, id_col: str) -> rd.Dataset:
    """Append a ``split`` column (train/val/test) — stateless map, no
    shuffle, reproducible at any scale and across reruns."""

    def tag(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        return b.append_column("split", pa.array(split_of(ids), type=pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def split_summary(ds: rd.Dataset, id_col: str, measure_col: str) -> rd.Dataset:
    """Per-split doc count + integer measure sum.  Per-batch partials are
    <= 3 rows; the final reduce is one task over the tiny partial set."""

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        bucket = (int_hash64(ids) % np.uint64(N_BUCKETS)).astype(np.int64)
        sid = np.digitize(bucket, SPLIT_EDGES)  # 0/1/2
        m = np.floor(b[measure_col].to_numpy(zero_copy_only=False).astype(np.float64))
        n = np.bincount(sid, minlength=3).astype(np.float64)
        s = np.bincount(sid, weights=m, minlength=3)
        return pa.table(
            {
                "sid": pa.array(np.arange(3, dtype=np.int64)),
                "n_docs": pa.array(n),
                "sum_measure": pa.array(s),
            }
        )

    def final(b: pa.Table) -> pa.Table:
        sid = b["sid"].to_numpy()
        n = np.bincount(sid, weights=b["n_docs"].to_numpy(), minlength=3)
        s = np.bincount(sid, weights=b["sum_measure"].to_numpy(), minlength=3)
        keep = n > 0
        return pa.table(
            {
                "split": pa.array(np.array(SPLIT_NAMES, dtype=object)[keep]),
                "n_docs": pa.array(n[keep]),
                "sum_measure": pa.array(s[keep]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def _prune_topk(df: pd.DataFrame, strata_col: str, k: int) -> pd.DataFrame:
    """Keep the k smallest (sample_key, id) rows per stratum — vectorized
    lexsort + run-relative rank, no per-group Python."""
    if len(df) == 0:
        # Typed full-schema empty (incl. the rank column the non-empty
        # path appends) — schema-divergent empties corrupt distributed
        # block schemas, and an all-empty dataset would make final()'s
        # drop(columns=["rank"]) raise (CLAUDE.md second-review lesson).
        out = df.copy()
        out["rank"] = np.array([], dtype=np.int64)
        return out
    codes, _ = pd.factorize(df[strata_col], use_na_sentinel=False)
    order = np.lexsort(
        (df["_id"].to_numpy(), df["sample_key"].to_numpy().view(np.uint64), codes)
    )
    codes_s = codes[order]
    starts = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1]])
    rank = np.arange(len(codes_s)) - np.repeat(starts, np.diff(np.r_[starts, len(codes_s)]))
    keep = order[rank < k]
    out = df.iloc[keep].copy()
    out["rank"] = (rank[rank < k] + 1).astype(np.int64)
    return out


def stratified_sample(
    ds: rd.Dataset, strata_col: str, id_col: str, k: int
) -> rd.Dataset:
    """Deterministic k-per-stratum sample: the k ids with the smallest
    ``int_hash64(id)`` per stratum (ties broken by id — a hash-ordered
    reservoir that every rerun and the SQL oracle reproduce exactly).

    Two-level top-k: per-batch prune to <= k rows per stratum, single
    final task over the bounded partial union — union-of-partial-top-k
    contains the global top-k, so the final prune is exact."""

    def partial(b: pa.Table) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        df = pd.DataFrame(
            {
                strata_col: b[strata_col].to_numpy(zero_copy_only=False),
                "_id": ids,
                "sample_key": int_hash64(ids).view(np.int64),
            }
        )
        return _prune_topk(df, strata_col, k)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = _prune_topk(df.drop(columns=["rank"]), strata_col, k)
        out = out.rename(columns={"_id": id_col})
        return out[[strata_col, id_col, "sample_key", "rank"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def weighted_sample(
    ds: rd.Dataset, strata_col: str, id_col: str, weight_col: str, k: int
) -> rd.Dataset:
    """Deterministic WEIGHTED k-per-stratum sample — sequential Poisson
    sampling (Ohlsson) with the uniform variate replaced by the strong
    id hash: priority ``kmv_hash64(id) // weight`` (integer floor
    division — exact on both sides), keep the k smallest priorities per
    stratum, ties broken by id.  A row with twice the weight halves its
    expected priority, so inclusion probability grows ~proportional to
    weight while staying a pure function of (id, weight): reruns and the
    SQL oracle reproduce the sample bit-for-bit.  Weights must be
    positive integers (integer-valued floats are fine).

    Scale shape is :func:`stratified_sample`'s two-level top-k — per-batch
    prune to <= k rows per stratum, one final task over the bounded
    partial union; no corpus shuffle."""
    from geoglue_ray.functions.texthash import kmv_hash64

    def partial(b: pa.Table) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(w) and w.min() <= 0:
            raise ValueError(f"{weight_col} must be positive")
        pri = kmv_hash64(ids) // w.astype(np.uint64)
        df = pd.DataFrame(
            {
                strata_col: b[strata_col].to_numpy(zero_copy_only=False),
                "_id": ids,
                weight_col: w,
                "sample_key": pri.view(np.int64),
            }
        )
        return _prune_topk(df, strata_col, k)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = _prune_topk(df.drop(columns=["rank"]), strata_col, k)
        out = out.rename(columns={"_id": id_col})
        return out[[strata_col, id_col, weight_col, "sample_key", "rank"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def greedy_pack(
    ds: "rd.Dataset",
    strata_col: str,
    size_col: str,
    order_col: str,
    capacity: int,
    n_shards: int = 64,
) -> "rd.Dataset":
    """Greedy sequence packing — the training-batch op that bins ordered
    documents into context windows: within each stratum, walk documents
    in ``order_col`` order and open a new pack whenever the running token
    count would exceed ``capacity`` (an oversize document gets a pack of
    its own).  Emits (strata, order, size, pack_id, pack_fill).

    Scale shape: packing is ORDER-DEPENDENT, so the sequential scan is
    inherent — the parallelism axis is strata (co-located via
    ``hash(strata) % n_shards``, the fixed-shard idiom); within a shard
    the scan is one pass with O(1) work per row.  This mirrors how
    production packers shard by stream.  The SQL twin replays the same
    recurrence with a recursive CTE.
    """
    import pandas as pd
    import pyarrow as pa

    from geoglue_ray.functions.texthash import token_hash64

    def shard(b: pa.Table) -> pa.Table:
        s = b[strata_col].to_numpy(zero_copy_only=False)
        h = token_hash64(s.astype(str)) % np.uint64(n_shards)
        return b.append_column("_pk", pa.array(h.astype(np.int64)))

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([strata_col, order_col], kind="mergesort").reset_index(
            drop=True
        )
        sizes = g[size_col].to_numpy()
        strata = g[strata_col].to_numpy()
        pack_id = np.empty(len(g), dtype=np.int64)
        fill = np.empty(len(g), dtype=np.int64)
        cur_s, cur_fill, cur_id = None, 0, 0
        for i in range(len(g)):
            if strata[i] != cur_s:
                cur_s, cur_id, cur_fill = strata[i], 1, int(sizes[i])
            elif cur_fill + sizes[i] > capacity:
                cur_id += 1
                cur_fill = int(sizes[i])
            else:
                cur_fill += int(sizes[i])
            pack_id[i] = cur_id
            fill[i] = cur_fill
        out = g.drop(columns=["_pk"])
        out["pack_id"] = pack_id
        out["pack_fill"] = fill
        return out

    return (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(pack, batch_format="pandas")
    )


def measure_topk(
    ds: rd.Dataset,
    group_col: str,
    id_col: str,
    measure_col: str,
    k: int,
    largest: bool = True,
) -> rd.Dataset:
    """Per-group top-k by an INTEGER measure (largest-first by default,
    ties broken by smallest id) — the per-host document cap of web-scale
    curation: keep the k longest/highest-quality docs per source so no
    single host dominates the corpus.

    Same two-level exact top-k shape as :func:`stratified_sample`
    (per-batch prune -> one final task over the bounded partial union);
    the sort key is an order-preserving offset of the measure, so the
    shared :func:`_prune_topk` kernel applies unchanged."""
    OFF = np.int64(1) << np.int64(62)

    def partial(b: pa.Table) -> pd.DataFrame:
        m = b[measure_col].to_numpy().astype(np.int64)
        key = (OFF - m) if largest else (OFF + m)
        df = pd.DataFrame(
            {
                group_col: b[group_col].to_numpy(zero_copy_only=False),
                "_id": b[id_col].to_numpy(),
                "sample_key": key,
                measure_col: m,
            }
        )
        return _prune_topk(df, group_col, k)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = _prune_topk(df.drop(columns=["rank"]), group_col, k)
        out = out.rename(columns={"_id": id_col})
        return out[[group_col, id_col, measure_col, "rank"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def skyline_2d(
    ds: rd.Dataset,
    max_col: str,
    min_col: str,
) -> rd.Dataset:
    """2-D skyline (Pareto frontier): rows for which no other row is at
    least as good on BOTH axes (``max_col`` maximized, ``min_col``
    minimized) and strictly better on one — the multi-criteria "best
    offers" operator.  Duplicated (min_col, max_col) points dominate
    each other in neither direction and are ALL kept (matching the SQL
    NOT-EXISTS dominance definition).

    Distribution: the classic local/global decomposition — a local
    skyline per block (any global-skyline row survives every subset's
    skyline, so the union of local skylines is a superset), then one
    final skyline over the union (bounded: frontier-cardinality per
    block).  Each pass is a vectorized sort + exclusive group cummax —
    dominated iff the best ``max_col`` over strictly-smaller ``min_col``
    groups >= x, or a same-``min_col`` row has a strictly larger x.
    Pure comparisons, so the SQL window twin is bit-exact."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        y = df[min_col].to_numpy()
        x = df[max_col].to_numpy()
        o = np.lexsort((-x, y))  # y asc, x desc
        ys, xs = y[o], x[o]
        first = np.r_[True, ys[1:] != ys[:-1]]
        starts = np.flatnonzero(first)
        run = np.cumsum(first) - 1
        gmax = xs[starts]  # per-y-group max (sorted desc within group)
        prev = np.r_[-np.inf, np.maximum.accumulate(gmax)[:-1]]
        dominated = (prev[run] >= xs) | (gmax[run] > xs)
        keep = np.empty(len(df), dtype=bool)
        keep[o] = ~dominated
        return df[keep]

    return (
        ds.map_batches(local, batch_format="pandas")
        .repartition(1)
        .map_batches(local, batch_format="pandas", batch_size=None)
    )



def histogram_drift(
    ds: rd.Dataset,
    id_col: str,
    measure_col: str,
    bin_w: int = 64,
    n_merge: int = 8,
) -> rd.Dataset:
    """Distribution-drift check between the deterministic train and test
    splits: total-variation distance between the two splits' fixed-width
    histograms of an integer measure —
    ``TV = sum_b |cA_b*nB - cB_b*nA| / (2*nA*nB)``, the cleared-
    denominator form (one exact division, no per-bin float sums), so the
    SQL twin matches bit-for-bit.  The drift gate every incremental
    ingest should run: TV ~ 0 means the split hash is unbiased w.r.t.
    the measure; a jump means the new data shifted the distribution.

    Scale shape: per-batch bincount partials (payload = touched bins,
    never rows), a fixed bin-keyed shard merge, and one driver pass over
    the bin-cardinality result — bins are bounded by max(measure)/bin_w
    by construction."""
    from geoglue_ray.functions.texthash import int_hash64

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        b10 = (int_hash64(ids) % np.uint64(10)).astype(np.int64)
        m = b[measure_col].to_numpy().astype(np.int64)
        bins = m // np.int64(bin_w)
        ca = np.bincount(bins[b10 <= 7])
        cb = np.bincount(bins[b10 == 9])
        n = max(len(ca), len(cb))
        ca = np.pad(ca, (0, n - len(ca)))
        cb = np.pad(cb, (0, n - len(cb)))
        keep = (ca > 0) | (cb > 0)
        bb = np.flatnonzero(keep).astype(np.int64)
        return pa.table(
            {
                "_sh": pa.array(bb % np.int64(n_merge)),
                "bin": pa.array(bb),
                "ca": pa.array(ca[keep].astype(np.int64)),
                "cb": pa.array(cb[keep].astype(np.int64)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = (
            g.groupby("bin", sort=False)[["ca", "cb"]]
            .sum()
            .reset_index()
        )
        return pd.DataFrame(
            {
                "bin": s["bin"].astype(np.int64),
                "ca": s["ca"].astype(np.int64),
                "cb": s["cb"].astype(np.int64),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(merge, batch_format="pandas")
        .take_all()
    )  # bounded: one row per touched bin
    na = sum(int(r["ca"]) for r in rows)
    nb = sum(int(r["cb"]) for r in rows)
    s = sum(abs(int(r["ca"]) * nb - int(r["cb"]) * na) for r in rows)
    n_bins = sum(1 for r in rows if r["ca"] or r["cb"])
    return rd.from_arrow(
        pa.table(
            {
                "n_train": pa.array([na], pa.int64()),
                "n_test": pa.array([nb], pa.int64()),
                "n_bins": pa.array([n_bins], pa.int64()),
                "tv_dist": pa.array([s / (2 * na * nb)], pa.float64()),
            }
        )
    )
