"""Keyed joins the Dataset API lacks: bucketed as-of join.

The portable pattern for both-sides-large temporal joins (per the Ray Data
idiom): co-locate the two sides by key with one groupby over the tagged
union, then run ``pd.merge_asof`` within each key group — a sort-merge
as-of join whose shuffle payload is the two projected tables, partitioned
by the join key.  Matches DuckDB ``ASOF JOIN`` semantics (most recent
right row with ``right.ts <= left.ts``); right-side timestamps must be
unique per key (pre-aggregate ties first — enforced, since tie-breaking
order differs between engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def range_join_broadcast(
    ds: rd.Dataset,
    value_col: str,
    bounds_lo: np.ndarray,
    band_cols: dict[str, np.ndarray],
    top: float = np.inf,
) -> rd.Dataset:
    """Broadcast interval join: attach the band whose half-open range
    ``[lo[i], lo[i+1])`` (last band ``[lo[-1], top)``) contains
    ``value_col``.

    The band table (small side) ships as sorted boundaries + attribute
    arrays; the per-batch lookup is one ``searchsorted`` — the broadcast
    form of a range join (no shuffle; values below the first band or at or
    above ``top`` are dropped, inner semantics)."""
    import ray

    order = np.argsort(bounds_lo)
    ref = ray.put(
        {
            "lo": np.asarray(bounds_lo, dtype=np.float64)[order],
            "cols": {k: np.asarray(v)[order] for k, v in band_cols.items()},
            "top": float(top),
        }
    )

    class AttachBand:
        def __init__(self):
            d = ray.get(ref)
            self.lo = d["lo"]
            self.cols = d["cols"]
            self.top = d["top"]

        def __call__(self, b: pa.Table) -> pa.Table:
            v = b[value_col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.lo, v, side="right") - 1
            keep = (pos >= 0) & (v < self.top)
            b = b.filter(pa.array(keep))
            pos = pos[keep]
            for name, arr in self.cols.items():
                b = b.append_column(name, pa.array(arr[pos]))
            return b

    return ds.map_batches(AttachBand, batch_format="pyarrow", concurrency=(1, 4))


def rolling_window(
    ds: rd.Dataset,
    key: str,
    order_col: str,
    value_col: str,
    window: int,
    out_prefix: str = "roll",
) -> rd.Dataset:
    """Per-key rolling aggregate over the last ``window`` rows (ordered by
    ``order_col``) — ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW.

    The windowed-aggregate shape: partition by key, sort within the group,
    pandas rolling inside ``map_groups``.  Sums over integer-valued inputs
    stay exact, so results match SQL window frames bit-for-bit."""

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        r = g[value_col].rolling(window, min_periods=1)
        g[f"{out_prefix}_sum"] = r.sum()
        g[f"{out_prefix}_n"] = r.count().astype("float64")
        return g

    return ds.groupby(key).map_groups(roll, batch_format="pandas")


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_r",
) -> rd.Dataset:
    """For each left row, attach the most recent right row (same ``key``,
    ``right_ts <= left_ts``); left rows with no match are dropped (inner
    as-of, DuckDB ``ASOF JOIN`` default).  ``left_ts`` and ``right_ts``
    must be distinct column names (the inner filter keys on the matched
    right timestamp)."""
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must have distinct names")
    left_cols = [c for c in left.schema().names]

    def tag(side: int):
        def _t(b: pa.Table) -> pa.Table:
            return b.append_column("_side", pa.array(np.full(len(b), side, dtype=np.int8)))

        return _t

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        # split by side using the declared schemas (NEVER dropna-by-column:
        # a legitimately all-null column per group would vanish and diverge
        # block schemas)
        l = g[g["_side"] == 0][left_cols]
        r = g[g["_side"] == 1][[key, right_ts, *right_cols]]
        if not len(l) or not len(r):
            # typed empty with the FULL joined schema (left + right_ts +
            # right_cols) — a left-only empty would diverge block schemas
            out = g.iloc[0:0][[*left_cols, right_ts, *right_cols]]
            for c in (left_ts, right_ts):
                if str(out[c].dtype).startswith("datetime64"):
                    out = out.assign(**{c: out[c].astype("datetime64[us]")})
            return out
        if r[right_ts].duplicated().any():
            raise ValueError(
                f"as-of right side has duplicate {right_ts!r} per key; "
                "pre-aggregate ties (tie order is engine-specific)"
            )
        # normalize timestamp resolutions (Arrow->pandas conversion can
        # yield different datetime64 units per side)
        if str(l[left_ts].dtype).startswith("datetime64"):
            l = l.assign(**{left_ts: l[left_ts].astype("datetime64[us]")})
            r = r.assign(**{right_ts: r[right_ts].astype("datetime64[us]")})
        l = l.sort_values(left_ts, kind="mergesort")
        r = r.sort_values(right_ts, kind="mergesort")
        out = pd.merge_asof(
            l,
            r.drop(columns=[key]),
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            suffixes=("", suffix),
        )
        return out[out[right_ts].notna()]

    return tagged.groupby(key).map_groups(per_key, batch_format="pandas")


def hash_equijoin(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    n_shards: int = 64,
    how: str = "inner",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    hot_keys=None,
    hot_salt: int = 8,
) -> rd.Dataset:
    """Distributed big-big equi-join on int64 keys — the general
    shuffle join Ray Data's Dataset API lacks.  ``how``: ``inner`` /
    ``left`` (right columns null-filled for unmatched left rows) /
    ``outer`` (FULL OUTER: unmatched rows from both sides survive with
    the other side null-filled; the key column is populated from
    whichever side has it) / ``semi`` / ``anti`` (left rows with /
    without a right match; left columns only, never duplicated by
    multi-matches).

    Shape: each side is tagged (``_t``) and sharded on
    ``int_hash64(key) % n_shards`` — a FIXED group count, so Ray's
    per-group Python overhead is constant regardless of key cardinality
    (CLAUDE.md lesson); the tagged union stays Arrow end to end with
    typed nulls for side-exclusive columns (pandas NaN-fill corrupts
    distributed block schemas).  Each shard task runs one vectorized
    ``pd.merge`` (C hash join) over ALL the shard's keys at once and
    emits rows cast back to the declared output schema.

    Partitioning assumptions (document per the build brief): shuffle
    payload = both projected sides; per-shard skew follows key-hash
    skew — a single mega-key lands in one task UNLESS declared in
    ``hot_keys``.  Project columns *before* joining.  Output key column
    is ``left_on``.

    **Hot-key salting** (``hot_keys`` + ``hot_salt``): each declared hot
    key gets its own ``hot_salt`` sub-shards past the normal range — the
    LEFT side's hot rows split round-robin across them (parallelizing the
    mega-key's probe work over ``hot_salt`` tasks) while the RIGHT side's
    hot rows REPLICATE to all of them, so every (l, r) pair still meets
    exactly once.  Exact for all four ``how`` modes (a left row lives in
    exactly one sub-shard and sees the full matching right set there);
    result sets are identical to the unsalted path (tested).  Intended
    for a small measured set of mega-keys (e.g. from ``topk_counts``) —
    replication cost is ``hot_salt`` x the right side's hot rows.
    """
    from geoglue_ray.functions.texthash import int_hash64

    # Ray drops the schema of zero-row datasets (repartitioned empties
    # report None) — accept an explicit pa.Schema fallback per side so
    # legitimately-empty inputs still declare the join output schema
    lschema = left.schema() or left_schema
    rschema = right.schema() or right_schema
    if lschema is None or rschema is None:
        raise ValueError(
            "hash_equijoin needs typed inputs on both sides — pass "
            "left_schema/right_schema when a side can be a zero-block Dataset"
        )
    lnames = list(lschema.names)
    rnames = [n for n in rschema.names if n != right_on]
    clash = set(lnames) & set(rnames)
    if clash:
        raise ValueError(f"column name clash (rename first): {sorted(clash)}")
    out_fields = [
        (n, lschema.types[lschema.names.index(n)]) for n in lnames
    ] + [(n, rschema.types[rschema.names.index(n)]) for n in rnames]
    out_schema = pa.schema(out_fields)
    P = np.uint64(n_shards)

    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    # semi/anti only ever read the right side's KEY: don't ship the right
    # value columns (nor null-filled right columns on left rows) through
    # the shuffle — the union schema narrows to (_shard, _t, *lnames),
    # with right rows carrying the key in left_on and typed nulls for the
    # other left columns (union blocks must share one schema).  Payload
    # bloat fix per ADVICE r3 (dormant_customers shipped a null
    # c_mktsegment per order row).
    union_rnames = [] if how in ("semi", "anti") else rnames
    if how in ("semi", "anti"):
        out_schema = pa.schema(out_fields[: len(lnames)])

    hk = (
        np.unique(np.asarray(hot_keys, dtype=np.int64))
        if hot_keys is not None and len(hot_keys)
        else None
    )

    def _hot_rank(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(is_hot mask, rank of each id in the sorted hot set)."""
        pos = np.searchsorted(hk, ids)
        pos_c = np.minimum(pos, len(hk) - 1)
        return hk[pos_c] == ids, pos_c

    def tag_left(b: pa.Table) -> pa.Table:
        ids = b[left_on].to_numpy().astype(np.int64)
        shard = (int_hash64(ids) % P).astype(np.int64)
        if hk is not None and len(b):
            hot, rank = _hot_rank(ids)
            # round-robin split of the mega-key's rows over its sub-shards
            # (any assignment yields the same result SET; this one is
            # deterministic per batch)
            spread = np.arange(len(b)) % hot_salt
            shard = np.where(hot, n_shards + rank * hot_salt + spread, shard)
        cols = {
            "_shard": pa.array(shard),
            "_t": pa.array(np.zeros(len(b), np.int8)),
        }
        for n in lnames:
            cols[n] = b[n]
        for n in union_rnames:
            cols[n] = pa.nulls(len(b), rschema.types[rschema.names.index(n)])
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        ids = b[right_on].to_numpy().astype(np.int64)
        shard = (int_hash64(ids) % P).astype(np.int64)
        take: np.ndarray | None = None
        if hk is not None and len(b):
            hot, rank = _hot_rank(ids)
            # replicate hot right rows to every sub-shard of their key
            reps = np.where(hot, hot_salt, 1).astype(np.int64)
            take = np.repeat(np.arange(len(b)), reps)
            within = np.arange(len(take)) - np.repeat(np.cumsum(reps) - reps, reps)
            shard = np.where(
                hot[take], n_shards + rank[take] * hot_salt + within, shard[take]
            )
            ids = ids[take]
        cols = {
            "_shard": pa.array(shard),
            "_t": pa.array(np.ones(len(ids), np.int8)),
        }
        for n in lnames:
            cols[n] = (
                pa.array(ids)
                if n == left_on
                else pa.nulls(len(ids), lschema.types[lschema.names.index(n)])
            )
        for n in union_rnames:
            cols[n] = b[n] if take is None else b[n].take(pa.array(take))
        return pa.table(cols)

    def shard_join(t: pa.Table) -> pa.Table:
        tt = t["_t"].to_numpy()
        lt_tab = t.filter(pa.array(tt == 0))
        if how in ("semi", "anti"):
            lkeys = lt_tab[left_on].to_numpy(zero_copy_only=False)
            rkeys = t.filter(pa.array(tt == 1))[left_on].to_numpy(zero_copy_only=False)
            hit = np.isin(lkeys, rkeys)
            keep = hit if how == "semi" else ~hit
            return lt_tab.select(lnames).filter(pa.array(keep))
        lt = lt_tab.select(lnames).to_pandas()
        rt = t.filter(pa.array(tt == 1)).select([left_on] + rnames).to_pandas()
        merged = lt.merge(rt, on=left_on, how=how)
        # per-column from_pandas conversion: a left join NaN-fills
        # unmatched right columns, which pandas widens to float —
        # pa.array(..., from_pandas=True) restores typed nulls
        cols = [
            pa.array(merged[f.name], type=f.type, from_pandas=True)
            for f in out_schema
        ]
        return pa.Table.from_arrays(cols, schema=out_schema)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    return tagged.groupby("_shard").map_groups(shard_join, batch_format="pyarrow")




def interval_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: tuple[str, str, str, str],
    bucket_width: int,
    n_shards: int = 64,
    hot_buckets: np.ndarray | None = None,
    hot_salt: int = 8,
) -> rd.Dataset:
    """Big-big interval join of two DISTINCT tables: one output row per
    overlapping (left interval, right interval) pair — closed-interval
    overlap ``l_start <= r_end AND r_start <= l_end``.

    ``on`` names the four int64 boundary columns
    ``(l_start, l_end, r_start, r_end)``; a point side passes the same
    column twice.  The session_overlaps shape generalized to two inputs:
    explode each interval to its covering width-``bucket_width`` buckets
    (fan-out bounded by interval length / bucket_width), co-shuffle the
    tagged union on ``hash(bucket) % n_shards`` (FIXED group count), build
    per-bucket left x right cross products in one vectorized
    ragged-cartesian pass per shard, and keep each pair exactly once — in
    the bucket containing ``max(l_start, r_start)``, which lies inside
    both intervals so exactly one bucket qualifies.

    Partitioning assumption: a shard task materializes its buckets' cross
    products, so pick ``bucket_width`` to bound ``L_b * R_b`` per bucket;
    skewed hot buckets want a finer width.  The two sides' data columns
    must be disjoint (select/rename first) — only projected columns ship.
    The whole path is Arrow-native: side-exclusive nulls never pass
    through pandas, so int64/timestamp columns keep their types (the
    tagged-union float64 NaN-fill hazard, CLAUDE.md).

    Skew: ``hot_buckets`` (a small int64 array of bucket ids known to be
    hot — e.g. from a cheap pre-count) splits each hot bucket across
    ``hot_salt`` sub-keys, the join analogue of hash_equijoin's hot-key
    salting: LEFT rows in a hot bucket round-robin over the salts, RIGHT
    rows replicate to every salt, so every pair still meets exactly once
    and one mega-bucket's L x R cross product spreads over ``hot_salt``
    tasks (at the cost of replicating the hot right rows).  The salt is
    packed into the pairing key, so two salts hashing to the same shard
    can never double-count.  Results are identical with or without
    salting (tested).
    """
    ls_c, le_c, rs_c, re_c = on
    salt_mult = int(hot_salt) if hot_buckets is not None else 1
    hot_sorted = np.sort(np.asarray(hot_buckets, dtype=np.int64)) if hot_buckets is not None else None
    lschema, rschema = left.schema(), right.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    overlap_names = set(lcols) & set(rcols)
    if overlap_names:
        raise ValueError(f"column collision between sides: {sorted(overlap_names)}")
    all_fields = [(c, lschema.types[lcols.index(c)]) for c in lcols] + [
        (c, rschema.types[rcols.index(c)]) for c in rcols
    ]
    MUL = np.uint64(0x9E3779B185EBCA87)

    def make_explode(s_col: str, e_col: str, tag: int, own: set):
        def explode(b: pa.Table) -> pa.Table:
            s = b[s_col].to_numpy()
            e = b[e_col].to_numpy()
            b0 = s // bucket_width
            k = (e // bucket_width - b0 + 1).astype(np.int64)
            row = np.repeat(np.arange(len(b)), k)
            within = np.arange(int(k.sum())) - np.repeat(np.cumsum(k) - k, k)
            bucket = b0[row] + within
            if hot_sorted is not None:
                pos = np.searchsorted(hot_sorted, bucket)
                pos[pos == len(hot_sorted)] = 0
                hotm = (
                    (hot_sorted[pos] == bucket)
                    if len(hot_sorted)
                    else np.zeros(len(bucket), bool)
                )
                if tag == 0:
                    # probe side: round-robin hot rows over the salts
                    salt = np.where(hotm, np.arange(len(bucket)) % hot_salt, 0)
                else:
                    # build side: replicate hot rows to every salt
                    rep = np.where(hotm, hot_salt, 1).astype(np.int64)
                    idx2 = np.repeat(np.arange(len(bucket)), rep)
                    salt = np.arange(int(rep.sum())) - np.repeat(
                        np.cumsum(rep) - rep, rep
                    )
                    row, bucket = row[idx2], bucket[idx2]
                packed = bucket * salt_mult + salt
            else:
                packed = bucket
            shard = ((packed.astype(np.uint64) * MUL) % np.uint64(n_shards)).astype(
                np.int64
            )
            cols: dict = {
                "_is": pa.array(shard),
                "_ib": pa.array(packed),
                "_it": pa.array(np.full(len(row), tag, dtype=np.int8)),
            }
            take = pa.array(row)
            for c, t in all_fields:  # canonical order on BOTH sides
                cols[c] = b[c].take(take) if c in own else pa.nulls(len(row), t)
            return pa.table(cols)

        return explode

    tagged = left.map_batches(
        make_explode(ls_c, le_c, 0, set(lcols)), batch_format="pyarrow"
    ).union(
        right.map_batches(make_explode(rs_c, re_c, 1, set(rcols)), batch_format="pyarrow")
    )

    empty = pa.table({c: pa.array([], t) for c, t in all_fields})

    def shard_pairs(g: pa.Table) -> pa.Table:
        t = g["_it"].to_numpy()
        lg = g.filter(pa.array(t == 0))
        rg = g.filter(pa.array(t == 1))
        if len(lg) == 0 or len(rg) == 0:
            return empty
        lb = lg["_ib"].to_numpy()
        rb = rg["_ib"].to_numpy()
        lo = np.argsort(lb, kind="mergesort")
        ro = np.argsort(rb, kind="mergesort")
        ub, lcnt = np.unique(lb, return_counts=True)
        vb, rcnt = np.unique(rb, return_counts=True)
        common, ui, vi = np.intersect1d(ub, vb, return_indices=True)
        if len(common) == 0:
            return empty
        L, R = lcnt[ui], rcnt[vi]
        lofs = (np.cumsum(lcnt) - lcnt)[ui]
        rofs = (np.cumsum(rcnt) - rcnt)[vi]
        npair = L * R
        total = int(npair.sum())
        pb = np.repeat(np.arange(len(common)), npair)
        within = np.arange(total) - np.repeat(np.cumsum(npair) - npair, npair)
        lidx = lo[lofs[pb] + within // R[pb]]
        ridx = ro[rofs[pb] + within % R[pb]]
        ls = lg[ls_c].to_numpy()[lidx]
        le = lg[le_c].to_numpy()[lidx]
        rs = rg[rs_c].to_numpy()[ridx]
        re_ = rg[re_c].to_numpy()[ridx]
        keep = (
            (ls <= re_)
            & (rs <= le)
            & (np.maximum(ls, rs) // bucket_width == common[pb] // salt_mult)
        )
        lt = lg.select(lcols).take(pa.array(lidx[keep]))
        rt = rg.select(rcols).take(pa.array(ridx[keep]))
        return pa.table({**{c: lt[c] for c in lcols}, **{c: rt[c] for c in rcols}})

    joined = tagged.groupby("_is").map_groups(shard_pairs, batch_format="pyarrow")
    # An empty side produces zero groups, and Ray's sort then emits a
    # schema-LESS empty dataset (test_ray_internals pins the upstream
    # behavior); one typed zero-row block keeps the declared schema.
    return joined.union(rd.from_arrow(empty))


def cooccur_topk(
    ds: rd.Dataset,
    basket_col: str,
    item_col: str,
    top_n: int = 50,
    n_shards: int = 64,
) -> rd.Dataset:
    """Market-basket pair co-occurrence: for every unordered pair of
    DISTINCT items appearing in the same basket, the number of baskets
    containing both — the frequent-itemset (k=2) primitive of a
    recommender / data-audit pipeline.  Emits the global ``top_n`` pairs
    by (count desc, item1, item2) — a total order, so the cutoff is
    deterministic.

    Scale shape: baskets co-locate via ``hash(basket) % n_shards``; each
    shard task generates within-basket pairs in one lexsort +
    :func:`geoglue_ray.stages.dedup._run_pairs` pass and COLLAPSES them
    to per-shard (pair, count) partials (shuffle payload = distinct-pair
    cardinality, never the pair stream).  Pair partials co-locate via
    ``hash(pair) % n_shards`` for the exact per-pair sum, each pair shard
    prunes to its local top_n, and one final task reduces the bounded
    ``n_shards x top_n`` union — two-level top-k, exact because a pair's
    total count lives entirely in one pair shard.  Baskets are assumed
    bounded (items-per-basket ~ tens); a hot basket with B items emits
    B(B-1)/2 pairs — cap upstream if B can be adversarial."""
    from geoglue_ray.functions.texthash import int_hash64
    from geoglue_ray.stages.dedup import _run_pairs

    def shard(b: pa.Table) -> pa.Table:
        k = b[basket_col].to_numpy()
        return pa.table(
            {
                "_sh": pa.array((int_hash64(k) % np.uint64(n_shards)).astype(np.int64)),
                basket_col: b[basket_col],
                item_col: b[item_col],
            }
        )

    def gen_pairs(g: pd.DataFrame) -> pd.DataFrame:
        bk = g[basket_col].to_numpy()
        it = g[item_col].to_numpy()
        o = np.lexsort((it, bk))
        bk, it = bk[o], it[o]
        uniq = np.r_[True, (bk[1:] != bk[:-1]) | (it[1:] != it[:-1])]
        bk, it = bk[uniq], it[uniq]  # distinct items per basket
        ia, ib = _run_pairs(bk)
        if len(ia) == 0:
            return pd.DataFrame(
                {
                    "item1": np.array([], np.int64),
                    "item2": np.array([], np.int64),
                    "n_baskets": np.array([], np.int64),
                    "_ps": np.array([], np.int64),
                }
            )
        # items ascend within a basket run, so it[ia] < it[ib] already
        packed = (it[ia].astype(np.int64) << np.int64(32)) | it[ib].astype(np.int64)
        pu, cnt = np.unique(packed, return_counts=True)
        ps = (int_hash64(pu) % np.uint64(n_shards)).astype(np.int64)
        return pd.DataFrame(
            {
                "item1": (pu >> np.int64(32)).astype(np.int64),
                "item2": (pu & np.int64(0xFFFFFFFF)).astype(np.int64),
                "n_baskets": cnt.astype(np.int64),
                "_ps": ps,
            }
        )

    def topk(df: pd.DataFrame, k: int) -> pd.DataFrame:
        if len(df) == 0:
            return df[["item1", "item2", "n_baskets"]]
        packed = (df["item1"].to_numpy() << np.int64(32)) | df["item2"].to_numpy()
        pu, inv = np.unique(packed, return_inverse=True)
        cnt = np.bincount(inv, weights=df["n_baskets"].to_numpy()).astype(np.int64)
        o = np.lexsort((pu, -cnt))[:k]
        return pd.DataFrame(
            {
                "item1": (pu[o] >> np.int64(32)).astype(np.int64),
                "item2": (pu[o] & np.int64(0xFFFFFFFF)).astype(np.int64),
                "n_baskets": cnt[o],
            }
        )

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        return topk(g, top_n)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return topk(df, top_n)

    return (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(gen_pairs, batch_format="pandas")
        .groupby("_ps")
        .map_groups(shard_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def setsim_join(
    ds: rd.Dataset,
    set_col: str,
    item_col: str,
    threshold_num: int = 1,
    threshold_den: int = 2,
    n_shards: int = 64,
    prefix_filter: bool = True,
) -> rd.Dataset:
    """EXACT set-similarity self-join (the SSJoin family): all pairs of
    sets whose Jaccard similarity ``|A n B| / |A u B| >= threshold_num /
    threshold_den`` — the threshold is a RATIONAL so the filter is pure
    integer arithmetic (``den * inter >= num * union``); the reported
    ``jaccard`` double is one division, mirrored by the SQL twin.

    Default path (``prefix_filter=True``) is the standard PREFIX-FILTERED
    SSJoin (Chaudhuri et al. 2006 / Bayardo et al. 2007 / the Vernica et
    al. 2010 MapReduce layout): order every set's items by the global
    (document-frequency ASC, item) total order; only a set's first
    ``|s| - ceil(t*|s|) + 1`` items (its PREFIX — the rare items) can
    witness a qualifying pair, so hub items (huge df, last in the order)
    fall outside almost every prefix and their ``C(df, 2)`` candidate
    blowup vanishes.  Candidates are generated from prefix postings only;
    each prefix posting carries its set's full item list (packed int64
    bytes), so the exact intersection verifies IN PLACE per item group —
    no false negatives (the published prefix-filter lemma, conservative
    symmetric prefix on both sides), no false positives (full verify).

    Four fixed-shard passes, all linear in posting data (one FEWER
    shuffle than a naive layering over the legacy path: the item-hash
    co-location of pass 1 already dedups (set, item) globally, and the
    set-hash co-location of pass 2 yields set sizes for free):
    1. ``hash(item)``: collapse to DISTINCT (set, item); run lengths =
       exact global df, annotate rows;
    2. ``hash(set)``: set size = per-set row count; (df, item)-sort,
       mark prefix rows, pack the item-sorted full set as bytes;
    3. ``hash(item)`` over PREFIX rows only: run pairs -> unique pairs ->
       vectorized padded-matrix intersection -> integer threshold test;
    4. ``hash(pair)``: first-wins dedup (a pair verified under several
       shared prefix items emits identical rows), one jaccard division.

    Legacy path (``prefix_filter=False``) keeps the 3-pass count-all-
    shared-items shape: candidate volume ``sum_items C(df, 2)`` — kept
    for A/B measurement; both paths are bit-identical (tested).

    Partitioning assumptions (100 TB): pass-4 verify is ``O(K^2)`` per
    pair on padded item matrices (K = max set size per group) — designed
    for bounded-size sets (baskets, orders, shingle samples; route huge
    documents through minhash_neardup instead).  Prefix postings ship
    each set's packed items ``prefix_len`` times (the Vernica tradeoff).
    Item ids must avoid the two int64 padding sentinels (min, min+1).
    """
    from geoglue_ray.functions.texthash import int_hash64

    from geoglue_ray.stages.dedup import _MIX1, _MIX2, _run_pairs

    P = np.uint64(n_shards)
    num = np.int64(threshold_num)
    den = np.int64(threshold_den)

    def shard_sets(b: pa.Table) -> pa.Table:
        k = b[set_col].to_numpy().astype(np.int64)
        return pa.table(
            {
                "_ss": pa.array((int_hash64(k) % P).astype(np.int64)),
                "ok": pa.array(k),
                "item": pa.array(b[item_col].to_numpy().astype(np.int64)),
            }
        )

    def distinct_sized(g: pd.DataFrame) -> pa.Table:
        ok = g["ok"].to_numpy().astype(np.int64)
        it = g["item"].to_numpy().astype(np.int64)
        if len(ok) == 0:  # empty group: typed full-schema empty
            return pa.table(
                {
                    "_is": pa.array([], pa.int64()),
                    "ok": pa.array([], pa.int64()),
                    "item": pa.array([], pa.int64()),
                    "sz": pa.array([], pa.int64()),
                }
            )
        o = np.lexsort((it, ok))
        ok, it = ok[o], it[o]
        keep = np.r_[True, (ok[1:] != ok[:-1]) | (it[1:] != it[:-1])]
        ok, it = ok[keep], it[keep]
        bnd = np.r_[True, ok[1:] != ok[:-1]]
        starts = np.nonzero(bnd)[0]
        sz = np.diff(np.r_[starts, len(ok)]).astype(np.int64)
        return pa.table(
            {
                "_is": pa.array((int_hash64(it) % P).astype(np.int64)),
                "ok": pa.array(ok),
                "item": pa.array(it),
                "sz": pa.array(np.repeat(sz, sz)),
            }
        )

    def _pair_collapse(a, b_, inter, sa, sb):
        o = np.lexsort((b_, a))
        a, b_, inter, sa, sb = a[o], b_[o], inter[o], sa[o], sb[o]
        bnd = np.r_[True, (a[1:] != a[:-1]) | (b_[1:] != b_[:-1])]
        starts = np.nonzero(bnd)[0]
        return (
            a[starts],
            b_[starts],
            np.add.reduceat(inter, starts),
            sa[starts],
            sb[starts],
        )

    def gen_candidates(g: pd.DataFrame) -> pa.Table:
        ok = g["ok"].to_numpy().astype(np.int64)
        it = g["item"].to_numpy().astype(np.int64)
        sz = g["sz"].to_numpy().astype(np.int64)
        o = np.lexsort((ok, it))
        ok, it, sz = ok[o], it[o], sz[o]
        ia, ib = _run_pairs(it)  # handles len 0/1 itself
        if len(ia) == 0:
            return pa.table(
                {
                    "_pb": pa.array([], pa.int64()),
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "inter": pa.array([], pa.int64()),
                    "sa": pa.array([], pa.int64()),
                    "sb": pa.array([], pa.int64()),
                }
            )
        a, b_, sa, sb = ok[ia], ok[ib], sz[ia], sz[ib]
        a, b_, inter, sa, sb = _pair_collapse(
            a, b_, np.ones(len(a), np.int64), sa, sb
        )
        h = (a.astype(np.uint64) * _MIX1 + b_.astype(np.uint64) * _MIX2) % P
        return pa.table(
            {
                "_pb": pa.array(h.astype(np.int64)),
                "doc_a": pa.array(a),
                "doc_b": pa.array(b_),
                "inter": pa.array(inter),
                "sa": pa.array(sa),
                "sb": pa.array(sb),
            }
        )

    def merge(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:  # empty group: typed full-schema empty
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "inter": pa.array([], pa.int64()),
                    "un": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        a, b_, inter, sa, sb = _pair_collapse(
            g["doc_a"].to_numpy().astype(np.int64),
            g["doc_b"].to_numpy().astype(np.int64),
            g["inter"].to_numpy().astype(np.int64),
            g["sa"].to_numpy().astype(np.int64),
            g["sb"].to_numpy().astype(np.int64),
        )
        union = sa + sb - inter
        keep = threshold_den * inter >= threshold_num * union
        return pa.table(
            {
                "doc_a": pa.array(a[keep]),
                "doc_b": pa.array(b_[keep]),
                "inter": pa.array(inter[keep]),
                "un": pa.array(union[keep]),
                "jaccard": pa.array(inter[keep] / union[keep]),
            }
        )

    if not prefix_filter:
        return (
            ds.map_batches(shard_sets, batch_format="pyarrow")
            .groupby("_ss")
            .map_groups(distinct_sized, batch_format="pandas")
            .groupby("_is")
            .map_groups(gen_candidates, batch_format="pandas")
            .groupby("_pb")
            .map_groups(merge, batch_format="pandas")
        )

    PAD_A = np.int64(np.iinfo(np.int64).min)
    PAD_B = np.int64(np.iinfo(np.int64).min + 1)

    def shard_items(b: pa.Table) -> pa.Table:
        k = b[item_col].to_numpy().astype(np.int64)
        return pa.table(
            {
                "_is": pa.array((int_hash64(k) % P).astype(np.int64)),
                "ok": pa.array(b[set_col].to_numpy().astype(np.int64)),
                "item": pa.array(k),
            }
        )

    def annotate_df(g: pd.DataFrame) -> pa.Table:
        """Item-shard pass: every copy of (set, item) is in this group,
        so a within-group dedup IS the global distinct, and run length
        under the item sort IS the exact global df."""
        empty = pa.table(
            {
                "_rs": pa.array([], pa.int64()),
                "ok": pa.array([], pa.int64()),
                "item": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        ok = g["ok"].to_numpy().astype(np.int64)
        it = g["item"].to_numpy().astype(np.int64)
        o = np.lexsort((ok, it))
        ok, it = ok[o], it[o]
        keep = np.r_[True, (ok[1:] != ok[:-1]) | (it[1:] != it[:-1])]
        ok, it = ok[keep], it[keep]
        bnd = np.r_[True, it[1:] != it[:-1]]
        starts = np.nonzero(bnd)[0]
        lens = np.diff(np.r_[starts, len(it)]).astype(np.int64)
        df = np.repeat(lens, lens)
        return pa.table(
            {
                "_rs": pa.array((int_hash64(ok) % P).astype(np.int64)),
                "ok": pa.array(ok),
                "item": pa.array(it),
                "df": pa.array(df),
            }
        )

    def mark_prefix(g: pd.DataFrame) -> pa.Table:
        """Set-shard pass: set size = per-set row count (rows are
        globally distinct); per set, (df, item)-rank its items and emit
        only the first ``sz - ceil(t*sz) + 1`` rows, each carrying the
        full item-sorted set packed as int64 bytes."""
        empty = pa.table(
            {
                "_is": pa.array([], pa.int64()),
                "ok": pa.array([], pa.int64()),
                "item": pa.array([], pa.int64()),
                "sz": pa.array([], pa.int64()),
                "blob": pa.array([], pa.binary()),
            }
        )
        if len(g) == 0:
            return empty
        ok = g["ok"].to_numpy().astype(np.int64)
        it = g["item"].to_numpy().astype(np.int64)
        df = g["df"].to_numpy().astype(np.int64)
        # packed full sets, items ascending (merge/verify order), and
        # set sizes from run lengths
        o1 = np.lexsort((it, ok))
        ok1, it1 = ok[o1], it[o1]
        sbnd = np.r_[True, ok1[1:] != ok1[:-1]]
        sstarts = np.nonzero(sbnd)[0]
        sends = np.r_[sstarts[1:], len(ok1)]
        set_sz = (sends - sstarts).astype(np.int64)
        flat = np.ascontiguousarray(it1, dtype="<i8").tobytes()
        blobs = [flat[8 * s : 8 * e] for s, e in zip(sstarts, sends)]
        uniq_ok = ok1[sstarts]
        # prefix ranks under the global (df, item) total order
        o2 = np.lexsort((it, df, ok))
        ok2, it2 = ok[o2], it[o2]
        bnd2 = np.r_[True, ok2[1:] != ok2[:-1]]
        starts2 = np.nonzero(bnd2)[0]
        lens2 = np.diff(np.r_[starts2, len(ok2)])
        rank = np.arange(len(ok2), dtype=np.int64) - np.repeat(starts2, lens2)
        sz2 = np.repeat(lens2.astype(np.int64), lens2)
        plen = sz2 - (num * sz2 + den - 1) // den + 1
        keep = rank < plen
        ok2, it2, sz2 = ok2[keep], it2[keep], sz2[keep]
        bi = np.searchsorted(uniq_ok, ok2)
        return pa.table(
            {
                "_is": pa.array((int_hash64(it2) % P).astype(np.int64)),
                "ok": pa.array(ok2),
                "item": pa.array(it2),
                "sz": pa.array(sz2),
                "blob": pa.array([blobs[i] for i in bi], pa.binary()),
            }
        )

    def gen_verify(g: pd.DataFrame) -> pa.Table:
        """Item-shard pass over prefix postings: run pairs -> unique
        pairs -> exact padded-matrix intersection -> threshold test."""
        empty = pa.table(
            {
                "_pb": pa.array([], pa.int64()),
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "inter": pa.array([], pa.int64()),
                "un": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        ok = g["ok"].to_numpy().astype(np.int64)
        it = g["item"].to_numpy().astype(np.int64)
        sz = g["sz"].to_numpy().astype(np.int64)
        blobs = g["blob"].to_numpy()
        o = np.lexsort((ok, it))
        ok, it, sz, blobs = ok[o], it[o], sz[o], blobs[o]
        ia, ib = _run_pairs(it)
        if len(ia) == 0:
            return empty
        # unique (a, b) within the group: a pair sharing several prefix
        # items that hash to this shard verifies once
        a, b_ = ok[ia], ok[ib]
        po = np.lexsort((b_, a))
        a, b_, ia, ib = a[po], b_[po], ia[po], ib[po]
        first = np.r_[True, (a[1:] != a[:-1]) | (b_[1:] != b_[:-1])]
        a, b_, ia, ib = a[first], b_[first], ia[first], ib[first]
        # padded item matrix (rows in group order)
        n = len(ok)
        K = int(sz.max())
        flat = np.frombuffer(b"".join(blobs.tolist()), dtype="<i8").astype(
            np.int64, copy=False
        )
        cum = np.r_[0, np.cumsum(sz)]
        M = np.full((n, K), PAD_A, dtype=np.int64)
        rows = np.repeat(np.arange(n), sz)
        cols = np.arange(len(flat), dtype=np.int64) - np.repeat(cum[:-1], sz)
        M[rows, cols] = flat
        Mb = np.where(M == PAD_A, PAD_B, M)
        inter = np.empty(len(ia), dtype=np.int64)
        CH = max(1, (1 << 22) // max(K * K, 1))
        for c0 in range(0, len(ia), CH):
            sl = slice(c0, c0 + CH)
            inter[sl] = (
                (M[ia[sl]][:, :, None] == Mb[ib[sl]][:, None, :])
                .sum(axis=(1, 2))
                .astype(np.int64)
            )
        un = sz[ia] + sz[ib] - inter
        keep = den * inter >= num * un
        a, b_, inter, un = a[keep], b_[keep], inter[keep], un[keep]
        h = (a.astype(np.uint64) * _MIX1 + b_.astype(np.uint64) * _MIX2) % P
        return pa.table(
            {
                "_pb": pa.array(h.astype(np.int64)),
                "doc_a": pa.array(a),
                "doc_b": pa.array(b_),
                "inter": pa.array(inter),
                "un": pa.array(un),
            }
        )

    def dedup_pairs(g: pd.DataFrame) -> pa.Table:
        """Pair-shard pass: cross-group first-wins (rows identical), the
        single jaccard division."""
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "inter": pa.array([], pa.int64()),
                "un": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        a = g["doc_a"].to_numpy().astype(np.int64)
        b_ = g["doc_b"].to_numpy().astype(np.int64)
        inter = g["inter"].to_numpy().astype(np.int64)
        un = g["un"].to_numpy().astype(np.int64)
        o = np.lexsort((b_, a))
        a, b_, inter, un = a[o], b_[o], inter[o], un[o]
        first = np.r_[True, (a[1:] != a[:-1]) | (b_[1:] != b_[:-1])]
        a, b_, inter, un = a[first], b_[first], inter[first], un[first]
        return pa.table(
            {
                "doc_a": pa.array(a),
                "doc_b": pa.array(b_),
                "inter": pa.array(inter),
                "un": pa.array(un),
                "jaccard": pa.array(inter / un),
            }
        )

    return (
        ds.map_batches(shard_items, batch_format="pyarrow")
        .groupby("_is")
        .map_groups(annotate_df, batch_format="pandas")
        .groupby("_rs")
        .map_groups(mark_prefix, batch_format="pandas")
        .groupby("_is")
        .map_groups(gen_verify, batch_format="pandas")
        .groupby("_pb")
        .map_groups(dedup_pairs, batch_format="pandas")
    )


def basket_rules(
    ds: rd.Dataset,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    top_n: int = 50,
    n_shards: int = 64,
) -> rd.Dataset:
    """Association-RULE mining (Apriori k=2): directed rules A -> B over
    basket co-occurrence with exact support, confidence = c_AB / c_A and
    lift = N * c_AB / (c_A * c_B) — both single divisions of exact int64
    counts, so the twin matches bit-for-bit; global ``top_n`` on the
    (confidence desc, antecedent, consequent) total order.  Extends
    :func:`cooccur_topk` (raw pair counts) with rule DIRECTION and the
    item-count denominators.

    Scale shape: the same two fixed-shard passes as cooccur_topk
    (basket-hash pair generation with per-shard collapse, pair-hash
    exact merge); per-item basket counts ride a THIRD bounded pass whose
    result broadcasts via ``ray.put`` (item vocabulary is
    catalog-bounded, never row-scale).  A pair's final confidence is
    computable entirely in its pair shard, so two-level top-k stays
    exact."""
    import ray

    from geoglue_ray.functions.texthash import int_hash64
    from geoglue_ray.stages.dedup import _run_pairs

    def shard(b: pa.Table) -> pa.Table:
        k = b[basket_col].to_numpy()
        return pa.table(
            {
                "_sh": pa.array(
                    (int_hash64(k) % np.uint64(n_shards)).astype(np.int64)
                ),
                basket_col: b[basket_col],
                item_col: b[item_col],
            }
        )

    sharded = ds.map_batches(shard, batch_format="pyarrow").materialize()

    def item_partial(g: pd.DataFrame) -> pd.DataFrame:
        bk = g[basket_col].to_numpy()
        it = g[item_col].to_numpy()
        o = np.lexsort((it, bk))
        bk, it = bk[o], it[o]
        uniq = np.r_[True, (bk[1:] != bk[:-1]) | (it[1:] != it[:-1])]
        u, c = np.unique(it[uniq], return_counts=True)
        return pd.DataFrame(
            {"it": u.astype(np.int64), "c": c.astype(np.int64)}
        )

    it_rows = (
        sharded.groupby("_sh")
        .map_groups(item_partial, batch_format="pandas")
        .take_all()
    )  # bounded: catalog cardinality (+ one nb per shard)
    counts: dict[int, int] = {}
    for r in it_rows:
        counts[int(r["it"])] = counts.get(int(r["it"]), 0) + int(r["c"])
    cref = ray.put(counts)

    def nb_partial(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"nb": [len(np.unique(g[basket_col].to_numpy()))]}
        )

    n_baskets = sum(
        int(r["nb"])
        for r in sharded.groupby("_sh")
        .map_groups(nb_partial, batch_format="pandas")
        .take_all()
    )

    def gen_pairs(g: pd.DataFrame) -> pd.DataFrame:
        bk = g[basket_col].to_numpy()
        it = g[item_col].to_numpy()
        o = np.lexsort((it, bk))
        bk, it = bk[o], it[o]
        uniq = np.r_[True, (bk[1:] != bk[:-1]) | (it[1:] != it[:-1])]
        bk, it = bk[uniq], it[uniq]
        ia, ib = _run_pairs(bk)
        if len(ia) == 0:
            return pd.DataFrame(
                {
                    "i1": np.array([], np.int64),
                    "i2": np.array([], np.int64),
                    "cab": np.array([], np.int64),
                    "_ps": np.array([], np.int64),
                }
            )
        packed = (it[ia].astype(np.int64) << np.int64(32)) | it[ib].astype(np.int64)
        pu, cnt = np.unique(packed, return_counts=True)
        ps = (int_hash64(pu) % np.uint64(n_shards)).astype(np.int64)
        return pd.DataFrame(
            {
                "i1": (pu >> np.int64(32)).astype(np.int64),
                "i2": (pu & np.int64(0xFFFFFFFF)).astype(np.int64),
                "cab": cnt.astype(np.int64),
                "_ps": ps,
            }
        )

    def _rules(i1, i2, cab, cmap):
        ante = np.concatenate([i1, i2])
        cons = np.concatenate([i2, i1])
        both = np.concatenate([cab, cab])
        ca = np.array([cmap[int(a)] for a in ante], dtype=np.int64)
        cb = np.array([cmap[int(b)] for b in cons], dtype=np.int64)
        conf = both.astype(np.float64) / ca.astype(np.float64)
        lift = (np.int64(n_baskets) * both).astype(np.float64) / (
            ca * cb
        ).astype(np.float64)
        return pd.DataFrame(
            {
                "antecedent": ante,
                "consequent": cons,
                "n_both": both,
                "n_ante": ca,
                "n_cons": cb,
                "confidence": conf,
                "lift": lift,
            }
        )

    def shard_rules(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "antecedent": pd.Series([], dtype=np.int64),
                "consequent": pd.Series([], dtype=np.int64),
                "n_both": pd.Series([], dtype=np.int64),
                "n_ante": pd.Series([], dtype=np.int64),
                "n_cons": pd.Series([], dtype=np.int64),
                "confidence": pd.Series([], dtype=np.float64),
                "lift": pd.Series([], dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        packed = (g["i1"].to_numpy() << np.int64(32)) | g["i2"].to_numpy()
        pu, inv = np.unique(packed, return_inverse=True)
        cnt = np.bincount(inv, weights=g["cab"].to_numpy()).astype(np.int64)
        keep = cnt >= min_support
        if not keep.any():
            return empty
        pu, cnt = pu[keep], cnt[keep]
        s = _rules(
            (pu >> np.int64(32)).astype(np.int64),
            (pu & np.int64(0xFFFFFFFF)).astype(np.int64),
            cnt,
            ray.get(cref),
        )
        s = s.sort_values(
            ["confidence", "antecedent", "consequent"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(top_n)
        return s.reset_index(drop=True)

    return (
        sharded.groupby("_sh")
        .map_groups(gen_pairs, batch_format="pandas")
        .groupby("_ps")
        .map_groups(shard_rules, batch_format="pandas")
        .sort(
            ["confidence", "antecedent", "consequent"],
            descending=[True, False, False],
        )
        .limit(top_n)
    )
