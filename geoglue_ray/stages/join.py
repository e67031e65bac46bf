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
) -> rd.Dataset:
    """Distributed big-big equi-join on int64 keys — the general
    shuffle join Ray Data's Dataset API lacks.  ``how``: ``inner`` /
    ``left`` (right columns null-filled for unmatched left rows) /
    ``semi`` / ``anti`` (left rows with / without a right match; left
    columns only, never duplicated by multi-matches).

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
    skew — a single mega-key still lands in one task (salting a join
    requires replicating the other side; out of scope here).  Project
    columns *before* joining.  Output key column is ``left_on``.
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

    if how not in ("inner", "left", "semi", "anti"):
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

    def tag_left(b: pa.Table) -> pa.Table:
        ids = b[left_on].to_numpy().astype(np.int64)
        cols = {
            "_shard": pa.array((int_hash64(ids) % P).astype(np.int64)),
            "_t": pa.array(np.zeros(len(b), np.int8)),
        }
        for n in lnames:
            cols[n] = b[n]
        for n in union_rnames:
            cols[n] = pa.nulls(len(b), rschema.types[rschema.names.index(n)])
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        ids = b[right_on].to_numpy().astype(np.int64)
        cols = {
            "_shard": pa.array((int_hash64(ids) % P).astype(np.int64)),
            "_t": pa.array(np.ones(len(b), np.int8)),
        }
        for n in lnames:
            cols[n] = (
                pa.array(ids)
                if n == left_on
                else pa.nulls(len(b), lschema.types[lschema.names.index(n)])
            )
        for n in union_rnames:
            cols[n] = b[n]
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
