"""Distributed global prefix scan over an integer-keyed Dataset.

The classic two-pass scan the Dataset API lacks (Ray Data has
per-partition windows via groupby, but no ORDER BY ... ROWS UNBOUNDED
PRECEDING across the whole corpus): range-bucket the key space, reduce
per-range partial sums (range-cardinality — bounded, driver-resident),
exclusive-scan those on the driver, broadcast the offsets, then one
co-shuffled pass adds each row's in-range running sum to its range's
base offset.  Payload: rows ship exactly once; the only concentrated
data is the (n_ranges, sum) table.

The engine analogue of the reference's cumulative/stitch chains
(geoglue pool.py year-boundary halo: each partition needs its
predecessors' totals); used by the sequence-packing query
(queries.pack_offsets) where documents are concatenated in id order and
chunked into fixed training context windows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def global_prefix_sum(
    ds,
    id_col: str,
    val_col: str,
    range_size: int = 65536,
    n_shards: int = 64,
):
    """Exclusive prefix sum of ``val_col`` in ascending ``id_col`` order
    (ids need not be dense, only unique and non-negative).  Appends
    ``start_offset`` = sum of all values with a smaller id.  Exact
    int64 arithmetic end to end."""
    import ray

    P = np.uint64(n_shards)
    MUL = np.uint64(0x9E3779B185EBCA87)

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        v = b[val_col].to_numpy().astype(np.int64)
        rb = ids // np.int64(range_size)
        u = np.unique(rb)
        sums = np.zeros(len(u), dtype=np.int64)
        np.add.at(sums, np.searchsorted(u, rb), v)
        return pa.table({"rb": pa.array(u), "s": pa.array(sums)})

    parts = (
        ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    )  # bounded: n_ranges x n_blocks partial rows
    agg = parts.groupby("rb", as_index=False)["s"].sum().sort_values("rb")
    rbs = agg["rb"].to_numpy().astype(np.int64)
    base = np.r_[np.int64(0), np.cumsum(agg["s"].to_numpy().astype(np.int64))[:-1]]
    ref = ray.put((rbs, base))

    def shard(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        rb = (ids // np.int64(range_size)).astype(np.uint64)
        return b.append_column(
            "_rs", pa.array(((rb * MUL) % P).astype(np.int64))
        )

    def scan(g: pd.DataFrame, *, offsets_ref=ref) -> pa.Table:
        names = [c for c in g.columns if c != "_rs"]
        if len(g) == 0:
            # typed full-schema empty (block-schema corruption class)
            arrs = {c: pa.array(g[c].to_numpy(), from_pandas=True) for c in names}
            arrs["start_offset"] = pa.array([], pa.int64())
            return pa.table(arrs)
        rbs_b, base_b = ray.get(offsets_ref)
        ids = g[id_col].to_numpy().astype(np.int64)
        v = g[val_col].to_numpy().astype(np.int64)
        rb = ids // np.int64(range_size)
        o = np.lexsort((ids, rb))
        inv = np.empty_like(o)
        inv[o] = np.arange(len(o))
        rb_s, v_s = rb[o], v[o]
        csum = np.cumsum(v_s)
        starts = np.flatnonzero(np.r_[True, rb_s[1:] != rb_s[:-1]])
        run_base = np.r_[np.int64(0), csum[starts[1:] - 1]]
        run = np.cumsum(np.r_[True, rb_s[1:] != rb_s[:-1]]) - 1
        local_excl = csum - v_s - run_base[run]
        global_base = base_b[np.searchsorted(rbs_b, rb_s[starts])]
        start = local_excl + global_base[run]
        out = {c: pa.array(g[c].to_numpy(), from_pandas=True) for c in names}
        out["start_offset"] = pa.array(start[inv])
        return pa.table(out)

    return (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("_rs")
        .map_groups(scan, batch_format="pandas")
    )
