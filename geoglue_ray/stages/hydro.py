"""Distributed D8 hydrology: flow accumulation + basin (watershed)
labeling over the flow-direction raster.

The reference computes per-cell terrain/zonal derivatives over the same
lattice (zonalstats.py; resample.py neighbor stencils); flow
accumulation is the canonical *global* raster dependency — each cell's
value depends on every upstream cell, so a plain halo stencil cannot
express it.  The scale shape here is tile (row-band) contraction, the
Barnes "parallel flow accumulation for trillion-cell DEMs" design:

1. **Local pass** (one task per row-band x hour-chunk): walk every
   in-band token down the D8 successor pointers — vectorized weight
   merging per step, never per-row Python — producing (a) the local
   accumulation from in-band origins, (b) each cell's in-band
   resolution (terminal pit, or the first out-of-band *gateway* cell)
   by pointer halving, and (c) the cross-band *exit edges* with their
   token weights.
2. **Contracted solve** (one task): the quotient graph on band-boundary
   cells only — perimeter-, not cell-, cardinality.  Inflows propagate
   in topological order (D8 drops are strictly positive, so gateway
   chains are acyclic); basins resolve by memoized pointer chase.
3. **Pour pass** (same banding): solved boundary inflows re-enter their
   band as tokens and pour down the stored in-band paths; basin labels
   for gateway-pending cells join against the broadcast-free tagged
   union of boundary basin maps (emitted only to the <=3 bands that can
   reference them).

Partitioning assumption (custom-operator rule): the contracted graph is
``O(n_cols x n_bands x hours)`` — band-*perimeter* scale.  At planet
scale raise ``band_rows`` so the quotient stays one-task sized, or
stack a second contraction level exactly as stages/spatial.py
spatial_components does.

Counts are exact integers and the walk order never enters a sum, so the
recursive-CTE SQL twin (oracles.raster_flow_acc) is bit-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from geoglue_ray import fixtures as fx

# key = (hour << 44) | (r << 22) | c   (r, c < 2^22; hour < 2^19)
_M22 = np.int64((1 << 22) - 1)

# D8 direction table — must match stages/stencil.flow_direction.
_DIRS = np.array(
    [(0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1)],
    dtype=np.int64,
)

_OUT_SCHEMA = {
    "_g": pa.int64(),
    "kind": pa.int64(),
    "a": pa.int64(),
    "b": pa.int64(),
    "c2": pa.int64(),
    "d": pa.int64(),
    "e": pa.int64(),
}


def _tagged(**cols: np.ndarray) -> pa.Table:
    n = max((len(v) for v in cols.values()), default=0)
    out = {}
    for name, typ in _OUT_SCHEMA.items():
        if name in cols:
            out[name] = pa.array(np.asarray(cols[name], np.int64), typ)
        else:
            out[name] = pa.array(np.zeros(n, np.int64), typ)
    return pa.table(out)


def _local_links(
    k: np.ndarray, sk: np.ndarray, band: int, band_rows: int
) -> tuple[np.ndarray, np.ndarray]:
    """(nxt, ext): in-band successor local index (-1 if none), and the
    out-of-band successor key (-1 if none).  ``k`` must be sorted."""
    n = len(k)
    sr = (sk >> np.int64(22)) & _M22
    inband = (sk >= 0) & (sr // band_rows == band)
    pos = np.searchsorted(k, sk).clip(0, max(n - 1, 0))
    if n and not np.array_equal(inband, inband & (k[pos] == sk)):
        raise AssertionError("in-band D8 successor missing from its band group")
    nxt = np.where(inband, pos, np.int64(-1))
    ext = np.where(~inband & (sk >= 0), sk, np.int64(-1))
    return nxt, ext


def flow_hydrology(
    fd: rd.Dataset,
    band_rows: int = 16,
    hour_chunk: int = 24,
) -> rd.Dataset:
    """Flow accumulation (# cells draining through each cell, itself
    included) and basin label (terminal pit cell of its flow path) per
    (valid_time, cell) from a :func:`stages.stencil.flow_direction`
    output.  See module docstring for the contraction design."""
    H = int(band_rows)
    T0 = np.datetime64(fx.T0, "us")

    def prep(b: pa.Table) -> pa.Table:
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )
        r = b["cell_row"].to_numpy().astype(np.int64)
        c = b["cell_col"].to_numpy().astype(np.int64)
        fdir = b["flow_dir"].to_numpy().astype(np.int64)
        key = (hour << np.int64(44)) | (r << np.int64(22)) | c
        pit = fdir < 0
        dr = np.where(pit, 0, _DIRS[fdir.clip(0), 0])
        dc = np.where(pit, 0, _DIRS[fdir.clip(0), 1])
        skey = np.where(
            pit,
            np.int64(-1),
            (hour << np.int64(44)) | ((r + dr) << np.int64(22)) | (c + dc),
        )
        g = ((hour // hour_chunk) << np.int64(12)) | (r // H)
        return pa.table(
            {
                "_g": pa.array(g),
                "key": pa.array(key),
                "skey": pa.array(skey),
            }
        )

    def local(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _tagged()
        k = g["key"].to_numpy().astype(np.int64)
        sk = g["skey"].to_numpy().astype(np.int64)
        o = np.argsort(k)
        k, sk = k[o], sk[o]
        gid = int(g["_g"].iloc[0])
        band = gid & ((1 << 12) - 1)
        n = len(k)
        nxt, ext = _local_links(k, sk, band, H)

        # token walk: every in-band cell starts one unit token
        acc = np.ones(n, np.int64)
        idx = np.arange(n)
        wt = np.ones(n, np.int64)
        exit_keys: list[np.ndarray] = []
        exit_ws: list[np.ndarray] = []
        while len(idx):
            m_ext = ext[idx] >= 0
            if m_ext.any():
                exit_keys.append(ext[idx[m_ext]])
                exit_ws.append(wt[m_ext])
            m_mv = nxt[idx] >= 0
            if not m_mv.any():
                break
            agg = np.zeros(n, np.int64)
            np.add.at(agg, nxt[idx[m_mv]], wt[m_mv])
            idx = np.flatnonzero(agg)
            wt = agg[idx]
            acc[idx] += wt

        # resolution by pointer halving: pit key (flag 1) or first
        # out-of-band gateway key (flag 0)
        res = np.where(sk < 0, k, np.where(ext >= 0, sk, np.int64(-1)))
        flag = np.where(sk < 0, np.int64(1), np.where(ext >= 0, np.int64(0), np.int64(-1)))
        ptr = nxt.copy()
        pending = np.flatnonzero(res == -1)
        while len(pending):
            j = ptr[pending]
            done = res[j] != -1
            di = pending[done]
            res[di] = res[j[done]]
            flag[di] = flag[j[done]]
            rest = pending[~done]
            ptr[rest] = ptr[ptr[rest]]
            pending = rest

        parts = [
            _tagged(
                _g=np.full(n, gid),
                kind=np.zeros(n, np.int64),
                a=k,
                b=sk,
                c2=acc,
                d=res,
                e=flag,
            )
        ]
        if exit_keys:
            ek = np.concatenate(exit_keys)
            ew = np.concatenate(exit_ws)
            uk, inv = np.unique(ek, return_inverse=True)
            uw = np.zeros(len(uk), np.int64)
            np.add.at(uw, inv, ew)
            parts.append(_tagged(kind=np.ones(len(uk), np.int64), a=uk, b=uw))
        rloc = (k >> np.int64(22)) & _M22
        bdy = (rloc % H == 0) | (rloc % H == H - 1)
        if bdy.any():
            parts.append(
                _tagged(
                    kind=np.full(int(bdy.sum()), 2),
                    a=k[bdy],
                    d=res[bdy],
                    e=flag[bdy],
                )
            )
        return pa.concat_tables(parts)

    def solve(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return _tagged()
        kind = g["kind"].to_numpy().astype(np.int64)
        mk = g["a"].to_numpy().astype(np.int64)[kind == 2]
        mres = g["d"].to_numpy().astype(np.int64)[kind == 2]
        mflag = g["e"].to_numpy().astype(np.int64)[kind == 2]
        meta = {int(a): (int(r_), int(f_)) for a, r_, f_ in zip(mk, mres, mflag)}
        ek = g["a"].to_numpy().astype(np.int64)[kind == 1]
        ew = g["b"].to_numpy().astype(np.int64)[kind == 1]
        inflow: dict[int, int] = {}
        for a, w in zip(ek, ew):
            inflow[int(a)] = inflow.get(int(a), 0) + int(w)
        for e in inflow:
            if e not in meta:
                raise AssertionError("cross-band inflow targets a non-boundary cell")

        # depth = gateway hops to terminal (acyclic: drops strictly > 0)
        depth: dict[int, int] = {}
        basin: dict[int, int] = {}
        for e0 in meta:
            stack = [e0]
            while stack:
                e = stack[-1]
                if e in depth:
                    stack.pop()
                    continue
                r_, f_ = meta[e]
                if f_ == 1:
                    depth[e] = 0
                    basin[e] = r_
                    stack.pop()
                elif r_ in depth:
                    depth[e] = depth[r_] + 1
                    basin[e] = basin[r_]
                    stack.pop()
                else:
                    stack.append(r_)
        # inflow propagation, sources (deep) first
        total = dict(inflow)
        for e in sorted(meta, key=lambda x: -depth[x]):
            w = total.get(e, 0)
            r_, f_ = meta[e]
            if w and f_ == 0:
                total[r_] = total.get(r_, 0) + w

        parts = []
        ik = np.array([e for e, w in total.items() if w > 0], np.int64)
        if len(ik):
            iw = np.array([total[int(e)] for e in ik], np.int64)
            gi = (((ik >> np.int64(44)) // hour_chunk) << np.int64(12)) | (
                ((ik >> np.int64(22)) & _M22) // H
            )
            parts.append(
                _tagged(_g=gi, kind=np.full(len(ik), 3), a=ik, b=iw)
            )
        bk = np.fromiter(basin.keys(), np.int64, len(basin))
        if len(bk):
            bv = np.array([basin[int(e)] for e in bk], np.int64)
            ch = ((bk >> np.int64(44)) // hour_chunk) << np.int64(12)
            bb = ((bk >> np.int64(22)) & _M22) // H
            for off in (-1, 0, 1):
                ok = bb + off >= 0
                parts.append(
                    _tagged(
                        _g=(ch | (bb + off))[ok],
                        kind=np.full(int(ok.sum()), 4),
                        a=bk[ok],
                        b=bv[ok],
                    )
                )
        return pa.concat_tables(parts) if parts else _tagged()

    def final(g: pd.DataFrame) -> pa.Table:
        kind = g["kind"].to_numpy().astype(np.int64)
        cells = kind == 0
        empty = pa.table(
            {
                "valid_time": pa.array([], pa.timestamp("us")),
                "cell_row": pa.array([], pa.int64()),
                "cell_col": pa.array([], pa.int64()),
                "flow_acc": pa.array([], pa.int64()),
                "basin_row": pa.array([], pa.int64()),
                "basin_col": pa.array([], pa.int64()),
            }
        )
        if not cells.any():
            return empty
        k = g["a"].to_numpy().astype(np.int64)[cells]
        sk = g["b"].to_numpy().astype(np.int64)[cells]
        acc = g["c2"].to_numpy().astype(np.int64)[cells]
        res = g["d"].to_numpy().astype(np.int64)[cells]
        flag = g["e"].to_numpy().astype(np.int64)[cells]
        o = np.argsort(k)
        k, sk, acc, res, flag = k[o], sk[o], acc[o], res[o], flag[o]
        gid = int(g["_g"].to_numpy()[np.flatnonzero(cells)[0]])
        band = gid & ((1 << 12) - 1)
        n = len(k)
        nxt, _ = _local_links(k, sk, band, H)

        ik = g["a"].to_numpy().astype(np.int64)[kind == 3]
        iw = g["b"].to_numpy().astype(np.int64)[kind == 3]
        if len(ik):
            pos = np.searchsorted(k, ik)
            if not np.array_equal(k[pos.clip(0, n - 1)], ik):
                raise AssertionError("solved inflow targets a cell absent from band")
            agg = np.zeros(n, np.int64)
            np.add.at(agg, pos, iw)
            while agg.any():
                idx = np.flatnonzero(agg)
                wt = agg[idx]
                acc[idx] += wt
                m = nxt[idx] >= 0
                agg = np.zeros(n, np.int64)
                if m.any():
                    np.add.at(agg, nxt[idx[m]], wt[m])

        bas = res.copy()
        pend = flag == 0
        if pend.any():
            mk = g["a"].to_numpy().astype(np.int64)[kind == 4]
            mv = g["b"].to_numpy().astype(np.int64)[kind == 4]
            mo = np.argsort(mk)
            mk, mv = mk[mo], mv[mo]
            mpos = np.searchsorted(mk, res[pend])
            if len(mk) == 0 or not np.array_equal(
                mk[mpos.clip(0, len(mk) - 1)], res[pend]
            ):
                raise AssertionError("gateway basin map missing a referenced entry")
            bas[pend] = mv[mpos]

        hour = k >> np.int64(44)
        return pa.table(
            {
                "valid_time": pa.array(
                    T0 + (hour * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array((k >> np.int64(22)) & _M22),
                "cell_col": pa.array(k & _M22),
                "flow_acc": pa.array(acc),
                "basin_row": pa.array((bas >> np.int64(22)) & _M22),
                "basin_col": pa.array(bas & _M22),
            }
        )

    interim = (
        fd.map_batches(prep, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(local, batch_format="pandas")
        .materialize()  # consumed by the solve filter AND the final union
    )

    def pick_solve(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.is_in(b["kind"], value_set=pa.array([1, 2], pa.int64())))
        return b.set_column(0, "_g", pa.array(np.zeros(len(b), np.int64)))

    solved = (
        interim.map_batches(pick_solve, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(solve, batch_format="pandas")
    )

    def pick_cells(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.equal(b["kind"], 0))

    return (
        interim.map_batches(pick_cells, batch_format="pyarrow")
        .union(solved)
        .groupby("_g")
        .map_groups(final, batch_format="pandas")
    )
