"""Terrain-analysis and per-cell time-series raster derivatives:
ruggedness (TRI), aspect octant, west-edge line-of-sight visibility
(viewshed scanline), row-wise linear gap fill, EWMA (alpha = 1/2), and
isotonic regression.

The reference computes per-cell neighbor statistics over the same
lattice (``zonalstats.py`` zonal cores; ``resample.py:96`` neighbor
stencils); these are the standard GIS terrain derivatives re-expressed
Ray-Data-first:

- :func:`ruggedness` and :func:`aspect_octant` are halo-exchange
  stencils (the :func:`stages.stencil._halo_prep` banding — one linear
  shuffle, vectorized window math per row-band task).
- :func:`los_visibility` is a *scanline* operator: visibility from the
  row's west-most cell needs the whole row but nothing outside it, so
  groups are row bands x hour chunks with NO halo, and the running
  sight-line maximum is one vectorized column sweep per task (33-step
  loop over columns, all (hour, row) scanlines advanced at once).

Partitioning assumption (custom-operator rule): a scanline group must
hold complete rows — bands split on ``cell_row`` only.  A full 2-D
viewshed at planet scale would sweep per octant with band contraction
exactly as stages/hydro.py does for flow accumulation.

All three emit exact integer comparisons / integer-valued sums with at
most one final division, so the SQL self-join twins are bit-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from geoglue_ray import fixtures as fx
from geoglue_ray.stages.stencil import _halo_prep, focal_gradient

_DIRS8 = ((0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1))


def ruggedness(
    ds: rd.Dataset,
    variable: str = "t2m",
    band_rows: int = 8,
    hour_chunk: int = 24,
    n_cols: int | None = None,
) -> rd.Dataset:
    """Terrain Ruggedness Index per (cell, hour): the sum and mean of
    ``|v(neighbor) - v(center)|`` over the up-to-8 existing neighbors
    (Riley's TRI with the mean-absolute variant; on integer-valued
    doubles the <=8-term sum is exact and ``tri`` is one division).
    Cells with a null center or no existing neighbor are absent."""
    T0 = np.datetime64(fx.T0, "us")
    prep = _halo_prep(variable, band_rows, hour_chunk)

    def stencil(g: pd.DataFrame) -> pa.Table:
        hour = g["hour"].to_numpy().astype(np.int64)
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        own = g["_own"].to_numpy().astype(bool)
        empty = {
            "valid_time": pa.array([], pa.timestamp("us")),
            "cell_row": pa.array([], pa.int64()),
            "cell_col": pa.array([], pa.int64()),
            "tri_sum": pa.array([], pa.float64()),
            "n_nb": pa.array([], pa.int64()),
            "tri": pa.array([], pa.float64()),
        }
        if not own.any():
            return pa.table(empty)
        t0, r0 = hour.min(), r.min()
        nt = int(hour.max() - t0 + 1)
        nr = int(r.max() - r0 + 1)
        nc = int(c.max()) + 1 if n_cols is None else int(n_cols)
        shape = (nt, nr + 2, nc + 2)
        V = np.zeros(shape, dtype=np.float64)
        M = np.zeros(shape, dtype=bool)
        ti, ri, ci = hour - t0, r - r0 + 1, c + 1
        fin = np.isfinite(v)
        V[ti[fin], ri[fin], ci[fin]] = v[fin]
        M[ti[fin], ri[fin], ci[fin]] = True
        sel = own & np.isfinite(v)
        to, ro, co = ti[sel], ri[sel], ci[sel]
        vc = v[sel]
        tri_sum = np.zeros(len(to), np.float64)
        n_nb = np.zeros(len(to), np.int64)
        for dr, dc in _DIRS8:
            m = M[to, ro + dr, co + dc]
            tri_sum[m] += np.abs(V[to, ro + dr, co + dc][m] - vc[m])
            n_nb += m
        keep = n_nb > 0
        if not keep.any():
            return pa.table(empty)
        to, ro, co = to[keep], ro[keep], co[keep]
        tri_sum, n_nb = tri_sum[keep], n_nb[keep]
        return pa.table(
            {
                "valid_time": pa.array(
                    T0 + ((to + t0) * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(ro - 1 + r0),
                "cell_col": pa.array(co - 1),
                "tri_sum": pa.array(tri_sum),
                "n_nb": pa.array(n_nb),
                "tri": pa.array(tri_sum / n_nb),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(stencil, batch_format="pandas")
    )


def aspect_octant(
    ds: rd.Dataset,
    variable: str = "t2m",
    band_rows: int = 8,
    hour_chunk: int = 24,
    n_cols: int | None = None,
) -> rd.Dataset:
    """Aspect octant per (cell, hour): the 45-degree sector of the
    central-difference gradient vector (gx eastward, gy northward),
    sector k covering angles ``[45k, 45k+45)`` so every boundary is an
    axis or a diagonal — membership is pure sign / |gx| vs |gy|
    comparisons on exact integer-valued differences (no atan2, no
    irrational sector bounds).  ``aspect_oct`` in 0..7
    (0=E 1=NE 2=N 3=NW 4=W 5=SW 6=S 7=SE as angle grows CCW from east);
    a zero gradient is flat = -1.  Emitted where the center and all
    four cardinal neighbors exist (the :func:`focal_gradient`
    domain).  The *2.0 gradient scaling cancels in every comparison, so
    the SQL CASE twin over raw differences matches bit-exact."""
    grad = focal_gradient(
        ds,
        variable=variable,
        band_rows=band_rows,
        hour_chunk=hour_chunk,
        n_cols=n_cols,
    )

    def classify(b: pa.Table) -> pa.Table:
        gx = b["grad_x"].to_numpy()
        gy = b["grad_y"].to_numpy()
        # One condition per 45-degree sector, same order as the SQL CASE.
        conds = [
            (gx > 0) & (gy >= 0) & (gx > gy),
            (gx > 0) & (gy >= gx),
            (gx <= 0) & (gy > 0) & (gy > -gx),
            (gy > 0) & (-gx >= gy),
            (gx < 0) & (gy <= 0) & (-gx > -gy),
            (gx < 0) & (-gy >= -gx),
            (gx >= 0) & (gy < 0) & (-gy > gx),
            (gx > 0) & (gy < 0),
        ]
        oct_ = np.select(conds, np.arange(8, dtype=np.int64), np.int64(-1))
        return pa.table(
            {
                "valid_time": b["valid_time"],
                "cell_row": b["cell_row"],
                "cell_col": b["cell_col"],
                "aspect_oct": pa.array(oct_),
            }
        )

    return grad.map_batches(classify, batch_format="pyarrow")


def los_visibility(
    ds: rd.Dataset,
    variable: str = "t2m",
    band_rows: int = 16,
    hour_chunk: int = 24,
) -> rd.Dataset:
    """West-edge line-of-sight visibility per (cell, hour): for each
    raster row the observer stands on the row's west-most existing
    cell; a cell is ``visible`` iff its sight-line slope (value rise
    over column run) STRICTLY exceeds that of every existing cell
    between it and the observer (null cells are transparent — they
    neither block nor appear).  The observer cell itself is visible.

    Slope comparisons are cross-multiplied — ``rise_a * run_b >
    rise_b * run_a`` on exact integer-valued products (|rise| < 997,
    run <= n_cols) — never divided, so the SQL NOT-EXISTS twin is
    bit-exact.  One vectorized column sweep advances every (hour, row)
    scanline in the group at once, carrying the running best slope as
    an exact (rise, run) rational pair."""
    H = int(band_rows)
    T0 = np.datetime64(fx.T0, "us")

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )
        r = b["cell_row"].to_numpy().astype(np.int64)
        g = ((hour // hour_chunk) << np.int64(20)) | (r // H)
        return pa.table(
            {
                "_lb": pa.array(g),
                "hour": pa.array(hour),
                "r": pa.array(r),
                "c": pa.array(b["cell_col"].to_numpy().astype(np.int64)),
                "value": pa.array(
                    b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
                ),
            }
        )

    def sweep(g: pd.DataFrame) -> pa.Table:
        empty = {
            "valid_time": pa.array([], pa.timestamp("us")),
            "cell_row": pa.array([], pa.int64()),
            "cell_col": pa.array([], pa.int64()),
            "obs_col": pa.array([], pa.int64()),
            "visible": pa.array([], pa.bool_()),
        }
        if len(g) == 0:
            return pa.table(empty)
        hour = g["hour"].to_numpy().astype(np.int64)
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        fin = np.isfinite(v)
        hour, r, c, v = hour[fin], r[fin], c[fin], v[fin]
        if len(hour) == 0:
            return pa.table(empty)
        t0, r0 = hour.min(), r.min()
        nt = int(hour.max() - t0 + 1)
        nr = int(r.max() - r0 + 1)
        nc = int(c.max() + 1)
        V = np.zeros((nt, nr, nc), np.float64)
        M = np.zeros((nt, nr, nc), bool)
        ti, ri = hour - t0, r - r0
        V[ti, ri, c] = v
        M[ti, ri, c] = True
        # observer = first existing column per scanline (rows with no
        # existing cell get obs pointing past the grid, matching nothing)
        obs = np.where(M.any(axis=2), M.argmax(axis=2), nc)
        v_obs = np.take_along_axis(
            V, obs.clip(max=nc - 1)[:, :, None], axis=2
        )[:, :, 0]
        best_num = np.full((nt, nr), -1.0)
        best_den = np.zeros((nt, nr), np.float64)
        vis = np.zeros((nt, nr, nc), bool)
        for cc in range(nc):
            run = np.float64(cc) - obs
            after = M[:, :, cc] & (run > 0)
            rise = V[:, :, cc] - v_obs
            beats = rise * best_den > best_num * run
            vis[:, :, cc] = after & beats
            upd = after & beats
            best_num = np.where(upd, rise, best_num)
            best_den = np.where(upd, run, best_den)
        vis[ti, ri, c] |= c == obs[ti, ri]
        hrs = (ti + t0) * 3_600_000_000
        return pa.table(
            {
                "valid_time": pa.array(
                    T0 + hrs.astype("timedelta64[us]"), type=pa.timestamp("us")
                ),
                "cell_row": pa.array(ri + r0),
                "cell_col": pa.array(c),
                "obs_col": pa.array(obs[ti, ri].astype(np.int64)),
                "visible": pa.array(vis[ti, ri, c]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_lb")
        .map_groups(sweep, batch_format="pandas")
    )


def gap_fill_rows(
    ds: rd.Dataset,
    variable: str = "t2m",
    band_rows: int = 16,
    hour_chunk: int = 24,
) -> rd.Dataset:
    """Linear nodata infill along raster rows: every null cell with a
    non-null neighbor on BOTH sides of its row gets
    ``vw + (ve - vw) * (c - cw) / (ce - cw)`` from the nearest existing
    west/east cells (edge nulls stay absent).  The numerator product is
    an exact integer, so the single division + add chain mirrors the
    SQL twin bit-for-bit.  Scanline groups (row bands x hour chunks, no
    halo); nearest existing columns via one forward + one backward
    accumulate over the dense block."""
    H = int(band_rows)
    T0 = np.datetime64(fx.T0, "us")

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )
        r = b["cell_row"].to_numpy().astype(np.int64)
        g = ((hour // hour_chunk) << np.int64(20)) | (r // H)
        return pa.table(
            {
                "_gf": pa.array(g),
                "hour": pa.array(hour),
                "r": pa.array(r),
                "c": pa.array(b["cell_col"].to_numpy().astype(np.int64)),
                "value": pa.array(
                    b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
                ),
            }
        )

    def fill(g: pd.DataFrame) -> pa.Table:
        empty = {
            "valid_time": pa.array([], pa.timestamp("us")),
            "cell_row": pa.array([], pa.int64()),
            "cell_col": pa.array([], pa.int64()),
            "filled": pa.array([], pa.float64()),
        }
        if len(g) == 0:
            return pa.table(empty)
        hour = g["hour"].to_numpy().astype(np.int64)
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        t0, r0 = hour.min(), r.min()
        nt = int(hour.max() - t0 + 1)
        nr = int(r.max() - r0 + 1)
        nc = int(c.max() + 1)
        V = np.full((nt, nr, nc), np.nan)
        P = np.zeros((nt, nr, nc), bool)  # present (row carried a cell)
        ti, ri = hour - t0, r - r0
        V[ti, ri, c] = v
        P[ti, ri, c] = True
        M = np.isfinite(V)
        cols = np.arange(nc, dtype=np.int64)
        # nearest existing column to the west (inclusive scan), east
        west = np.where(M, cols, np.int64(-1))
        np.maximum.accumulate(west, axis=2, out=west)
        east = np.where(M, cols, nc)
        east = np.minimum.accumulate(east[:, :, ::-1], axis=2)[:, :, ::-1]
        tgt = P & ~M & (west >= 0) & (east < nc)
        if not tgt.any():
            return pa.table(empty)
        tt, rr, cc = np.nonzero(tgt)
        cw, ce = west[tt, rr, cc], east[tt, rr, cc]
        vw, ve = V[tt, rr, cw], V[tt, rr, ce]
        filled = vw + (ve - vw) * (cc - cw) / (ce - cw)
        return pa.table(
            {
                "valid_time": pa.array(
                    T0 + ((tt + t0) * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(rr + r0),
                "cell_col": pa.array(cc),
                "filled": pa.array(filled),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_gf")
        .map_groups(fill, batch_format="pandas")
    )


def ewma_cells(
    ds: rd.Dataset,
    variable: str = "t2m",
    n_shards: int = 64,
) -> rd.Dataset:
    """Per-cell exponential moving average with alpha = 1/2:
    ``e_t = (x_t + e_{t-1}) / 2`` over the cell's hour-ordered non-null
    series, ``e_first = x_first``.  Each halving is one correctly-
    rounded float op in a FIXED sequential order, so the recursive-CTE
    SQL twin (the identical per-step chain) is bit-exact even after the
    mantissa fills.  Cells co-shuffle on a fixed shard count; the
    recurrence advances all cells in a shard per time step (T-step loop
    of vectorized ops, never per-cell Python)."""

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        # holes are NaN floats (valid, non-null, in Arrow) — filter on
        # finiteness, mirroring the SQL twin's value IS NOT NULL
        b = b.filter(
            pa.array(np.isfinite(b["value"].to_numpy(zero_copy_only=False)))
        )
        r = b["cell_row"].to_numpy().astype(np.int64)
        c = b["cell_col"].to_numpy().astype(np.int64)
        cell = (r << np.int64(22)) | c
        shard = (
            (cell.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_ew": pa.array(shard),
                "cell": pa.array(cell),
                "valid_time": b["valid_time"],
                "value": pa.array(b["value"].to_numpy().astype(np.float64)),
            }
        )

    def ewma(g: pd.DataFrame) -> pa.Table:
        empty = {
            "valid_time": pa.array([], pa.timestamp("us")),
            "cell_row": pa.array([], pa.int64()),
            "cell_col": pa.array([], pa.int64()),
            "ewma": pa.array([], pa.float64()),
        }
        if len(g) == 0:
            return pa.table(empty)
        cell = g["cell"].to_numpy().astype(np.int64)
        t = g["valid_time"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        o = np.lexsort((t, cell))
        cell, t, v = cell[o], t[o], v[o]
        first = np.r_[True, cell[1:] != cell[:-1]]
        e = v.copy()
        # advance the recurrence one step at a time across ALL series:
        # rows at per-series position p update from position p-1
        pos = np.arange(len(v)) - np.repeat(
            np.flatnonzero(first), np.diff(np.r_[np.flatnonzero(first), len(v)])
        )
        maxp = int(pos.max()) if len(pos) else 0
        for p in range(1, maxp + 1):
            idx = np.flatnonzero(pos == p)
            e[idx] = (v[idx] + e[idx - 1]) / 2.0
        return pa.table(
            {
                "valid_time": pa.array(
                    t.astype("datetime64[us]"), type=pa.timestamp("us")
                ),
                "cell_row": pa.array(cell >> np.int64(22)),
                "cell_col": pa.array(cell & np.int64((1 << 22) - 1)),
                "ewma": pa.array(e),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_ew")
        .map_groups(ewma, batch_format="pandas")
    )


def isotonic_cells(
    ds: rd.Dataset,
    variable: str = "t2m",
    n_shards: int = 64,
) -> rd.Dataset:
    """Isotonic (monotone non-decreasing) regression per cell over its
    hour-ordered series via the exact max-min formula:
    ``fit_i = max_{j<=i} min_{k>=i} mean(x_j..x_k)`` — every interval
    mean is ONE division of exact integer prefix-sum differences, and
    min/max of identical doubles are order-free, so the SQL
    window-cummin/group-max twin is bit-exact.  O(T^2) per cell,
    vectorized as (cells x T x T) blocks per shard."""

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        # holes are NaN floats (valid, non-null, in Arrow) — filter on
        # finiteness, mirroring the SQL twin's value IS NOT NULL
        b = b.filter(
            pa.array(np.isfinite(b["value"].to_numpy(zero_copy_only=False)))
        )
        r = b["cell_row"].to_numpy().astype(np.int64)
        c = b["cell_col"].to_numpy().astype(np.int64)
        cell = (r << np.int64(22)) | c
        shard = (
            (cell.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_iso": pa.array(shard),
                "cell": pa.array(cell),
                "valid_time": b["valid_time"],
                "value": pa.array(b["value"].to_numpy().astype(np.float64)),
            }
        )

    def fit(g: pd.DataFrame) -> pa.Table:
        empty = {
            "valid_time": pa.array([], pa.timestamp("us")),
            "cell_row": pa.array([], pa.int64()),
            "cell_col": pa.array([], pa.int64()),
            "fitted": pa.array([], pa.float64()),
        }
        if len(g) == 0:
            return pa.table(empty)
        cell = g["cell"].to_numpy().astype(np.int64)
        t = g["valid_time"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        o = np.lexsort((t, cell))
        cell, t, v = cell[o], t[o], v[o]
        uc, starts = np.unique(cell, return_index=True)
        counts = np.diff(np.r_[starts, len(cell)])
        if len(np.unique(counts)) != 1:
            raise AssertionError("isotonic_cells expects equal-length series")
        T = int(counts[0])
        ncell = len(uc)
        X = v.reshape(ncell, T)
        ps = np.zeros((ncell, T + 1))
        np.cumsum(X, axis=1, out=ps[:, 1:])
        j = np.arange(T)[None, :, None]
        k = np.arange(T)[None, None, :]
        lenjk = (k - j + 1).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            # broadcast gives [cell, j, k] = ps[k+1] - ps[j] directly
            A = (ps[:, 1:][:, None, :] - ps[:, :-1][:, :, None]) / lenjk
        A = np.where(k >= j, A, np.inf)
        # M[cell, j, i] = min over k >= i of A[j, k]  (suffix cummin)
        M = np.minimum.accumulate(A[:, :, ::-1], axis=2)[:, :, ::-1]
        # fit[cell, i] = max over j <= i of M[j, i]
        M = np.where(k >= j, M, -np.inf)  # mask j > i lanes
        fit_v = M.max(axis=1)
        return pa.table(
            {
                "valid_time": pa.array(
                    t.astype("datetime64[us]"), type=pa.timestamp("us")
                ),
                "cell_row": pa.array(np.repeat(uc >> np.int64(22), T)),
                "cell_col": pa.array(np.repeat(uc & np.int64((1 << 22) - 1), T)),
                "fitted": pa.array(fit_v.ravel()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_iso")
        .map_groups(fit, batch_format="pandas")
    )


def rolling_median_cells(
    ds: rd.Dataset,
    variable: str = "t2m",
    window: int = 5,
    n_shards: int = 64,
) -> rd.Dataset:
    """Centered rolling median per cell over its hour-ordered non-null
    series (window = ``window`` rows, shrinking at the edges — the SQL
    ``ROWS BETWEEN h PRECEDING AND h FOLLOWING`` frame).  The even-count
    two-middle average matches DuckDB's ``median`` bit-for-bit
    (measured); one (cells x T x window) NaN-padded gather +
    ``np.nanmedian`` per shard."""
    if window % 2 != 1:
        raise ValueError("window must be odd (centered frame)")
    h = window // 2

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        b = b.filter(
            pa.array(np.isfinite(b["value"].to_numpy(zero_copy_only=False)))
        )
        r = b["cell_row"].to_numpy().astype(np.int64)
        c = b["cell_col"].to_numpy().astype(np.int64)
        cell = (r << np.int64(22)) | c
        shard = (
            (cell.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_rm": pa.array(shard),
                "cell": pa.array(cell),
                "valid_time": b["valid_time"],
                "value": pa.array(b["value"].to_numpy().astype(np.float64)),
            }
        )

    def roll(g: pd.DataFrame) -> pa.Table:
        empty = {
            "valid_time": pa.array([], pa.timestamp("us")),
            "cell_row": pa.array([], pa.int64()),
            "cell_col": pa.array([], pa.int64()),
            "roll_median": pa.array([], pa.float64()),
        }
        if len(g) == 0:
            return pa.table(empty)
        cell = g["cell"].to_numpy().astype(np.int64)
        t = g["valid_time"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        o = np.lexsort((t, cell))
        cell, t, v = cell[o], t[o], v[o]
        uc, starts = np.unique(cell, return_index=True)
        counts = np.diff(np.r_[starts, len(cell)])
        if len(np.unique(counts)) != 1:
            raise AssertionError("rolling_median_cells expects equal-length series")
        T = int(counts[0])
        X = v.reshape(len(uc), T)
        pad = np.pad(X, ((0, 0), (h, h)), constant_values=np.nan)
        stack = np.stack([pad[:, i : i + T] for i in range(window)], axis=2)
        med = np.nanmedian(stack, axis=2)
        return pa.table(
            {
                "valid_time": pa.array(
                    t.astype("datetime64[us]"), type=pa.timestamp("us")
                ),
                "cell_row": pa.array(np.repeat(uc >> np.int64(22), T)),
                "cell_col": pa.array(np.repeat(uc & np.int64((1 << 22) - 1), T)),
                "roll_median": pa.array(med.ravel()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_rm")
        .map_groups(roll, batch_format="pandas")
    )


def cost_distance(
    ds: rd.Dataset,
    variable: str = "t2m",
    rounds: int = 6,
    band_rows: int = 16,
    src_mod: int = 89,
    n_cols: int | None = None,
) -> rd.Dataset:
    """Bounded least-cost distance over the raster lattice: ``rounds``
    synchronous min-plus relaxation steps (8-neighbor) from the source
    cells (``value % src_mod == 0``), with entering a cell costing that
    cell's (integer-valued) value and null "ocean hole" cells
    impassable.  Emits ``(cell_row, cell_col, cost_dist)`` for every
    cell reached within ``rounds`` steps — the GIS cost-distance /
    accumulated-cost-surface operator truncated to a fixed horizon (the
    distributed-safe form: an unbounded Dijkstra is inherently
    sequential; k-step Bellman-Ford is a k-deep stencil).

    Shape (100 TB): the dependence radius of k rounds is exactly k
    cells, so each row band ships k halo rows to each neighbor band and
    runs ALL k rounds locally on a dense ``(band_rows + 2k) x n_cols``
    block — ONE linear shuffle total, never one per round, vectorized
    shifted-window ``np.fmin`` per round.  Interior (own) rows are
    exact; halo rows are recomputed by their owning band.  Requires
    ``rounds < band_rows`` so a cell ships to at most 3 bands.

    Exactness: every reachable distance is a sum of <= ``rounds``
    integers < 997 — exact in float64 under any accumulation order, so
    the SQL twin (k chained 3x3 min-join CTEs) is bit-identical.
    """
    if rounds >= band_rows:
        raise ValueError("cost_distance requires rounds < band_rows")
    from geoglue_ray.sources.raster import RXSIZE

    C = int(n_cols if n_cols is not None else RXSIZE)
    H = int(band_rows)
    K = int(rounds)
    T0 = np.datetime64(fx.T0, "us")

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        b = b.filter(pc.equal(b["valid_time"], pa.scalar(T0, pa.timestamp("us"))))
        r = b["cell_row"].to_numpy().astype(np.int64)
        c = b["cell_col"].to_numpy().astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        band = r // H
        parts = []
        for off, sel in (
            (0, np.ones(len(r), dtype=bool)),
            (-1, r % H <= K - 1),  # halo down to the band above
            (1, r % H >= H - K),  # halo up to the band below
        ):
            bb = band[sel] + off
            ok = bb >= 0
            parts.append(
                pa.table(
                    {
                        "_cd": pa.array(bb[ok]),
                        "r": pa.array(r[sel][ok]),
                        "c": pa.array(c[sel][ok]),
                        "value": pa.array(v[sel][ok]),
                        "_own": pa.array(np.full(int(ok.sum()), off == 0)),
                    }
                )
            )
        return pa.concat_tables(parts)

    def relax(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "cell_row": pa.array([], pa.int64()),
                "cell_col": pa.array([], pa.int64()),
                "cost_dist": pa.array([], pa.float64()),
            }
        )
        own = g["_own"].to_numpy().astype(bool)
        if len(g) == 0 or not own.any():
            return empty
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        band = int(r[own].min()) // H
        r0 = band * H - K
        R = H + 2 * K
        cost = np.full((R, C), np.nan)
        inb = (r - r0 >= 0) & (r - r0 < R)
        cost[r[inb] - r0, c[inb]] = v[inb]
        finite = np.isfinite(cost)
        src = np.zeros_like(finite)
        src[finite] = np.mod(cost[finite], float(src_mod)) == 0.0
        dist = np.where(src, 0.0, np.nan)
        for _ in range(K):
            pad = np.full((R + 2, C + 2), np.nan)
            pad[1:-1, 1:-1] = dist
            nb = np.full((R, C), np.nan)
            for dr, dc in _DIRS8:
                nb = np.fmin(nb, pad[1 + dr : R + 1 + dr, 1 + dc : C + 1 + dc])
            dist = np.fmin(dist, nb + cost)
        rr, cc = np.nonzero(np.isfinite(dist))
        out_r = rr + r0
        keep = (out_r >= band * H) & (out_r < band * H + H)
        return pa.table(
            {
                "cell_row": pa.array(out_r[keep]),
                "cell_col": pa.array(cc[keep].astype(np.int64)),
                "cost_dist": pa.array(dist[rr[keep], cc[keep]]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_cd")
        .map_groups(relax, batch_format="pandas")
    )


def plan_curvature(
    ds: rd.Dataset,
    variable: str = "t2m",
    band_rows: int = 8,
    hour_chunk: int = 24,
    n_cols: int | None = None,
) -> rd.Dataset:
    """Plan (contour) curvature per (cell, hour) — the second-order
    terrain derivative alongside TRI/aspect:
    ``(zxx*zy^2 - 2*zxy*zx*zy + zyy*zx^2) / (zx^2 + zy^2)`` on the 3x3
    window, with the grid spacing CLEARED so numerator and denominator
    are exact int64 polynomials of the raw central differences
    (zx_n = E-W, zy_n = S-N, zxx_n = E-2C+W, zyy_n = S-2C+N,
    zxy_n = SE-SW-NE+NW; substituting zx = zx_n/2, zxy = zxy_n/4 and
    clearing: num = 2*zxx_n*zy_n^2 - zxy_n*zx_n*zy_n + 2*zyy_n*zx_n^2,
    den = 2*(zx_n^2 + zy_n^2)) and curvature is ONE division — bit-exact vs the 8-neighbor pivot twin.  Cells need all
    8 neighbors + center finite; flat cells (zx = zy = 0) drop on both
    sides (0/0).  Same halo-banding scale shape as :func:`ruggedness`."""
    T0 = np.datetime64(fx.T0, "us")
    prep = _halo_prep(variable, band_rows, hour_chunk)

    def stencil(g: pd.DataFrame) -> pa.Table:
        hour = g["hour"].to_numpy().astype(np.int64)
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        own = g["_own"].to_numpy().astype(bool)
        empty = {
            "valid_time": pa.array([], pa.timestamp("us")),
            "cell_row": pa.array([], pa.int64()),
            "cell_col": pa.array([], pa.int64()),
            "curv_num": pa.array([], pa.int64()),
            "curv_den": pa.array([], pa.int64()),
            "plan_curv": pa.array([], pa.float64()),
        }
        if not own.any():
            return pa.table(empty)
        t0, r0 = hour.min(), r.min()
        nt = int(hour.max() - t0 + 1)
        nr = int(r.max() - r0 + 1)
        nc = int(c.max()) + 1 if n_cols is None else int(n_cols)
        shape = (nt, nr + 2, nc + 2)
        V = np.zeros(shape, dtype=np.int64)
        M = np.zeros(shape, dtype=bool)
        ti, ri, ci = hour - t0, r - r0 + 1, c + 1
        fin = np.isfinite(v)
        V[ti[fin], ri[fin], ci[fin]] = v[fin].astype(np.int64)
        M[ti[fin], ri[fin], ci[fin]] = True
        sel = own & np.isfinite(v)
        to, ro, co = ti[sel], ri[sel], ci[sel]
        all8 = np.ones(len(to), dtype=bool)
        for dr, dc in _DIRS8:
            all8 &= M[to, ro + dr, co + dc]
        to, ro, co = to[all8], ro[all8], co[all8]
        vc = V[to, ro, co]
        e, w = V[to, ro, co + 1], V[to, ro, co - 1]
        s, n = V[to, ro + 1, co], V[to, ro - 1, co]
        se, sw = V[to, ro + 1, co + 1], V[to, ro + 1, co - 1]
        ne, nw = V[to, ro - 1, co + 1], V[to, ro - 1, co - 1]
        zx, zy = e - w, s - n
        zxx, zyy = e - 2 * vc + w, s - 2 * vc + n
        zxy = se - sw - ne + nw
        num = 2 * zxx * zy * zy - zxy * zx * zy + 2 * zyy * zx * zx
        den = 2 * (zx * zx + zy * zy)
        keep = den > 0
        to, ro, co = to[keep], ro[keep], co[keep]
        num, den = num[keep], den[keep]
        return pa.table(
            {
                "valid_time": pa.array(
                    T0 + ((to + t0) * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(ro - 1 + r0),
                "cell_col": pa.array(co - 1),
                "curv_num": pa.array(num),
                "curv_den": pa.array(den),
                "plan_curv": pa.array(
                    num.astype(np.float64) / den.astype(np.float64)
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(stencil, batch_format="pandas")
    )
