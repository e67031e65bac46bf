"""Stencil (focal / neighborhood) statistics over the raster lattice via
HALO EXCHANGE — the moving-window raster operator family (GIS "focal
statistics"; reference analogue: the gridded-raster math of resample.py,
which interpolates *between* grids where this smooths *within* one).

Partitioning: the lattice splits into row bands x hour chunks; every cell
ships to its own band, and cells on a band's first/last row ALSO ship one
copy to the adjacent band (the halo).  Each group task rebuilds a dense
``[hours, band_rows + 2, cols + 2]`` block and computes the 3x3
sum/count by nine shifted adds — pure vectorized numpy, no per-cell work,
and no task ever needs another task's output (one linear shuffle).

Exactness: raster values are integer-valued doubles, so the nine-term
neighborhood sum is exact in float64 regardless of accumulation order,
and the mean is ONE division — DuckDB's ``sum(v)/count(v)`` over the
self-joined neighborhood reproduces it bit-for-bit.

Scale shape (100 TB): task memory is ``hour_chunk x (band_rows + 2) x
n_cols`` — tune both knobs to the node; the halo overhead is ``2 /
band_rows`` of the corpus re-shipped.  Wider stencils (radius k) would
ship k halo rows each side; the shuffle stays linear.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from geoglue_ray import fixtures as fx


def focal_mean(
    ds: rd.Dataset,
    variable: str = "t2m",
    band_rows: int = 8,
    hour_chunk: int = 24,
    n_cols: int | None = None,
) -> rd.Dataset:
    """3x3 focal mean — see :func:`focal_stats` (``ops=("mean",)``)."""
    return focal_stats(
        ds,
        ops=("mean",),
        variable=variable,
        band_rows=band_rows,
        hour_chunk=hour_chunk,
        n_cols=n_cols,
    )


def focal_stats(
    ds: rd.Dataset,
    ops: tuple[str, ...] = ("mean",),
    variable: str = "t2m",
    band_rows: int = 8,
    hour_chunk: int = 24,
    n_cols: int | None = None,
) -> rd.Dataset:
    """3x3 focal (moving-window) statistics of ``value`` over the
    (hour, row, col) lattice for one variable — GIS "focal statistics".
    Emits one row per lattice cell with at least one non-null value in
    its 3x3 neighborhood: ``valid_time, cell_row, cell_col, n_nb`` plus
    one ``focal_<op>`` column per requested op.

    Ops: ``mean`` (single-division, exact for integer-valued doubles),
    ``sum``, ``min``, ``max``, ``range`` (max - min, exact integers) —
    all computed in the SAME nine-shifted-adds pass over the dense halo
    block, so requesting several ops costs one traversal — plus
    ``median`` (one vectorized (cells x 9) NaN-padded gather +
    ``np.nanmedian``; the even-count two-middle average is bit-identical
    to DuckDB's ``median`` — measured on formula-divergent pairs) and
    ``mode`` (majority value, ties to the SMALLEST value: 81 vectorized
    equality counts over the same 9-gather stack — exact integer
    comparisons, mirroring the SQL count-desc/value-asc row_number
    twin).
    """
    allowed = {"mean", "sum", "min", "max", "range", "median", "mode"}
    bad = set(ops) - allowed
    if bad:
        raise ValueError(f"unknown focal ops: {sorted(bad)}")
    H = int(band_rows)
    T0 = np.datetime64(fx.T0, "us")

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )
        r = b["cell_row"].to_numpy().astype(np.int64)
        c = b["cell_col"].to_numpy().astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        band = r // H
        tch = hour // hour_chunk
        parts = []
        for off, sel in (
            (0, np.ones(len(r), dtype=bool)),  # own band
            (-1, r % H == 0),  # halo down to the band above
            (1, r % H == H - 1),  # halo up to the band below
        ):
            bb = band[sel] + off
            ok = bb >= 0  # no band below 0; a too-high band only ever
            # receives halo rows and emits nothing — harmless but skip
            # shipping when we can prove it cheaply (own rows bound it)
            parts.append(
                pa.table(
                    {
                        "_fb": pa.array(
                            (tch[sel][ok] << np.int64(20)) | bb[ok]
                        ),
                        "hour": pa.array(hour[sel][ok]),
                        "r": pa.array(r[sel][ok]),
                        "c": pa.array(c[sel][ok]),
                        "value": pa.array(v[sel][ok]),
                        "_own": pa.array(np.full(int(ok.sum()), off == 0)),
                    }
                )
            )
        return pa.concat_tables(parts)

    need_minmax = bool({"min", "max", "range"} & set(ops))

    def stencil(g: pd.DataFrame) -> pa.Table:
        hour = g["hour"].to_numpy().astype(np.int64)
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        own = g["_own"].to_numpy().astype(bool)
        if not own.any():
            cols: dict = {
                "valid_time": pa.array([], pa.timestamp("us")),
                "cell_row": pa.array([], pa.int64()),
                "cell_col": pa.array([], pa.int64()),
                "n_nb": pa.array([], pa.int64()),
            }
            for op in ops:
                cols[f"focal_{op}"] = pa.array([], pa.float64())
            return pa.table(cols)
        t0, r0 = hour.min(), r.min()
        nt = int(hour.max() - t0 + 1)
        nr = int(r.max() - r0 + 1)
        nc = int(c.max()) + 1 if n_cols is None else int(n_cols)
        shape = (nt, nr + 2, nc + 2)
        V = np.zeros(shape, dtype=np.float64)
        M = np.zeros(shape, dtype=np.int64)
        ti, ri, ci = hour - t0, r - r0 + 1, c + 1
        fin = np.isfinite(v)
        V[ti[fin], ri[fin], ci[fin]] = v[fin]
        M[ti[fin], ri[fin], ci[fin]] = 1
        S = np.zeros(shape)
        C = np.zeros(shape, dtype=np.int64)
        if need_minmax:
            Vlo = np.where(M == 1, V, np.inf)
            Vhi = np.where(M == 1, V, -np.inf)
            Mn = np.full(shape, np.inf)
            Mx = np.full(shape, -np.inf)
        inner = (slice(None), slice(1, -1), slice(1, -1))
        for dr in (-1, 0, 1):  # one pass of nine shifts for every op
            for dc in (-1, 0, 1):
                sh = (
                    slice(None),
                    slice(1 + dr, nr + 1 + dr),
                    slice(1 + dc, nc + 1 + dc),
                )
                S[inner] += V[sh]  # exact: integer-valued doubles
                C[inner] += M[sh]
                if need_minmax:
                    np.minimum(Mn[inner], Vlo[sh], out=Mn[inner])
                    np.maximum(Mx[inner], Vhi[sh], out=Mx[inner])
        to, ro, co = ti[own], ri[own], ci[own]
        cnt = C[to, ro, co]
        nz = cnt > 0
        to, ro, co, cnt = to[nz], ro[nz], co[nz], cnt[nz]
        cols = {
            "valid_time": pa.array(
                T0 + ((to + t0) * 3_600_000_000).astype("timedelta64[us]"),
                type=pa.timestamp("us"),
            ),
            "cell_row": pa.array(ro - 1 + r0),
            "cell_col": pa.array(co - 1),
            "n_nb": pa.array(cnt),
        }
        if {"median", "mode"} & set(ops):
            stack = np.full((len(to), 9), np.nan)
            k = 0
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    m9 = M[to, ro + dr, co + dc] == 1
                    stack[m9, k] = V[to, ro + dr, co + dc][m9]
                    k += 1
            if "median" in ops:
                med = np.nanmedian(stack, axis=1)
            if "mode" in ops:
                # count[:, i] = multiplicity of stack[:, i]; NaN never
                # matches so missing slots score 0.  Maximize count,
                # break ties to the smallest value (values < 2^16).
                counts = np.zeros((len(to), 9), np.int64)
                for i in range(9):
                    for j in range(9):
                        counts[:, i] += stack[:, i] == stack[:, j]
                score = counts * np.int64(1 << 17) + (
                    np.int64(1 << 16)
                    - np.nan_to_num(stack, nan=-1.0).astype(np.int64)
                )
                mode = stack[np.arange(len(to)), score.argmax(axis=1)]
        for op in ops:
            if op == "mean":
                out = S[to, ro, co] / cnt
            elif op == "sum":
                out = S[to, ro, co]
            elif op == "min":
                out = Mn[to, ro, co]
            elif op == "max":
                out = Mx[to, ro, co]
            elif op == "median":
                out = med
            elif op == "mode":
                out = mode
            else:  # range
                out = Mx[to, ro, co] - Mn[to, ro, co]
            cols[f"focal_{op}"] = pa.array(out)
        return pa.table(cols)

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(stencil, batch_format="pandas")
    )


def _halo_prep(variable: str, band_rows: int, hour_chunk: int):
    """Shared banding/halo closure of the stencil family: filter to one
    variable, split into row bands x hour chunks, duplicate a band's
    first/last rows to the adjacent band (the one-row halo), tag own vs
    halo rows.  Returns the map_batches callable."""
    H = int(band_rows)
    T0 = np.datetime64(fx.T0, "us")

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )
        r = b["cell_row"].to_numpy().astype(np.int64)
        c = b["cell_col"].to_numpy().astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        band = r // H
        tch = hour // hour_chunk
        parts = []
        for off, sel in (
            (0, np.ones(len(r), dtype=bool)),
            (-1, r % H == 0),
            (1, r % H == H - 1),
        ):
            bb = band[sel] + off
            ok = bb >= 0
            parts.append(
                pa.table(
                    {
                        "_fb": pa.array((tch[sel][ok] << np.int64(20)) | bb[ok]),
                        "hour": pa.array(hour[sel][ok]),
                        "r": pa.array(r[sel][ok]),
                        "c": pa.array(c[sel][ok]),
                        "value": pa.array(v[sel][ok]),
                        "_own": pa.array(np.full(int(ok.sum()), off == 0)),
                    }
                )
            )
        return pa.concat_tables(parts)

    return prep


def focal_gradient(
    ds: rd.Dataset,
    variable: str = "t2m",
    band_rows: int = 8,
    hour_chunk: int = 24,
    n_cols: int | None = None,
) -> rd.Dataset:
    """Central-difference gradient (GIS slope components; the terrain-
    analysis face of the focal family): per cell and hour,
    ``grad_x = (E - W) * 2.0`` and ``grad_y = (N - S) * 2.0`` — the
    d/dlon, d/dlat finite differences at 0.25-deg spacing (1/(2*0.25)
    == the exact dyadic factor 2.0) — plus the squared magnitude
    ``grad2 = grad_x^2 + grad_y^2``.  Emitted only where the center and
    all four cardinal neighbors are non-null (boundary cells and cells
    adjacent to a hole are excluded).

    Same halo-exchange partitioning as :func:`focal_stats` (row bands x
    hour chunks, one-row halo, one linear shuffle); values are
    integer-valued doubles, so differences, the *2.0 scaling and the
    two-term square sum are all exact — the SQL 4-way self-join twin is
    bit-exact."""
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
            "grad_x": pa.array([], pa.float64()),
            "grad_y": pa.array([], pa.float64()),
            "grad2": pa.array([], pa.float64()),
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
        to, ro, co = ti[own], ri[own], ci[own]
        valid = (
            M[to, ro, co]
            & M[to, ro, co + 1]
            & M[to, ro, co - 1]
            & M[to, ro - 1, co]
            & M[to, ro + 1, co]
        )
        # interior only: a physical-boundary neighbor is an always-empty
        # padding cell, so M there is False and `valid` already excludes it
        to, ro, co = to[valid], ro[valid], co[valid]
        if len(to) == 0:
            return pa.table(empty)
        gx = (V[to, ro, co + 1] - V[to, ro, co - 1]) * 2.0
        gy = (V[to, ro - 1, co] - V[to, ro + 1, co]) * 2.0
        return pa.table(
            {
                "valid_time": pa.array(
                    T0 + ((to + t0) * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(ro - 1 + r0),
                "cell_col": pa.array(co - 1),
                "grad_x": pa.array(gx),
                "grad_y": pa.array(gy),
                "grad2": pa.array(gx * gx + gy * gy),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(stencil, batch_format="pandas")
    )


def local_geary(
    ds: rd.Dataset,
    variable: str = "t2m",
    band_rows: int = 8,
    hour_chunk: int = 24,
    n_cols: int | None = None,
) -> rd.Dataset:
    """Local Geary's c (Anselin 1995 LISA family, binary rook weights) —
    the squared-difference complement of :func:`local_moran`: per valid
    cell, ``c_i = sum_{j in nb} (x_i - x_j)^2 / m2``.  The neighbour
    squared-difference sum expands to the pure-integer form
    ``k*x^2 - 2*x*ns + nss`` (k/ns/nss = rook neighbour count / sum /
    sum of squares), computed in int64 and cast once, so the only float
    ops are the per-slice m2 chain and ONE final division — the DuckDB
    twin spelling the same expressions is bit-exact.

    Same two-pass distribution as local_moran: bounded moment pass +
    one halo-exchange stencil pass.  NOTE: consumes ``ds`` twice —
    materialize a pruned slice first (CLAUDE.md rule)."""
    T0 = np.datetime64(fx.T0, "us")
    mom = slice_moments(ds, variable=variable)
    m_hours = mom["hours"]
    nd = mom["n"].astype(np.float64)
    mean_h = mom["sx"].astype(np.float64) / nd
    m2_h = mom["sxx"].astype(np.float64) / nd - mean_h * mean_h
    prep = _halo_prep(variable, band_rows, hour_chunk)

    def stencil(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "valid_time": pa.array([], pa.timestamp("us")),
                "cell_row": pa.array([], pa.int64()),
                "cell_col": pa.array([], pa.int64()),
                "n_nb": pa.array([], pa.int64()),
                "sqdiff": pa.array([], pa.float64()),
                "local_c": pa.array([], pa.float64()),
            }
        )
        hour = g["hour"].to_numpy().astype(np.int64)
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        own = g["_own"].to_numpy().astype(bool)
        if not own.any():
            return empty
        t0, r0 = hour.min(), r.min()
        nt = int(hour.max() - t0 + 1)
        nr = int(r.max() - r0 + 1)
        nc = int(c.max()) + 1 if n_cols is None else int(n_cols)
        shape = (nt, nr + 2, nc + 2)
        V = np.zeros(shape, dtype=np.int64)
        M = np.zeros(shape, dtype=np.int64)
        ti, ri, ci = hour - t0, r - r0 + 1, c + 1
        fin = np.isfinite(v)
        V[ti[fin], ri[fin], ci[fin]] = v[fin].astype(np.int64)
        M[ti[fin], ri[fin], ci[fin]] = 1
        NS = np.zeros(shape, dtype=np.int64)
        NSS = np.zeros(shape, dtype=np.int64)
        K = np.zeros(shape, dtype=np.int64)
        inner = (slice(None), slice(1, -1), slice(1, -1))
        for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):  # rook, no self
            sh = (slice(None), slice(1 + dr, nr + 1 + dr), slice(1 + dc, nc + 1 + dc))
            NS[inner] += V[sh]
            NSS[inner] += V[sh] * V[sh]
            K[inner] += M[sh]
        sel = own & fin
        if not sel.any():
            return empty
        to, ro, co = ti[sel], ri[sel], ci[sel]
        hi = np.searchsorted(m_hours, to + t0)
        xi = v[sel].astype(np.int64)
        k = K[to, ro, co]
        num = k * xi * xi - 2 * xi * NS[to, ro, co] + NSS[to, ro, co]
        sqd = num.astype(np.float64)
        return pa.table(
            {
                "valid_time": pa.array(
                    T0 + ((to + t0) * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(ro - 1 + r0),
                "cell_col": pa.array(co - 1),
                "n_nb": pa.array(k),
                "sqdiff": pa.array(sqd),
                "local_c": pa.array(sqd / m2_h[hi]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(stencil, batch_format="pandas")
    )


def local_moran_bivariate(
    ds: rd.Dataset,
    var_x: str = "t2m",
    var_y: str = "tp",
    band_rows: int = 8,
    hour_chunk: int = 24,
    n_cols: int | None = None,
) -> rd.Dataset:
    """Bivariate local Moran's I (Anselin; the cross-variable LISA): per
    valid x-cell, ``I_i = z_x,i * (rook lag of z_y)_i / (s_x * s_y)``
    with per-slice standardization of BOTH fields.  Measures whether
    high x sits amid high y — e.g. temperature vs precipitation.

    The float chain is single IEEE ops on exact integer aggregates plus
    two correctly-rounded sqrts (the getis_ord discipline — sqrt is
    exact-input-deterministic, unlike ln/exp), so the SQL twin spelling
    the same expressions is bit-exact.  One halo stencil pass builds
    both fields' dense blocks; moments are two bounded passes.  NOTE:
    consumes ``ds`` three times — materialize a pruned slice first."""
    T0 = np.datetime64(fx.T0, "us")
    H = int(band_rows)
    momx = slice_moments(ds, variable=var_x)
    momy = slice_moments(ds, variable=var_y)

    def _chain(m):
        nd = m["n"].astype(np.float64)
        mean = m["sx"].astype(np.float64) / nd
        m2 = m["sxx"].astype(np.float64) / nd - mean * mean
        return m["hours"], mean, m2

    hx, mean_x, m2x = _chain(momx)
    hy, mean_y, m2y = _chain(momy)

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(
            pc.or_(pc.equal(b["variable"], var_x), pc.equal(b["variable"], var_y))
        )
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )
        r = b["cell_row"].to_numpy().astype(np.int64)
        c = b["cell_col"].to_numpy().astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        isx = pa.compute.equal(b["variable"], var_x).to_numpy(zero_copy_only=False)
        band = r // H
        tch = hour // hour_chunk
        parts = []
        for off, sel in (
            (0, np.ones(len(r), dtype=bool)),
            (-1, r % H == 0),
            (1, r % H == H - 1),
        ):
            bb = band[sel] + off
            ok = bb >= 0
            parts.append(
                pa.table(
                    {
                        "_fb": pa.array((tch[sel][ok] << np.int64(20)) | bb[ok]),
                        "hour": pa.array(hour[sel][ok]),
                        "r": pa.array(r[sel][ok]),
                        "c": pa.array(c[sel][ok]),
                        "value": pa.array(v[sel][ok]),
                        "_isx": pa.array(isx[sel][ok]),
                        "_own": pa.array(np.full(int(ok.sum()), off == 0)),
                    }
                )
            )
        return pa.concat_tables(parts)

    def stencil(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "valid_time": pa.array([], pa.timestamp("us")),
                "cell_row": pa.array([], pa.int64()),
                "cell_col": pa.array([], pa.int64()),
                "n_nb": pa.array([], pa.int64()),
                "zx": pa.array([], pa.float64()),
                "lag_y": pa.array([], pa.float64()),
                "local_ixy": pa.array([], pa.float64()),
            }
        )
        hour = g["hour"].to_numpy().astype(np.int64)
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        isx = g["_isx"].to_numpy().astype(bool)
        own = g["_own"].to_numpy().astype(bool)
        if not own.any():
            return empty
        t0, r0 = hour.min(), r.min()
        nt = int(hour.max() - t0 + 1)
        nr = int(r.max() - r0 + 1)
        nc = int(c.max()) + 1 if n_cols is None else int(n_cols)
        shape = (nt, nr + 2, nc + 2)
        Vy = np.zeros(shape)
        My = np.zeros(shape, dtype=np.int64)
        ti, ri, ci = hour - t0, r - r0 + 1, c + 1
        fin = np.isfinite(v)
        ysel = fin & ~isx
        Vy[ti[ysel], ri[ysel], ci[ysel]] = v[ysel]
        My[ti[ysel], ri[ysel], ci[ysel]] = 1
        NSy = np.zeros(shape)
        Ky = np.zeros(shape, dtype=np.int64)
        inner = (slice(None), slice(1, -1), slice(1, -1))
        for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):  # rook, no self
            sh = (slice(None), slice(1 + dr, nr + 1 + dr), slice(1 + dc, nc + 1 + dc))
            NSy[inner] += Vy[sh]  # exact: integer-valued doubles
            Ky[inner] += My[sh]
        sel = own & fin & isx  # defined at valid x cells
        if not sel.any():
            return empty
        to, ro, co = ti[sel], ri[sel], ci[sel]
        hix = np.searchsorted(hx, to + t0)
        hiy = np.searchsorted(hy, to + t0)
        zx = v[sel] - mean_x[hix]
        k = Ky[to, ro, co]
        lag = NSy[to, ro, co] - k * mean_y[hiy]
        return pa.table(
            {
                "valid_time": pa.array(
                    T0 + ((to + t0) * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(ro - 1 + r0),
                "cell_col": pa.array(co - 1),
                "n_nb": pa.array(k),
                "zx": pa.array(zx),
                "lag_y": pa.array(lag),
                "local_ixy": pa.array(
                    (zx * lag) / (np.sqrt(m2x[hix]) * np.sqrt(m2y[hiy]))
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(stencil, batch_format="pandas")
    )


def join_counts(
    ds: rd.Dataset,
    variable: str = "t2m",
    threshold: int = 499,
    band_rows: int = 8,
    hour_chunk: int = 24,
) -> rd.Dataset:
    """Join-count statistics (Cliff & Ord; the binary-map autocorrelation
    test): classify each valid cell black (``value >= threshold``) or
    white, then count rook lattice EDGES per time slice by endpoint
    colors — ``bb``/``ww``/``bw`` plus the edge total.  Pure integer
    counts, so the SQL right/down pair-join twin is bit-exact.

    Distribution: each band task counts its horizontal edges and the
    vertical edges whose UPPER endpoint it owns (the lower row may be a
    halo copy — every edge is counted exactly once); per-(slice, band)
    partials are slice-cardinality rows reduced by one tiny groupby."""
    T0 = np.datetime64(fx.T0, "us")
    prep = _halo_prep(variable, band_rows, hour_chunk)

    def count_band(g: pd.DataFrame) -> pd.DataFrame:
        hour = g["hour"].to_numpy().astype(np.int64)
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        own = g["_own"].to_numpy().astype(bool)
        cols = ["hour", "bb", "ww", "bw", "n_edges"]
        if not own.any():
            return pd.DataFrame({k: np.array([], dtype=np.int64) for k in cols})
        t0, r0 = hour.min(), r.min()
        nt = int(hour.max() - t0 + 1)
        nr = int(r.max() - r0 + 1)
        nc = int(c.max()) + 1
        shape = (nt, nr, nc)
        B = np.zeros(shape, dtype=np.int64)  # 1 = black, 0 = white
        M = np.zeros(shape, dtype=bool)
        O = np.zeros(shape, dtype=bool)  # own (non-halo) cells
        ti, ri, ci = hour - t0, r - r0, c
        fin = np.isfinite(v)
        B[ti[fin], ri[fin], ci[fin]] = (v[fin] >= threshold).astype(np.int64)
        M[ti[fin], ri[fin], ci[fin]] = True
        O[ti[own], ri[own], ci[own]] = True
        out = {k: [] for k in cols}
        for t in range(nt):
            # horizontal edges: both endpoints own rows by construction
            hl = M[t, :, :-1] & M[t, :, 1:] & O[t, :, :-1]
            hs = B[t, :, :-1] + B[t, :, 1:]
            # vertical edges: upper endpoint must be an own row
            vl = M[t, :-1, :] & M[t, 1:, :] & O[t, :-1, :]
            vs = B[t, :-1, :] + B[t, 1:, :]
            s = np.r_[hs[hl], vs[vl]]
            out["hour"].append(t + t0)
            out["bb"].append(int((s == 2).sum()))
            out["ww"].append(int((s == 0).sum()))
            out["bw"].append(int((s == 1).sum()))
            out["n_edges"].append(len(s))
        return pd.DataFrame({k: np.asarray(vv, dtype=np.int64) for k, vv in out.items()})

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("hour", as_index=False, dropna=False)[
            ["bb", "ww", "bw", "n_edges"]
        ].sum()
        tot["valid_time"] = pd.Series(
            np.datetime64(fx.T0, "us")
            + (tot["hour"].to_numpy() * 3_600_000_000).astype("timedelta64[us]")
        )
        return tot[["valid_time", "bb", "ww", "bw", "n_edges"]]

    partials = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(count_band, batch_format="pandas")
    )
    # slice-cardinality partials -> one final reduce task
    return partials.repartition(1).map_batches(
        finalize, batch_format="pandas", batch_size=None
    )


def slice_moments(ds: rd.Dataset, variable: str = "t2m") -> dict[str, np.ndarray]:
    """Exact per-time-slice moments ``(n, sum x, sum x^2)`` of the valid
    raster cells, as int64 — partial-collapsed per batch to hour
    cardinality, so the driver only ever holds ``blocks x hours-per-block``
    tiny rows (the provably-bounded ``take_all`` class).  Raster values
    are integer-valued doubles, so the sums are exact and
    order-independent."""
    T0 = np.datetime64(fx.T0, "us")

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )[fin]
        x = v[fin]  # exact small integers in float64
        hu, hi = np.unique(hour, return_inverse=True)
        return pa.table(
            {
                "hour": pa.array(hu.astype(np.int64)),
                "n": pa.array(np.bincount(hi).astype(np.int64)),
                "sx": pa.array(np.bincount(hi, weights=x).astype(np.int64)),
                "sxx": pa.array(np.bincount(hi, weights=x * x).astype(np.int64)),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[int, list[int]] = {}
    for row in rows:
        a = agg.setdefault(int(row["hour"]), [0, 0, 0])
        a[0] += int(row["n"])
        a[1] += int(row["sx"])
        a[2] += int(row["sxx"])
    hours = np.array(sorted(agg), dtype=np.int64)
    n = np.array([agg[h][0] for h in hours], dtype=np.int64)
    sx = np.array([agg[h][1] for h in hours], dtype=np.int64)
    sxx = np.array([agg[h][2] for h in hours], dtype=np.int64)
    return {"hours": hours, "n": n, "sx": sx, "sxx": sxx}


def local_moran(
    ds: rd.Dataset,
    variable: str = "t2m",
    band_rows: int = 8,
    hour_chunk: int = 24,
    n_cols: int | None = None,
) -> rd.Dataset:
    """Local Moran's I spatial autocorrelation (Anselin LISA, binary rook
    weights) per raster cell and time slice — the hot-spot/cold-spot
    operator of the GIS toolbox, over the same (hour, row, col) lattice
    geoglue's zonal statistics consume.

    Per slice t with valid cells x_i (integer-valued doubles):
    ``mean = sx/n``, ``m2 = sxx/n - mean*mean``, ``z_i = x_i - mean``,
    ``lag_i = ns_i - k_i*mean`` (ns_i/k_i = rook-neighbour integer
    sum/count), ``I_i = (z_i * lag_i) / m2``.  Every float is a fixed
    chain of single IEEE ops on exact integer aggregates, so a DuckDB
    twin spelling the same expressions reproduces it bit-for-bit (the
    events_contingency discipline; no transcendental functions).

    Distribution: one bounded-moment pass (:func:`slice_moments`,
    driver-resident at hour cardinality, shipped to tasks by closure)
    plus one halo-exchange stencil pass (the :func:`focal_stats` banding —
    row bands x hour chunks, first/last band rows duplicated to the
    adjacent band; four shifted adds per dense block).  NOTE: consumes
    ``ds`` twice — materialize a pruned slice first (CLAUDE.md rule) or
    pass a re-readable source.
    """
    H = int(band_rows)
    T0 = np.datetime64(fx.T0, "us")
    mom = slice_moments(ds, variable=variable)
    m_hours = mom["hours"]
    nd = mom["n"].astype(np.float64)
    mean_h = mom["sx"].astype(np.float64) / nd
    m2_h = mom["sxx"].astype(np.float64) / nd - mean_h * mean_h

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )
        r = b["cell_row"].to_numpy().astype(np.int64)
        c = b["cell_col"].to_numpy().astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        band = r // H
        tch = hour // hour_chunk
        parts = []
        for off, sel in (
            (0, np.ones(len(r), dtype=bool)),
            (-1, r % H == 0),  # halo down to the band above
            (1, r % H == H - 1),  # halo up to the band below
        ):
            bb = band[sel] + off
            ok = bb >= 0
            parts.append(
                pa.table(
                    {
                        "_fb": pa.array((tch[sel][ok] << np.int64(20)) | bb[ok]),
                        "hour": pa.array(hour[sel][ok]),
                        "r": pa.array(r[sel][ok]),
                        "c": pa.array(c[sel][ok]),
                        "value": pa.array(v[sel][ok]),
                        "_own": pa.array(np.full(int(ok.sum()), off == 0)),
                    }
                )
            )
        return pa.concat_tables(parts)

    def stencil(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "valid_time": pa.array([], pa.timestamp("us")),
                "cell_row": pa.array([], pa.int64()),
                "cell_col": pa.array([], pa.int64()),
                "n_nb": pa.array([], pa.int64()),
                "z": pa.array([], pa.float64()),
                "lag": pa.array([], pa.float64()),
                "local_i": pa.array([], pa.float64()),
            }
        )
        hour = g["hour"].to_numpy().astype(np.int64)
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        own = g["_own"].to_numpy().astype(bool)
        if not own.any():
            return empty
        t0, r0 = hour.min(), r.min()
        nt = int(hour.max() - t0 + 1)
        nr = int(r.max() - r0 + 1)
        nc = int(c.max()) + 1 if n_cols is None else int(n_cols)
        shape = (nt, nr + 2, nc + 2)
        V = np.zeros(shape, dtype=np.float64)
        M = np.zeros(shape, dtype=np.int64)
        ti, ri, ci = hour - t0, r - r0 + 1, c + 1
        fin = np.isfinite(v)
        V[ti[fin], ri[fin], ci[fin]] = v[fin]
        M[ti[fin], ri[fin], ci[fin]] = 1
        NS = np.zeros(shape)
        K = np.zeros(shape, dtype=np.int64)
        inner = (slice(None), slice(1, -1), slice(1, -1))
        for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):  # rook, no self
            sh = (slice(None), slice(1 + dr, nr + 1 + dr), slice(1 + dc, nc + 1 + dc))
            NS[inner] += V[sh]  # exact: integer-valued doubles
            K[inner] += M[sh]
        sel = own & fin  # Moran's I is defined only at valid cells
        if not sel.any():
            return empty
        to, ro, co = ti[sel], ri[sel], ci[sel]
        hi = np.searchsorted(m_hours, to + t0)
        mean = mean_h[hi]
        k = K[to, ro, co]
        ns = NS[to, ro, co]
        z = v[sel] - mean
        lag = ns - k * mean
        return pa.table(
            {
                "valid_time": pa.array(
                    T0 + ((to + t0) * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(ro - 1 + r0),
                "cell_col": pa.array(co - 1),
                "n_nb": pa.array(k),
                "z": pa.array(z),
                "lag": pa.array(lag),
                "local_i": pa.array((z * lag) / m2_h[hi]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(stencil, batch_format="pandas")
    )


def getis_ord(
    ds: rd.Dataset,
    variable: str = "t2m",
    band_rows: int = 8,
    hour_chunk: int = 24,
    n_cols: int | None = None,
) -> rd.Dataset:
    """Getis-Ord Gi* hot-spot statistic per raster cell and time slice —
    the z-scored local-sum operator (queen 3x3 neighborhood INCLUDING
    self, binary weights): ``Gi* = (ns - w*mean) / (s * sqrt((n*w - w*w)
    / (n-1)))`` with ``ns``/``w`` the neighborhood integer sum/valid
    count, ``mean``/``s = sqrt(m2)`` the per-slice moments.

    Exactness: integer aggregates, single-op IEEE chains, and ``sqrt``
    only — which IEEE-754 requires correctly rounded, so numpy and
    DuckDB agree bit-for-bit (unlike transcendental functions, which
    must never appear in an oracle chain — CLAUDE.md).  Same banding +
    halo and moment pass as :func:`local_moran`; consumes ``ds`` twice
    (materialize a pruned slice first)."""
    H = int(band_rows)
    T0 = np.datetime64(fx.T0, "us")
    mom = slice_moments(ds, variable=variable)
    m_hours = mom["hours"]
    n_h = mom["n"].astype(np.float64)
    mean_h = mom["sx"].astype(np.float64) / n_h
    s_h = np.sqrt(mom["sxx"].astype(np.float64) / n_h - mean_h * mean_h)

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )
        r = b["cell_row"].to_numpy().astype(np.int64)
        c = b["cell_col"].to_numpy().astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        band = r // H
        tch = hour // hour_chunk
        parts = []
        for off, sel in (
            (0, np.ones(len(r), dtype=bool)),
            (-1, r % H == 0),
            (1, r % H == H - 1),
        ):
            bb = band[sel] + off
            ok = bb >= 0
            parts.append(
                pa.table(
                    {
                        "_fb": pa.array((tch[sel][ok] << np.int64(20)) | bb[ok]),
                        "hour": pa.array(hour[sel][ok]),
                        "r": pa.array(r[sel][ok]),
                        "c": pa.array(c[sel][ok]),
                        "value": pa.array(v[sel][ok]),
                        "_own": pa.array(np.full(int(ok.sum()), off == 0)),
                    }
                )
            )
        return pa.concat_tables(parts)

    def stencil(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "valid_time": pa.array([], pa.timestamp("us")),
                "cell_row": pa.array([], pa.int64()),
                "cell_col": pa.array([], pa.int64()),
                "w_nb": pa.array([], pa.int64()),
                "g_star": pa.array([], pa.float64()),
            }
        )
        hour = g["hour"].to_numpy().astype(np.int64)
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        own = g["_own"].to_numpy().astype(bool)
        if not own.any():
            return empty
        t0, r0 = hour.min(), r.min()
        nt = int(hour.max() - t0 + 1)
        nr = int(r.max() - r0 + 1)
        nc = int(c.max()) + 1 if n_cols is None else int(n_cols)
        shape = (nt, nr + 2, nc + 2)
        V = np.zeros(shape)
        M = np.zeros(shape, dtype=np.int64)
        ti, ri, ci = hour - t0, r - r0 + 1, c + 1
        fin = np.isfinite(v)
        V[ti[fin], ri[fin], ci[fin]] = v[fin]
        M[ti[fin], ri[fin], ci[fin]] = 1
        NS = np.zeros(shape)
        W = np.zeros(shape, dtype=np.int64)
        inner = (slice(None), slice(1, -1), slice(1, -1))
        for dr in (-1, 0, 1):  # queen 3x3 INCLUDING self
            for dc in (-1, 0, 1):
                sh = (
                    slice(None),
                    slice(1 + dr, nr + 1 + dr),
                    slice(1 + dc, nc + 1 + dc),
                )
                NS[inner] += V[sh]
                W[inner] += M[sh]
        sel = own & fin
        if not sel.any():
            return empty
        to, ro, co = ti[sel], ri[sel], ci[sel]
        hi = np.searchsorted(m_hours, to + t0)
        w = W[to, ro, co]
        ns = NS[to, ro, co]
        n = n_h[hi]
        num = ns - w * mean_h[hi]
        den = s_h[hi] * np.sqrt((n * w - w * w) / (n - 1))
        return pa.table(
            {
                "valid_time": pa.array(
                    T0 + ((to + t0) * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(ro - 1 + r0),
                "cell_col": pa.array(co - 1),
                "w_nb": pa.array(w),
                "g_star": pa.array(num / den),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(stencil, batch_format="pandas")
    )


def variogram(
    ds: rd.Dataset,
    variable: str = "t2m",
    max_lag: int = 4,
    band_rows: int = 8,
    hour_chunk: int = 24,
) -> pa.Table:
    """Empirical semivariogram per time slice — ``gamma(h) = sum of
    (x_i - x_j)^2 over axis-aligned valid pairs at lag h, / (2 *
    n_pairs)`` for ``h = 1..max_lag`` — the geostatistics operator
    (variogram estimation, the first step of kriging) over the raster
    lattice.

    Distribution: the focal-stats row-band x hour-chunk banding, with an
    ``max_lag``-row halo (a band's first ``max_lag`` rows also ship to
    the band above; horizontal pairs never cross bands; vertical pairs
    are owned by their upper cell).  Each band task emits one partial
    ``(hour, h, n, sd2)`` row per (slice, lag) — all-integer, exact,
    order-free — so the driver only ever holds ``bands x chunks x
    slices x max_lag`` tiny rows before the final single-division
    ``gamma``.  Returns a bounded in-memory table (slice x lag rows).
    """
    H = int(band_rows)
    L = int(max_lag)
    if L >= H:
        raise ValueError("max_lag must be < band_rows (halo depth)")
    T0 = np.datetime64(fx.T0, "us")

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )[fin]
        r = b["cell_row"].to_numpy().astype(np.int64)[fin]
        c = b["cell_col"].to_numpy().astype(np.int64)[fin]
        x = v[fin]
        band = r // H
        tch = hour // hour_chunk
        parts = []
        for off, sel in (
            (0, np.ones(len(r), dtype=bool)),
            (-1, r % H < L),  # halo: first L band rows feed the band above
        ):
            bb = band[sel] + off
            ok = bb >= 0
            parts.append(
                pa.table(
                    {
                        "_fb": pa.array((tch[sel][ok] << np.int64(20)) | bb[ok]),
                        "hour": pa.array(hour[sel][ok]),
                        "r": pa.array(r[sel][ok]),
                        "c": pa.array(c[sel][ok]),
                        "value": pa.array(x[sel][ok]),
                        "_own": pa.array(np.full(int(ok.sum()), off == 0)),
                    }
                )
            )
        return pa.concat_tables(parts)

    def pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "hour": pa.array([], pa.int64()),
                "h": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sd2": pa.array([], pa.int64()),
            }
        )
        hour = g["hour"].to_numpy().astype(np.int64)
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        own = g["_own"].to_numpy().astype(bool)
        if not own.any():
            return empty
        t0, r0 = hour.min(), r.min()
        nt = int(hour.max() - t0 + 1)
        nr = int(r.max() - r0 + 1)
        nc = int(c.max()) + 1
        V = np.zeros((nt, nr, nc))
        M = np.zeros((nt, nr, nc), dtype=bool)
        O = np.zeros((nt, nr, nc), dtype=bool)
        ti, ri, ci = hour - t0, r - r0, c
        V[ti, ri, ci] = v
        M[ti, ri, ci] = True
        O[ti, ri, ci] = own
        rows = {"hour": [], "h": [], "n": [], "sd2": []}
        for h in range(1, L + 1):
            # vertical pairs, owned by the upper cell (halo feeds the lower)
            if nr > h:
                ok = O[:, :-h, :] & M[:, :-h, :] & M[:, h:, :]
                d = np.where(ok, V[:, :-h, :] - V[:, h:, :], 0.0)
                n_v = ok.sum(axis=(1, 2))
                s_v = (d * d).sum(axis=(1, 2))  # exact: integer diffs
            else:
                n_v = np.zeros(nt, np.int64)
                s_v = np.zeros(nt)
            # horizontal pairs, owned by the left cell (never cross bands)
            if nc > h:
                ok = O[:, :, :-h] & M[:, :, :-h] & M[:, :, h:]
                d = np.where(ok, V[:, :, :-h] - V[:, :, h:], 0.0)
                n_h = ok.sum(axis=(1, 2))
                s_h = (d * d).sum(axis=(1, 2))
            else:
                n_h = np.zeros(nt, np.int64)
                s_h = np.zeros(nt)
            n = (n_v + n_h).astype(np.int64)
            sd2 = (s_v + s_h).astype(np.int64)
            nz = n > 0
            rows["hour"].extend((np.arange(nt, dtype=np.int64) + t0)[nz])
            rows["h"].extend(np.full(int(nz.sum()), h, dtype=np.int64))
            rows["n"].extend(n[nz])
            rows["sd2"].extend(sd2[nz])
        if not rows["hour"]:
            return empty
        return pa.table({k: pa.array(np.asarray(a, np.int64)) for k, a in rows.items()})

    parts = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(pairs, batch_format="pandas")
        .take_all()
    )
    agg: dict[tuple[int, int], list[int]] = {}
    for row in parts:
        a = agg.setdefault((int(row["hour"]), int(row["h"])), [0, 0])
        a[0] += int(row["n"])
        a[1] += int(row["sd2"])
    keys = sorted(agg)
    hour = np.array([k[0] for k in keys], dtype=np.int64)
    lag = np.array([k[1] for k in keys], dtype=np.int64)
    n = np.array([agg[k][0] for k in keys], dtype=np.int64)
    sd2 = np.array([agg[k][1] for k in keys], dtype=np.int64)
    return pa.table(
        {
            "valid_time": pa.array(
                T0 + (hour * 3_600_000_000).astype("timedelta64[us]"),
                type=pa.timestamp("us"),
            ),
            "lag": pa.array(lag),
            "n_pairs": pa.array(n),
            "gamma": pa.array(sd2.astype(np.float64) / (2 * n)),
        }
    )


def temporal_variogram(
    ds: rd.Dataset,
    variable: str = "t2m",
    max_lag_hours: int = 6,
    n_shards: int = 32,
) -> pa.Table:
    """Marginal temporal semivariogram — ``gamma(h) = sum over same-cell
    pairs (t, t+h) of (x_{t+h} - x_t)^2 / (2 * n_pairs)`` for ``h =
    1..max_lag_hours`` — the time-axis companion of :func:`variogram`
    (together they give the space-time covariance structure kriging
    needs).

    Distribution: cells co-shuffle on ``hash(cell) % n_shards`` (all of
    a cell's hours co-locate, NO halo needed); one lexsort per shard,
    then each lag is a single shifted comparison over the sorted array.
    Partials are (lag, n, sd2) integers — the driver holds ``shards x
    max_lag`` rows before the single-division gamma.  Returns a bounded
    in-memory table (max_lag rows).  Partitioning assumption: a DENSE
    hourly axis per cell (array distance == hour distance after the
    lexsort); cells with missing hours would under-count pairs whose
    gap spans a hole."""
    L = int(max_lag_hours)
    T0 = np.datetime64(fx.T0, "us")

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )[fin]
        r = b["cell_row"].to_numpy().astype(np.int64)[fin]
        c = b["cell_col"].to_numpy().astype(np.int64)[fin]
        cell = r * np.int64(1 << 20) + c
        shard = (
            (cell.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_s": pa.array(shard),
                "cell": pa.array(cell),
                "hour": pa.array(hour),
                "x": pa.array(v[fin].astype(np.int64)),
            }
        )

    def pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "h": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sd2": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        cell = g["cell"].to_numpy().astype(np.int64)
        hour = g["hour"].to_numpy().astype(np.int64)
        x = g["x"].to_numpy().astype(np.int64)
        o = np.lexsort((hour, cell))
        cell, hour, x = cell[o], hour[o], x[o]
        hs, ns, sds = [], [], []
        for h in range(1, L + 1):
            if len(x) <= h:
                continue
            ok = (cell[h:] == cell[:-h]) & (hour[h:] == hour[:-h] + h)
            d = x[h:][ok] - x[:-h][ok]
            hs.append(h)
            ns.append(int(ok.sum()))
            sds.append(int((d * d).sum()))
        if not hs:
            return empty
        return pa.table(
            {
                "h": pa.array(np.asarray(hs, np.int64)),
                "n": pa.array(np.asarray(ns, np.int64)),
                "sd2": pa.array(np.asarray(sds, np.int64)),
            }
        )

    rows = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(pairs, batch_format="pandas")
        .take_all()
    )
    agg: dict[int, list[int]] = {}
    for row in rows:
        a = agg.setdefault(int(row["h"]), [0, 0])
        a[0] += int(row["n"])
        a[1] += int(row["sd2"])
    lags = np.array(sorted(agg), dtype=np.int64)
    n = np.array([agg[h][0] for h in lags], dtype=np.int64)
    sd2 = np.array([agg[h][1] for h in lags], dtype=np.int64)
    return pa.table(
        {
            "lag_hours": pa.array(lags),
            "n_pairs": pa.array(n),
            "gamma": pa.array(sd2.astype(np.float64) / (2 * n)),
        }
    )


def mann_kendall(
    ds: rd.Dataset,
    variable: str = "t2m",
    n_shards: int = 32,
) -> rd.Dataset:
    """Per-cell Mann-Kendall monotonic-trend test over the time axis —
    the non-parametric climate-trend operator: ``S = sum over time pairs
    i<j of sign(x_j - x_i)``, tie-corrected variance ``var_S = (n(n-1)
    (2n+5) - sum_g t_g(t_g-1)(2t_g+5)) / 18`` and the standard z-score
    (continuity-corrected, 0 at S = 0).

    Distribution: cells co-shuffle on ``hash(cell) % n_shards`` (FIXED
    group count — each task resolves MANY cells in one lexsort pass, the
    CLAUDE.md shard idiom); per cell the pair scan is O(T^2) vectorized.
    All statistics are exact integers until the one /18 division and the
    z chain (subtract 1, correctly-rounded sqrt, divide) — bit-exact vs
    the SQL self-join twin."""

    T0 = np.datetime64(fx.T0, "us")

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )[fin]
        r = b["cell_row"].to_numpy().astype(np.int64)[fin]
        c = b["cell_col"].to_numpy().astype(np.int64)[fin]
        cell = r * np.int64(1 << 20) + c
        shard = (
            (cell.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_s": pa.array(shard),
                "cell": pa.array(cell),
                "hour": pa.array(hour),
                "x": pa.array(v[fin].astype(np.int64)),
            }
        )

    def trend(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "cell_row": pa.array([], pa.int64()),
                "cell_col": pa.array([], pa.int64()),
                "n_obs": pa.array([], pa.int64()),
                "s_stat": pa.array([], pa.int64()),
                "var_s": pa.array([], pa.float64()),
                "z": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        cell = g["cell"].to_numpy().astype(np.int64)
        hour = g["hour"].to_numpy().astype(np.int64)
        x = g["x"].to_numpy().astype(np.int64)
        o = np.lexsort((hour, cell))
        cell, x = cell[o], x[o]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        rows = {"cell": [], "n": [], "s": [], "t": []}
        for s0, e0 in zip(starts, ends):
            xs = x[s0:e0]
            n = len(xs)
            d = xs[None, :] - xs[:, None]  # d[i, j] = x_j - x_i
            iu = np.triu_indices(n, k=1)
            s_stat = int(np.sign(d[iu]).sum())
            _, tg = np.unique(xs, return_counts=True)
            tsum = int((tg * (tg - 1) * (2 * tg + 5)).sum())
            rows["cell"].append(cell[s0])
            rows["n"].append(n)
            rows["s"].append(s_stat)
            rows["t"].append(tsum)
        cc = np.asarray(rows["cell"], np.int64)
        n = np.asarray(rows["n"], np.int64)
        s_stat = np.asarray(rows["s"], np.int64)
        tsum = np.asarray(rows["t"], np.int64)
        var = (n * (n - 1) * (2 * n + 5) - tsum).astype(np.float64) / 18.0
        sd = np.sqrt(var)
        z = np.where(
            s_stat > 0,
            (s_stat - 1).astype(np.float64) / sd,
            np.where(s_stat < 0, (s_stat + 1).astype(np.float64) / sd, 0.0),
        )
        return pa.table(
            {
                "cell_row": pa.array(cc >> np.int64(20)),
                "cell_col": pa.array(cc & np.int64((1 << 20) - 1)),
                "n_obs": pa.array(n),
                "s_stat": pa.array(s_stat),
                "var_s": pa.array(var),
                "z": pa.array(z),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(trend, batch_format="pandas")
    )


def lattice_edges(
    ds: rd.Dataset,
    variable: str = "t2m",
    class_div: int = 16,
    band_rows: int = 8,
    n_rows: int = 64,
    n_cols: int = 33,
) -> rd.Dataset:
    """4-adjacency same-class edges of the raster lattice (per time
    slice): cell class = ``int(value) // class_div``; NULL cells belong
    to no region.  Cell id packs ``((hour * n_rows) + r) * n_cols + c``.

    Right edges need no neighbor band; down edges are generated at the
    upper cell's band, fed by a one-row halo (each band's FIRST row also
    ships to the band above) — the same halo-exchange shape as
    :func:`focal_mean`, one linear shuffle.
    """
    H = int(band_rows)
    T0 = np.datetime64(fx.T0, "us")

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        hour = (
            (b["valid_time"].to_numpy() - T0)
            .astype("timedelta64[h]")
            .astype(np.int64)
        )[fin]
        r = b["cell_row"].to_numpy().astype(np.int64)[fin]
        c = b["cell_col"].to_numpy().astype(np.int64)[fin]
        cls = v[fin].astype(np.int64) // class_div
        band = r // H
        parts = []
        for off, sel in (
            (0, np.ones(len(r), dtype=bool)),
            (-1, r % H == 0),  # halo: first band row feeds the band above
        ):
            bb = band[sel] + off
            ok = bb >= 0
            parts.append(
                pa.table(
                    {
                        "_fb": pa.array(bb[ok]),
                        "hour": pa.array(hour[sel][ok]),
                        "r": pa.array(r[sel][ok]),
                        "c": pa.array(c[sel][ok]),
                        "cls": pa.array(cls[sel][ok]),
                        "_own": pa.array(np.full(int(ok.sum()), off == 0)),
                    }
                )
            )
        return pa.concat_tables(parts)

    def edges(g: pd.DataFrame) -> pa.Table:
        hour = g["hour"].to_numpy().astype(np.int64)
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        cls = g["cls"].to_numpy().astype(np.int64)
        own = g["_own"].to_numpy().astype(bool)
        empty = pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
        if not own.any():
            return empty
        hu = np.unique(hour)
        t0, r0 = hour.min(), r.min()
        ti = np.searchsorted(hu, hour)
        nt, nr = len(hu), int(r.max() - r0 + 1)
        C = np.full((nt, nr, n_cols), -1, dtype=np.int64)
        O = np.zeros((nt, nr, n_cols), dtype=bool)
        C[ti, r - r0, c] = cls
        O[ti, r - r0, c] = own
        def ids(tg, rg, cg):
            return ((hu[tg] * n_rows) + (rg + r0)) * n_cols + cg
        srcs, dsts = [], []
        # right edges: owned cell and its right neighbour (same band row)
        tg, rg, cg = np.nonzero(
            O[:, :, :-1] & (C[:, :, :-1] >= 0) & (C[:, :, :-1] == C[:, :, 1:])
        )
        srcs.append(ids(tg, rg, cg))
        dsts.append(ids(tg, rg, cg + 1))
        # down edges: owned upper cell, neighbour may be the halo row
        if nr > 1:
            tg, rg, cg = np.nonzero(
                O[:, :-1, :] & (C[:, :-1, :] >= 0) & (C[:, :-1, :] == C[:, 1:, :])
            )
            srcs.append(ids(tg, rg, cg))
            dsts.append(ids(tg, rg + 1, cg))
        src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
        dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
        if not len(src):
            return empty
        return pa.table({"doc_a": pa.array(src), "doc_b": pa.array(dst)})

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(edges, batch_format="pandas")
    )


def clump_regions(
    ds: rd.Dataset,
    variable: str = "t2m",
    class_div: int = 16,
    band_rows: int = 8,
    n_rows: int = 64,
    n_cols: int = 33,
    n_shards: int = 32,
) -> rd.Dataset:
    """Raster region labeling ("clump" / region-group): connected
    components of same-class 4-adjacent cells per time slice, reduced to
    per-region rows ``(region_id, cls, n_cells)`` with ``region_id`` the
    component's lowest cell id.  Composes :func:`lattice_edges` with the
    distributed min-label propagation of ``dedup.duplicate_clusters``;
    isolated cells (no same-class neighbour) become singleton regions via
    a co-shuffled tagged union — no broadcast, no driver state.

    ``ds`` is consumed TWICE (edge generation, then cell rows): pass a
    materialized slice or a cheap column-pruned file read — an expensive
    lineage would re-execute per consumer (CLAUDE.md round-3 rule).
    """
    from geoglue_ray.functions.texthash import int_hash64
    from geoglue_ray.stages.dedup import duplicate_clusters

    T0 = np.datetime64(fx.T0, "us")
    labels = duplicate_clusters(
        lattice_edges(ds, variable, class_div, band_rows, n_rows, n_cols),
        sort=False,
    )

    def cell_rows(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        hour = (
            (b["valid_time"].to_numpy() - T0)
            .astype("timedelta64[h]")
            .astype(np.int64)
        )[fin]
        r = b["cell_row"].to_numpy().astype(np.int64)[fin]
        c = b["cell_col"].to_numpy().astype(np.int64)[fin]
        ids = ((hour * n_rows) + r) * n_cols + c
        return pa.table(
            {
                "_ls": pa.array(
                    (int_hash64(ids) % np.uint64(n_shards)).astype(np.int64)
                ),
                "id": pa.array(ids),
                "cls": pa.array(v[fin].astype(np.int64) // class_div),
                "lab": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            }
        )

    def label_rows(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "_ls": pa.array(
                    (int_hash64(ids) % np.uint64(n_shards)).astype(np.int64)
                ),
                "id": pa.array(ids),
                "cls": pa.array(np.full(len(ids), -1, dtype=np.int64)),
                "lab": b["cluster_id"],
            }
        )

    tagged = ds.map_batches(cell_rows, batch_format="pyarrow").union(
        labels.map_batches(label_rows, batch_format="pyarrow")
    )

    def resolve(g: pd.DataFrame) -> pa.Table:
        ids = g["id"].to_numpy().astype(np.int64)
        cls = g["cls"].to_numpy().astype(np.int64)
        lab = g["lab"].to_numpy().astype(np.int64)
        if len(ids) == 0:  # empty group: typed full-schema empty
            return pa.table(
                {
                    "_ms": pa.array([], pa.int64()),
                    "region_id": pa.array([], pa.int64()),
                    "cls": pa.array([], pa.int64()),
                    "n_cells": pa.array([], pa.int64()),
                }
            )
        o = np.lexsort((lab, ids))  # per id: cell row (lab -1) first
        ids, cls, lab = ids[o], cls[o], lab[o]
        bnd = np.r_[True, ids[1:] != ids[:-1]]
        starts = np.nonzero(bnd)[0]
        ends = np.r_[starts[1:], len(ids)]
        region = np.where(ends - starts > 1, lab[ends - 1], ids[starts])
        # per-shard partial: (region, cls) counts — region-bounded payload
        key_r, key_c = region, cls[starts]
        o2 = np.lexsort((key_c, key_r))
        kr, kc = key_r[o2], key_c[o2]
        bnd2 = np.r_[True, (kr[1:] != kr[:-1]) | (kc[1:] != kc[:-1])]
        s2 = np.nonzero(bnd2)[0]
        cnt = np.diff(np.r_[s2, len(kr)]).astype(np.int64)
        return pa.table(
            {
                "_ms": pa.array(
                    (int_hash64(kr[s2]) % np.uint64(n_shards)).astype(np.int64)
                ),
                "region_id": pa.array(kr[s2]),
                "cls": pa.array(kc[s2]),
                "n_cells": pa.array(cnt),
            }
        )

    def merge(g: pd.DataFrame) -> pa.Table:
        r_ = g["region_id"].to_numpy().astype(np.int64)
        c_ = g["cls"].to_numpy().astype(np.int64)
        n_ = g["n_cells"].to_numpy().astype(np.int64)
        if len(r_) == 0:  # empty group: typed full-schema empty
            return pa.table(
                {
                    "region_id": pa.array([], pa.int64()),
                    "cls": pa.array([], pa.int64()),
                    "n_cells": pa.array([], pa.int64()),
                }
            )
        o = np.lexsort((c_, r_))
        r_, c_, n_ = r_[o], c_[o], n_[o]
        bnd = np.r_[True, (r_[1:] != r_[:-1]) | (c_[1:] != c_[:-1])]
        starts = np.nonzero(bnd)[0]
        return pa.table(
            {
                "region_id": pa.array(r_[starts]),
                "cls": pa.array(c_[starts]),
                "n_cells": pa.array(np.add.reduceat(n_, starts)),
            }
        )

    return (
        tagged.groupby("_ls")
        .map_groups(resolve, batch_format="pandas")
        .groupby("_ms")
        .map_groups(merge, batch_format="pandas")
    )


def cusum_drawup(
    ds: rd.Dataset,
    variable: str = "t2m",
    n_shards: int = 32,
) -> rd.Dataset:
    """Per-cell CUSUM max-drawup change-point statistic over the time
    axis — the sequential-analysis operator (did this cell's series shift
    upward, and when?): with cleared denominators ``D_k = n * S_k - k *
    Tot`` (prefix sums of the mean-centered series scaled by n, pure
    int64), the statistic is ``max_k (D_k - min_{j<k} D_j)`` with the
    empty-prefix minimum 0, and ``t_at_max`` = the FIRST hour attaining
    it (total order: drawup desc, hour asc).

    Distribution: the mann_kendall shard idiom (cells co-shuffle on
    ``hash(cell) % n_shards``, each task resolves many cells in one
    lexsort pass); the per-cell recurrence (running min with resets)
    vectorizes by padding the ragged cell series into ONE dense
    (cells x T_max) matrix per task and running ``np.minimum.accumulate``
    along axis 1 — no per-cell Python loop.  All-integer statistics, so
    the SQL window twin (running sum / running min / QUALIFY first-max)
    is bit-exact."""
    import pandas as pd

    T0 = np.datetime64(fx.T0, "us")

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )[fin]
        r = b["cell_row"].to_numpy().astype(np.int64)[fin]
        c = b["cell_col"].to_numpy().astype(np.int64)[fin]
        cell = r * np.int64(1 << 20) + c
        shard = (
            (cell.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_s": pa.array(shard),
                "cell": pa.array(cell),
                "hour": pa.array(hour),
                "x": pa.array(v[fin].astype(np.int64)),
            }
        )

    BIG = np.int64(1) << np.int64(62)

    def drawup(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "cell_row": pa.array([], pa.int64()),
                "cell_col": pa.array([], pa.int64()),
                "n_obs": pa.array([], pa.int64()),
                "drawup": pa.array([], pa.int64()),
                "t_at_max": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        cell = g["cell"].to_numpy().astype(np.int64)
        hour = g["hour"].to_numpy().astype(np.int64)
        x = g["x"].to_numpy().astype(np.int64)
        o = np.lexsort((hour, cell))
        cell, hour, x = cell[o], hour[o], x[o]
        first = np.r_[True, cell[1:] != cell[:-1]]
        starts = np.flatnonzero(first)
        run = np.cumsum(first) - 1
        pos = np.arange(len(cell), dtype=np.int64) - starts[run]
        ncell = len(starts)
        nlen = np.diff(np.r_[starts, len(cell)]).astype(np.int64)
        tmax = int(nlen.max())
        # per-cell prefix sums S_k via global cumsum minus the offset at
        # each cell start; D_k = n*S_k - k*Tot (mean-centered, scaled by n)
        cs = np.cumsum(x)
        base = np.where(starts > 0, cs[starts - 1], 0)
        s_k = cs - base[run]
        tot = s_k[np.r_[starts[1:], len(cell)] - 1]
        d_k = nlen[run] * s_k - (pos + 1) * tot[run]
        # pad ragged rows into one dense matrix; +BIG filler never wins a
        # running MIN, -BIG filler never wins the final MAX
        m = np.full((ncell, tmax), BIG, dtype=np.int64)
        m[run, pos] = d_k
        runmin = np.minimum.accumulate(m, axis=1)
        # exclusive prefix min with the empty prefix contributing 0
        excl = np.concatenate(
            [np.full((ncell, 1), BIG, dtype=np.int64), runmin[:, :-1]], axis=1
        )
        excl = np.minimum(excl, 0)
        dr = np.full((ncell, tmax), -BIG, dtype=np.int64)
        dr[run, pos] = d_k - excl[run, pos]
        best = dr.argmax(axis=1)  # first max = smallest hour (ties)
        hmat = np.zeros((ncell, tmax), dtype=np.int64)
        hmat[run, pos] = hour
        rows = np.arange(ncell)
        return pa.table(
            {
                "cell_row": pa.array(cell[starts] >> np.int64(20)),
                "cell_col": pa.array(cell[starts] & np.int64((1 << 20) - 1)),
                "n_obs": pa.array(nlen),
                "drawup": pa.array(dr[rows, best]),
                "t_at_max": pa.array(hmat[rows, best]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(drawup, batch_format="pandas")
    )

def theil_sen(
    ds: rd.Dataset,
    variable: str = "t2m",
    n_shards: int = 32,
) -> rd.Dataset:
    """Per-cell Theil-Sen robust trend estimator over the time axis — the
    median-of-pairwise-slopes companion to :func:`mann_kendall` (the
    standard robust climate-trend pair; reference analogue: the per-cell
    time reductions of timeagg.py generalized to a rank statistic):
    ``slope = median over time pairs i<j of (x_j - x_i) / (h_j - h_i)``
    and the Conover intercept ``median over i of (x_i - slope * h_i)``.

    Distribution: the mann_kendall shard idiom — cells co-shuffle on
    ``hash(cell) % n_shards`` (fixed group count, each task resolves many
    cells in one lexsort pass); the per-cell O(T^2) pair slopes are one
    vectorized triu block.  Exactness: x and h are integers, each slope
    is ONE float division, and the median of an even count is the mean
    of the two middle elements — ``(a + b) / 2`` in numpy and DuckDB
    alike, so the SQL pairwise-self-join twin is bit-exact."""

    T0 = np.datetime64(fx.T0, "us")

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )[fin]
        r = b["cell_row"].to_numpy().astype(np.int64)[fin]
        c = b["cell_col"].to_numpy().astype(np.int64)[fin]
        cell = r * np.int64(1 << 20) + c
        shard = (
            (cell.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_s": pa.array(shard),
                "cell": pa.array(cell),
                "hour": pa.array(hour),
                "x": pa.array(v[fin].astype(np.int64)),
            }
        )

    def slopes(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "cell_row": pa.array([], pa.int64()),
                "cell_col": pa.array([], pa.int64()),
                "n_obs": pa.array([], pa.int64()),
                "sen_slope": pa.array([], pa.float64()),
                "sen_intercept": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        cell = g["cell"].to_numpy().astype(np.int64)
        hour = g["hour"].to_numpy().astype(np.int64)
        x = g["x"].to_numpy().astype(np.int64)
        o = np.lexsort((hour, cell))
        cell, hour, x = cell[o], hour[o], x[o]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        rows = {"cell": [], "n": [], "m": [], "b": []}
        for s0, e0 in zip(starts, ends):
            xs = x[s0:e0]
            hs = hour[s0:e0]
            n = len(xs)
            if n < 2:
                continue
            iu, ju = np.triu_indices(n, k=1)
            sl = (xs[ju] - xs[iu]).astype(np.float64) / (
                hs[ju] - hs[iu]
            ).astype(np.float64)
            m = float(np.median(sl))
            b_ = float(np.median(xs.astype(np.float64) - m * hs.astype(np.float64)))
            rows["cell"].append(cell[s0])
            rows["n"].append(n)
            rows["m"].append(m)
            rows["b"].append(b_)
        cc = np.asarray(rows["cell"], np.int64)
        return pa.table(
            {
                "cell_row": pa.array(cc >> np.int64(20)),
                "cell_col": pa.array(cc & np.int64((1 << 20) - 1)),
                "n_obs": pa.array(np.asarray(rows["n"], np.int64)),
                "sen_slope": pa.array(np.asarray(rows["m"], np.float64)),
                "sen_intercept": pa.array(np.asarray(rows["b"], np.float64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(slopes, batch_format="pandas")
    )

def flow_direction(
    ds: rd.Dataset,
    variable: str = "t2m",
    band_rows: int = 8,
    hour_chunk: int = 24,
    n_cols: int | None = None,
) -> rd.Dataset:
    """D8 flow direction (hydrology's steepest-descent operator) per
    cell and hour over the integer-valued field: among the up-to-8
    existing (in-grid, non-null) neighbors, the direction of the
    LARGEST drop ``v(center) - v(neighbor)``; ties break to the
    smallest direction index, and a cell whose best drop is <= 0 is a
    pit/flat (``flow_dir = -1``).  Cells with a null center or no
    existing neighbor are absent (mirroring the SQL join semantics).

    Direction indices (grid coordinates, row grows southward):
    0=E(0,+1) 1=SE(+1,+1) 2=S(+1,0) 3=SW(+1,-1) 4=W(0,-1) 5=NW(-1,-1)
    6=N(-1,0) 7=NE(-1,+1).

    Same halo-exchange partitioning as :func:`focal_stats` (diagonals
    live inside the one-row halo because groups span the full column
    extent); drops are exact integer-valued differences and the argmax
    is pure comparisons, so the SQL 8-neighbor self-join twin is
    bit-exact."""
    T0 = np.datetime64(fx.T0, "us")
    prep = _halo_prep(variable, band_rows, hour_chunk)
    DIRS = ((0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1))

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
            "flow_dir": pa.array([], pa.int64()),
            "best_drop": pa.array([], pa.float64()),
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
        drops = np.full((len(to), 8), -np.inf)
        exists = np.zeros((len(to), 8), dtype=bool)
        for k, (dr, dc) in enumerate(DIRS):
            m = M[to, ro + dr, co + dc]
            drops[m, k] = vc[m] - V[to, ro + dr, co + dc][m]
            exists[:, k] = m
        any_nb = exists.any(axis=1)
        if not any_nb.any():
            return pa.table(empty)
        to, ro, co = to[any_nb], ro[any_nb], co[any_nb]
        drops = drops[any_nb]
        best = drops.argmax(axis=1)  # first max = smallest dir index
        bd = drops[np.arange(len(best)), best]
        fdir = np.where(bd > 0.0, best.astype(np.int64), np.int64(-1))
        return pa.table(
            {
                "valid_time": pa.array(
                    T0 + ((to + t0) * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(ro - 1 + r0),
                "cell_col": pa.array(co - 1),
                "flow_dir": pa.array(fdir),
                "best_drop": pa.array(bd),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(stencil, batch_format="pandas")
    )

def spearman_slices(
    ds: rd.Dataset,
    var_x: str = "t2m",
    var_y: str = "tp",
    n_shards: int = 16,
) -> rd.Dataset:
    """Spearman rank correlation between two raster variables per hour
    slice — the monotone-association companion to the moment-based
    local stats (does tp rise with t2m, without assuming linearity?).

    Each slice's (x, y) pairs co-shuffle on ``hash(hour) % n_shards``
    (a slice is lattice-cardinality, many slices per task); ranks are
    DOUBLED average ranks — for a tie run of ``c`` values after ``k``
    predecessors the average rank ``(2k + c + 1) / 2`` doubles to the
    exact INTEGER ``2k + c + 1`` — so every Spearman sum is exact int64
    and rho is the one mirrored chain ``(n*Sxy - Sx*Sy) /
    (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))`` (two correctly-rounded
    sqrts, one multiply, one divide), bit-exact vs the SQL
    window-rank twin."""
    T0 = np.datetime64(fx.T0, "us")

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )
        r = b["cell_row"].to_numpy().astype(np.int64)
        c = b["cell_col"].to_numpy().astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        var = b["variable"].to_numpy(zero_copy_only=False)
        cell = r * np.int64(1 << 20) + c
        out = {}
        for name in (var_x, var_y):
            m = (var == name) & np.isfinite(v)
            out[name] = pa.table(
                {
                    "hour": pa.array(hour[m]),
                    "cell": pa.array(cell[m]),
                    "val": pa.array(v[m]),
                    "is_x": pa.array(np.full(int(m.sum()), name == var_x)),
                }
            )
        t = pa.concat_tables([out[var_x], out[var_y]])
        shard = (
            (t["hour"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return t.append_column("_s", pa.array(shard))

    def rho(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "valid_time": pa.array([], pa.timestamp("us")),
                "n_cells": pa.array([], pa.int64()),
                "rho": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        hour = g["hour"].to_numpy().astype(np.int64)
        cell = g["cell"].to_numpy().astype(np.int64)
        val = g["val"].to_numpy()
        isx = g["is_x"].to_numpy().astype(bool)

        def rank2_of(sel: np.ndarray) -> dict[tuple[int, int], np.ndarray]:
            # doubled average ranks per (hour) partition, keyed back to cell
            h, cl, v = hour[sel], cell[sel], val[sel]
            o = np.lexsort((v, h))
            h, cl, v = h[o], cl[o], v[o]
            newh = np.r_[True, h[1:] != h[:-1]]
            hstart = np.flatnonzero(newh)
            hrun = np.cumsum(newh) - 1
            pos = np.arange(len(h), dtype=np.int64) - hstart[hrun]
            newv = newh | np.r_[True, v[1:] != v[:-1]]
            vstart = np.flatnonzero(newv)
            vrun = np.cumsum(newv) - 1
            vlen = np.diff(np.r_[vstart, len(h)]).astype(np.int64)
            k = pos[vstart[vrun]]  # predecessors within the hour slice
            r2 = 2 * k + vlen[vrun] + 1
            return h, cl, r2

        hx, cx, r2x = rank2_of(isx)
        hy, cy, r2y = rank2_of(~isx)
        # align x and y rows on (hour, cell): both sides complete (holes
        # are per-cell for every variable) — lexsort both identically
        ox = np.lexsort((cx, hx))
        oy = np.lexsort((cy, hy))
        if not (
            len(ox) == len(oy)
            and np.array_equal(hx[ox], hy[oy])
            and np.array_equal(cx[ox], cy[oy])
        ):
            raise ValueError("spearman_slices: x/y slices misaligned")
        h = hx[ox]
        x = r2x[ox]
        y = r2y[oy]
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        n = np.diff(np.r_[starts, len(h)]).astype(np.int64)
        sx = np.add.reduceat(x, starts)
        sy = np.add.reduceat(y, starts)
        sxx = np.add.reduceat(x * x, starts)
        syy = np.add.reduceat(y * y, starts)
        sxy = np.add.reduceat(x * y, starts)
        num = (n * sxy - sx * sy).astype(np.float64)
        den = np.sqrt((n * sxx - sx * sx).astype(np.float64)) * np.sqrt(
            (n * syy - sy * sy).astype(np.float64)
        )
        return pa.table(
            {
                "valid_time": pa.array(
                    T0 + (h[starts] * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "n_cells": pa.array(n),
                "rho": pa.array(num / den),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(rho, batch_format="pandas")
    )

def seasonal_decompose(
    ds: rd.Dataset,
    variable: str = "t2m",
    period: int = 24,
    half: int = 12,
    n_shards: int = 32,
) -> rd.Dataset:
    """Classical seasonal-trend decomposition per cell over the hourly
    series (the moving-average STL-lite: ``x = trend + seasonal +
    residual``): trend = centered (2*half+1)-hour moving average,
    seasonal = per-hour-of-day mean of the detrended interior, residual
    the rest.  All arithmetic runs in CLEARED DENOMINATORS — ``T25 =
    sum of the 25-hour window`` (exact int64), ``d25 = 25*x - T25``,
    per-hod sums ``S75 = sum of d25`` over the interior occurrences —
    so float sums never accumulate in engine-dependent order; the three
    emitted columns are single divisions (``/25``, ``/75``, ``(3*d25 -
    S75)/75``), bit-exact vs the SQL window twin.  Requires the input
    span to give every hour-of-day the same interior count (e.g. 4 days
    with period 24, half 12 -> 3 occurrences each — asserted).

    Distribution: the mann_kendall shard idiom — whole cell series
    co-shuffle on ``hash(cell) % n_shards``; per task one lexsort +
    cumsum pass, no per-cell Python beyond a bounded loop."""

    T0 = np.datetime64(fx.T0, "us")
    W = 2 * half + 1

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], variable))
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )[fin]
        r = b["cell_row"].to_numpy().astype(np.int64)[fin]
        c = b["cell_col"].to_numpy().astype(np.int64)[fin]
        cell = r * np.int64(1 << 20) + c
        shard = (
            (cell.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_s": pa.array(shard),
                "cell": pa.array(cell),
                "hour": pa.array(hour),
                "x": pa.array(v[fin].astype(np.int64)),
            }
        )

    def decompose(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "valid_time": pa.array([], pa.timestamp("us")),
                "cell_row": pa.array([], pa.int64()),
                "cell_col": pa.array([], pa.int64()),
                "trend": pa.array([], pa.float64()),
                "seasonal": pa.array([], pa.float64()),
                "resid": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        cell = g["cell"].to_numpy().astype(np.int64)
        hour = g["hour"].to_numpy().astype(np.int64)
        x = g["x"].to_numpy().astype(np.int64)
        o = np.lexsort((hour, cell))
        cell, hour, x = cell[o], hour[o], x[o]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        outs = []
        for s0, e0 in zip(starts, ends):
            xs = x[s0:e0]
            hs = hour[s0:e0]
            n = len(xs)
            if n < W:
                continue
            cs = np.concatenate(([0], np.cumsum(xs)))
            t25 = cs[W:] - cs[:-W]  # window sums, positions half..n-1-half
            ti = np.arange(half, n - half)
            d25 = W * xs[ti] - t25
            hod = hs[ti] % period
            cnt = np.bincount(hod, minlength=period)
            occ = cnt[cnt > 0]
            if len(occ) and not np.all(occ == occ[0]):
                raise ValueError(
                    "seasonal_decompose: uneven hour-of-day interior counts"
                )
            m = int(occ[0]) if len(occ) else 0
            s75 = np.bincount(hod, weights=d25, minlength=period).astype(np.int64)
            den = float(W * m)
            outs.append(
                pa.table(
                    {
                        "valid_time": pa.array(
                            T0 + (hs[ti] * 3_600_000_000).astype("timedelta64[us]"),
                            type=pa.timestamp("us"),
                        ),
                        "cell_row": pa.array(
                            np.full(len(ti), cell[s0] >> np.int64(20))
                        ),
                        "cell_col": pa.array(
                            np.full(len(ti), cell[s0] & np.int64((1 << 20) - 1))
                        ),
                        "trend": pa.array(t25.astype(np.float64) / float(W)),
                        "seasonal": pa.array(
                            s75[hod].astype(np.float64) / den
                        ),
                        "resid": pa.array(
                            (m * d25 - s75[hod]).astype(np.float64) / den
                        ),
                    }
                )
            )
        return pa.concat_tables(outs) if outs else empty

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(decompose, batch_format="pandas")
    )


def marching_squares_cases(
    ds: rd.Dataset,
    threshold: float,
    variable: str = "t2m",
    band_rows: int = 16,
    n_cols: int | None = None,
) -> rd.Dataset:
    """Marching-squares CONTOUR-TOPOLOGY classification of one raster
    slice (hour 0): every 2x2 corner block with all four values present
    gets its case index ``TL + 2*TR + 4*BR + 8*BL`` (corner bit =
    value >= threshold — an exact comparison of integer-valued
    doubles), the vectorized cell pass of isoline extraction.  Returns
    the per-case census (case_id, n_blocks, n_segments) over the
    non-trivial cases 1..14, with the two saddle cases (5, 10)
    contributing two contour segments each.

    Shape: row bands with a ONE-row bottom halo (a block belongs to its
    top-left row's band); per-band dense bit matrix + shifted adds, then
    a 14-key aggregate — the focal_stats banding with block semantics.
    """
    from geoglue_ray.stages.zonal import zonal_aggregate

    H = int(band_rows)
    if n_cols is None:
        from geoglue_ray.sources.raster import RXSIZE

        n_cols = RXSIZE
    C = int(n_cols)
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
            (-1, r % H == 0),  # a band's first row is the previous band's halo
        ):
            bb = band[sel] + off
            ok = bb >= 0
            parts.append(
                pa.table(
                    {
                        "_ms": pa.array(bb[ok]),
                        "r": pa.array(r[sel][ok]),
                        "c": pa.array(c[sel][ok]),
                        "value": pa.array(v[sel][ok]),
                        "_own": pa.array(np.full(int(ok.sum()), off == 0)),
                    }
                )
            )
        return pa.concat_tables(parts)

    def cases(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {"case_id": pa.array([], pa.int64()), "n": pa.array([], pa.float64())}
        )
        own = g["_own"].to_numpy().astype(bool)
        if len(g) == 0 or not own.any():
            return empty
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        band = int(r[own].min()) // H
        r0 = band * H
        R = H + 1
        grid = np.full((R, C), np.nan)
        inb = (r - r0 >= 0) & (r - r0 < R)
        grid[r[inb] - r0, c[inb]] = v[inb]
        fin = np.isfinite(grid)
        bit = grid >= threshold
        tl, tr = bit[:-1, :-1], bit[:-1, 1:]
        bl, br = bit[1:, :-1], bit[1:, 1:]
        case = (
            tl.astype(np.int64)
            + 2 * tr.astype(np.int64)
            + 4 * br.astype(np.int64)
            + 8 * bl.astype(np.int64)
        )
        okb = fin[:-1, :-1] & fin[:-1, 1:] & fin[1:, :-1] & fin[1:, 1:]
        okb &= (case != 0) & (case != 15)
        cnt = np.bincount(case[okb], minlength=16)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "case_id": pa.array(nz.astype(np.int64)),
                "n": pa.array(cnt[nz].astype(np.float64)),
            }
        )

    agg = zonal_aggregate(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_ms")
        .map_groups(cases, batch_format="pandas"),
        ["sum"],
        keys=["case_id"],
        value_col="n",
    )

    def final(b: pa.Table) -> pa.Table:
        cid = b["case_id"].to_numpy().astype(np.int64)
        n = b["sum"].to_numpy().astype(np.float64)
        segs = np.where((cid == 5) | (cid == 10), 2.0, 1.0)
        return pa.table(
            {
                "case_id": pa.array(cid),
                "n_blocks": pa.array(n),
                "n_segments": pa.array(n * segs),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow").sort("case_id")
