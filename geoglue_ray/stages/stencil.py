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
    """3x3 focal mean of ``value`` over the (hour, row, col) lattice for
    one variable.  Emits one row per lattice cell with at least one
    non-null value in its 3x3 neighborhood: ``valid_time, cell_row,
    cell_col, n_nb, focal_mean`` (count and single-division mean of the
    non-null neighbors, the cell itself included).
    """
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

    def stencil(g: pd.DataFrame) -> pa.Table:
        hour = g["hour"].to_numpy().astype(np.int64)
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy().astype(np.float64)
        own = g["_own"].to_numpy().astype(bool)
        if not own.any():
            return pa.table(
                {
                    "valid_time": pa.array([], pa.timestamp("us")),
                    "cell_row": pa.array([], pa.int64()),
                    "cell_col": pa.array([], pa.int64()),
                    "n_nb": pa.array([], pa.int64()),
                    "focal_mean": pa.array([], pa.float64()),
                }
            )
        t0, r0 = hour.min(), r.min()
        nt = int(hour.max() - t0 + 1)
        nr = int(r.max() - r0 + 1)
        nc = int(c.max()) + 1 if n_cols is None else int(n_cols)
        V = np.zeros((nt, nr + 2, nc + 2), dtype=np.float64)
        M = np.zeros((nt, nr + 2, nc + 2), dtype=np.int64)
        ti, ri, ci = hour - t0, r - r0 + 1, c + 1
        fin = np.isfinite(v)
        V[ti[fin], ri[fin], ci[fin]] = v[fin]
        M[ti[fin], ri[fin], ci[fin]] = 1
        S = np.zeros_like(V)
        C = np.zeros_like(M)
        for dr in (-1, 0, 1):  # nine shifted adds — exact integer doubles
            for dc in (-1, 0, 1):
                S[:, 1:-1, 1:-1] += V[
                    :, 1 + dr : nr + 1 + dr, 1 + dc : nc + 1 + dc
                ]
                C[:, 1:-1, 1:-1] += M[
                    :, 1 + dr : nr + 1 + dr, 1 + dc : nc + 1 + dc
                ]
        to, ro, co = ti[own], ri[own], ci[own]
        cnt = C[to, ro, co]
        nz = cnt > 0
        to, ro, co, cnt = to[nz], ro[nz], co[nz], cnt[nz]
        mean = S[to, ro, co] / cnt
        return pa.table(
            {
                "valid_time": pa.array(
                    T0 + ((to + t0) * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(ro - 1 + r0),
                "cell_col": pa.array(co - 1),
                "n_nb": pa.array(cnt),
                "focal_mean": pa.array(mean),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_fb")
        .map_groups(stencil, batch_format="pandas")
    )
