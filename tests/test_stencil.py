"""Focal-mean stencil: brute-force equivalence and halo correctness."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geoglue_ray import fixtures as fx
from geoglue_ray.stages.stencil import focal_mean


def _lattice(nt: int, nr: int, nc: int, hole_frac: float, seed: int):
    rng = np.random.default_rng(seed)
    t, r, c = np.meshgrid(
        np.arange(nt), np.arange(nr), np.arange(nc), indexing="ij"
    )
    t, r, c = t.ravel(), r.ravel(), c.ravel()
    v = rng.integers(0, 100, size=len(t)).astype(np.float64)
    v[rng.random(len(t)) < hole_frac] = np.nan
    return t, r, c, v


def _brute(t, r, c, v, nt, nr, nc):
    grid = np.full((nt, nr, nc), np.nan)
    grid[t, r, c] = v
    rows = []
    for ti in range(nt):
        for ri in range(nr):
            for ci in range(nc):
                nb = grid[
                    ti,
                    max(ri - 1, 0) : ri + 2,
                    max(ci - 1, 0) : ci + 2,
                ].ravel()
                nb = nb[np.isfinite(nb)]
                if len(nb):
                    rows.append((ti, ri, ci, len(nb), nb.sum() / len(nb)))
    return pd.DataFrame(
        rows, columns=["t", "cell_row", "cell_col", "n_nb", "focal_mean"]
    )


def test_focal_mean_matches_brute_force(ray_session):
    import ray.data as rd

    nt, nr, nc = 3, 11, 7  # band_rows=4 -> 3 bands, real halo traffic
    t, r, c, v = _lattice(nt, nr, nc, hole_frac=0.3, seed=5)
    T0 = np.datetime64(fx.T0, "us")
    ds = rd.from_arrow(
        pa.table(
            {
                "valid_time": pa.array(
                    T0 + (t * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(r.astype(np.int32)),
                "cell_col": pa.array(c.astype(np.int32)),
                "variable": pa.array(np.repeat("t2m", len(t))),
                "value": pa.array(v),
            }
        )
    ).repartition(4)
    out = focal_mean(ds, variable="t2m", band_rows=4, hour_chunk=2).to_pandas()
    out["t"] = (
        (out["valid_time"].to_numpy() - T0)
        .astype("timedelta64[h]")
        .astype(np.int64)
    )
    out = (
        out[["t", "cell_row", "cell_col", "n_nb", "focal_mean"]]
        .sort_values(["t", "cell_row", "cell_col"])
        .reset_index(drop=True)
    )
    exp = _brute(t, r, c, v, nt, nr, nc)
    assert out.shape == exp.shape
    assert np.array_equal(out["n_nb"].to_numpy(), exp["n_nb"].to_numpy())
    # integer-valued doubles: the 9-term sum and single division are exact
    assert np.array_equal(
        out["focal_mean"].to_numpy(), exp["focal_mean"].to_numpy()
    )


def test_focal_mean_band_partitioning_invariance(ray_session):
    """Identical results for different band/chunk splits (halo exchange
    is exact at every boundary placement)."""
    import ray.data as rd

    nt, nr, nc = 2, 9, 5
    t, r, c, v = _lattice(nt, nr, nc, hole_frac=0.2, seed=11)
    T0 = np.datetime64(fx.T0, "us")
    tbl = pa.table(
        {
            "valid_time": pa.array(
                T0 + (t * 3_600_000_000).astype("timedelta64[us]"),
                type=pa.timestamp("us"),
            ),
            "cell_row": pa.array(r.astype(np.int32)),
            "cell_col": pa.array(c.astype(np.int32)),
            "variable": pa.array(np.repeat("t2m", len(t))),
            "value": pa.array(v),
        }
    )
    outs = []
    for band_rows, hour_chunk in ((1, 1), (3, 2), (100, 24)):
        ds = rd.from_arrow(tbl).repartition(3)
        outs.append(
            focal_mean(ds, band_rows=band_rows, hour_chunk=hour_chunk)
            .to_pandas()
            .sort_values(["valid_time", "cell_row", "cell_col"])
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])
    assert outs[0].equals(outs[2])


def _class_lattice(classes: np.ndarray):
    """Build a raster dataset from a [nr, nc] int class grid (class -1 =
    NULL cell); values = class * 16 so class_div=16 recovers the grid."""
    import ray.data as rd

    nr, nc = classes.shape
    r, c = np.meshgrid(np.arange(nr), np.arange(nc), indexing="ij")
    r, c = r.ravel(), c.ravel()
    cls = classes.ravel().astype(np.float64)
    v = np.where(cls < 0, np.nan, cls * 16.0)
    T0 = np.datetime64(fx.T0, "us")
    return rd.from_arrow(
        pa.table(
            {
                "valid_time": pa.array(
                    np.full(len(r), T0), type=pa.timestamp("us")
                ),
                "cell_row": pa.array(r.astype(np.int32)),
                "cell_col": pa.array(c.astype(np.int32)),
                "variable": pa.array(np.repeat("t2m", len(r))),
                "value": pa.array(v),
            }
        )
    ).repartition(3)


def test_clump_regions_hand_case(ray_session):
    """Two L-shaped regions of the same class separated by a NULL/other
    diagonal, plus an isolated singleton."""
    from geoglue_ray.stages.stencil import clump_regions

    grid = np.array(
        [
            [1, 1, -1, 2],
            [1, -1, 2, 2],
            [-1, 3, -1, 2],
        ]
    )
    nc = grid.shape[1]
    out = (
        clump_regions(
            _class_lattice(grid), class_div=16, band_rows=2, n_rows=3, n_cols=nc
        )
        .to_pandas()
        .sort_values("region_id")
        .reset_index(drop=True)
    )
    # ids: r*4+c -> region {0,1,4} label 0 cls1; {3,6,7,11} label 3 cls2;
    # {9} singleton cls3
    assert out.to_dict("list") == {
        "region_id": [0, 3, 9],
        "cls": [1, 2, 3],
        "n_cells": [3, 4, 1],
    }


def test_clump_regions_band_invariance(ray_session):
    from geoglue_ray.stages.stencil import clump_regions

    rng = np.random.default_rng(9)
    grid = rng.integers(-1, 3, size=(16, 6))
    outs = []
    for H in (1, 4, 100):
        outs.append(
            clump_regions(
                _class_lattice(grid),
                class_div=16,
                band_rows=H,
                n_rows=16,
                n_cols=6,
            )
            .to_pandas()
            .sort_values("region_id")
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])
    assert outs[0].equals(outs[2])


def test_focal_gradient_matches_brute_force(ray_session):
    import ray.data as rd

    from geoglue_ray.stages.stencil import focal_gradient

    nt, nr, nc = 2, 11, 7
    t, r, c, v = _lattice(nt, nr, nc, hole_frac=0.25, seed=11)
    T0 = np.datetime64(fx.T0, "us")
    ds = rd.from_arrow(
        pa.table(
            {
                "valid_time": pa.array(
                    T0 + (t * 3_600_000_000).astype("timedelta64[us]"),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(r.astype(np.int32)),
                "cell_col": pa.array(c.astype(np.int32)),
                "variable": pa.array(np.repeat("t2m", len(t))),
                "value": pa.array(v),
            }
        )
    )
    out = (
        focal_gradient(ds, band_rows=4, n_cols=nc)
        .to_pandas()
        .sort_values(["cell_row", "cell_col", "valid_time"])
        .reset_index(drop=True)
    )
    grid = np.full((nt, nr, nc), np.nan)
    grid[t, r, c] = v
    rows = []
    for ti in range(nt):
        for ri in range(1, nr - 1):
            for ci in range(1, nc - 1):
                win = grid[ti, ri - 1 : ri + 2, ci - 1 : ci + 2]
                if not (
                    np.isfinite(win[1, 1]) and np.isfinite(win[1, 0])
                    and np.isfinite(win[1, 2]) and np.isfinite(win[0, 1])
                    and np.isfinite(win[2, 1])
                ):
                    continue
                gx = (win[1, 2] - win[1, 0]) * 2.0
                gy = (win[0, 1] - win[2, 1]) * 2.0
                rows.append((ti, ri, ci, gx, gy, gx * gx + gy * gy))
    exp = pd.DataFrame(
        rows, columns=["t", "cell_row", "cell_col", "grad_x", "grad_y", "grad2"]
    ).sort_values(["cell_row", "cell_col", "t"]).reset_index(drop=True)
    assert len(out) == len(exp)
    assert np.array_equal(out["grad_x"].to_numpy(), exp["grad_x"].to_numpy())
    assert np.array_equal(out["grad_y"].to_numpy(), exp["grad_y"].to_numpy())
    assert np.array_equal(out["grad2"].to_numpy(), exp["grad2"].to_numpy())
    # boundary rows/cols never emit
    assert out["cell_row"].min() >= 1 and out["cell_row"].max() <= nr - 2
    assert out["cell_col"].min() >= 1 and out["cell_col"].max() <= nc - 2


def test_join_counts_band_invariance_and_totals(ray_session):
    import ray.data as rd

    from geoglue_ray.stages.stencil import join_counts

    nt, nr, nc = 2, 13, 5
    t, r, c, v = _lattice(nt, nr, nc, hole_frac=0.2, seed=3)
    T0 = np.datetime64(fx.T0, "us")
    tbl = pa.table(
        {
            "valid_time": pa.array(
                T0 + (t * 3_600_000_000).astype("timedelta64[us]"),
                type=pa.timestamp("us"),
            ),
            "cell_row": pa.array(r.astype(np.int32)),
            "cell_col": pa.array(c.astype(np.int32)),
            "variable": pa.array(np.repeat("t2m", len(t))),
            "value": pa.array(v),
        }
    )
    outs = []
    for H in (1, 4, 100):
        outs.append(
            join_counts(rd.from_arrow(tbl), threshold=50, band_rows=H)
            .to_pandas()
            .sort_values("valid_time")
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1]) and outs[0].equals(outs[2])
    # brute force: every rook edge with both endpoints finite, once
    grid = np.full((nt, nr, nc), np.nan)
    grid[t, r, c] = v
    B = grid >= 50
    F = np.isfinite(grid)
    for ti in range(nt):
        s, n = [], 0
        for arr, msk in (
            ((B[ti, :, :-1].astype(int) + B[ti, :, 1:]), F[ti, :, :-1] & F[ti, :, 1:]),
            ((B[ti, :-1, :].astype(int) + B[ti, 1:, :]), F[ti, :-1, :] & F[ti, 1:, :]),
        ):
            s.append(arr[msk])
        s = np.concatenate(s)
        row = outs[0].iloc[ti]
        assert row["n_edges"] == len(s)
        assert row["bb"] == int((s == 2).sum())
        assert row["ww"] == int((s == 0).sum())
        assert row["bw"] == int((s == 1).sum())


def test_cusum_drawup_matches_bruteforce(ray_session):
    """Ragged per-cell series (random NaN holes): the dense-padded
    minimum.accumulate path must equal a plain per-cell Python replay of
    the recurrence, at two shard counts."""
    import ray.data as rd

    from geoglue_ray.stages.stencil import cusum_drawup

    rng = np.random.default_rng(23)
    nr, nc, nt = 6, 5, 20
    rows = []
    for r in range(nr):
        for c in range(nc):
            for t in range(nt):
                if rng.random() < 0.15:
                    continue  # ragged holes
                rows.append((t, r, c, float(rng.integers(0, 500))))
    t_arr = np.array([x[0] for x in rows], dtype=np.int64)
    tbl = pa.table(
        {
            "valid_time": pa.array(
                (np.datetime64(fx.T0, "us") + t_arr * np.timedelta64(1, "h"))
            ),
            "cell_row": pa.array(np.array([x[1] for x in rows], np.int32)),
            "cell_col": pa.array(np.array([x[2] for x in rows], np.int32)),
            "variable": pa.array(["t2m"] * len(rows)),
            "value": pa.array(np.array([x[3] for x in rows])),
        }
    )

    expect = {}
    for r in range(nr):
        for c in range(nc):
            xs = [
                (t, v)
                for (t, rr, cc, v) in rows
                if rr == r and cc == c
            ]
            n = len(xs)
            if n == 0:
                continue
            tot = int(sum(v for _, v in xs))
            s, best, best_t, runmin = 0, None, None, 0
            for k, (t, v) in enumerate(xs, start=1):
                s += int(v)
                dk = n * s - k * tot
                drk = dk - runmin
                if best is None or drk > best:
                    best, best_t = drk, t
                runmin = min(runmin, dk)
            expect[(r, c)] = (n, best, best_t)

    for shards in (1, 7):
        got = (
            cusum_drawup(rd.from_arrow(tbl).repartition(3), n_shards=shards)
            .to_pandas()
            .sort_values(["cell_row", "cell_col"])
            .reset_index(drop=True)
        )
        assert len(got) == len(expect)
        for _, row in got.iterrows():
            n, dr, th = expect[(row["cell_row"], row["cell_col"])]
            assert (row["n_obs"], row["drawup"], row["t_at_max"]) == (n, dr, th)


def test_marching_squares_matches_brute_force(ray_session):
    from geoglue_ray.stages.stencil import marching_squares_cases
    from tests.test_terrain import _dataset, _grid, _lattice

    nt, nr, nc = 1, 20, 9
    t, r, c, v = _lattice(nt, nr, nc, 0.15, seed=23, lo=0, hi=10)
    T = 5.0
    got = (
        marching_squares_cases(
            _dataset(t, r, c, v), threshold=T, band_rows=4, n_cols=nc
        )
        .to_pandas()
        .set_index("case_id")
    )
    g = _grid(t, r, c, v, nt, nr, nc)[0]
    from collections import Counter

    want = Counter()
    for rr in range(nr - 1):
        for cc in range(nc - 1):
            blk = g[rr : rr + 2, cc : cc + 2]
            if not np.isfinite(blk).all():
                continue
            case = (
                int(blk[0, 0] >= T)
                + 2 * int(blk[0, 1] >= T)
                + 4 * int(blk[1, 1] >= T)
                + 8 * int(blk[1, 0] >= T)
            )
            if case not in (0, 15):
                want[case] += 1
    assert sorted(got.index.tolist()) == sorted(want)
    for cid, n in want.items():
        assert got.loc[cid, "n_blocks"] == float(n)
        segs = 2.0 if cid in (5, 10) else 1.0
        assert got.loc[cid, "n_segments"] == float(n) * segs
    # the random lattice actually exercises a saddle
    assert 5 in want or 10 in want
