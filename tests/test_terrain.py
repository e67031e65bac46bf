"""Terrain derivatives: brute-force equivalence on adversarial small
lattices (the oracle gate covers the fixture-scale SQL twins; these pin
hole handling, octant boundaries and sight-line ties)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geoglue_ray import fixtures as fx
from geoglue_ray.stages.terrain import aspect_octant, los_visibility, ruggedness

DIRS8 = ((0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1))


def _lattice(nt, nr, nc, hole_frac, seed, lo=0, hi=12):
    rng = np.random.default_rng(seed)
    t, r, c = np.meshgrid(np.arange(nt), np.arange(nr), np.arange(nc), indexing="ij")
    t, r, c = t.ravel(), r.ravel(), c.ravel()
    # small value range on purpose: forces octant/slope ties
    v = rng.integers(lo, hi, size=len(t)).astype(np.float64)
    v[rng.random(len(t)) < hole_frac] = np.nan
    return t, r, c, v


def _dataset(t, r, c, v):
    import ray.data as rd

    T0 = np.datetime64(fx.T0, "us")
    return rd.from_arrow(
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
    ).repartition(3)


def _grid(t, r, c, v, nt, nr, nc):
    g = np.full((nt, nr, nc), np.nan)
    g[t, r, c] = v
    return g


def test_ruggedness_matches_brute_force(ray_session):
    nt, nr, nc = 2, 9, 6
    t, r, c, v = _lattice(nt, nr, nc, 0.2, seed=3)
    got = (
        ruggedness(_dataset(t, r, c, v), band_rows=3, hour_chunk=1)
        .to_pandas()
        .sort_values(["valid_time", "cell_row", "cell_col"])
        .reset_index(drop=True)
    )
    grid = _grid(t, r, c, v, nt, nr, nc)
    rows = []
    for ti in range(nt):
        for ri in range(nr):
            for ci in range(nc):
                if not np.isfinite(grid[ti, ri, ci]):
                    continue
                diffs = [
                    abs(grid[ti, ri + dr, ci + dc] - grid[ti, ri, ci])
                    for dr, dc in DIRS8
                    if 0 <= ri + dr < nr
                    and 0 <= ci + dc < nc
                    and np.isfinite(grid[ti, ri + dr, ci + dc])
                ]
                if diffs:
                    rows.append((ti, ri, ci, sum(diffs), len(diffs)))
    want = pd.DataFrame(rows, columns=["t", "r", "c", "tri_sum", "n_nb"])
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["tri_sum"].to_numpy(), want["tri_sum"])
    np.testing.assert_array_equal(got["n_nb"].to_numpy(), want["n_nb"])
    np.testing.assert_array_equal(
        got["tri"].to_numpy(),
        want["tri_sum"].to_numpy() / want["n_nb"].to_numpy(),
    )


def test_aspect_octant_boundaries(ray_session):
    """Every sign/diagonal boundary case lands in its documented sector:
    sector k covers [45k, 45k+45)."""
    import math

    import ray.data as rd  # noqa: F401

    nt, nr, nc = 3, 8, 8
    t, r, c, v = _lattice(nt, nr, nc, 0.1, seed=11, lo=0, hi=6)
    got = (
        aspect_octant(_dataset(t, r, c, v), band_rows=4, hour_chunk=2)
        .to_pandas()
        .set_index(["valid_time", "cell_row", "cell_col"])["aspect_oct"]
    )
    grid = _grid(t, r, c, v, nt, nr, nc)
    T0 = np.datetime64(fx.T0, "us")
    n_checked = 0
    for ti in range(nt):
        for ri in range(1, nr - 1):
            for ci in range(1, nc - 1):
                vals = [
                    grid[ti, ri, ci],
                    grid[ti, ri, ci + 1],
                    grid[ti, ri, ci - 1],
                    grid[ti, ri - 1, ci],
                    grid[ti, ri + 1, ci],
                ]
                key = (
                    T0 + np.timedelta64(ti * 3600_000_000, "us"),
                    ri,
                    ci,
                )
                if not all(np.isfinite(x) for x in vals):
                    assert key not in got.index
                    continue
                gx = vals[1] - vals[2]
                gy = vals[3] - vals[4]
                if gx == 0 and gy == 0:
                    want = -1
                else:
                    ang = math.degrees(math.atan2(gy, gx)) % 360.0
                    want = int(ang // 45.0)
                assert got[key] == want, (key, gx, gy, got[key], want)
                n_checked += 1
    assert n_checked > 40


def _brute_los(grid, nt, nr, nc):
    rows = []
    for ti in range(nt):
        for ri in range(nr):
            cs = [ci for ci in range(nc) if np.isfinite(grid[ti, ri, ci])]
            if not cs:
                continue
            obs = cs[0]
            vo = grid[ti, ri, obs]
            for ci in cs:
                vis = True
                for mid in cs:
                    if obs < mid < ci and (grid[ti, ri, ci] - vo) * (
                        mid - obs
                    ) <= (grid[ti, ri, mid] - vo) * (ci - obs):
                        vis = False
                        break
                rows.append((ti, ri, ci, obs, vis))
    return pd.DataFrame(rows, columns=["t", "r", "c", "obs_col", "visible"])


def test_los_visibility_matches_brute_force(ray_session):
    # hi=4 forces many exact slope ties (equal-slope cells must NOT be
    # visible: strict comparison)
    nt, nr, nc = 2, 7, 12
    t, r, c, v = _lattice(nt, nr, nc, 0.25, seed=5, lo=0, hi=4)
    got = (
        los_visibility(_dataset(t, r, c, v), band_rows=2, hour_chunk=1)
        .to_pandas()
        .sort_values(["valid_time", "cell_row", "cell_col"])
        .reset_index(drop=True)
    )
    want = _brute_los(_grid(t, r, c, v, nt, nr, nc), nt, nr, nc)
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["cell_row"].to_numpy(), want["r"].to_numpy())
    np.testing.assert_array_equal(got["cell_col"].to_numpy(), want["c"].to_numpy())
    np.testing.assert_array_equal(got["obs_col"].to_numpy(), want["obs_col"].to_numpy())
    np.testing.assert_array_equal(got["visible"].to_numpy(), want["visible"].to_numpy())
    # monotone ridge: strictly rising terrain is fully visible
    t2 = np.zeros(6, np.int64)
    r2 = np.zeros(6, np.int64)
    c2 = np.arange(6, dtype=np.int64)
    v2 = np.array([5.0, 1, 2, 4, 8, 16])
    out = los_visibility(_dataset(t2, r2, c2, v2), band_rows=1, hour_chunk=1).to_pandas()
    out = out.sort_values("cell_col")
    # col1 first after obs => visible; col2 slope (2-5)/2 > (1-5)/1 => visible;
    # col3.. increasingly steep => visible
    assert out["visible"].tolist() == [True, True, True, True, True, True]


def test_gap_fill_rows_brute(ray_session):
    from geoglue_ray.stages.terrain import gap_fill_rows

    nt, nr, nc = 2, 5, 14
    t, r, c, v = _lattice(nt, nr, nc, 0.35, seed=17, lo=0, hi=30)
    got = (
        gap_fill_rows(_dataset(t, r, c, v), band_rows=2, hour_chunk=1)
        .to_pandas()
        .sort_values(["valid_time", "cell_row", "cell_col"])
        .reset_index(drop=True)
    )
    grid = _grid(t, r, c, v, nt, nr, nc)
    rows = []
    for ti in range(nt):
        for ri in range(nr):
            for ci in range(nc):
                if np.isfinite(grid[ti, ri, ci]):
                    continue
                ws = [x for x in range(ci) if np.isfinite(grid[ti, ri, x])]
                es = [x for x in range(ci + 1, nc) if np.isfinite(grid[ti, ri, x])]
                if not ws or not es:
                    continue
                cw, ce = ws[-1], es[0]
                vw, ve = grid[ti, ri, cw], grid[ti, ri, ce]
                rows.append((ti, ri, ci, vw + (ve - vw) * (ci - cw) / (ce - cw)))
    assert len(got) == len(rows)
    want = pd.DataFrame(rows, columns=["t", "r", "c", "filled"])
    np.testing.assert_array_equal(got["cell_row"].to_numpy(), want["r"])
    np.testing.assert_array_equal(got["cell_col"].to_numpy(), want["c"])
    np.testing.assert_array_equal(got["filled"].to_numpy(), want["filled"])


def test_ewma_chain(ray_session):
    from geoglue_ray.stages.terrain import ewma_cells

    nt, nr, nc = 7, 3, 3
    t, r, c, v = _lattice(nt, nr, nc, 0.0, seed=29, lo=0, hi=997)
    got = (
        ewma_cells(_dataset(t, r, c, v), n_shards=3)
        .to_pandas()
        .sort_values(["cell_row", "cell_col", "valid_time"])
        .reset_index(drop=True)
    )
    grid = _grid(t, r, c, v, nt, nr, nc)
    want = []
    for ri in range(nr):
        for ci in range(nc):
            e = grid[0, ri, ci]
            want.append(e)
            for ti in range(1, nt):
                e = (grid[ti, ri, ci] + e) / 2.0
                want.append(e)
    np.testing.assert_array_equal(got["ewma"].to_numpy(), np.array(want))


def _pava(x):
    """Classic pool-adjacent-violators (weighted means as sum/count)."""
    blocks = [(xi, 1.0) for xi in x]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) >= 2 and out[-2][0] / out[-2][1] >= out[-1][0] / out[-1][1]:
            s2, w2 = out.pop()
            s1, w1 = out.pop()
            out.append((s1 + s2, w1 + w2))
    fit = []
    for s, w in out:
        fit.extend([s / w] * int(w))
    return np.array(fit)


def test_isotonic_matches_pava(ray_session):
    from geoglue_ray.stages.terrain import isotonic_cells

    nt, nr, nc = 9, 2, 3
    t, r, c, v = _lattice(nt, nr, nc, 0.0, seed=37, lo=0, hi=10)
    got = (
        isotonic_cells(_dataset(t, r, c, v), n_shards=2)
        .to_pandas()
        .sort_values(["cell_row", "cell_col", "valid_time"])
        .reset_index(drop=True)
    )
    grid = _grid(t, r, c, v, nt, nr, nc)
    for ri in range(nr):
        for ci in range(nc):
            series = grid[:, ri, ci]
            fit = _pava(series)
            g = got[(got.cell_row == ri) & (got.cell_col == ci)]["fitted"].to_numpy()
            # max-min formula == PAVA (up to float rounding of the
            # two formulations; the fixture keeps sums exact so the
            # single-division means agree exactly)
            np.testing.assert_allclose(g, fit, rtol=0, atol=1e-12)
            assert (np.diff(g) >= -1e-12).all()


def test_cost_distance_matches_brute_force(ray_session):
    from geoglue_ray.stages.terrain import cost_distance

    nt, nr, nc = 1, 16, 7
    t, r, c, v = _lattice(nt, nr, nc, 0.25, seed=11, lo=0, hi=13)
    K, MOD = 2, 12
    got = (
        cost_distance(
            _dataset(t, r, c, v),
            rounds=K,
            band_rows=4,
            src_mod=MOD,
            n_cols=nc,
        )
        .to_pandas()
        .sort_values(["cell_row", "cell_col"])
        .reset_index(drop=True)
    )
    cost = _grid(t, r, c, v, nt, nr, nc)[0]
    src = np.zeros((nr, nc), dtype=bool)
    fin = np.isfinite(cost)
    src[fin] = np.mod(cost[fin], MOD) == 0
    dist = np.where(src, 0.0, np.nan)
    for _ in range(K):
        prev = dist.copy()
        for rr in range(nr):
            for cc in range(nc):
                if not np.isfinite(cost[rr, cc]):
                    continue
                best = np.nan
                for dr, dc in DIRS8:
                    r2, c2 = rr + dr, cc + dc
                    if 0 <= r2 < nr and 0 <= c2 < nc:
                        best = np.fmin(best, prev[r2, c2])
                dist[rr, cc] = np.fmin(prev[rr, cc], best + cost[rr, cc])
    want_r, want_c = np.nonzero(np.isfinite(dist))
    assert got["cell_row"].to_numpy().tolist() == want_r.tolist()
    assert got["cell_col"].to_numpy().tolist() == want_c.tolist()
    assert np.array_equal(got["cost_dist"].to_numpy(), dist[want_r, want_c])
    # the horizon actually matters: some non-hole cells are unreached
    assert len(got) < int(fin.sum())
    assert len(got) > int(src.sum())  # and propagation actually happened
