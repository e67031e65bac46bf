"""Brute-force unit tests for the round-4-continuation statistics stages
(skyline, D8 flow direction, Theil-Sen, Spearman, Mantel, dispersion,
cross-K).  The oracle gate (test_oracle_gate) verifies the full queries
against DuckDB; these pin the STAGE semantics directly against tiny
brute-force replays, including edge cases the fixtures never hit."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_skyline_matches_bruteforce_with_ties():
    from geoglue_ray.stages.sample import skyline_2d

    rng = np.random.default_rng(11)
    n = 400
    # coarse grids force duplicated points and axis ties
    x = rng.integers(0, 12, n).astype(np.float64)
    y = rng.integers(0, 12, n).astype(np.float64)
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"id": ids, "x": x, "y": y})
    got = (
        skyline_2d(rd.from_pandas(df).repartition(5), max_col="x", min_col="y")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    keep = []
    for i in range(n):
        dom = (
            (y <= y[i]) & (x >= x[i]) & ((y < y[i]) | (x > x[i]))
        ).any()
        if not dom:
            keep.append(i)
    assert got["id"].tolist() == keep
    # duplicated frontier points are ALL kept
    fx_, fy_ = x[keep], y[keep]
    for i in range(len(keep)):
        same = (fx_ == fx_[i]) & (fy_ == fy_[i])
        assert same.sum() >= 1


def _raster_table(vals: np.ndarray, t0: str = "2020-01-06T00:00:00"):
    """(nt, nr, nc) -> the read_raster row schema (NaN = hole)."""
    nt, nr, nc = vals.shape
    tt, rr, cc = np.meshgrid(
        np.arange(nt), np.arange(nr), np.arange(nc), indexing="ij"
    )
    base = np.datetime64(t0, "us")
    return pa.table(
        {
            "valid_time": pa.array(
                base + (tt.ravel() * 3_600_000_000).astype("timedelta64[us]"),
                type=pa.timestamp("us"),
            ),
            "cell_row": pa.array(rr.ravel().astype(np.int64)),
            "cell_col": pa.array(cc.ravel().astype(np.int64)),
            "variable": pa.array(np.full(tt.size, "t2m").astype(object)),
            "value": pa.array(vals.ravel()),
        }
    )


def test_flow_direction_pits_ties_and_holes():
    from geoglue_ray.stages.stencil import flow_direction

    vals = np.array(
        [[
            [5.0, 4.0, 5.0],
            [4.0, 9.0, np.nan],
            [5.0, 4.0, 3.0],
        ]]
    )
    got = (
        flow_direction(rd.from_arrow(_raster_table(vals)), band_rows=2)
        .to_pandas()
        .set_index(["cell_row", "cell_col"])
    )
    # center (1,1): neighbors all lower except the hole; steepest drop is
    # 9-3=6 to SE (dir 1)
    assert got.loc[(1, 1), "flow_dir"] == 1
    assert got.loc[(1, 1), "best_drop"] == 6.0
    # (0,1)=4: drops to E/W are -1 (uphill), N/S out-of-grid or 9 — best
    # drop <= 0 -> pit
    assert got.loc[(0, 1), "flow_dir"] == -1
    # tie-break: (2,0)=5 has equal drops 1.0 to N=(1,0)->4 and E=(2,1)->4;
    # dirs are E(0) before N(6): picks 0
    assert got.loc[(2, 0), "flow_dir"] == 0
    # the hole cell emits nothing
    assert (1, 2) not in got.index


def test_theil_sen_matches_direct():
    from geoglue_ray.stages.stencil import theil_sen

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50, (10, 2, 2)).astype(np.float64)
    got = (
        theil_sen(rd.from_arrow(_raster_table(vals)), n_shards=4)
        .to_pandas()
        .set_index(["cell_row", "cell_col"])
    )
    h = np.arange(10)
    for r in range(2):
        for c in range(2):
            xs = vals[:, r, c]
            iu, ju = np.triu_indices(10, k=1)
            sl = (xs[ju] - xs[iu]) / (h[ju] - h[iu]).astype(np.float64)
            m = float(np.median(sl))
            b = float(np.median(xs - m * h.astype(np.float64)))
            assert got.loc[(r, c), "sen_slope"] == m
            assert got.loc[(r, c), "sen_intercept"] == b


def test_spearman_matches_direct_with_ties():
    from geoglue_ray.stages.stencil import spearman_slices

    rng = np.random.default_rng(9)
    nt, nr, nc = 3, 4, 5
    x = rng.integers(0, 6, (nt, nr, nc)).astype(np.float64)
    y = rng.integers(0, 6, (nt, nr, nc)).astype(np.float64)
    tx = _raster_table(x).to_pandas()
    ty = _raster_table(y).to_pandas()
    ty["variable"] = "tp"
    ds = rd.from_pandas(pd.concat([tx, ty], ignore_index=True))
    got = spearman_slices(ds, n_shards=2).to_pandas().sort_values("valid_time")

    def rank2(v):
        order = np.argsort(v, kind="stable")
        r2 = np.empty(len(v), dtype=np.int64)
        sv = v[order]
        starts = np.flatnonzero(np.r_[True, sv[1:] != sv[:-1]])
        lens = np.diff(np.r_[starts, len(v)])
        for s, ln in zip(starts, lens):
            r2[order[s : s + ln]] = 2 * s + ln + 1
        return r2

    for t in range(nt):
        rx = rank2(x[t].ravel()).astype(np.float64)
        ry = rank2(y[t].ravel()).astype(np.float64)
        n = len(rx)
        num = n * (rx * ry).sum() - rx.sum() * ry.sum()
        den = np.sqrt(n * (rx * rx).sum() - rx.sum() ** 2) * np.sqrt(
            n * (ry * ry).sum() - ry.sum() ** 2
        )
        assert abs(got["rho"].iloc[t] - num / den) < 1e-12
        assert got["n_cells"].iloc[t] == n


def test_mantel_matches_bruteforce():
    from geoglue_ray.stages.spatial import mantel_counts

    rng = np.random.default_rng(5)
    n = 300
    ids = np.arange(1, n + 1, dtype=np.int64)
    lon = np.round(rng.uniform(0, 0.5, n) * 1024) / 1024
    lat = np.round(rng.uniform(0, 0.5, n) * 1024) / 1024
    t0 = np.datetime64("2020-01-06T00:00:00", "us").astype(np.int64)
    ts = t0 + rng.integers(0, 30 * 86400, n) * 1_000_000
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": ids,
                "lon": lon,
                "lat": lat,
                "ts_us": pa.array(ts.astype(np.int64)),
            }
        )
    ).repartition(4)
    eps = 0.0625
    got = mantel_counts(ds, eps=eps, n_shards=8).to_pandas().iloc[0]
    tsec = (ts - t0) // 1_000_000
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    dt = np.abs(tsec[:, None] - tsec[None, :])
    iu = np.triu_indices(n, k=1)
    close = d2[iu] <= eps * eps
    assert int(got["pairs_space"]) == int(close.sum())
    assert int(got["sum_dt_close"]) == int(dt[iu][close].sum())
    assert int(got["sum_dt_all"]) == int(dt[iu].sum())


def test_dispersion_single_and_pair():
    from geoglue_ray.stages.sketch import dispersion_stats

    tbl = pa.table(
        {
            "k": pa.array([1, 2, 2], pa.int64()),
            "ix": pa.array([1 << 20, 0, 1 << 21], pa.int64()),
            "iy": pa.array([1 << 20, 0, 0], pa.int64()),
        }
    )
    got = (
        dispersion_stats(rd.from_arrow(tbl), "k", "ix", "iy", n_shards=2)
        .to_pandas()
        .set_index("k")
    )
    # single point: zero dispersion, mean center = the point
    assert got.loc[1, "rog"] == 0.0
    assert got.loc[1, "mean_lon"] == 103.0 and got.loc[1, "mean_lat"] == 9.0
    # two points 2 deg apart on the lon axis: var_x = 1, var_y = 0, rog = 1
    assert got.loc[2, "var_x"] == 1.0 and got.loc[2, "var_y"] == 0.0
    assert got.loc[2, "cov_xy"] == 0.0 and got.loc[2, "rog"] == 1.0


def test_cross_k_matches_bruteforce():
    from geoglue_ray.stages.spatial import cross_k

    rng = np.random.default_rng(7)
    n = 400
    lon = np.round(rng.uniform(0, 1, n) * 4096) / 4096
    lat = np.round(rng.uniform(0, 1, n) * 4096) / 4096
    typ = np.where(rng.random(n) < 0.4, "a", "b").astype(object)
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "event_type": pa.array(typ),
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )
    ).repartition(4)
    radii = (1 / 64, 2 / 64, 4 / 64)
    got = cross_k(
        ds, "event_type", "a", "b", radii=radii, area=1.0, n_shards=8
    ).to_pandas()
    a = typ == "a"
    d2 = (lon[a][:, None] - lon[~a][None, :]) ** 2 + (
        lat[a][:, None] - lat[~a][None, :]
    ) ** 2
    for k, r in enumerate(radii):
        assert int(got["n_pairs"].iloc[k]) == int((d2 <= r * r).sum())
