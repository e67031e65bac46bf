"""Convex hull / trajectory simplification: brute-force equivalence on
adversarial point sets (duplicates, collinear runs, ties) — the oracle
gate covers the fixture-scale SQL twins."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geoglue_ray.stages.geometry import (
    _chain,
    convex_hull,
    simplify_trajectories,
)


def _brute_hull_vertices(x, y):
    """Strict hull vertices by edge witness (O(n^3)): p is a vertex iff
    it sources a CCW edge with all other distinct points strictly left
    or collinear-strictly-between."""
    pts = np.unique(np.stack([x, y], axis=1), axis=0)
    n = len(pts)
    if n <= 2:
        return {tuple(p) for p in pts}
    out = set()
    for a in range(n):
        for b in range(n):
            if a == b:
                continue
            ok = True
            for c in range(n):
                if c in (a, b):
                    continue
                cr = (pts[b, 0] - pts[a, 0]) * (pts[c, 1] - pts[a, 1]) - (
                    pts[b, 1] - pts[a, 1]
                ) * (pts[c, 0] - pts[a, 0])
                if cr > 0:
                    continue
                between = (
                    cr == 0
                    and (pts[c, 0] - pts[a, 0]) * (pts[b, 0] - pts[a, 0])
                    + (pts[c, 1] - pts[a, 1]) * (pts[b, 1] - pts[a, 1])
                    > 0
                    and (pts[c, 0] - pts[b, 0]) * (pts[a, 0] - pts[b, 0])
                    + (pts[c, 1] - pts[b, 1]) * (pts[a, 1] - pts[b, 1])
                    > 0
                )
                if not between:
                    ok = False
                    break
            if ok:
                out.add(tuple(pts[a]))
    return out


def test_chain_adversarial():
    rng = np.random.default_rng(42)
    for trial in range(30):
        n = int(rng.integers(1, 40))
        # small integer lattice => many duplicates and collinear runs
        x = rng.integers(0, 6, n).astype(np.float64)
        y = rng.integers(0, 6, n).astype(np.float64)
        got = {tuple(p) for p in _chain(x, y)}
        want = _brute_hull_vertices(x, y)
        assert got == want, (trial, sorted(got), sorted(want))


def test_convex_hull_distributed_matches_chain(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 3000
    key = rng.integers(0, 3, n)
    x = rng.integers(0, 50, n).astype(np.float64)
    y = rng.integers(0, 50, n).astype(np.float64)
    ds = rd.from_arrow(
        pa.table({"k": pa.array(key), "lon": pa.array(x), "lat": pa.array(y)})
    ).repartition(7)
    got = (
        convex_hull(ds, "k")
        .to_pandas()
        .sort_values(["k", "lon", "lat"])
        .reset_index(drop=True)
    )
    for k in range(3):
        m = key == k
        want = sorted({tuple(p) for p in _chain(x[m], y[m])})
        g = got[got["k"] == k][["lon", "lat"]].to_numpy()
        assert [tuple(p) for p in g] == want


def _brute_dp(x, y, eps_area):
    """Sequential recursive Douglas-Peucker with the area criterion."""
    keep = {0, len(x) - 1}

    def rec(i, j):
        if j - i < 2:
            return
        best, bc = -1, -1
        for k in range(i + 1, j):
            cr = abs(
                (x[j] - x[i]) * (y[k] - y[i]) - (y[j] - y[i]) * (x[k] - x[i])
            )
            if cr > bc:
                bc, best = cr, k
        if bc > eps_area:
            keep.add(best)
            rec(i, best)
            rec(best, j)

    rec(0, len(x) - 1)
    return keep


def test_simplify_matches_recursive_dp(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(19)
    rows = []
    want = {}
    for uid in range(12):
        n = int(rng.integers(2, 60))
        # tiny lattice: many exact cross-product ties
        x = rng.integers(0, 8, n).astype(np.float64)
        y = rng.integers(0, 8, n).astype(np.float64)
        want[uid] = _brute_dp(
            np.rint(x * (1 << 20)), np.rint(y * (1 << 18)), eps_area=1 << 41
        )
        for i in range(n):
            rows.append((uid, uid * 1000 + i, np.datetime64("2020-01-06", "us") + np.timedelta64(i, "h"), x[i], y[i]))
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "lon", "lat"])
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    got = simplify_trajectories(ds, eps_area=1 << 41, n_shards=4).to_pandas()
    for uid in range(12):
        g = set(got[got["user_id"] == uid]["seq"].to_numpy() - 1)
        assert g == want[uid], (uid, sorted(g), sorted(want[uid]))
    # single-point user is retained whole
    one = pd.DataFrame(
        {"user_id": [99], "event_id": [1], "ts": [np.datetime64("2020-01-06", "us")],
         "lon": [1.0], "lat": [2.0]}
    )
    got1 = simplify_trajectories(
        rd.from_arrow(pa.Table.from_pandas(one, preserve_index=False)), eps_area=10
    ).to_pandas()
    assert len(got1) == 1 and got1["seq"].iloc[0] == 1
