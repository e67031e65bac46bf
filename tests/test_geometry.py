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


def _brute_crossings(df):
    """O(S^2) proper-crossing counts between different users."""
    from collections import Counter

    segs = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        x = np.rint(g["lon"].to_numpy() * (1 << 20)).astype(np.int64)
        y = np.rint(g["lat"].to_numpy() * (1 << 18)).astype(np.int64)
        for i in range(len(g) - 1):
            segs.append((uid, x[i], y[i], x[i + 1], y[i + 1]))

    def orient(ax, ay, bx, by, px, py):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    cnt = Counter()
    for i in range(len(segs)):
        for j in range(i + 1, len(segs)):
            a, b = segs[i], segs[j]
            if a[0] == b[0]:
                continue
            o1 = orient(a[1], a[2], a[3], a[4], b[1], b[2])
            o2 = orient(a[1], a[2], a[3], a[4], b[3], b[4])
            o3 = orient(b[1], b[2], b[3], b[4], a[1], a[2])
            o4 = orient(b[1], b[2], b[3], b[4], a[3], a[4])
            if ((o1 > 0) != (o2 > 0) and o1 != 0 and o2 != 0
                    and (o3 > 0) != (o4 > 0) and o3 != 0 and o4 != 0):
                cnt[(min(a[0], b[0]), max(a[0], b[0]))] += 1
    return cnt


def test_segment_crossings_matches_brute_force(ray_session):
    import ray.data as rd

    from geoglue_ray.stages.geometry import segment_crossings

    rng = np.random.default_rng(31)
    rows = []
    for uid in range(8):
        n = int(rng.integers(2, 25))
        # integer lattice: collinear overlaps and shared endpoints occur
        x = rng.integers(0, 10, n) / 16.0
        y = rng.integers(0, 10, n) / 16.0
        for i in range(n):
            rows.append(
                (uid, uid * 1000 + i,
                 np.datetime64("2020-01-06", "us") + np.timedelta64(i, "h"),
                 x[i], y[i])
            )
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "lon", "lat"])
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)
    got = segment_crossings(ds, cell=1.0 / 8.0, n_shards=4).to_pandas()
    want = _brute_crossings(df)
    got_map = {
        (int(r.user_a), int(r.user_b)): int(r.n_crossings)
        for r in got.itertuples()
    }
    assert got_map == dict(want), (got_map, dict(want))
    assert sum(got_map.values()) > 0  # the fixture actually crosses


def test_focal_mode_tie_rule(ray_session):
    import ray.data as rd

    from geoglue_ray import fixtures as fx
    from geoglue_ray.stages.stencil import focal_stats

    rng = np.random.default_rng(13)
    nt, nr, nc = 2, 6, 6
    t, r, c = np.meshgrid(np.arange(nt), np.arange(nr), np.arange(nc), indexing="ij")
    t, r, c = t.ravel(), r.ravel(), c.ravel()
    v = rng.integers(0, 3, len(t)).astype(np.float64)  # tiny range: ties
    v[rng.random(len(t)) < 0.2] = np.nan
    T0 = np.datetime64(fx.T0, "us")
    ds = rd.from_arrow(pa.table({
        "valid_time": pa.array(T0 + (t * 3_600_000_000).astype("timedelta64[us]"),
                               type=pa.timestamp("us")),
        "cell_row": pa.array(r.astype(np.int32)),
        "cell_col": pa.array(c.astype(np.int32)),
        "variable": pa.array(np.repeat("t2m", len(t))),
        "value": pa.array(v),
    })).repartition(3)
    got = (
        focal_stats(ds, ops=("mode",), band_rows=2, hour_chunk=1)
        .to_pandas()
        .set_index(["valid_time", "cell_row", "cell_col"])["focal_mode"]
    )
    grid = np.full((nt, nr, nc), np.nan)
    grid[t, r, c] = v
    n_checked = 0
    for ti in range(nt):
        for ri in range(nr):
            for ci in range(nc):
                vals = [
                    grid[ti, ri + dr, ci + dc]
                    for dr in (-1, 0, 1)
                    for dc in (-1, 0, 1)
                    if 0 <= ri + dr < nr and 0 <= ci + dc < nc
                    and np.isfinite(grid[ti, ri + dr, ci + dc])
                ]
                key = (T0 + np.timedelta64(ti * 3600_000_000, "us"), ri, ci)
                if not vals:
                    assert key not in got.index
                    continue
                from collections import Counter

                cnt = Counter(vals)
                best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                assert got[key] == best, (key, cnt, got[key])
                n_checked += 1
    assert n_checked > 50


def test_pairwise_set_jaccard_brute(ray_session):
    import ray.data as rd

    from geoglue_ray.stages.similarity import pairwise_set_jaccard

    rng = np.random.default_rng(23)
    n = 400
    key = rng.integers(0, 12, n).astype(np.int64)
    item = rng.integers(0, 25, n).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"u": pa.array(key), "it": pa.array(item)})
    ).repartition(5)
    got = pairwise_set_jaccard(ds, "u", "it", n_shards=4).to_pandas()
    sets = {k: set(item[key == k]) for k in np.unique(key)}
    want = {}
    ks = sorted(sets)
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            sh = len(sets[a] & sets[b])
            if sh:
                want[(a, b)] = (sh, sh / len(sets[a] | sets[b]))
    got_map = {
        (int(r.key_a), int(r.key_b)): (int(r.n_shared), float(r.jaccard))
        for r in got.itertuples()
    }
    assert got_map == want


def _brute_traj_counts(df, x0, y0, inv_cell, nx, ny):
    from collections import Counter

    cnt = Counter()
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cx = np.floor((g["lon"].to_numpy() - x0) * inv_cell).astype(int)
        cy = np.floor((g["lat"].to_numpy() - y0) * inv_cell).astype(int)
        for i in range(1, len(g)):
            ax, ay, bx, by = cx[i - 1], cy[i - 1], cx[i], cy[i]
            n = max(abs(bx - ax), abs(by - ay))
            for k in range(n + 1):
                x = ax if n == 0 else (ax * (n - k) + bx * k) // n
                y = ay if n == 0 else (ay * (n - k) + by * k) // n
                if 0 <= x < nx and 0 <= y < ny:
                    cnt[(x, y)] += 1
    return dict(cnt)


def test_traj_cell_counts_matches_brute_force(ray_session):
    import ray.data as rd

    from geoglue_ray.stages.geometry import traj_cell_counts

    rng = np.random.default_rng(47)
    rows = []
    for uid in range(10):
        n = int(rng.integers(2, 30))
        # cell centers on an 8x8 grid (odd 16ths -> never on a boundary)
        x = (2 * rng.integers(0, 8, n) + 1) / 16.0
        y = (2 * rng.integers(0, 8, n) + 1) / 16.0
        for i in range(n):
            rows.append(
                (uid, uid * 1000 + i,
                 np.datetime64("2020-01-06", "us") + np.timedelta64(i, "h"),
                 x[i], y[i])
            )
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "lon", "lat"])
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)
    got = traj_cell_counts(
        ds, x0=0.0, y0=0.0, inv_cell=8.0, nx=8, ny=8, n_shards=4
    ).to_pandas()
    got_map = {
        (int(r.cell_x), int(r.cell_y)): int(r.n_visits) for r in got.itertuples()
    }
    want = _brute_traj_counts(df, 0.0, 0.0, 8.0, 8, 8)
    assert got_map == want
    # long diagonal segments actually expand to >1 visited cell
    assert sum(got_map.values()) > len(df) - 10


def test_contiguity_pairs_brute(ray_session):
    import ray.data as rd

    from geoglue_ray.geom import polygon_wkb
    from geoglue_ray.stages.geometry import contiguity_pairs

    def sq(x, y):  # unit square, closed ring
        return polygon_wkb(
            [np.array([[x, y], [x + 1, y], [x + 1, y + 1], [x, y + 1], [x, y]], float)]
        )

    # 2x2 grid of unit squares (ids 0..3, rook pairs (0,1),(0,2),(1,3),(2,3))
    rows = [(i, sq(i % 2, i // 2)) for i in range(4)]
    # 10/11 share TWO unit edges: both boundaries split at (11, 0)
    a = polygon_wkb(
        [np.array([[10, 0], [11, 0], [12, 0], [12, 1], [10, 1], [10, 0]], float)]
    )
    b = polygon_wkb(
        [np.array([[10, -1], [12, -1], [12, 0], [11, 0], [10, 0], [10, -1]], float)]
    )
    rows += [(10, a), (11, b)]
    ds = rd.from_arrow(
        pa.table(
            {
                "admin_id": pa.array([r[0] for r in rows], pa.int64()),
                "geometry_wkb": pa.array([r[1] for r in rows], pa.binary()),
            }
        )
    ).repartition(3)
    got = contiguity_pairs(ds, n_shards=4).to_pandas()
    want = {(0, 1): 1.0, (0, 2): 1.0, (1, 3): 1.0, (2, 3): 1.0, (10, 11): 2.0}
    got_map = {
        (int(r.admin_a), int(r.admin_b)): float(r.n_shared_edges)
        for r in got.itertuples()
    }
    assert got_map == want


def _octant_scalar(dx, dy):
    if dx > 0 and dy >= 0 and dx > dy:
        return 0
    if dx > 0 and dy >= dx:
        return 1
    if dx <= 0 and dy > 0 and dy > -dx:
        return 2
    if dy > 0 and -dx >= dy:
        return 3
    if dx < 0 and dy <= 0 and -dx > -dy:
        return 4
    if dx < 0 and -dy >= -dx:
        return 5
    if dx >= 0 and dy < 0 and -dy > dx:
        return 6
    if dx > 0 and dy < 0:
        return 7
    return -1


def test_octant_sectors_partition_the_plane():
    # every nonzero vector lands in exactly one sector; boundaries are
    # axes/diagonals and belong to the CCW-lower sector
    import itertools

    for dx, dy in itertools.product(range(-3, 4), repeat=2):
        o = _octant_scalar(float(dx), float(dy))
        if dx == 0 and dy == 0:
            assert o == -1
            continue
        assert 0 <= o <= 7
    assert _octant_scalar(1.0, 0.0) == 0  # east axis -> sector 0
    assert _octant_scalar(1.0, 1.0) == 1  # NE diagonal -> sector 1
    assert _octant_scalar(0.0, 1.0) == 2  # north axis -> sector 2
    assert _octant_scalar(-1.0, 1.0) == 3
    assert _octant_scalar(-1.0, 0.0) == 4
    assert _octant_scalar(-1.0, -1.0) == 5
    assert _octant_scalar(0.0, -1.0) == 6
    assert _octant_scalar(1.0, -1.0) == 7
