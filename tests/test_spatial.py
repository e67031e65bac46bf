"""Brute-force equivalence tests for stages/spatial.dbscan and knox_counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from geoglue_ray.stages.spatial import dbscan


def _brute_dbscan(ids: np.ndarray, lon: np.ndarray, lat: np.ndarray,
                  eps: float, min_pts: int) -> pd.DataFrame:
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    hit = d2 <= eps * eps
    np.fill_diagonal(hit, False)
    core = hit.sum(1) >= min_pts
    ci = np.flatnonzero(core)
    lab = ids[ci].copy()
    adj = hit[np.ix_(ci, ci)].copy()
    np.fill_diagonal(adj, True)
    while True:
        new = np.where(adj, lab[None, :], np.iinfo(np.int64).max).min(1)
        if (new == lab).all():
            break
        lab = new
    rows = [(int(i), "core", int(l)) for i, l in zip(ids[ci], lab)]
    for j in np.flatnonzero(~core):
        cand = ci[hit[j, ci]]
        if len(cand):
            # nearest core, ties to the smallest core id
            order = np.lexsort((ids[cand], d2[j, cand]))
            k = cand[order[0]]
            comp = int(lab[np.flatnonzero(ci == k)[0]])
            rows.append((int(ids[j]), "border", comp))
        else:
            rows.append((int(ids[j]), "noise", None))
    return (
        pd.DataFrame(rows, columns=["event_id", "role", "cluster_id"])
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _points(n: int, seed: int):
    rng = np.random.default_rng(seed)
    ids = np.arange(1, n + 1, dtype=np.int64)
    rng.shuffle(ids)
    # a few dense pockets + a diffuse background so all three roles occur
    centers = rng.uniform(0, 4, size=(6, 2))
    which = rng.integers(0, 7, n)
    lon = np.where(which < 6, centers[which % 6, 0] + rng.normal(0, 0.08, n),
                   rng.uniform(0, 4, n))
    lat = np.where(which < 6, centers[which % 6, 1] + rng.normal(0, 0.08, n),
                   rng.uniform(0, 4, n))
    return ids, lon, lat


# two (seed, min_pts, n_shards) cells: both compare against the exact
# brute force, so shard-count invariance (1 vs 8) is implied transitively
# without extra pipeline executions (each run costs ~1 min of Ray stage
# constants at the 4-CPU test session)
@pytest.mark.parametrize("seed,min_pts,n_shards", [(7, 3, 8), (11, 5, 1)])
def test_dbscan_matches_bruteforce(seed, min_pts, n_shards):
    ids, lon, lat = _points(400, seed)
    eps = 0.0625
    ref = _brute_dbscan(ids, lon, lat, eps, min_pts)
    assert set(ref["role"]) == {"core", "border", "noise"}, "degenerate fixture"
    ds = rd.from_arrow(
        pa.table({"event_id": ids, "lon": lon, "lat": lat})
    ).repartition(5)
    got = (
        dbscan(ds, eps=eps, min_pts=min_pts, n_shards=n_shards)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["event_id"].tolist() == ref["event_id"].tolist()
    assert got["role"].tolist() == ref["role"].tolist()
    a = got["cluster_id"].astype("float64").to_numpy()
    b = ref["cluster_id"].astype("float64").to_numpy()
    assert np.array_equal(a, b, equal_nan=True)


def test_knox_counts_matches_bruteforce():
    from geoglue_ray.stages.spatial import knox_counts

    rng = np.random.default_rng(19)
    n = 300
    ids = np.arange(1, n + 1, dtype=np.int64)
    lon = rng.uniform(0, 2, n)
    lat = rng.uniform(0, 2, n)
    ts = rng.integers(0, 100 * 3_600_000_000, n)  # 100 h span, us
    eps, tau = 0.25, 5 * 3_600_000_000

    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    dt = np.abs(ts[:, None] - ts[None, :])
    upper = ids[:, None] < ids[None, :]
    S = int(((d2 <= eps * eps) & upper).sum())
    T = int(((dt <= tau) & upper).sum())
    ST = int(((d2 <= eps * eps) & (dt <= tau) & upper).sum())
    assert S > 0 and T > 0 and ST > 0, "degenerate fixture"

    ds = rd.from_arrow(
        pa.table({"event_id": ids, "lon": lon, "lat": lat, "ts_us": ts})
    ).repartition(4)
    got = knox_counts(ds, eps=eps, tau_us=tau, n_shards=8).to_pandas()
    assert got["n_events"][0] == n
    assert got["pairs_space"][0] == S
    assert got["pairs_time"][0] == T
    assert got["pairs_st"][0] == ST
    total = n * (n - 1) // 2
    assert got["expected_st"][0] == np.float64(S * T) / np.float64(total)
    assert got["knox_ratio"][0] == np.float64(ST * total) / np.float64(S * T)


def test_dbscan_long_chain_crosses_tiles():
    """A single chain component spanning multiple contraction tiles and
    ~100 graph-diameter hops: tile-contracted components must label it
    exactly (plain min-label propagation would need ~diameter rounds).
    eps = 1/16 -> tile width 4 deg; the chain spans ~6 deg."""
    eps = 0.0625
    step = eps * 0.9
    n = 110
    ids = np.arange(1, n + 1, dtype=np.int64)[::-1].copy()  # ids not in pos order
    lon = 0.03 + np.arange(n) * step
    lat = np.full(n, 0.5)
    # plus an isolated far blob of 4 mutually-close points
    ids2 = np.array([500, 501, 502, 503], dtype=np.int64)
    lon2 = np.array([20.0, 20.01, 20.02, 20.03])
    lat2 = np.full(4, 7.0)
    all_ids = np.concatenate([ids, ids2])
    all_lon = np.concatenate([lon, lon2])
    all_lat = np.concatenate([lat, lat2])
    ref = _brute_dbscan(all_ids, all_lon, all_lat, eps, 2)
    ds = rd.from_arrow(
        pa.table({"event_id": all_ids, "lon": all_lon, "lat": all_lat})
    ).repartition(6)
    got = (
        dbscan(ds, eps=eps, min_pts=2, n_shards=8)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["event_id"].tolist() == ref["event_id"].tolist()
    assert got["role"].tolist() == ref["role"].tolist()
    a = got["cluster_id"].astype("float64").to_numpy()
    b = ref["cluster_id"].astype("float64").to_numpy()
    assert np.array_equal(a, b, equal_nan=True)
    # the chain really is ONE cluster labeled by its minimum CORE id
    # (the two chain ENDPOINTS have a single neighbour each, so at
    # min_pts=2 they are borders — id 1 sits at an endpoint, hence 2)
    chain = got[got["event_id"] <= n]
    assert chain["cluster_id"].nunique() == 1
    assert chain["cluster_id"].iloc[0] == 2


def test_trajectory_hausdorff_matches_bruteforce(tmp_path):
    """Random multi-user point sets written to a parquet events table:
    the broadcast-vs-stream two-direction merge must equal the O(n^2)
    definition.  Uses the real fixture lon/lat derivation (ids map to
    coordinates), so the brute force derives identically."""
    import pyarrow.parquet as pq

    from geoglue_ray import fixtures as fx
    from geoglue_ray.pipelines.queries import trajectory_hausdorff

    rng = np.random.default_rng(31)
    n = 400
    ids = np.arange(1, n + 1, dtype=np.int64)
    users = rng.integers(0, 12, n).astype(np.int64)
    t = pa.table(
        {
            "event_id": ids,
            "ts": pa.array(
                np.full(n, np.datetime64("2020-01-06", "us"))
            ),
            "user_id": users,
            "event_type": pa.array(["x"] * n),
            "value": pa.array(np.zeros(n)),
            "props": pa.array([""] * n),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = (
        trajectory_hausdorff(str(tmp_path), n_shards=8)
        .to_pandas()
        .sort_values(["query_user", "other_user"])
        .reset_index(drop=True)
    )

    lon, lat = fx.derive_lonlat(ids)
    qs = np.unique(users)[:4]
    expect = []
    for qu in qs:
        qa = users == qu
        for cu in np.unique(users):
            if cu == qu:
                continue
            ca = users == cu
            dx = lon[qa][:, None] - lon[ca][None, :]
            dy = lat[qa][:, None] - lat[ca][None, :]
            d2 = dx * dx + dy * dy
            h = max(d2.min(axis=1).max(), d2.min(axis=0).max())
            expect.append((int(qu), int(cu), float(h)))
    exp = (
        pd.DataFrame(expect, columns=["query_user", "other_user", "hausdorff_d2"])
        .sort_values(["query_user", "other_user"])
        .reset_index(drop=True)
    )
    assert got["query_user"].tolist() == exp["query_user"].tolist()
    assert got["other_user"].tolist() == exp["other_user"].tolist()
    assert np.array_equal(
        got["hausdorff_d2"].to_numpy(), exp["hausdorff_d2"].to_numpy()
    )


def test_ripley_salted_matches_unsalted():
    """Hot-cell salting must not change any pair count: a dense blob plus
    scattered points, multi-batch input, hot_cap small enough that the
    blob cell splits into many sub-shards."""
    from geoglue_ray.stages.spatial import ripley_k

    rng = np.random.default_rng(7)
    n_blob, n_bg = 900, 300
    lon = np.r_[0.51 + 0.02 * rng.random(n_blob), 8.0 * rng.random(n_bg)]
    lat = np.r_[0.52 + 0.02 * rng.random(n_blob), 8.0 * rng.random(n_bg)]
    ids = np.arange(n_blob + n_bg, dtype=np.int64)
    tbl = pa.table({"event_id": pa.array(ids), "lon": pa.array(lon), "lat": pa.array(lat)})

    def load():
        return rd.from_arrow(tbl).repartition(7)

    base = ripley_k(load(), area=64.0, hot_cap=10**9)  # never salts
    salted = ripley_k(load(), area=64.0, hot_cap=50)  # blob splits ~18-way
    bp, sp = base.to_pandas(), salted.to_pandas()
    assert (bp["n_pairs"].to_numpy() == sp["n_pairs"].to_numpy()).all()
    assert np.array_equal(bp["k_est"].to_numpy(), sp["k_est"].to_numpy())
    assert np.array_equal(bp["l_est"].to_numpy(), sp["l_est"].to_numpy())
    # sanity vs brute force at r_max
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    assert int(bp["n_pairs"].iloc[3]) == int((d2 <= (4 / 64) ** 2).sum())


def test_dbscan_second_contraction_level_matches():
    """levels=2 (super-tile contraction + distributed label compose) must
    be label-identical to levels=1 and to brute force.  The chain spans
    ~34 deg: tiles are 4 deg (eps=1/16), supers 32 deg (super_shift=3),
    so the quotient has real intra-super merges AND a surviving
    cross-super residual at the lon=32 boundary."""
    eps = 0.0625
    step = eps * 0.9
    n = 600
    ids = np.arange(1, n + 1, dtype=np.int64)[::-1].copy()
    lon = 0.03 + np.arange(n) * step
    lat = np.full(n, 0.5)
    ids2 = np.array([900, 901, 902, 903], dtype=np.int64)
    lon2 = np.array([20.0, 20.01, 20.02, 20.03])
    lat2 = np.full(4, 7.0)
    all_ids = np.concatenate([ids, ids2])
    all_lon = np.concatenate([lon, lon2])
    all_lat = np.concatenate([lat, lat2])
    ref = _brute_dbscan(all_ids, all_lon, all_lat, eps, 2)
    ds = rd.from_arrow(
        pa.table({"event_id": all_ids, "lon": all_lon, "lat": all_lat})
    ).repartition(6)
    g1 = (
        dbscan(ds, eps=eps, min_pts=2, n_shards=8)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    g2 = (
        dbscan(ds, eps=eps, min_pts=2, n_shards=8, cc_levels=2)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(g1, g2)
    assert g2["event_id"].tolist() == ref["event_id"].tolist()
    a = g2["cluster_id"].astype("float64").to_numpy()
    b = ref["cluster_id"].astype("float64").to_numpy()
    assert np.array_equal(a, b, equal_nan=True)
    # the whole chain contracted to ONE label across both supers
    assert g2[g2["event_id"] <= n]["cluster_id"].nunique() == 1


def test_dbscan_levels2_no_cross_edges():
    """levels=2 degenerate case: every point in one tile — the quotient
    is EMPTY end to end (empty mapping2, empty residual), and the
    left-join compose must fall back to the level-1 labels."""
    ids = np.array([7, 3, 11, 5], dtype=np.int64)
    lon = np.array([0.10, 0.11, 0.12, 0.13])
    lat = np.full(4, 0.2)
    ds = rd.from_arrow(pa.table({"event_id": ids, "lon": lon, "lat": lat}))
    g1 = (
        dbscan(ds, eps=0.0625, min_pts=2, n_shards=4)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    g2 = (
        dbscan(ds, eps=0.0625, min_pts=2, n_shards=4, cc_levels=2)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(g1, g2)
    assert (g2["cluster_id"] == 3).all()


def test_radius_knn_join_matches_bruteforce():
    """radius_knn_join vs an exact all-pairs top-k: same (id, rank,
    nn_id, nn_dist) rows under (d2, id) ordering, points with < k
    in-radius neighbours emit short lists, isolated points none."""
    from geoglue_ray.stages.spatial import radius_knn_join

    ids, lon, lat = _points(300, seed=13)
    r, k = 0.125, 3
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    d2 = np.where(d2 > r * r, np.inf, d2)
    rows = []
    for i in range(len(ids)):
        order = np.lexsort((ids, d2[i]))
        for rank, j in enumerate(order[:k], start=1):
            if np.isfinite(d2[i, j]):
                rows.append((int(ids[i]), rank, int(ids[j]),
                             float(np.sqrt(d2[i, j]))))
    ref = (
        pd.DataFrame(rows, columns=["event_id", "rank", "nn_id", "nn_dist"])
        .sort_values(["event_id", "rank"]).reset_index(drop=True)
    )
    ds = rd.from_arrow(pa.table({"event_id": ids, "lon": lon, "lat": lat}))
    got = (
        radius_knn_join(ds, radius=r, k=k, id_col="event_id", n_shards=8)
        .to_pandas().sort_values(["event_id", "rank"]).reset_index(drop=True)
    )
    assert len(got) == len(ref)
    assert np.array_equal(got["event_id"].to_numpy(), ref["event_id"].to_numpy())
    assert np.array_equal(got["rank"].to_numpy(), ref["rank"].to_numpy())
    assert np.array_equal(got["nn_id"].to_numpy(), ref["nn_id"].to_numpy())
    assert np.array_equal(got["nn_dist"].to_numpy(), ref["nn_dist"].to_numpy())


def test_triangle_stats_matches_bruteforce():
    """triangle_stats vs the adjacency-matrix count: per-node triangles
    = diag(A^3)/2, degree = row sums, clustering = 2T/(d(d-1))."""
    from geoglue_ray.stages.spatial import triangle_stats

    ids, lon, lat = _points(250, seed=5)
    r = 0.125
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    A = (d2 <= r * r).astype(np.int64)
    np.fill_diagonal(A, 0)
    deg = A.sum(1)
    tri = np.diag(A @ A @ A) // 2
    cl = np.where(deg >= 2, 2.0 * tri / np.maximum(deg * (deg - 1), 1), np.nan)
    order = np.argsort(ids)
    ds = rd.from_arrow(pa.table({"event_id": ids, "lon": lon, "lat": lat}))
    got = (
        triangle_stats(ds, radius=r, id_col="event_id", n_shards=8)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert len(got) == len(ids)
    assert np.array_equal(got["degree"].to_numpy(), deg[order])
    assert np.array_equal(got["n_tri"].to_numpy(), tri[order])
    assert np.array_equal(got["clustering"].to_numpy(), cl[order], equal_nan=True)
    assert tri.sum() > 0  # the fixture actually has triangles


def test_time_knn_join_bucket_knob_invariant():
    """time_knn_join results must be IDENTICAL for any bucket_us (the
    cost knob): sub-tau buckets with a widened halo sweep and super-tau
    buckets both reproduce the default bucket == tau output exactly."""
    from geoglue_ray.stages.spatial import time_knn_join

    rng = np.random.default_rng(11)
    n = 3000
    ids = np.arange(n, dtype=np.int64)
    ts = rng.integers(0, 40 * 3_600_000_000, n).astype(np.int64)
    tau = 2 * 3_600_000_000
    tbl = pa.table({"event_id": pa.array(ids), "ts_us": pa.array(ts)})
    base = None
    for bw in (None, tau // 4, tau * 3):
        got = (
            time_knn_join(rd.from_arrow(tbl), tau_us=tau, k=5,
                          id_col="event_id", n_shards=8, bucket_us=bw)
            .to_pandas()
            .sort_values(["event_id", "t_rank"])
            .reset_index(drop=True)
        )
        if base is None:
            base = got
            assert len(base) > 0
        else:
            pd.testing.assert_frame_equal(got, base)
