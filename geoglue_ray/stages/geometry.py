"""Computational-geometry operators over point sets and trajectories:
per-key convex hull and recursive trajectory simplification.

The reference's geometry surface is polygon/bbox algebra
(``geom.py``; ``region.py`` bbox_from_region) — these add the two
classic derived-geometry operators a movement / point-pattern pipeline
needs, Ray-Data-first:

- :func:`convex_hull` is a *mergeable-summary* reduction: each batch
  reduces its points to their hull vertices (an Akl-Toussaint
  vectorized discard + monotone chain on the few survivors), and the
  per-key merge runs the same chain over the union of partial hulls —
  the hull of a union of hulls is the hull of the union, so the final
  pass sees key-cardinality x hull-size rows, never the corpus.
- :func:`simplify_trajectories` is Douglas-Peucker recursion with the
  exact TRIANGLE-AREA criterion (|cross product| of integer-scaled
  dyadic coordinates): split at the interior point of largest twice-
  area while it exceeds ``eps_area``.  Area replaces perpendicular
  distance deliberately — the distance test squares a ~2^51 cross
  product out of int64/double exactness, while |cross| itself is an
  exact int64, so engine and SQL twin agree bit-for-bit.  All
  frontier segments advance together in one lexsort + run-argmax pass
  per round (rounds = recursion depth, never per-segment Python).

Coordinates are the fixture's dyadic rationals: ``lon * 2^20`` and
``lat * 2^18`` are exact int64 (geoglue_ray/fixtures.py), so every
cross product here is exact (|cross| < 2^52).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

XSCALE = float(1 << 20)  # lon -> exact integer
YSCALE = float(1 << 18)  # lat -> exact integer


def _chain(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Strict monotone-chain convex hull: indices of hull VERTICES
    (collinear boundary points excluded) of the distinct points.
    Sequential over the few Akl-Toussaint survivors only."""
    pts = np.unique(np.stack([x, y], axis=1), axis=0)
    n = len(pts)
    if n <= 2:
        return pts
    def half(p):
        out: list[np.ndarray] = []
        for q in p:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (q[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (q[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(q)
        return out
    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def _akl_toussaint(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized discard: drop points strictly inside the quadrilateral
    of the 4 extreme points (min/max of x+y, x-y).  Keeps every hull
    vertex; typically discards ~all interior points in O(n)."""
    if len(x) <= 8:
        return np.ones(len(x), bool)
    s, d = x + y, x - y
    corners = [np.argmin(s), np.argmax(d), np.argmax(s), np.argmin(d)]  # CCW
    keep = np.zeros(len(x), bool)
    for i in range(4):
        ax, ay = x[corners[i]], y[corners[i]]
        bx, by = x[corners[(i + 1) % 4]], y[corners[(i + 1) % 4]]
        # outside-or-on this edge's half-plane => cannot be discarded
        keep |= (bx - ax) * (y - ay) - (by - ay) * (x - ax) <= 0
    return keep


def convex_hull(
    ds: rd.Dataset,
    key_col: str,
    x_col: str = "lon",
    y_col: str = "lat",
) -> rd.Dataset:
    """Strict convex-hull vertices per key: rows ``(key, x, y)`` (hull
    vertices only — collinear boundary points and duplicates excluded),
    unordered.  Partial hull per batch, exact chain merge per key."""

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        x = b[x_col].to_numpy()
        y = b[y_col].to_numpy()
        codes, uniq = pd.factorize(keys, use_na_sentinel=False)
        ko, xo, yo = [], [], []
        for k in range(len(uniq)):
            m = codes == k
            xm, ym = x[m], y[m]
            pre = _akl_toussaint(xm, ym)
            hull = _chain(xm[pre], ym[pre])
            ko.append(np.repeat(k, len(hull)))
            xo.append(hull[:, 0])
            yo.append(hull[:, 1])
        kk = np.concatenate(ko) if ko else np.array([], np.int64)
        return pa.table(
            {
                key_col: pa.array(uniq[kk] if len(kk) else uniq[:0]),
                x_col: pa.array(
                    np.concatenate(xo) if xo else np.array([], np.float64)
                ),
                y_col: pa.array(
                    np.concatenate(yo) if yo else np.array([], np.float64)
                ),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g
        hull = _chain(g[x_col].to_numpy(), g[y_col].to_numpy())
        return pd.DataFrame(
            {
                key_col: np.repeat(g[key_col].iloc[0], len(hull)),
                x_col: hull[:, 0],
                y_col: hull[:, 1],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge, batch_format="pandas")
    )


def simplify_trajectories(
    ds: rd.Dataset,
    eps_area: int,
    user_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    n_shards: int = 64,
) -> rd.Dataset:
    """Douglas-Peucker-style simplification of every user's
    (ts, id)-ordered trajectory with the exact triangle-area criterion:
    keep both endpoints; recursively split at the interior point whose
    |cross((j - i), (k - i))| over integer-scaled coordinates is
    largest (ties to the smallest seq) while it exceeds ``eps_area``.
    Returns the RETAINED vertices ``(user, seq, id)``.

    Users co-locate on ``hash(user) % n_shards``; each round advances
    every active segment in the shard at once (point->segment
    assignment by searchsorted on segment starts, per-segment argmax by
    one lexsort + run pass)."""

    def prep(b: pa.Table) -> pa.Table:
        uid = b[user_col].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return pa.table(
            {
                "_ts_": pa.array(shard),
                user_col: b[user_col],
                id_col: b[id_col],
                ts_col: b[ts_col],
                "x": pa.array(
                    np.rint(b[lon_col].to_numpy() * XSCALE).astype(np.int64)
                ),
                "y": pa.array(
                    np.rint(b[lat_col].to_numpy() * YSCALE).astype(np.int64)
                ),
            }
        )

    def simplify(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                user_col: pa.array([], pa.int64()),
                "seq": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        uid = g[user_col].to_numpy().astype(np.int64)
        eid = g[id_col].to_numpy().astype(np.int64)
        t = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        x = g["x"].to_numpy().astype(np.int64)
        y = g["y"].to_numpy().astype(np.int64)
        o = np.lexsort((eid, t, uid))
        uid, eid, x, y = uid[o], eid[o], x[o], y[o]
        n = len(uid)
        first = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(first)
        run = np.cumsum(first) - 1
        seq = np.arange(n, dtype=np.int64) - starts[run] + 1

        keep = np.zeros(n, bool)
        keep[starts] = True
        ends = np.r_[starts[1:], n] - 1
        keep[ends] = True

        # frontier: segment starts (global indices); each segment spans
        # [si, sj] where sj = next kept index after si within the user
        seg_i = starts[ends > starts]
        seg_j = ends[ends > starts]
        while len(seg_i):
            # assign every strictly-interior point to its segment
            # (segments are disjoint, sorted by seg_i)
            idx = np.arange(n)
            s = np.searchsorted(seg_i, idx, side="right") - 1
            ok = (s >= 0) & (idx > seg_i[s.clip(0)]) & (idx < seg_j[s.clip(0)])
            pk, sk = idx[ok], s[ok]
            if len(pk) == 0:
                break
            xi, yi = x[seg_i[sk]], y[seg_i[sk]]
            xj, yj = x[seg_j[sk]], y[seg_j[sk]]
            cross = np.abs((xj - xi) * (y[pk] - yi) - (yj - yi) * (x[pk] - xi))
            # per-segment argmax, ties to smallest index: sort by
            # (segment, -cross, index) and take each run's head
            o2 = np.lexsort((pk, -cross, sk))
            head = np.r_[True, sk[o2][1:] != sk[o2][:-1]]
            best_p = pk[o2][head]
            best_c = cross[o2][head]
            split = best_c > eps_area
            if not split.any():
                break
            bp = best_p[split]
            keep[bp] = True
            bs = sk[o2][head][split]
            # the next frontier is ONLY the children of split segments
            # ([i, bp] and [bp, j]); disjoint intervals sorted by start
            # have sorted ends, so position-wise pairing is exact
            seg_i = np.sort(np.r_[seg_i[bs], bp])
            seg_j = np.sort(np.r_[bp, seg_j[bs]])
        kept = np.flatnonzero(keep)
        return pa.table(
            {
                user_col: pa.array(uid[kept]),
                "seq": pa.array(seq[kept]),
                id_col: pa.array(eid[kept]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_ts_")
        .map_groups(simplify, batch_format="pandas")
    )


def segment_crossings(
    ds: rd.Dataset,
    cell: float = 1.0 / 64.0,
    user_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    n_shards: int = 64,
) -> rd.Dataset:
    """Segment x segment spatial join: counts PROPER crossings between
    different users' trajectory segments (consecutive (ts, id)-ordered
    points).  Returns ``(user_a, user_b, n_crossings)`` with
    ``user_a < user_b``.

    Shape: segments are built per user (fixed-shard co-shuffle), then
    each segment replicates to every grid cell its bounding box
    overlaps; candidate pairs meet inside one cell and are counted
    EXACTLY ONCE via the reference-point rule — a pair is evaluated
    only in the lexicographically-first cell of its bbox-overlap region
    (``(max(ax0,bx0), max(ay0,by0))``), which both segments provably
    cover.  The crossing predicate is four exact integer cross-product
    orientations (strictly opposite on both sides — touching/collinear
    pairs excluded), mirrored by the SQL pair-join twin.

    Partitioning assumption: duplication factor = bbox cells per
    segment; pick ``cell`` near the typical segment extent.  Counts are
    exact integers, so the final per-pair reduction is one small
    fixed-shard groupby."""

    def prep(b: pa.Table) -> pa.Table:
        uid = b[user_col].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return pa.table(
            {
                "_sc_": pa.array(shard),
                user_col: b[user_col],
                id_col: b[id_col],
                ts_col: b[ts_col],
                "x": pa.array(
                    np.rint(b[lon_col].to_numpy() * XSCALE).astype(np.int64)
                ),
                "y": pa.array(
                    np.rint(b[lat_col].to_numpy() * YSCALE).astype(np.int64)
                ),
            }
        )

    cx_scale = cell * XSCALE  # scaled-int units per grid cell (x)
    cy_scale = cell * YSCALE

    _seg_schema = {
        "_cell": pa.int64(),
        "user_id": pa.int64(),
        "x1": pa.int64(),
        "y1": pa.int64(),
        "x2": pa.int64(),
        "y2": pa.int64(),
        "cx0": pa.int64(),
        "cy0": pa.int64(),
    }

    def segments(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({k: pa.array([], t) for k, t in _seg_schema.items()})
        uid = g[user_col].to_numpy().astype(np.int64)
        eid = g[id_col].to_numpy().astype(np.int64)
        t = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        x = g["x"].to_numpy().astype(np.int64)
        y = g["y"].to_numpy().astype(np.int64)
        o = np.lexsort((eid, t, uid))
        uid, x, y = uid[o], x[o], y[o]
        same = uid[1:] == uid[:-1]
        x1, y1, x2, y2 = x[:-1][same], y[:-1][same], x[1:][same], y[1:][same]
        su = uid[:-1][same]
        # bbox -> covered cell range (scaled-int grid)
        cx0 = np.floor(np.minimum(x1, x2) / cx_scale).astype(np.int64)
        cx1 = np.floor(np.maximum(x1, x2) / cx_scale).astype(np.int64)
        cy0 = np.floor(np.minimum(y1, y2) / cy_scale).astype(np.int64)
        cy1 = np.floor(np.maximum(y1, y2) / cy_scale).astype(np.int64)
        nx = cx1 - cx0 + 1
        ny = cy1 - cy0 + 1
        rep = (nx * ny).astype(np.int64)
        idx = np.repeat(np.arange(len(su)), rep)
        # per-replica (dx, dy) offsets within each segment's cell range
        off = np.arange(len(idx)) - np.repeat(np.cumsum(rep) - rep, rep)
        dy = off % np.repeat(ny, rep)
        dx = off // np.repeat(ny, rep)
        ccx = cx0[idx] + dx
        ccy = cy0[idx] + dy
        return pa.table(
            {
                "_cell": pa.array((ccx << np.int64(22)) | ccy),
                "user_id": pa.array(su[idx]),
                "x1": pa.array(x1[idx]),
                "y1": pa.array(y1[idx]),
                "x2": pa.array(x2[idx]),
                "y2": pa.array(y2[idx]),
                "cx0": pa.array(cx0[idx]),
                "cy0": pa.array(cy0[idx]),
            }
        )

    def cross_in_cell(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "user_a": pa.array([], pa.int64()),
                "user_b": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        n = len(g)
        if n < 2:
            return empty
        cell_id = int(g["_cell"].iloc[0])
        ccx, ccy = cell_id >> 22, cell_id & ((1 << 22) - 1)
        uid = g["user_id"].to_numpy().astype(np.int64)
        x1 = g["x1"].to_numpy().astype(np.int64)
        y1 = g["y1"].to_numpy().astype(np.int64)
        x2 = g["x2"].to_numpy().astype(np.int64)
        y2 = g["y2"].to_numpy().astype(np.int64)
        cx0 = g["cx0"].to_numpy().astype(np.int64)
        cy0 = g["cy0"].to_numpy().astype(np.int64)
        ii, jj = np.triu_indices(n, k=1)
        keep = uid[ii] != uid[jj]
        # reference-point dedup: evaluate only where this cell is the
        # first cell of the pair's bbox overlap
        keep &= np.maximum(cx0[ii], cx0[jj]) == ccx
        keep &= np.maximum(cy0[ii], cy0[jj]) == ccy
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return empty

        def orient(ax, ay, bx, by, px, py):
            return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

        o1 = orient(x1[ii], y1[ii], x2[ii], y2[ii], x1[jj], y1[jj])
        o2 = orient(x1[ii], y1[ii], x2[ii], y2[ii], x2[jj], y2[jj])
        o3 = orient(x1[jj], y1[jj], x2[jj], y2[jj], x1[ii], y1[ii])
        o4 = orient(x1[jj], y1[jj], x2[jj], y2[jj], x2[ii], y2[ii])
        hit = (
            (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0)))
            & (((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0)))
        )
        if not hit.any():
            return empty
        ua = np.minimum(uid[ii[hit]], uid[jj[hit]])
        ub = np.maximum(uid[ii[hit]], uid[jj[hit]])
        key = ua * np.int64(1 << 32) + ub
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.zeros(len(uk), np.int64)
        np.add.at(cnt, inv, 1)
        return pa.table(
            {
                "user_a": pa.array(uk // (1 << 32)),
                "user_b": pa.array(uk % (1 << 32)),
                "n": pa.array(cnt),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["user_a", "user_b"], as_index=False, dropna=False)[
            "n"
        ].sum()
        return out.rename(columns={"n": "n_crossings"})

    segs = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_sc_")
        .map_groups(segments, batch_format="pandas")
    )
    partial = segs.groupby("_cell").map_groups(
        cross_in_cell, batch_format="pandas"
    )

    def shard_pairs(b: pa.Table) -> pa.Table:
        k = (
            b["user_a"].to_numpy().astype(np.uint64)
            * np.uint64(0x9E3779B185EBCA87)
        ) % np.uint64(n_shards)
        return b.append_column("_pm", pa.array(k.astype(np.int64)))

    return (
        partial.map_batches(shard_pairs, batch_format="pyarrow")
        .groupby("_pm")
        .map_groups(
            lambda g: merge(g.drop(columns=["_pm"])), batch_format="pandas"
        )
    )


def traj_cell_counts(
    ds: rd.Dataset,
    x0: float,
    y0: float,
    inv_cell: float,
    nx: int,
    ny: int,
    user_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    n_shards: int = 64,
) -> rd.Dataset:
    """Trajectory LINE rasterization: every consecutive (ts, id)-ordered
    segment of a user's track is walked cell by cell with an exact
    integer DDA, and the result is the per-grid-cell TRANSIT count (the
    line-density raster — events_density's sibling for movement data:
    that bins the points, this bins the paths between them).

    DDA: a segment from cell ``(ax, ay)`` to ``(bx, by)`` takes
    ``n = max(|bx-ax|, |by-ay|)`` steps and visits
    ``((ax*(n-k) + bx*k) // n, (ay*(n-k) + by*k) // n)`` at step k —
    the dominant axis advances every step, so the n+1 visited cells are
    distinct within a segment.  All arithmetic is non-negative int64
    (grid coords must be >= 0 — DuckDB ``//`` truncates where numpy
    floors on NEGATIVES, so the twin is exact only on this domain), and
    cell coords come from ``floor((lon - x0) * inv_cell)`` on the
    fixture's dyadic coordinates — exact when ``inv_cell`` is a power
    of two.  Consecutive segments share an endpoint cell and BOTH count
    it (transit counts, mirrored by the SQL ``generate_series`` twin).

    Shape (100 TB): one fixed-shard co-shuffle on ``hash(user)`` builds
    segments; each shard task expands its DDA steps vectorized
    (repeat/arange, no per-segment Python) and collapses them to a
    grid-cardinality partial bincount, so the driver-side final merge
    sees at most ``n_shards x nx*ny`` bounded rows — the
    events_density partial-collapse pattern.  Out-of-grid cells are
    dropped (callers filter to the grid's domain, as the city-cluster
    query does by id arithmetic on both sides)."""

    def prep(b: pa.Table) -> pa.Table:
        uid = b[user_col].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return pa.table(
            {
                "_tc": pa.array(shard),
                user_col: b[user_col],
                id_col: b[id_col],
                ts_col: b[ts_col],
                "cx": pa.array(
                    np.floor((b[lon_col].to_numpy() - x0) * inv_cell).astype(np.int64)
                ),
                "cy": pa.array(
                    np.floor((b[lat_col].to_numpy() - y0) * inv_cell).astype(np.int64)
                ),
            }
        )

    def visits(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "cell_x": pa.array([], pa.int64()),
                "cell_y": pa.array([], pa.int64()),
                "n_visits": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        uid = g[user_col].to_numpy().astype(np.int64)
        eid = g[id_col].to_numpy().astype(np.int64)
        t = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        cx = g["cx"].to_numpy().astype(np.int64)
        cy = g["cy"].to_numpy().astype(np.int64)
        o = np.lexsort((eid, t, uid))
        uid, cx, cy = uid[o], cx[o], cy[o]
        same = uid[1:] == uid[:-1]
        ax, ay = cx[:-1][same], cy[:-1][same]
        bx, by = cx[1:][same], cy[1:][same]
        if len(ax) == 0:
            return empty
        n = np.maximum(np.abs(bx - ax), np.abs(by - ay))
        rep = n + 1
        idx = np.repeat(np.arange(len(ax), dtype=np.int64), rep)
        k = np.arange(int(rep.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(rep) - rep, rep
        )
        nn = n[idx]
        safe = np.maximum(nn, 1)
        xs = np.where(nn == 0, ax[idx], (ax[idx] * (nn - k) + bx[idx] * k) // safe)
        ys = np.where(nn == 0, ay[idx], (ay[idx] * (nn - k) + by[idx] * k) // safe)
        ok = (xs >= 0) & (xs < nx) & (ys >= 0) & (ys < ny)
        cnt = np.bincount(ys[ok] * nx + xs[ok], minlength=nx * ny)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "cell_x": pa.array(nz % nx),
                "cell_y": pa.array(nz // nx),
                "n_visits": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    parts = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_tc")
        .map_groups(visits, batch_format="pandas")
        .take_all()  # bounded: <= n_shards x nx*ny partial rows
    )
    grid = np.zeros(nx * ny, dtype=np.int64)
    for row in parts:
        grid[int(row["cell_y"]) * nx + int(row["cell_x"])] += int(row["n_visits"])
    nz = np.nonzero(grid)[0]
    out = pa.table(
        {
            "cell_x": pa.array(nz % nx),
            "cell_y": pa.array(nz // nx),
            "n_visits": pa.array(grid[nz]),
        }
    )
    return rd.from_arrow(out).sort(["cell_x", "cell_y"])


def contiguity_pairs(
    ds: rd.Dataset,
    id_col: str = "admin_id",
    wkb_col: str = "geometry_wkb",
    n_shards: int = 64,
) -> rd.Dataset:
    """ROOK-contiguity spatial weights (the pysal W / GIS neighbor-list
    builder): two features are neighbors when they share a full boundary
    edge.  Each batch parses its WKB polygons, explodes boundary edges
    with CANONICAL endpoints (lexicographically-ordered scaled-integer
    vertex pairs — dyadic coordinates make the scaling exact), and the
    edges co-shuffle on an edge-key hash; each shard lexsorts its edges
    and every exactly-twice edge yields one (admin_a < admin_b) pair.
    Pair multiplicity (features sharing several edges) collapses to a
    ``n_shared_edges`` count via the partial/final aggregate.

    Partitioning assumptions: boundaries form a MANIFOLD tessellation —
    an edge belongs to at most two features (non-manifold edges are
    ignored); shared edges match exactly (mesh-style tessellations like
    admin hierarchies; partial-overlap boundaries need a segment-split
    pass first).  Shuffle payload is one row per polygon edge; output
    is adjacency-cardinality."""
    from geoglue_ray.geom import PolygonSet
    from geoglue_ray.stages.zonal import zonal_aggregate

    _empty = {
        "_ct": pa.int64(),
        "ax": pa.int64(),
        "ay": pa.int64(),
        "bx": pa.int64(),
        "by": pa.int64(),
        "fid": pa.int64(),
    }

    def edges(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({k: pa.array([], t) for k, t in _empty.items()})
        ps = PolygonSet.from_wkb(
            [w.as_py() for w in b[wkb_col]]
        )
        ids = b[id_col].to_numpy().astype(np.int64)
        x = np.rint(ps.xy[:, 0] * XSCALE).astype(np.int64)
        y = np.rint(ps.xy[:, 1] * YSCALE).astype(np.int64)
        V = len(x)
        mask = np.ones(V, dtype=bool)
        mask[ps.ring_off[1:] - 1] = False  # a ring's closing vertex starts no edge
        i1 = np.flatnonzero(mask)
        ring_idx = np.searchsorted(ps.ring_off[1:], i1, side="right")
        fid = ids[ps.poly_of_ring[ring_idx]]
        px, py, qx, qy = x[i1], y[i1], x[i1 + 1], y[i1 + 1]
        lt = (px < qx) | ((px == qx) & (py < qy))
        ax = np.where(lt, px, qx)
        ay = np.where(lt, py, qy)
        bx = np.where(lt, qx, px)
        by = np.where(lt, qy, py)
        M = np.uint64(0x9E3779B185EBCA87)
        k = ax.astype(np.uint64)
        for part in (ay, bx, by):
            k = (k * M) + part.astype(np.uint64)
        shard = (k % np.uint64(n_shards)).astype(np.int64)
        return pa.table(
            {
                "_ct": pa.array(shard),
                "ax": pa.array(ax),
                "ay": pa.array(ay),
                "bx": pa.array(bx),
                "by": pa.array(by),
                "fid": pa.array(fid),
            }
        )

    def pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "admin_a": pa.array([], pa.int64()),
                "admin_b": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        cols = [g[c].to_numpy().astype(np.int64) for c in ("ax", "ay", "bx", "by")]
        fid = g["fid"].to_numpy().astype(np.int64)
        o = np.lexsort((fid, cols[3], cols[2], cols[1], cols[0]))
        s = [c[o] for c in cols]
        fid = fid[o]
        new = np.zeros(len(fid), dtype=bool)
        new[0] = True
        for c in s:
            new |= np.r_[True, c[1:] != c[:-1]]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, len(fid)])
        two = starts[lens == 2]  # manifold interior edges only
        if len(two) == 0:
            return empty
        return pa.table(
            {
                "admin_a": pa.array(fid[two]),  # run is fid-sorted: a < b
                "admin_b": pa.array(fid[two + 1]),
            }
        )

    edge_ds = ds.map_batches(edges, batch_format="pyarrow")
    pair_ds = edge_ds.groupby("_ct").map_groups(pairs, batch_format="pandas")
    out = zonal_aggregate(
        pair_ds, ["count"], keys=["admin_a", "admin_b"], value_col="admin_a"
    ).map_batches(
        lambda t: t.rename_columns(["admin_a", "admin_b", "n_shared_edges"]),
        batch_format="pyarrow",
    )
    return out.sort(["admin_a", "admin_b"])


def dtw_to_reference(
    ds: rd.Dataset,
    ref: np.ndarray,
    key_col: str = "user_id",
    time_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    seq_n: int = 16,
    n_shards: int = 32,
    big: int = 1 << 60,
) -> rd.Dataset:
    """Asymmetric dynamic-time-warping distance from every key's value
    SEQUENCE to one broadcast reference pattern — the sequence-alignment
    operator (pattern matching against a canonical trajectory / load
    profile).  Step pattern (i-1,j) | (i-1,j-1) (Sakoe-Chiba asymmetric,
    P=0): every query element is consumed exactly once, so row i of the
    DP table depends ONLY on row i-1 — the recurrence unrolls into
    ``seq_n`` chained vectorized passes here and ``seq_n`` chained CTEs
    in the SQL twin (the pagerank unrolled-fixed-point precedent), no
    within-row dependency, bit-exact in pure int64.

    Values quantize to cents (round-to-nearest == DuckDB CAST, the
    events_benford identity); cost is |qv - ref_j|; unreachable cells
    carry the ``big`` sentinel and accumulate identically on both sides
    (never clamped), staying far under int64 with any sane cost scale.

    Scale shape: rows ship once to a fixed key-hash shard; each shard
    task recovers every key's first ``seq_n`` elements in ONE
    lexsort+run pass (keys with fewer drop, documented), stacks them
    (k x seq_n) and runs the DP vectorized across all keys at once —
    per-key Python cost is zero.  The reference is a tiny literal; keys
    never co-shuffle with anything else."""
    ref = np.asarray(ref, dtype=np.int64)
    m = len(ref)

    def prep(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy().astype(np.int64)
        qv = np.round(b[value_col].to_numpy() * 100.0).astype(np.int64)
        sh = (
            (k.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_sh": pa.array(sh),
                "k": pa.array(k),
                "t": pa.array(b[time_col].to_numpy().astype("datetime64[us]").astype(np.int64)),
                "tb": pa.array(b[tiebreak_col].to_numpy().astype(np.int64)),
                "qv": pa.array(qv),
            }
        )

    def dp(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {key_col: pa.array([], pa.int64()), "dtw": pa.array([], pa.int64())}
        )
        if len(g) == 0:
            return empty
        k = g["k"].to_numpy().astype(np.int64)
        t = g["t"].to_numpy().astype(np.int64)
        tb = g["tb"].to_numpy().astype(np.int64)
        qv = g["qv"].to_numpy().astype(np.int64)
        o = np.lexsort((tb, t, k))
        k, qv = k[o], qv[o]
        first = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(first)
        lens = np.diff(np.r_[starts, len(k)])
        grp = np.cumsum(first) - 1
        rank = np.arange(len(k)) - starts[grp]
        keep = (lens[grp] >= seq_n) & (rank < seq_n)
        kk = k[keep]
        if len(kk) == 0:
            return empty
        V = qv[keep].reshape(-1, seq_n)  # row-major: rank runs fastest
        keys = kk[::seq_n]
        cost0 = np.abs(V[:, 0:1] - ref[None, :])
        d = np.full((len(keys), m), big, dtype=np.int64)
        d[:, 0] = cost0[:, 0]
        for i in range(1, seq_n):
            shifted = np.concatenate(
                [np.full((len(keys), 1), big, dtype=np.int64), d[:, :-1]], axis=1
            )
            d = np.abs(V[:, i : i + 1] - ref[None, :]) + np.minimum(d, shifted)
        return pa.table(
            {key_col: pa.array(keys), "dtw": pa.array(d[:, m - 1])}
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(dp, batch_format="pandas")
    )
