"""Spatial-join stages: GGrid cell encode + stateful polygon-index refine.

The engine's equivalent of the reference's raster-cell x polygon join inside
``exactextract`` (``zonalstats.py:44-62``), re-expressed Ray-Data-first per
the north_star:

1. ``encode_cells`` — stateless ``map_batches``: (lon, lat) -> GGrid cell id
   (H3-substitute), pure numpy, zero-copy Arrow in/out.
2. ``SpatialJoiner`` — **actor-pool** ``map_batches`` class: ``__init__``
   fetches the broadcast :class:`AdminIndex` (one ``ray.get`` per actor,
   never per batch) and ``__call__`` does candidate lookup -> vectorized
   point-in-polygon -> kNN nearest-centroid fallback, appending
   ``admin_id`` / ``admin1_id`` / ``via_knn``.

Use :func:`spatial_join` to wire both onto a Dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from geoglue_ray import cells as gcells
from geoglue_ray.sources.admin import AdminIndex

DEFAULT_CELL_RES = 11


CELL_COL = "gg_cell"  # namespaced: never collides with user cell-id columns


def encode_cells(batch: pa.Table, res: int = DEFAULT_CELL_RES) -> pa.Table:
    cell = gcells.encode(batch["lon"].to_numpy(), batch["lat"].to_numpy(), res)
    return batch.append_column(CELL_COL, pa.array(cell))


class SpatialJoiner:
    """Actor-pool stage holding the pickled polygon index (ST1/J1 analogue).

    ``index_ref`` is an ``ray.ObjectRef`` from ``ray.put(AdminIndex)`` (or a
    plain AdminIndex in unit tests).  State is resolved once per actor.
    With ``weights_ref`` (broadcast dense weight grid) the stage also
    appends the per-point ``weight`` column — one actor pool instead of
    two keeps plan overhead down and the batch in cache.
    """

    def __init__(self, index_ref, weights_ref=None, emit_names: bool = True):
        self.index: AdminIndex = (
            ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        )
        self.weights = (
            ray.get(weights_ref)
            if isinstance(weights_ref, ray.ObjectRef)
            else weights_ref
        )
        self.emit_names = emit_names
        # dictionary-encoded name columns: build the string pools once
        self._admin_pool = pa.array(self.index.admin_id, type=pa.string())
        self._admin1_pool = pa.array(self.index.admin1_id, type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        cell = None
        if CELL_COL in batch.column_names and len(batch):
            c = batch[CELL_COL].to_numpy(zero_copy_only=False)
            # our own namespaced column; still verify the encoded resolution
            if c.dtype.kind == "i" and int(gcells.res_of(c[0])) == self.index.res:
                cell = c
        feat, via_knn = self.index.assign(lon, lat, cell=cell)
        out = batch.append_column("admin_idx", pa.array(feat.astype(np.int32)))
        if self.emit_names:
            idx = pa.array(feat, type=pa.int64())
            out = out.append_column("admin_id", self._admin_pool.take(idx))
            out = out.append_column("admin1_id", self._admin1_pool.take(idx))
        out = out.append_column("via_knn", pa.array(via_knn))
        if self.weights is not None:
            from geoglue_ray.sources.weights import lookup_weight

            out = out.append_column(
                "weight", pa.array(lookup_weight(lon, lat, self.weights))
            )
        return out


def radius_nn_join(
    ds,
    radius: float = 0.0625,
    id_col: str = "event_id",
    n_shards: int = 64,
):
    """Bounded-radius nearest-neighbour self-join over a point table:
    for every point, the nearest OTHER point within ``radius`` (planar
    Euclidean; ties broken by smallest neighbour id), NULL when none —
    the point x point face of the spatial-join family (the reference
    joins points to polygons; this joins observations to observations,
    e.g. duplicate-sensor detection, co-located report matching).

    Distribution: grid-bucket at cell size == ``radius``, so a point's
    nearest in-radius neighbour provably lies in its 3x3 cell ring.  Own
    rows ship once, candidate copies ship to the 9 ring cells (bounded
    9x fan-out of the point table); buckets co-shuffle on ``hash(cell) %
    n_shards`` (FIXED group count) and each shard resolves many cells in
    one pass — per cell a vectorized (own x candidate) distance block
    with candidates pre-sorted by id so ``argmin`` ties resolve to the
    smallest id.  Mega-cell skew (the city-cluster callout): per-cell
    cost is |own|x|cand|; ``radius`` IS the cell size, so choosing it
    small splits hot clusters structurally — the documented knob, same
    family as embed_neardup's second-level bucket split.

    Exactness: dyadic coordinates make dx/dy exact; ``d2 = dx*dx +
    dy*dy`` and ``sqrt`` are the resample_idw chain; the radius is a
    power of two so ``d2 <= r*r`` is an exact comparison — the SQL
    self-join twin reproduces every row bit-for-bit.
    """
    import pandas as pd
    import ray.data as rd  # noqa: F401  (ds is already a Dataset)

    r2 = radius * radius
    inv = 1.0 / radius  # radius is a power of two: exact

    def prep(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        cx = np.floor(lon * inv).astype(np.int64)
        cy = np.floor(lat * inv).astype(np.int64)
        n = len(ids)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                own = dx == 0 and dy == 0
                cell = (cx + dx) * np.int64(1 << 21) + (cy + dy)
                t = pa.table(
                    {
                        "_cell": pa.array(cell),
                        id_col: pa.array(ids),
                        "lon": pa.array(lon),
                        "lat": pa.array(lat),
                        "_own": pa.array(np.full(n, own)),
                    }
                )
                parts.append(t)
        out = pa.concat_tables(parts)
        # uint64 wraparound keeps the shard non-negative for negative cells
        shard = (
            (out["_cell"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return out.append_column("_s", pa.array(shard))

    def resolve(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "nn_id": pa.array([], pa.int64()),
                "nn_dist": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        cell = g["_cell"].to_numpy().astype(np.int64)
        ids = g[id_col].to_numpy().astype(np.int64)
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        own = g["_own"].to_numpy().astype(bool)
        # candidates sorted by (cell, id): argmin picks smallest id on ties
        o = np.lexsort((ids, cell))
        cell, ids, lon, lat, own = cell[o], ids[o], lon[o], lat[o], own[o]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        out_id, out_nn, out_d = [], [], []
        CHUNK = 1024  # own-side rows per distance block: caps a hot
        # mega-cell's |own| x |cand| matrix at CHUNK x |cand| floats
        for s, e in zip(starts, ends):
            osel = own[s:e]
            if not osel.any():
                continue
            oi_all = ids[s:e][osel]
            olon_all, olat_all = lon[s:e][osel], lat[s:e][osel]
            for c0 in range(0, len(oi_all), CHUNK):
                oi = oi_all[c0 : c0 + CHUNK]
                olon = olon_all[c0 : c0 + CHUNK]
                olat = olat_all[c0 : c0 + CHUNK]
                dxm = olon[:, None] - lon[s:e][None, :]
                dym = olat[:, None] - lat[s:e][None, :]
                d2 = dxm * dxm + dym * dym
                bad = (d2 > r2) | (oi[:, None] == ids[s:e][None, :])
                d2 = np.where(bad, np.inf, d2)
                j = np.argmin(d2, axis=1)
                dmin = d2[np.arange(len(oi)), j]
                hit = np.isfinite(dmin)
                out_id.append(oi)
                out_nn.append(np.where(hit, ids[s:e][j], -1))
                out_d.append(np.where(hit, np.sqrt(dmin), np.nan))
        if not out_id:
            return empty
        oi = np.concatenate(out_id)
        nn = np.concatenate(out_nn)
        d = np.concatenate(out_d)
        return pa.table(
            {
                id_col: pa.array(oi),
                "nn_id": pa.array(
                    np.where(nn >= 0, nn, 0), mask=(nn < 0), type=pa.int64()
                ),
                "nn_dist": pa.array(d),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(resolve, batch_format="pandas")
    )


def radius_knn_join(
    ds,
    radius: float = 0.0625,
    k: int = 3,
    id_col: str = "event_id",
    n_shards: int = 64,
):
    """k-nearest-neighbours-within-radius self-join: for every point, its
    up-to-``k`` nearest OTHER points within ``radius`` as (id, rank,
    nn_id, nn_dist) rows ordered by (distance, neighbour id) — the k>1
    generalization of :func:`radius_nn_join` (sensor cross-validation,
    k-NN density / LOF features).  Points with fewer than ``k``
    in-radius neighbours emit fewer rows; isolated points emit none
    (inner semantics — the SQL twin is a plain window-rank filter).

    Same distribution as radius_nn_join: 3x3 ring grid-bucket at cell
    size == radius (a point's k nearest in-radius neighbours all lie in
    the ring), FIXED ``hash(cell) % n_shards`` co-shuffle, vectorized
    per-cell distance blocks.  Rank order: candidates are pre-sorted by
    id, so a STABLE argsort on d2 yields (d2 asc, id asc) — exactly the
    twin's ``row_number() OVER (ORDER BY d2, nb)``.  Exactness: the
    radius_nn_join chain (dyadic coords, exact d2, power-of-two radius,
    correctly-rounded sqrt)."""
    import pandas as pd

    r2 = radius * radius
    inv = 1.0 / radius  # radius is a power of two: exact

    def prep(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        cx = np.floor(lon * inv).astype(np.int64)
        cy = np.floor(lat * inv).astype(np.int64)
        n = len(ids)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                own = dx == 0 and dy == 0
                cell = (cx + dx) * np.int64(1 << 21) + (cy + dy)
                parts.append(
                    pa.table(
                        {
                            "_cell": pa.array(cell),
                            id_col: pa.array(ids),
                            "lon": pa.array(lon),
                            "lat": pa.array(lat),
                            "_own": pa.array(np.full(n, own)),
                        }
                    )
                )
        out = pa.concat_tables(parts)
        shard = (
            (out["_cell"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return out.append_column("_s", pa.array(shard))

    def resolve(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "nn_id": pa.array([], pa.int64()),
                "nn_dist": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        cell = g["_cell"].to_numpy().astype(np.int64)
        ids = g[id_col].to_numpy().astype(np.int64)
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        own = g["_own"].to_numpy().astype(bool)
        o = np.lexsort((ids, cell))
        cell, ids, lon, lat, own = cell[o], ids[o], lon[o], lat[o], own[o]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        out_id, out_rank, out_nn, out_d = [], [], [], []
        CHUNK = 1024
        for s, e in zip(starts, ends):
            osel = own[s:e]
            if not osel.any():
                continue
            cid, clon, clat = ids[s:e], lon[s:e], lat[s:e]
            oi_all = cid[osel]
            olon_all, olat_all = clon[osel], clat[osel]
            kk = min(k, len(cid))
            for c0 in range(0, len(oi_all), CHUNK):
                oi = oi_all[c0 : c0 + CHUNK]
                olon = olon_all[c0 : c0 + CHUNK]
                olat = olat_all[c0 : c0 + CHUNK]
                dxm = olon[:, None] - clon[None, :]
                dym = olat[:, None] - clat[None, :]
                d2 = dxm * dxm + dym * dym
                bad = (d2 > r2) | (oi[:, None] == cid[None, :])
                d2 = np.where(bad, np.inf, d2)
                # stable sort over id-sorted candidates == (d2, id) order
                ordc = np.argsort(d2, axis=1, kind="stable")[:, :kk]
                dsel = np.take_along_axis(d2, ordc, axis=1)
                rows, cols = np.nonzero(np.isfinite(dsel))
                if len(rows) == 0:
                    continue
                out_id.append(oi[rows])
                out_rank.append(cols.astype(np.int64) + 1)  # inf sorts last
                out_nn.append(cid[ordc[rows, cols]])
                out_d.append(np.sqrt(dsel[rows, cols]))
        if not out_id:
            return empty
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "rank": pa.array(np.concatenate(out_rank)),
                "nn_id": pa.array(np.concatenate(out_nn)),
                "nn_dist": pa.array(np.concatenate(out_d)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(resolve, batch_format="pandas")
    )


def radius_edges(
    ds,
    radius: float = 0.0625,
    id_col: str = "event_id",
    n_shards: int = 64,
):
    """Oriented edge list of the in-radius proximity graph: one (a, b)
    row per unordered point pair with ``a < b`` and planar distance
    <= ``radius`` — the graph-construction face of the radius-join
    family.  Same 3x3 ring grid-bucket distribution as
    :func:`radius_nn_join`; each pair is emitted exactly once, from the
    smaller id's own-cell row (the larger id is always inside the
    smaller's ring).  Per-cell cost is |own| x |cand|; ``radius`` is
    the structural skew knob (it IS the cell size)."""
    import pandas as pd

    r2 = radius * radius
    inv = 1.0 / radius

    def prep(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        cx = np.floor(lon * inv).astype(np.int64)
        cy = np.floor(lat * inv).astype(np.int64)
        n = len(ids)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                own = dx == 0 and dy == 0
                cell = (cx + dx) * np.int64(1 << 21) + (cy + dy)
                parts.append(
                    pa.table(
                        {
                            "_cell": pa.array(cell),
                            id_col: pa.array(ids),
                            "lon": pa.array(lon),
                            "lat": pa.array(lat),
                            "_own": pa.array(np.full(n, own)),
                        }
                    )
                )
        out = pa.concat_tables(parts)
        shard = (
            (out["_cell"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return out.append_column("_s", pa.array(shard))

    def resolve(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        if len(g) == 0:
            return empty
        cell = g["_cell"].to_numpy().astype(np.int64)
        ids = g[id_col].to_numpy().astype(np.int64)
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        own = g["_own"].to_numpy().astype(bool)
        o = np.lexsort((ids, cell))
        cell, ids, lon, lat, own = cell[o], ids[o], lon[o], lat[o], own[o]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        out_a, out_b = [], []
        CHUNK = 1024
        for s, e in zip(starts, ends):
            osel = own[s:e]
            if not osel.any():
                continue
            cid, clon, clat = ids[s:e], lon[s:e], lat[s:e]
            oi_all = cid[osel]
            olon_all, olat_all = clon[osel], clat[osel]
            for c0 in range(0, len(oi_all), CHUNK):
                oi = oi_all[c0 : c0 + CHUNK]
                olon = olon_all[c0 : c0 + CHUNK]
                olat = olat_all[c0 : c0 + CHUNK]
                dxm = olon[:, None] - clon[None, :]
                dym = olat[:, None] - clat[None, :]
                d2 = dxm * dxm + dym * dym
                hit = (d2 <= r2) & (cid[None, :] > oi[:, None])
                rows, cols = np.nonzero(hit)
                if len(rows):
                    out_a.append(oi[rows])
                    out_b.append(cid[cols])
        if not out_a:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(resolve, batch_format="pandas")
    )


def triangle_stats(
    ds,
    radius: float = 0.0625,
    id_col: str = "event_id",
    n_shards: int = 64,
):
    """Per-node triangle count, degree and local clustering coefficient
    over the in-radius proximity graph — the classic distributed
    node-iterator triangle enumeration (wedge generation at the
    smallest endpoint + one co-shuffled closure join against the edge
    set), composed from engine primitives: :func:`radius_edges`, the
    fixed-shard partial/final count idiom, and two
    ``hash_equijoin(how='left')`` attaches back onto the full point
    table.

    Each triangle (u < v < w) is found exactly once: the wedge (v, w)
    is generated at pivot u and closed iff edge (v, w) exists.  Wedge
    cost at a pivot is C(deg, 2) — mega-hub mitigation is the standard
    degree-ordered orientation (orient edges toward higher degree),
    documented as the scale path; here edges orient by id and
    ``radius`` structurally bounds degree.  ``clustering`` =
    ``2*n_tri / (degree*(degree-1))`` — a single division of exact
    int64 quantities (NULL below degree 2), so the SQL twin mirrors
    bit-for-bit.

    Relationship to ``stages/graph.triangle_counts``: that variant adds
    degree-ordered orientation and a broadcast-edge-set fast mode but
    returns a driver-resident node table — right for BOUNDED node sets
    (parts, admin units), wrong here where nodes are corpus-scale; this
    one keeps counts distributed end to end."""
    from geoglue_ray.functions.texthash import int_hash64

    P = np.uint64(n_shards)
    PACK = np.int64(1) << np.int64(32)  # ids < 2^31: exact packed (v, w) key

    # edge list is consumed three times (degree, wedges, closure):
    # materialize once (CLAUDE.md round-3 rule)
    edges = radius_edges(ds, radius=radius, id_col=id_col, n_shards=n_shards)
    edges = edges.materialize()

    # -- degree: both endpoints, pre-counted per batch, fixed-shard final
    def deg_partial(b: pa.Table) -> pa.Table:
        both = np.concatenate(
            [b["a"].to_numpy().astype(np.int64), b["b"].to_numpy().astype(np.int64)]
        )
        u, c = np.unique(both, return_counts=True)
        return pa.table({id_col: pa.array(u), "n": pa.array(c)})

    deg_partials = edges.map_batches(deg_partial, batch_format="pyarrow")

    # -- wedges at the smallest endpoint: group edges by a, enumerate
    #    neighbour pairs (v < w) vectorized across runs
    def tag_pivot(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy().astype(np.int64)
        return b.append_column("_s", pa.array((int_hash64(a) % P).astype(np.int64)))

    def gen_wedges(g) -> pa.Table:
        empty = pa.table(
            {
                "_t": pa.array([], pa.int8()),
                "u": pa.array([], pa.int64()),
                "pk": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        a = g["a"].to_numpy().astype(np.int64)
        b = g["b"].to_numpy().astype(np.int64)
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        first = np.r_[True, a[1:] != a[:-1]]
        starts = np.flatnonzero(first)
        counts = np.diff(np.r_[starts, len(a)])
        run = np.cumsum(first) - 1
        pos = np.arange(len(a), dtype=np.int64) - starts[run]  # rank in run
        # every (v, w) pair within a run, v before w: for each element at
        # rank p emit it as w against the p elements before it
        n_pairs = pos  # element contributes `pos` pairs as the w side
        tot = int(n_pairs.sum())
        if tot == 0:
            return empty
        w_idx = np.repeat(np.arange(len(a), dtype=np.int64), n_pairs)
        # offset within each element's emitted block = 0..pos-1
        off = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(n_pairs) - n_pairs, n_pairs
        )
        v_idx = starts[run[w_idx]] + off
        u = a[w_idx]
        v = b[v_idx]
        w = b[w_idx]
        return pa.table(
            {
                "_t": pa.array(np.zeros(tot, dtype=np.int8)),
                "u": pa.array(u),
                "pk": pa.array(v * PACK + w),
            }
        )

    wedges = (
        edges.map_batches(tag_pivot, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(gen_wedges, batch_format="pandas")
    )

    # -- closure: co-shuffle wedges with the edge set on the packed
    #    (v, w) key; matched wedges attribute the triangle to u, v, w
    def tag_edge_keys(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy().astype(np.int64)
        bb = b["b"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "_t": pa.array(np.ones(len(a), dtype=np.int8)),
                "u": pa.array(np.zeros(len(a), dtype=np.int64)),
                "pk": pa.array(a * PACK + bb),
            }
        )

    def shard_pk(b: pa.Table) -> pa.Table:
        pk = b["pk"].to_numpy().astype(np.int64)
        return b.append_column("_s", pa.array((int_hash64(pk) % P).astype(np.int64)))

    tagged = wedges.union(edges.map_batches(tag_edge_keys, batch_format="pyarrow"))

    def close_tri(g) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        if len(g) == 0:
            return empty
        t = g["_t"].to_numpy().astype(np.int8)
        pk = g["pk"].to_numpy().astype(np.int64)
        u = g["u"].to_numpy().astype(np.int64)
        epk = np.sort(pk[t == 1])
        wsel = t == 0
        wpk, wu = pk[wsel], u[wsel]
        pos = np.searchsorted(epk, wpk)
        pos_c = np.minimum(pos, max(len(epk) - 1, 0))
        hit = (len(epk) > 0) & (epk[pos_c] == wpk) if len(epk) else np.zeros(len(wpk), bool)
        if not np.any(hit):
            return empty
        tu = wu[hit]
        tv = (wpk[hit] // PACK).astype(np.int64)
        tw = (wpk[hit] % PACK).astype(np.int64)
        nodes = np.concatenate([tu, tv, tw])
        uq, c = np.unique(nodes, return_counts=True)
        return pa.table({id_col: pa.array(uq), "n": pa.array(c)})

    tri_partials = (
        tagged.map_batches(shard_pk, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(close_tri, batch_format="pandas")
    )

    # -- ONE tagged co-shuffle finishes everything: the full point set
    #    (_k=2, defines the universe — isolated points keep degree 0 /
    #    n_tri 0 / NULL clustering), degree partials (_k=0) and triangle
    #    partials (_k=1) merge per id-hash shard in a single vectorized
    #    pass (was: two _keyed_count_sum shuffles + two hash_equijoin
    #    shuffles — four sort constants for bookkeeping; measured 23.7 s
    #    -> this shape at sf0.01/8 CPUs)
    def tag(k: int):
        def f(b: pa.Table) -> pa.Table:
            ids = b[id_col].to_numpy().astype(np.int64)
            n = (
                b["n"].to_numpy().astype(np.int64)
                if "n" in b.column_names
                else np.zeros(len(ids), dtype=np.int64)
            )
            return pa.table(
                {
                    id_col: pa.array(ids),
                    "n": pa.array(n),
                    "_k": pa.array(np.full(len(ids), k, dtype=np.int8)),
                    "_s": pa.array((int_hash64(ids) % P).astype(np.int64)),
                }
            )

        return f

    merged = (
        ds.select_columns([id_col])
        .map_batches(tag(2), batch_format="pyarrow")
        .union(deg_partials.map_batches(tag(0), batch_format="pyarrow"))
        .union(tri_partials.map_batches(tag(1), batch_format="pyarrow"))
    )

    def finalize(g) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "degree": pa.array([], pa.int64()),
                "n_tri": pa.array([], pa.int64()),
                "clustering": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        ids = g[id_col].to_numpy().astype(np.int64)
        n = g["n"].to_numpy().astype(np.int64)
        k = g["_k"].to_numpy().astype(np.int8)
        uni = np.unique(ids[k == 2])
        if len(uni) == 0:
            return empty
        deg = np.zeros(len(uni), dtype=np.int64)
        tri = np.zeros(len(uni), dtype=np.int64)
        dsel = k == 0
        np.add.at(deg, np.searchsorted(uni, ids[dsel]), n[dsel])
        tsel = k == 1
        np.add.at(tri, np.searchsorted(uni, ids[tsel]), n[tsel])
        cl = np.where(
            deg >= 2,
            (2 * tri).astype(np.float64)
            / np.maximum(deg * (deg - 1), 1).astype(np.float64),
            np.nan,
        )
        return pa.table(
            {
                id_col: pa.array(uni),
                "degree": pa.array(deg),
                "n_tri": pa.array(tri),
                "clustering": pa.array(cl),
            }
        )

    return merged.groupby("_s").map_groups(finalize, batch_format="pandas")


def radius_nn_lookup(
    queries: rd.Dataset,
    candidates: rd.Dataset,
    radius: float = 0.25,
    q_id: str = "q_id",
    c_id: str = "c_id",
    n_shards: int = 64,
):
    """Bounded-radius nearest-neighbour LOOKUP between two point tables:
    for every query point, the nearest candidate within ``radius``
    (planar Euclidean; ties to the smallest candidate id), NULL when
    isolated — distance-to-nearest-facility / nearest-station
    assignment, the two-table sibling of :func:`radius_nn_join`.

    Same distribution: grid-bucket at cell size == ``radius`` (query
    rows ship once to their own cell; candidate rows ship to the 3x3
    ring, a bounded 9x fan-out of the candidate table only), FIXED
    ``hash(cell) % n_shards`` co-shuffle, vectorized per-cell distance
    blocks with candidates pre-sorted by id.  Exactness: the
    radius_nn_join chain (dyadic coords, d2 = dx*dx + dy*dy, power-of-two
    radius, correctly-rounded sqrt)."""
    import pandas as pd

    r2 = radius * radius
    inv = 1.0 / radius  # radius is a power of two: exact

    def _cells(lon, lat):
        cx = np.floor(lon * inv).astype(np.int64)
        cy = np.floor(lat * inv).astype(np.int64)
        return cx, cy

    def _shard(cell):
        return (
            (cell.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)

    def prep_q(b: pa.Table) -> pa.Table:
        ids = b[q_id].to_numpy()
        lon, lat = b["lon"].to_numpy(), b["lat"].to_numpy()
        cx, cy = _cells(lon, lat)
        cell = cx * np.int64(1 << 21) + cy
        return pa.table(
            {
                "_s": pa.array(_shard(cell)),
                "_cell": pa.array(cell),
                "_id": pa.array(ids.astype(np.int64)),
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "_q": pa.array(np.ones(len(ids), dtype=bool)),
            }
        )

    def prep_c(b: pa.Table) -> pa.Table:
        ids = b[c_id].to_numpy()
        lon, lat = b["lon"].to_numpy(), b["lat"].to_numpy()
        cx, cy = _cells(lon, lat)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cell = (cx + dx) * np.int64(1 << 21) + (cy + dy)
                parts.append(
                    pa.table(
                        {
                            "_s": pa.array(_shard(cell)),
                            "_cell": pa.array(cell),
                            "_id": pa.array(ids.astype(np.int64)),
                            "lon": pa.array(lon),
                            "lat": pa.array(lat),
                            "_q": pa.array(np.zeros(len(ids), dtype=bool)),
                        }
                    )
                )
        return pa.concat_tables(parts)

    def resolve(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                q_id: pa.array([], pa.int64()),
                "nn_id": pa.array([], pa.int64()),
                "nn_dist": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        cell = g["_cell"].to_numpy().astype(np.int64)
        ids = g["_id"].to_numpy().astype(np.int64)
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        isq = g["_q"].to_numpy().astype(bool)
        o = np.lexsort((ids, cell))
        cell, ids, lon, lat, isq = cell[o], ids[o], lon[o], lat[o], isq[o]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        out_id, out_nn, out_d = [], [], []
        CHUNK = 1024
        for s, e in zip(starts, ends):
            qs = isq[s:e]
            if not qs.any():
                continue
            cs = ~qs
            qi_all = ids[s:e][qs]
            qlon_all, qlat_all = lon[s:e][qs], lat[s:e][qs]
            if not cs.any():
                out_id.append(qi_all)
                out_nn.append(np.full(len(qi_all), -1, dtype=np.int64))
                out_d.append(np.full(len(qi_all), np.nan))
                continue
            ci = ids[s:e][cs]
            clon, clat = lon[s:e][cs], lat[s:e][cs]
            for c0 in range(0, len(qi_all), CHUNK):
                qi = qi_all[c0 : c0 + CHUNK]
                qlon = qlon_all[c0 : c0 + CHUNK]
                qlat = qlat_all[c0 : c0 + CHUNK]
                dxm = qlon[:, None] - clon[None, :]
                dym = qlat[:, None] - clat[None, :]
                d2 = dxm * dxm + dym * dym
                d2 = np.where(d2 > r2, np.inf, d2)
                j = np.argmin(d2, axis=1)
                dmin = d2[np.arange(len(qi)), j]
                hit = np.isfinite(dmin)
                out_id.append(qi)
                out_nn.append(np.where(hit, ci[j], -1))
                out_d.append(np.where(hit, np.sqrt(dmin), np.nan))
        if not out_id:
            return empty
        qi = np.concatenate(out_id)
        nn = np.concatenate(out_nn)
        d = np.concatenate(out_d)
        return pa.table(
            {
                q_id: pa.array(qi),
                "nn_id": pa.array(
                    np.where(nn >= 0, nn, 0), mask=(nn < 0), type=pa.int64()
                ),
                "nn_dist": pa.array(d),
            }
        )

    both = queries.map_batches(prep_q, batch_format="pyarrow").union(
        candidates.map_batches(prep_c, batch_format="pyarrow")
    )
    return both.groupby("_s").map_groups(resolve, batch_format="pandas")


def _minid_labels(node_ids: np.ndarray, ea: np.ndarray, eb: np.ndarray):
    """Union-find (path halving) -> min-id component label per node.
    ``node_ids`` need not be sorted; edges reference ids in the set."""
    order = np.argsort(node_ids)
    nodes = node_ids[order]  # sorted: smaller index == smaller id
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for x, y in zip(
        np.searchsorted(nodes, ea), np.searchsorted(nodes, eb)
    ):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            if rx < ry:
                parent[ry] = rx  # root stays the smallest index = smallest id
            else:
                parent[rx] = ry
    lab = nodes[[find(i) for i in range(len(nodes))]]
    return nodes, lab


def spatial_components(
    cores: rd.Dataset,
    edges: rd.Dataset,
    id_col: str,
    n_shards: int = 64,
    levels: int = 1,
    super_shift: int = 3,
) -> rd.Dataset:
    """Connected components of a SPATIAL proximity graph -> ``(doc_id,
    cluster_id)`` with min-id labels, in O(1) propagation rounds — the
    scale path for percolated components whose graph diameter makes
    plain min-label propagation (rounds ~ diameter,
    stages/dedup.duplicate_clusters) unusable: a 10-degree-wide
    percolated region at eps = 1/16 has diameter ~160.

    Tile contraction: nodes and INTRA-tile edges co-shuffle on
    ``hash(tile)`` (``cores`` carries a ``tile`` column; ``edges`` carry
    ``ta``/``tb``); each task solves its tiles exactly with union-find
    (one O(E a) pass, no rounds).  CROSS-tile edges are rewritten to
    their endpoints' local labels via two co-shuffled hash equijoins;
    the resulting QUOTIENT graph is tile-boundary-cardinality (not
    point-cardinality) and is finished in one driver step, then the
    root relabeling broadcasts back through the mapping.  Partitioning
    assumption (documented per the custom-operator rule): the deduped
    quotient edge set fits one task — it scales with the number of
    adjacent-tile component pairs, not with points.

    ``levels=2`` is the planet-scale path: before the driver step the
    quotient graph itself is contracted once more on ``2**super_shift``
    x coarser SUPER-tiles (a level-1 root's home tile rides along on
    every quotient edge, since a tile-local component lives in exactly
    one tile).  Intra-super quotient edges co-shuffle on
    ``hash(super)`` and solve by union-find exactly as level 1; only
    the cross-SUPER quotient — boundary length another ``2**
    super_shift`` shorter — reaches the driver.  The final labels
    compose DISTRIBUTED: point-cardinality ``mapping`` left-joins the
    boundary-cardinality level-2 mapping (never a point-scale
    broadcast), then the tiny level-2 root map broadcasts.  Output is
    identical to ``levels=1`` (labels are min node ids either way —
    tested)."""
    import pandas as pd

    from geoglue_ray.stages.join import hash_equijoin

    def tag_nodes(b: pa.Table) -> pa.Table:
        t = b["tile"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "_ts": pa.array(
                    (
                        (t.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
                        % np.uint64(n_shards)
                    ).astype(np.int64)
                ),
                "a": b[id_col],
                "b": pa.array(np.full(len(b), -1, dtype=np.int64)),
            }
        )

    def tag_intra(b: pa.Table) -> pa.Table:
        ta = b["ta"].to_numpy().astype(np.int64)
        same = ta == b["tb"].to_numpy().astype(np.int64)
        b = b.filter(pa.array(same))
        ta = ta[same]
        return pa.table(
            {
                "_ts": pa.array(
                    (
                        (ta.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
                        % np.uint64(n_shards)
                    ).astype(np.int64)
                ),
                "a": b["doc_a"],
                "b": b["doc_b"],
            }
        )

    def local(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "r": pa.array([], pa.int64())}
        )
        if len(g) == 0:
            return empty
        a = g["a"].to_numpy().astype(np.int64)
        b = g["b"].to_numpy().astype(np.int64)
        is_node = b == -1
        # unique: level-2 node rows arrive once per quotient-edge
        # endpoint occurrence (level-1 cores are already distinct)
        nodes = np.unique(a[is_node])
        if len(nodes) == 0:
            return empty
        nodes_s, lab = _minid_labels(nodes, a[~is_node], b[~is_node])
        return pa.table({"node": pa.array(nodes_s), "r": pa.array(lab)})

    mapping = (
        cores.map_batches(tag_nodes, batch_format="pyarrow")
        .union(edges.map_batches(tag_intra, batch_format="pyarrow"))
        .groupby("_ts")
        .map_groups(local, batch_format="pandas")
        .materialize()  # consumed by two joins + the final relabel
    )

    def only_cross(b: pa.Table) -> pa.Table:
        keep = b["ta"].to_numpy().astype(np.int64) != b["tb"].to_numpy().astype(
            np.int64
        )
        # ta/tb ride along: a level-1 root's home tile (its component
        # lives in exactly one tile) keys the level-2 super contraction
        return b.filter(pa.array(keep)).select(["doc_a", "doc_b", "ta", "tb"])

    cross = edges.map_batches(only_cross, batch_format="pyarrow")
    j1 = hash_equijoin(
        cross,
        mapping.map_batches(
            lambda b: pa.table({"na": b["node"], "ra": b["r"]}),
            batch_format="pyarrow",
        ),
        "doc_a",
        "na",
        left_schema=pa.schema(
            [(c, pa.int64()) for c in ("doc_a", "doc_b", "ta", "tb")]
        ),
        right_schema=pa.schema([("na", pa.int64()), ("ra", pa.int64())]),
    ).map_batches(
        # explicit typed projection: select_columns' Project is not
        # reflected by Dataset.schema() here, and the downstream join
        # captures its left column list from that schema
        lambda b: pa.table(
            {"ra": b["ra"], "doc_b": b["doc_b"], "ta": b["ta"], "tb": b["tb"]}
        ),
        batch_format="pyarrow",
    )
    j2 = hash_equijoin(
        j1,
        mapping.map_batches(
            lambda b: pa.table({"nb": b["node"], "rb": b["r"]}),
            batch_format="pyarrow",
        ),
        "doc_b",
        "nb",
        left_schema=pa.schema(
            [(c, pa.int64()) for c in ("ra", "doc_b", "ta", "tb")]
        ),
        right_schema=pa.schema([("nb", pa.int64()), ("rb", pa.int64())]),
    )

    def q_dedup(b: pa.Table) -> pa.Table:
        ra = b["ra"].to_numpy().astype(np.int64)
        rb = b["rb"].to_numpy().astype(np.int64)
        ta = b["ta"].to_numpy().astype(np.int64)
        tb = b["tb"].to_numpy().astype(np.int64)
        swap = rb < ra
        lo = np.where(swap, rb, ra)
        hi = np.where(swap, ra, rb)
        tlo = np.where(swap, tb, ta)
        thi = np.where(swap, ta, tb)
        key = lo * np.int64(1 << 40) + hi
        uk, ui = np.unique(key, return_index=True)
        return pa.table(
            {
                "ra": pa.array(uk >> np.int64(40)),
                "rb": pa.array(uk & np.int64((1 << 40) - 1)),
                "ta": pa.array(tlo[ui]),
                "tb": pa.array(thi[ui]),
            }
        )

    def _drive_roots(qa: np.ndarray, qb: np.ndarray) -> dict[int, int]:
        if len(qa) == 0:
            return {}
        roots = np.unique(np.concatenate([qa, qb]))
        rs, rl = _minid_labels(roots, qa, qb)
        return {int(k): int(v) for k, v in zip(rs, rl) if k != v}

    qds = j2.map_batches(q_dedup, batch_format="pyarrow")

    if levels < 2:
        # quotient: tile-boundary-component cardinality — one driver step
        q = qds.take_all()
        rmap = _drive_roots(
            np.array([r["ra"] for r in q], dtype=np.int64),
            np.array([r["rb"] for r in q], dtype=np.int64),
        )
        rmap_ref = ray.put(rmap)

        def relabel(b: pa.Table, *, ref=rmap_ref) -> pa.Table:
            m = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            r = b["r"].to_numpy().astype(np.int64)
            if m:
                out = np.array([m.get(int(x), int(x)) for x in r], dtype=np.int64)
            else:
                out = r
            return pa.table({"doc_id": b["node"], "cluster_id": pa.array(out)})

        return mapping.map_batches(relabel, batch_format="pyarrow")

    # ---- level 2: contract the quotient on 2**super_shift coarser
    # super-tiles.  Supers need not be spatially coherent for
    # correctness (any deterministic partition of roots works — only
    # the residual boundary length depends on coherence).
    SHIFT = np.int64(super_shift)
    P = np.int64(1 << 21)
    GOLD = np.uint64(0x9E3779B185EBCA87)

    def _super(t: np.ndarray) -> np.ndarray:
        tx, ty = np.divmod(t, P)  # tile packing: tx * 2^21 + ty
        return (tx >> SHIFT) * P + (ty >> SHIFT)

    def _ts_of(sup: np.ndarray) -> pa.Array:
        return pa.array(
            ((sup.astype(np.uint64) * GOLD) % np.uint64(n_shards)).astype(np.int64)
        )

    qds = qds.materialize()  # consumed 3x; quotient cardinality, cheap

    def tag_nodes2(b: pa.Table) -> pa.Table:
        ra = b["ra"].to_numpy().astype(np.int64)
        rb = b["rb"].to_numpy().astype(np.int64)
        sup = np.concatenate(
            [
                _super(b["ta"].to_numpy().astype(np.int64)),
                _super(b["tb"].to_numpy().astype(np.int64)),
            ]
        )
        node = np.concatenate([ra, rb])
        return pa.table(
            {
                "_ts": _ts_of(sup),
                "a": pa.array(node),
                "b": pa.array(np.full(len(node), -1, dtype=np.int64)),
            }
        )

    def tag_intra2(b: pa.Table) -> pa.Table:
        sa = _super(b["ta"].to_numpy().astype(np.int64))
        sb = _super(b["tb"].to_numpy().astype(np.int64))
        same = sa == sb
        return pa.table(
            {
                "_ts": _ts_of(sa[same]),
                "a": pa.array(b["ra"].to_numpy().astype(np.int64)[same]),
                "b": pa.array(b["rb"].to_numpy().astype(np.int64)[same]),
            }
        )

    mapping2 = (
        qds.map_batches(tag_nodes2, batch_format="pyarrow")
        .union(qds.map_batches(tag_intra2, batch_format="pyarrow"))
        .groupby("_ts")
        .map_groups(local, batch_format="pandas")
        .materialize()  # two cross2 joins + the compose join
    )
    def only_cross2(b: pa.Table) -> pa.Table:
        sa = _super(b["ta"].to_numpy().astype(np.int64))
        sb = _super(b["tb"].to_numpy().astype(np.int64))
        keep = pa.array(sa != sb)
        return pa.table({"ra": b["ra"].filter(keep), "rb": b["rb"].filter(keep)})

    cross2 = qds.map_batches(only_cross2, batch_format="pyarrow")
    ee = pa.schema([("ra", pa.int64()), ("rb", pa.int64())])
    k1 = hash_equijoin(
        cross2,
        mapping2.map_batches(
            lambda b: pa.table({"n2a": b["node"], "r2a": b["r"]}),
            batch_format="pyarrow",
        ),
        "ra",
        "n2a",
        left_schema=ee,
        right_schema=pa.schema([("n2a", pa.int64()), ("r2a", pa.int64())]),
    ).map_batches(
        lambda b: pa.table({"r2a": b["r2a"], "rb": b["rb"]}),
        batch_format="pyarrow",
    )
    k2 = hash_equijoin(
        k1,
        mapping2.map_batches(
            lambda b: pa.table({"n2b": b["node"], "r2b": b["r"]}),
            batch_format="pyarrow",
        ),
        "rb",
        "n2b",
        left_schema=pa.schema([("r2a", pa.int64()), ("rb", pa.int64())]),
        right_schema=pa.schema([("n2b", pa.int64()), ("r2b", pa.int64())]),
    )

    def q_dedup2(b: pa.Table) -> pa.Table:
        x = b["r2a"].to_numpy().astype(np.int64)
        y = b["r2b"].to_numpy().astype(np.int64)
        key = np.unique(
            np.minimum(x, y) * np.int64(1 << 40) + np.maximum(x, y)
        )
        return pa.table(
            {
                "ra": pa.array(key >> np.int64(40)),
                "rb": pa.array(key & np.int64((1 << 40) - 1)),
            }
        )

    # residual quotient: cross-SUPER boundary cardinality — driver step
    q2 = k2.map_batches(q_dedup2, batch_format="pyarrow").take_all()
    rmap2 = _drive_roots(
        np.array([r["ra"] for r in q2], dtype=np.int64),
        np.array([r["rb"] for r in q2], dtype=np.int64),
    )
    rmap2_ref = ray.put(rmap2)

    # compose labels DISTRIBUTED: point-cardinality mapping left-joins
    # the boundary-cardinality level-2 mapping (typed-null fill for
    # roots no cross-tile edge ever touched), then the tiny level-2
    # root map broadcasts.
    lab = hash_equijoin(
        mapping,
        mapping2.map_batches(
            lambda b: pa.table({"m2n": b["node"], "m2r": b["r"]}),
            batch_format="pyarrow",
        ),
        "r",
        "m2n",
        how="left",
        right_schema=pa.schema([("m2n", pa.int64()), ("m2r", pa.int64())]),
    )

    def relabel2(b: pa.Table, *, ref=rmap2_ref) -> pa.Table:
        import pyarrow.compute as pc_

        m = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        r = (
            pc_.coalesce(b["m2r"], b["r"])
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if m:
            mk = np.array(sorted(m), dtype=np.int64)
            mv = np.array([m[int(k)] for k in mk], dtype=np.int64)
            idx = np.minimum(np.searchsorted(mk, r), len(mk) - 1)
            hit = mk[idx] == r
            out = np.where(hit, mv[idx], r)
        else:
            out = r
        return pa.table({"doc_id": b["node"], "cluster_id": pa.array(out)})

    return lab.map_batches(relabel2, batch_format="pyarrow")


def dbscan(
    points: rd.Dataset,
    eps: float = 0.03125,
    min_pts: int = 5,
    id_col: str = "event_id",
    n_shards: int = 64,
    cc_levels: int = 1,
):
    """Grid-bucketed DBSCAN over a point table -> ``(id, role,
    cluster_id)`` with role in {core, border, noise} and ``cluster_id`` =
    the lowest core id of the density-connected component (NULL for
    noise).  Deterministic variant: a point is core when it has >=
    ``min_pts`` OTHER points within ``eps``; border points attach to
    their NEAREST core (ties to the smallest core id) — unlike textbook
    DBSCAN's scan-order-dependent border assignment, every rerun and the
    SQL twin reproduce the same labels.

    Distribution (all bounded, never all-pairs): neighbour COUNTS by the
    radius_nn_join grid-bucket ring co-shuffle; core-core EDGES emitted
    once from the smaller id's own cell; components via
    :func:`spatial_components` (tile-contracted union-find — O(1)
    propagation rounds even for percolated components, whose graph
    diameter makes round-per-hop min-label propagation unusable at
    density x10); border assignment via :func:`radius_nn_lookup` + a
    co-shuffled hash equijoin to the core label table (core-cardinality
    — never broadcast).  The counts table (one row per point) has three
    consumers and is materialized into the object store; at 100 TB
    checkpoint it to parquet instead."""
    import pandas as pd
    import ray.data as rd  # noqa: F401

    from geoglue_ray.stages.join import hash_equijoin

    r2 = eps * eps
    inv = 1.0 / eps  # eps is a power of two: exact

    def _shard(cell):
        return (
            (cell.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)

    def prep(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        cx = np.floor(lon * inv).astype(np.int64)
        cy = np.floor(lat * inv).astype(np.int64)
        n = len(ids)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                own = dx == 0 and dy == 0
                cell = (cx + dx) * np.int64(1 << 21) + (cy + dy)
                parts.append(
                    pa.table(
                        {
                            "_s": pa.array(_shard(cell)),
                            "_cell": pa.array(cell),
                            "_id": pa.array(ids),
                            "lon": pa.array(lon),
                            "lat": pa.array(lat),
                            "_own": pa.array(np.full(n, own)),
                        }
                    )
                )
        return pa.concat_tables(parts)

    CHUNK = 1024

    def _cell_blocks(g: pd.DataFrame):
        cell = g["_cell"].to_numpy().astype(np.int64)
        ids = g["_id"].to_numpy().astype(np.int64)
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        own = g["_own"].to_numpy().astype(bool)
        o = np.lexsort((ids, cell))
        cell, ids, lon, lat, own = cell[o], ids[o], lon[o], lat[o], own[o]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        for s, e in zip(starts, ends):
            yield ids[s:e], lon[s:e], lat[s:e], own[s:e]

    def count_nb(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "lon": pa.array([], pa.float64()),
                "lat": pa.array([], pa.float64()),
                "n_nb": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        oi, olon, olat, on = [], [], [], []
        for ids, lon, lat, own in _cell_blocks(g):
            if not own.any():
                continue
            qi, qlon, qlat = ids[own], lon[own], lat[own]
            for c0 in range(0, len(qi), CHUNK):
                qs = slice(c0, c0 + CHUNK)
                dxm = qlon[qs][:, None] - lon[None, :]
                dym = qlat[qs][:, None] - lat[None, :]
                d2 = dxm * dxm + dym * dym
                hit = (d2 <= r2) & (qi[qs][:, None] != ids[None, :])
                oi.append(qi[qs])
                olon.append(qlon[qs])
                olat.append(qlat[qs])
                on.append(hit.sum(axis=1).astype(np.int64))
        if not oi:  # a group holding only neighbour-replica rows
            return empty
        return pa.table(
            {
                id_col: pa.array(np.concatenate(oi)),
                "lon": pa.array(np.concatenate(olon)),
                "lat": pa.array(np.concatenate(olat)),
                "n_nb": pa.array(np.concatenate(on)),
            }
        )

    TILE_CELLS = 64  # tile side in eps-cells (spatial_components contraction)

    def _tile(lon, lat):
        tx = np.floor(lon * inv).astype(np.int64) // TILE_CELLS
        ty = np.floor(lat * inv).astype(np.int64) // TILE_CELLS
        return tx * np.int64(1 << 21) + ty

    def core_pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "ta": pa.array([], pa.int64()),
                "tb": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        pa_, pb_, ta_, tb_ = [], [], [], []
        for ids, lon, lat, own in _cell_blocks(g):
            if not own.any():
                continue
            qi, qlon, qlat = ids[own], lon[own], lat[own]
            for c0 in range(0, len(qi), CHUNK):
                qs = slice(c0, c0 + CHUNK)
                dxm = qlon[qs][:, None] - lon[None, :]
                dym = qlat[qs][:, None] - lat[None, :]
                d2 = dxm * dxm + dym * dym
                # each unordered pair emitted exactly once: from the
                # smaller id's OWN cell row
                hit = (d2 <= r2) & (qi[qs][:, None] < ids[None, :])
                a_idx, b_idx = np.nonzero(hit)
                pa_.append(qi[qs][a_idx])
                pb_.append(ids[b_idx])
                ta_.append(_tile(qlon[qs][a_idx], qlat[qs][a_idx]))
                tb_.append(_tile(lon[b_idx], lat[b_idx]))
        if not pa_:
            return empty
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(pa_)),
                "doc_b": pa.array(np.concatenate(pb_)),
                "ta": pa.array(np.concatenate(ta_)),
                "tb": pa.array(np.concatenate(tb_)),
            }
        )

    counts = (
        points.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(count_nb, batch_format="pandas")
        .materialize()
    )

    def only_cores(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(b["n_nb"].to_numpy() >= min_pts))

    def only_noncores(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(b["n_nb"].to_numpy() < min_pts))

    cores = counts.map_batches(only_cores, batch_format="pyarrow")
    edges = (
        cores.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(core_pairs, batch_format="pandas")
        .materialize()  # consumed twice inside spatial_components
    )
    # components via tile contraction (O(1) rounds even when the graph
    # percolates — plain min-label propagation needs ~diameter rounds;
    # singleton cores are covered by the node side of the mapping pass)
    tiled_cores = cores.map_batches(
        lambda b: pa.table(
            {id_col: b[id_col], "tile": pa.array(_tile(b["lon"].to_numpy(), b["lat"].to_numpy()))}
        ),
        batch_format="pyarrow",
    )
    labels = spatial_components(
        tiled_cores, edges, id_col=id_col, n_shards=n_shards, levels=cc_levels
    ).materialize()

    def core_out(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                id_col: b["doc_id"],
                "role": pa.array(np.repeat("core", n)),
                "cluster_id": b["cluster_id"],
            }
        )

    nn = radius_nn_lookup(
        counts.map_batches(only_noncores, batch_format="pyarrow").map_batches(
            lambda b: pa.table({"q_id": b[id_col], "lon": b["lon"], "lat": b["lat"]}),
            batch_format="pyarrow",
        ),
        cores.map_batches(
            lambda b: pa.table({"c_id": b[id_col], "lon": b["lon"], "lat": b["lat"]}),
            batch_format="pyarrow",
        ),
        radius=eps,
        q_id="q_id",
        c_id="c_id",
    )

    def split_border(b: pa.Table) -> pa.Table:
        return b.filter(pa.compute.is_valid(b["nn_id"])).select(["q_id", "nn_id"])

    def split_noise(b: pa.Table) -> pa.Table:
        b = b.filter(pa.compute.is_null(b["nn_id"]))
        n = len(b)
        return pa.table(
            {
                id_col: b["q_id"],
                "role": pa.array(np.repeat("noise", n)),
                "cluster_id": pa.array([None] * n, pa.int64()),
            }
        )

    nn = nn.materialize()  # consumed twice (border + noise split)
    lab2 = labels.map_batches(
        lambda b: pa.table({"core_id": b["doc_id"], "cluster_id": b["cluster_id"]}),
        batch_format="pyarrow",
    )
    border = hash_equijoin(
        nn.map_batches(split_border, batch_format="pyarrow"),
        lab2,
        "nn_id",
        "core_id",
        # either side can legitimately be empty (no borders / no cores)
        left_schema=pa.schema([("q_id", pa.int64()), ("nn_id", pa.int64())]),
        right_schema=pa.schema(
            [("core_id", pa.int64()), ("cluster_id", pa.int64())]
        ),
    )

    def border_out(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                id_col: b["q_id"],
                "role": pa.array(np.repeat("border", n)),
                "cluster_id": b["cluster_id"],
            }
        )

    out = (
        labels.map_batches(core_out, batch_format="pyarrow")
        .union(border.map_batches(border_out, batch_format="pyarrow"))
        .union(nn.map_batches(split_noise, batch_format="pyarrow"))
    )
    return out


def ripley_k(
    ds,
    radii: tuple[float, ...] = (1 / 64, 2 / 64, 3 / 64, 4 / 64),
    area: float = 128.0,
    id_col: str = "event_id",
    n_shards: int = 64,
    hot_cap: int = 256,
):
    """Ripley's K point-pattern statistic (naive estimator, no edge
    correction — documented): ``K(r) = area * #ordered pairs with d <= r
    / (n * (n-1))`` plus the variance-stabilized ``L(r) = sqrt(K/pi)``
    — clustered vs dispersed process detection over the observation
    points.

    Same grid-bucket ring co-shuffle as :func:`radius_nn_join` with cell
    size == max(radii) (all pair distances <= r_max provably resolve in
    the 3x3 ring); per cell one vectorized distance block counts all
    radii at once, emitting (radius index, pair count) integer partials
    — the driver only ever holds ``shards x |radii|`` tiny rows.  All
    counts exact; K is one multiply + one divide, L one divide + sqrt
    (pi is the same IEEE double literal on both sides), so the SQL twin
    is bit-exact.  Returns a bounded in-memory table (|radii| rows).

    Hot-cell salting: a dense blob puts its whole ``|own| x |ring|``
    quadratic block in ONE task (the statistic is inherently quadratic
    in local density — the work can only be spread, not skipped).  A
    cheap pre-count pass (partials bounded by occupied-cell
    cardinality; the input lineage is a column-pruned read, so the
    double consumption is the bloom-pre-filter precedent) finds cells
    with more than ``hot_cap`` own points; their own rows partition
    into ``ceil(cnt/hot_cap)`` sub-shards by id hash while every ring
    candidate row replicates to all sub-shards (the join salting rule:
    probe splits, build replicates — pair counting can't pre-collapse).
    Each own row is flagged ``_own`` in exactly one sub-shard, so every
    ordered pair is still counted exactly once."""
    import math

    rmax = max(radii)
    inv = 1.0 / rmax  # power-of-two radius: exact
    r2s = np.array([r * r for r in radii])
    r2max = float(r2s.max())
    GOLD = np.uint64(0x9E3779B185EBCA87)
    MAXSPLIT = 64

    def pack_cell(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
        return cx * np.int64(1 << 21) + cy

    # ---- pass 1: per-cell own counts (partials bounded by occupied
    # cells per block; at planet scale this collapses through a small
    # cell-keyed groupby and only counts > hot_cap reach the driver).
    def cell_counts(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        cell = pack_cell(
            np.floor(lon * inv).astype(np.int64), np.floor(lat * inv).astype(np.int64)
        )
        ks, cnt = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(ks), "cnt": pa.array(cnt.astype(np.int64))})

    cc = ds.map_batches(cell_counts, batch_format="pyarrow").to_pandas()
    tot = cc.groupby("cell")["cnt"].sum() if len(cc) else cc.set_index("cell")["cnt"]
    hot = tot[tot > hot_cap]
    hot_cells = hot.index.to_numpy().astype(np.int64)  # groupby index: sorted
    hot_split = np.minimum(
        -(-hot.to_numpy().astype(np.int64) // hot_cap), MAXSPLIT
    ).astype(np.int64)

    def splits_of(cell: np.ndarray) -> np.ndarray:
        s = np.ones(len(cell), dtype=np.int64)
        if len(hot_cells):
            idx = np.minimum(
                np.searchsorted(hot_cells, cell), len(hot_cells) - 1
            )
            m = hot_cells[idx] == cell
            s[m] = hot_split[idx[m]]
        return s

    def prep(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        cx = np.floor(lon * inv).astype(np.int64)
        cy = np.floor(lat * inv).astype(np.int64)
        home_sub = ids.astype(np.uint64) * GOLD  # per-point salt source
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                own = dx == 0 and dy == 0
                cell = pack_cell(cx + dx, cy + dy)
                s = splits_of(cell)
                rep = np.repeat(np.arange(len(cell)), s)
                sub = np.arange(len(rep), dtype=np.int64) - np.repeat(
                    np.cumsum(s) - s, s
                )
                if own:
                    ownflag = sub == (
                        home_sub[rep] % s[rep].astype(np.uint64)
                    ).astype(np.int64)
                else:
                    ownflag = np.zeros(len(rep), dtype=bool)
                parts.append(
                    pa.table(
                        {
                            "_cell": pa.array(cell[rep] * np.int64(MAXSPLIT) + sub),
                            id_col: pa.array(ids[rep]),
                            "lon": pa.array(lon[rep]),
                            "lat": pa.array(lat[rep]),
                            "_own": pa.array(ownflag),
                        }
                    )
                )
        out = pa.concat_tables(parts)
        shard = (
            (out["_cell"].to_numpy().astype(np.uint64) * GOLD) % np.uint64(n_shards)
        ).astype(np.int64)
        return out.append_column("_s", pa.array(shard))

    def count_pairs(g) -> pa.Table:
        empty = pa.table(
            {
                "ri": pa.array([], pa.int64()),
                "pairs": pa.array([], pa.int64()),
                "n_own": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        cell = g["_cell"].to_numpy().astype(np.int64)
        ids = g[id_col].to_numpy().astype(np.int64)
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        own = g["_own"].to_numpy().astype(bool)
        o = np.argsort(cell, kind="stable")
        cell, ids, lon, lat, own = cell[o], ids[o], lon[o], lat[o], own[o]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        counts = np.zeros(len(radii), dtype=np.int64)
        n_own = 0
        for s, e in zip(starts, ends):
            osel = own[s:e]
            no = int(osel.sum())
            if no == 0:
                continue
            n_own += no
            clon, clat, cids = lon[s:e], lat[s:e], ids[s:e]
            olon_all, olat_all = clon[osel], clat[osel]
            oid_all = cids[osel]
            # adaptive chunk: keep each |chunk| x |cand| float64 block
            # ~32 MB so the three temporaries stay cache/heap-friendly
            width = len(clon)
            chunk = max(16, (1 << 22) // max(width, 1))
            for c0 in range(0, no, chunk):
                dxm = olon_all[c0 : c0 + chunk][:, None] - clon[None, :]
                dym = olat_all[c0 : c0 + chunk][:, None] - clat[None, :]
                d2 = dxm * dxm + dym * dym
                # one full-matrix mask at r_max, then the smaller radii
                # count on the compressed (~pi/9 dense) vector
                m = d2 <= r2max
                m &= oid_all[c0 : c0 + chunk][:, None] != cids[None, :]
                d2v = d2[m]
                for k, r2 in enumerate(r2s):
                    counts[k] += (
                        int(d2v.size) if r2 == r2max else int((d2v <= r2).sum())
                    )
        return pa.table(
            {
                "ri": pa.array(np.arange(len(radii), dtype=np.int64)),
                "pairs": pa.array(counts),
                "n_own": pa.array(
                    np.r_[np.int64(n_own), np.zeros(len(radii) - 1, np.int64)]
                ),
            }
        )

    rows = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(count_pairs, batch_format="pandas")
        .take_all()
    )
    pairs = np.zeros(len(radii), dtype=np.int64)
    n = 0
    for row in rows:
        pairs[int(row["ri"])] += int(row["pairs"])
        n += int(row["n_own"])
    nf = float(n * (n - 1))
    k_est = (area * pairs.astype(np.float64)) / nf
    return pa.table(
        {
            "radius": pa.array(np.array(radii)),
            "n_pairs": pa.array(pairs),
            "k_est": pa.array(k_est),
            "l_est": pa.array(np.sqrt(k_est / math.pi)),
        }
    )


def ripley_multi(
    ds: rd.Dataset,
    pattern_col: str,
    radii: tuple[float, ...] = (1 / 64, 2 / 64, 3 / 64, 4 / 64),
    area: float = 128.0,
    id_col: str = "event_id",
    n_shards: int = 64,
) -> "pa.Table":
    """Ripley K pair counts for MANY point patterns in one co-shuffle —
    the kernel of CSR simulation envelopes: ``(pattern, cell)`` keys the
    grid-bucket ring pass, so all patterns resolve in a single shuffle.
    Unsalted (envelope patterns are uniform by construction — use
    :func:`ripley_k` for a single skewed observed pattern).  Returns the
    bounded (patterns x radii) table of ordered pair counts and
    per-pattern point counts."""
    rmax = max(radii)
    inv = 1.0 / rmax
    r2s = np.array([r * r for r in radii])
    r2max = float(r2s.max())
    GOLD = np.uint64(0x9E3779B185EBCA87)

    def prep(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        pat = b[pattern_col].to_numpy().astype(np.int64)
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        cx = np.floor(lon * inv).astype(np.int64)
        cy = np.floor(lat * inv).astype(np.int64)
        n = len(ids)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                own = dx == 0 and dy == 0
                cell = ((cx + dx) * np.int64(1 << 21) + (cy + dy)) * np.int64(
                    64
                ) + pat
                parts.append(
                    pa.table(
                        {
                            "_cell": pa.array(cell),
                            "_pat": pa.array(pat),
                            "_id": pa.array(ids),
                            "lon": pa.array(lon),
                            "lat": pa.array(lat),
                            "_own": pa.array(np.full(n, own)),
                        }
                    )
                )
        out = pa.concat_tables(parts)
        shard = (
            (out["_cell"].to_numpy().astype(np.uint64) * GOLD) % np.uint64(n_shards)
        ).astype(np.int64)
        return out.append_column("_s", pa.array(shard))

    def count_pairs(g) -> pa.Table:
        empty = pa.table(
            {
                "pattern": pa.array([], pa.int64()),
                "ri": pa.array([], pa.int64()),
                "pairs": pa.array([], pa.int64()),
                "n_own": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        cell = g["_cell"].to_numpy().astype(np.int64)
        pat = g["_pat"].to_numpy().astype(np.int64)
        ids = g["_id"].to_numpy().astype(np.int64)
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        own = g["_own"].to_numpy().astype(bool)
        o = np.argsort(cell, kind="stable")
        cell, pat, ids, lon, lat, own = (
            cell[o], pat[o], ids[o], lon[o], lat[o], own[o]
        )
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        acc: dict[int, np.ndarray] = {}
        nown: dict[int, int] = {}
        for s, e in zip(starts, ends):
            osel = own[s:e]
            no = int(osel.sum())
            if no == 0:
                continue
            p = int(pat[s])
            nown[p] = nown.get(p, 0) + no
            cnt = acc.setdefault(p, np.zeros(len(radii), dtype=np.int64))
            clon, clat, cids = lon[s:e], lat[s:e], ids[s:e]
            olon, olat = clon[osel], clat[osel]
            oid = cids[osel]
            chunk = max(16, (1 << 22) // max(len(clon), 1))
            for c0 in range(0, no, chunk):
                dxm = olon[c0 : c0 + chunk][:, None] - clon[None, :]
                dym = olat[c0 : c0 + chunk][:, None] - clat[None, :]
                d2 = dxm * dxm + dym * dym
                m = d2 <= r2max
                m &= oid[c0 : c0 + chunk][:, None] != cids[None, :]
                d2v = d2[m]
                for k, r2 in enumerate(r2s):
                    cnt[k] += (
                        int(d2v.size) if r2 == r2max else int((d2v <= r2).sum())
                    )
        pats = sorted(acc)
        return pa.table(
            {
                "pattern": pa.array(
                    np.repeat(np.array(pats, np.int64), len(radii))
                ),
                "ri": pa.array(np.tile(np.arange(len(radii), dtype=np.int64), len(pats))),
                "pairs": pa.array(
                    np.concatenate([acc[p] for p in pats])
                    if pats
                    else np.array([], np.int64)
                ),
                "n_own": pa.array(
                    np.concatenate(
                        [
                            np.r_[np.int64(nown[p]), np.zeros(len(radii) - 1, np.int64)]
                            for p in pats
                        ]
                    )
                    if pats
                    else np.array([], np.int64)
                ),
            }
        )

    rows = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(count_pairs, batch_format="pandas")
        .take_all()
    )
    agg: dict[int, np.ndarray] = {}
    ns: dict[int, int] = {}
    for r in rows:
        p = int(r["pattern"])
        agg.setdefault(p, np.zeros(len(radii), dtype=np.int64))[int(r["ri"])] += int(
            r["pairs"]
        )
        ns[p] = ns.get(p, 0) + int(r["n_own"])
    pats = sorted(agg)
    return pa.table(
        {
            "pattern": pa.array(
                np.repeat(np.array(pats, np.int64), len(radii))
            ),
            "radius": pa.array(np.tile(np.array(radii), len(pats))),
            "n_pairs": pa.array(
                np.concatenate([agg[p] for p in pats])
                if pats
                else np.array([], np.int64)
            ),
            "n_points": pa.array(
                np.repeat(np.array([ns[p] for p in pats], np.int64), len(radii))
            ),
        }
    )


def cross_k(
    ds: rd.Dataset,
    type_col: str,
    type_a: str,
    type_b: str,
    radii: tuple[float, ...] = (1 / 64, 2 / 64, 3 / 64, 4 / 64),
    area: float = 128.0,
    id_col: str = "event_id",
    n_shards: int = 64,
) -> pa.Table:
    """Bivariate Ripley cross-K between two point types — the
    colocation-at-distance statistic (are purchases clustered AROUND
    views beyond what density predicts?): ``K_ab(r) = area * #(ordered
    pairs a in A, b in B with d <= r) / (n_a * n_b)`` plus the
    variance-stabilized L.

    The :func:`ripley_k` grid-bucket ring co-shuffle with cell size ==
    max(radii); every A point's own-cell row counts its B candidates in
    the 3x3 ring once (A and B are disjoint type classes, so no self
    pair exists).  Integer pair counts, single-division K, sqrt L —
    the SQL prefiltered A-x-B self-join twin is bit-exact."""
    import math

    rmax = max(radii)
    inv = 1.0 / rmax
    r2s = np.array([r * r for r in radii])
    r2max = float(r2s.max())
    GOLD = np.uint64(0x9E3779B185EBCA87)

    def prep(b: pa.Table) -> pa.Table:
        t = b[type_col].to_numpy(zero_copy_only=False)
        is_a = t == type_a
        is_b = t == type_b
        keep = is_a | is_b
        lon = b["lon"].to_numpy()[keep]
        lat = b["lat"].to_numpy()[keep]
        a_flag = is_a[keep]
        cx = np.floor(lon * inv).astype(np.int64)
        cy = np.floor(lat * inv).astype(np.int64)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                own = dx == 0 and dy == 0
                cell = (cx + dx) * np.int64(1 << 21) + (cy + dy)
                parts.append(
                    pa.table(
                        {
                            "_cell": pa.array(cell),
                            "lon": pa.array(lon),
                            "lat": pa.array(lat),
                            # own A rows count; B rows are candidates in
                            # every ring replica (incl. their own cell)
                            "_own_a": pa.array(a_flag & own),
                            "_is_b": pa.array(~a_flag),
                            "_ca": pa.array(a_flag & own),
                            "_cb": pa.array((~a_flag) & own),
                        }
                    )
                )
        out = pa.concat_tables(parts)
        shard = (
            (out["_cell"].to_numpy().astype(np.uint64) * GOLD) % np.uint64(n_shards)
        ).astype(np.int64)
        return out.append_column("_s", pa.array(shard))

    def count_pairs(g) -> pa.Table:
        empty = pa.table(
            {
                "ri": pa.array([], pa.int64()),
                "pairs": pa.array([], pa.int64()),
                "n_a": pa.array([], pa.int64()),
                "n_b": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        cell = g["_cell"].to_numpy().astype(np.int64)
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        own_a = g["_own_a"].to_numpy().astype(bool)
        isb = g["_is_b"].to_numpy().astype(bool)
        n_a = int(g["_ca"].to_numpy().astype(bool).sum())
        n_b = int(g["_cb"].to_numpy().astype(bool).sum())
        o = np.argsort(cell, kind="stable")
        cell, lon, lat, own_a, isb = cell[o], lon[o], lat[o], own_a[o], isb[o]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        counts = np.zeros(len(radii), dtype=np.int64)
        for s, e in zip(starts, ends):
            osel = own_a[s:e]
            bsel = isb[s:e]
            no, nb = int(osel.sum()), int(bsel.sum())
            if no == 0 or nb == 0:
                continue
            olon, olat = lon[s:e][osel], lat[s:e][osel]
            blon, blat = lon[s:e][bsel], lat[s:e][bsel]
            chunk = max(16, (1 << 22) // max(nb, 1))
            for c0 in range(0, no, chunk):
                dxm = olon[c0 : c0 + chunk][:, None] - blon[None, :]
                dym = olat[c0 : c0 + chunk][:, None] - blat[None, :]
                d2 = dxm * dxm + dym * dym
                m = d2 <= r2max
                d2v = d2[m]
                for k, r2 in enumerate(r2s):
                    counts[k] += (
                        int(d2v.size) if r2 == r2max else int((d2v <= r2).sum())
                    )
        return pa.table(
            {
                "ri": pa.array(np.arange(len(radii), dtype=np.int64)),
                "pairs": pa.array(counts),
                "n_a": pa.array(
                    np.r_[np.int64(n_a), np.zeros(len(radii) - 1, np.int64)]
                ),
                "n_b": pa.array(
                    np.r_[np.int64(n_b), np.zeros(len(radii) - 1, np.int64)]
                ),
            }
        )

    rows = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(count_pairs, batch_format="pandas")
        .take_all()
    )
    pairs = np.zeros(len(radii), dtype=np.int64)
    n_a = n_b = 0
    for row in rows:
        pairs[int(row["ri"])] += int(row["pairs"])
        n_a += int(row["n_a"])
        n_b += int(row["n_b"])
    k_est = (area * pairs.astype(np.float64)) / np.float64(n_a * n_b)
    return pa.table(
        {
            "radius": pa.array(np.array(radii)),
            "n_pairs": pa.array(pairs),
            "k_ab": pa.array(k_est),
            "l_ab": pa.array(np.sqrt(k_est / math.pi)),
        }
    )


def knox_counts(
    ds: rd.Dataset,
    eps: float = 0.03125,
    tau_us: int = 2 * 3_600_000_000,
    id_col: str = "event_id",
    n_shards: int = 64,
) -> pa.Table:
    """Knox space-time interaction statistic over a point-event table —
    the epidemiological clustering test (are events close in space ALSO
    close in time?).  Exact integer pair counts:

    - ``pairs_space``: unordered pairs with planar d <= eps (grid-bucket
      ring co-shuffle, cell size == eps, each pair counted once from the
      smaller id's own-cell row — the ripley_k topology),
    - ``pairs_time``: unordered pairs with \\|dt\\| <= tau (the SAME
      exactly-once trick in 1D: time buckets of width tau, ring +-1),
    - ``pairs_st``: both, counted inside the spatial pass (ts rides the
      spatial co-shuffle),
    - ``knox_ratio = pairs_st / (pairs_space * pairs_time / C(n,2))``,
      evaluated as the single division CAST(st * total) / CAST(S * T) so
      the SQL twin is bit-exact (expected_st is one more single
      division).

    Shuffle payload is the bucketed point table (x9 spatial / x3
    temporal replicas); the driver only holds per-task integer partials
    (<= 2 x n_shards tiny rows).  int64 products hold to ~10^9 close
    pairs x C(n,2) ~ 10^9 — beyond that switch the two ratio products to
    Python ints driver-side (the partials stay int64)."""
    inv = 1.0 / eps  # power-of-two eps: exact

    def prep_space(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        ts = b["ts_us"].to_numpy().astype(np.int64)
        cx = np.floor(lon * inv).astype(np.int64)
        cy = np.floor(lat * inv).astype(np.int64)
        n = len(ids)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                own = dx == 0 and dy == 0
                cell = (cx + dx) * np.int64(1 << 21) + (cy + dy)
                parts.append(
                    pa.table(
                        {
                            "_cell": pa.array(cell),
                            "_id": pa.array(ids),
                            "lon": pa.array(lon),
                            "lat": pa.array(lat),
                            "_ts": pa.array(ts),
                            "_own": pa.array(np.full(n, own)),
                        }
                    )
                )
        out = pa.concat_tables(parts)
        shard = (
            (out["_cell"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return out.append_column("_s", pa.array(shard))

    def prep_time(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        ts = b["ts_us"].to_numpy().astype(np.int64)
        tb = ts // np.int64(tau_us)
        n = len(ids)
        parts = []
        for d in (-1, 0, 1):
            parts.append(
                pa.table(
                    {
                        "_cell": pa.array(tb + d),
                        "_id": pa.array(ids),
                        "_ts": pa.array(ts),
                        "_own": pa.array(np.full(n, d == 0)),
                    }
                )
            )
        out = pa.concat_tables(parts)
        shard = (
            (out["_cell"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return out.append_column("_s", pa.array(shard))

    CHUNK = 1024
    r2 = eps * eps

    def _partial(space: bool):
        def count(g) -> pa.Table:
            empty = pa.table(
                {
                    "pairs": pa.array([], pa.int64()),
                    "pairs_st": pa.array([], pa.int64()),
                    "n_own": pa.array([], pa.int64()),
                }
            )
            if len(g) == 0:
                return empty
            cell = g["_cell"].to_numpy().astype(np.int64)
            ids = g["_id"].to_numpy().astype(np.int64)
            ts = g["_ts"].to_numpy().astype(np.int64)
            own = g["_own"].to_numpy().astype(bool)
            if space:
                lon = g["lon"].to_numpy()
                lat = g["lat"].to_numpy()
            o = np.argsort(cell, kind="stable")
            cell, ids, ts, own = cell[o], ids[o], ts[o], own[o]
            if space:
                lon, lat = lon[o], lat[o]
            starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
            ends = np.r_[starts[1:], len(cell)]
            pairs = 0
            pairs_st = 0
            n_own = 0
            for s, e in zip(starts, ends):
                osel = own[s:e]
                if not osel.any():
                    continue
                n_own += int(osel.sum())
                oid = ids[s:e][osel]
                ots = ts[s:e][osel]
                if space:
                    olon, olat = lon[s:e][osel], lat[s:e][osel]
                for c0 in range(0, len(oid), CHUNK):
                    sl = slice(c0, c0 + CHUNK)
                    lower = oid[sl][:, None] < ids[s:e][None, :]
                    dtm = np.abs(ots[sl][:, None] - ts[s:e][None, :])
                    close_t = dtm <= tau_us
                    if space:
                        dxm = olon[sl][:, None] - lon[s:e][None, :]
                        dym = olat[sl][:, None] - lat[s:e][None, :]
                        hit = (dxm * dxm + dym * dym <= r2) & lower
                        pairs += int(hit.sum())
                        pairs_st += int((hit & close_t).sum())
                    else:
                        pairs += int((close_t & lower).sum())
            return pa.table(
                {
                    "pairs": pa.array([np.int64(pairs)]),
                    "pairs_st": pa.array([np.int64(pairs_st)]),
                    "n_own": pa.array([np.int64(n_own)]),
                }
            )

        return count

    sp = (
        ds.map_batches(prep_space, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(_partial(True), batch_format="pandas")
        .take_all()
    )
    tm = (
        ds.map_batches(prep_time, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(_partial(False), batch_format="pandas")
        .take_all()
    )
    pairs_space = sum(int(r["pairs"]) for r in sp)
    pairs_st = sum(int(r["pairs_st"]) for r in sp)
    pairs_time = sum(int(r["pairs"]) for r in tm)
    n = sum(int(r["n_own"]) for r in sp)
    total = n * (n - 1) // 2
    expected = np.float64(pairs_space * pairs_time) / np.float64(total)
    ratio = np.float64(pairs_st * total) / np.float64(pairs_space * pairs_time)
    return pa.table(
        {
            "n_events": pa.array([np.int64(n)]),
            "pairs_space": pa.array([np.int64(pairs_space)]),
            "pairs_time": pa.array([np.int64(pairs_time)]),
            "pairs_st": pa.array([np.int64(pairs_st)]),
            "expected_st": pa.array([expected]),
            "knox_ratio": pa.array([ratio]),
        }
    )


def mantel_counts(
    ds: rd.Dataset,
    eps: float = 0.03125,
    id_col: str = "event_id",
    n_shards: int = 64,
) -> pa.Table:
    """Mantel-type space-time interaction statistic — the continuous-
    response companion of :func:`knox_counts` (epidemiology: are events
    that are close in SPACE also close in TIME, measured on the full
    |dt| scale instead of a tau cutoff?).  The standardized cross-
    product with indicator space kernel ``a_ij = 1[d <= eps]`` and
    response ``b_ij = |dt|`` in integer seconds:

    - ``sum_dt_close``: exact ``sum of |dt_sec|`` over unordered pairs
      with planar d <= eps — the knox grid-bucket ring co-shuffle, one
      extra int64 accumulator riding the same distance mask,
    - ``sum_dt_all``: exact ``sum of |dt_sec|`` over ALL C(n,2) pairs —
      never enumerated: hour buckets (3600-s bins) reduce the stream to
      per-bucket ``(n, sum_t, within)`` rows where ``within`` is the
      bucket's internal pairwise sum via the sorted rank identity
      ``sum_k t_(k) * (2k - n - 1)`` on bucket-relative offsets (< 3600,
      so int64-safe); the cross-bucket part closes in the driver over
      the <= bucket-count rows with Python-int prefix sums,
    - ``mantel_ratio = mean_dt_close / mean_dt_all`` (< 1 = interaction:
      spatially close pairs are also temporally closer), each mean ONE
      division — the SQL twin (box self-join + window rank identity) is
      bit-exact.

    int64 bound: ``sum_dt_all <= C(n,2) * 2.6e6 s`` holds to n ~ 2.6M
    events (beyond that the driver's Python ints are exact but the
    output column and the SQL BIGINT cast saturate — widen to the
    HUGEINT split-cast idiom then).  Shuffle payload: the x9 bucketed
    point table (close pass) + one narrow (hour, t) stream (all pass)."""
    from geoglue_ray import fixtures as fx

    inv = 1.0 / eps  # power-of-two eps: exact
    T0_US = np.int64(np.datetime64(fx.T0, "us").astype(np.int64))
    GOLD = np.uint64(0x9E3779B185EBCA87)

    def prep_space(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        tsec = (b["ts_us"].to_numpy().astype(np.int64) - T0_US) // np.int64(1_000_000)
        cx = np.floor(lon * inv).astype(np.int64)
        cy = np.floor(lat * inv).astype(np.int64)
        n = len(ids)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                own = dx == 0 and dy == 0
                cell = (cx + dx) * np.int64(1 << 21) + (cy + dy)
                parts.append(
                    pa.table(
                        {
                            "_cell": pa.array(cell),
                            "_id": pa.array(ids),
                            "lon": pa.array(lon),
                            "lat": pa.array(lat),
                            "_ts": pa.array(tsec),
                            "_own": pa.array(np.full(n, own)),
                        }
                    )
                )
        out = pa.concat_tables(parts)
        shard = (
            (out["_cell"].to_numpy().astype(np.uint64) * GOLD) % np.uint64(n_shards)
        ).astype(np.int64)
        return out.append_column("_s", pa.array(shard))

    CHUNK = 1024
    r2 = eps * eps

    def close_pairs(g) -> pa.Table:
        empty = pa.table(
            {
                "pairs": pa.array([], pa.int64()),
                "sum_dt": pa.array([], pa.int64()),
                "n_own": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        cell = g["_cell"].to_numpy().astype(np.int64)
        ids = g["_id"].to_numpy().astype(np.int64)
        ts = g["_ts"].to_numpy().astype(np.int64)
        own = g["_own"].to_numpy().astype(bool)
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        o = np.argsort(cell, kind="stable")
        cell, ids, ts, own, lon, lat = (
            cell[o], ids[o], ts[o], own[o], lon[o], lat[o]
        )
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        pairs = 0
        sum_dt = 0
        n_own = 0
        for s, e in zip(starts, ends):
            osel = own[s:e]
            if not osel.any():
                continue
            n_own += int(osel.sum())
            oid, ots = ids[s:e][osel], ts[s:e][osel]
            olon, olat = lon[s:e][osel], lat[s:e][osel]
            for c0 in range(0, len(oid), CHUNK):
                sl = slice(c0, c0 + CHUNK)
                dxm = olon[sl][:, None] - lon[s:e][None, :]
                dym = olat[sl][:, None] - lat[s:e][None, :]
                hit = (dxm * dxm + dym * dym <= r2) & (
                    oid[sl][:, None] < ids[s:e][None, :]
                )
                if hit.any():
                    dtm = np.abs(ots[sl][:, None] - ts[s:e][None, :])
                    pairs += int(hit.sum())
                    sum_dt += int(dtm[hit].sum())
        return pa.table(
            {
                "pairs": pa.array([np.int64(pairs)]),
                "sum_dt": pa.array([np.int64(sum_dt)]),
                "n_own": pa.array([np.int64(n_own)]),
            }
        )

    def prep_time(b: pa.Table) -> pa.Table:
        tsec = (b["ts_us"].to_numpy().astype(np.int64) - T0_US) // np.int64(1_000_000)
        hb = tsec // np.int64(3600)
        shard = ((hb.astype(np.uint64) * GOLD) % np.uint64(n_shards)).astype(np.int64)
        return pa.table(
            {"_s": pa.array(shard), "hb": pa.array(hb), "t": pa.array(tsec)}
        )

    def bucket_stats(g) -> pa.Table:
        empty = pa.table(
            {
                "hb": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sum_t": pa.array([], pa.int64()),
                "within": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        hb = g["hb"].to_numpy().astype(np.int64)
        t = g["t"].to_numpy().astype(np.int64)
        o = np.lexsort((t, hb))
        hb, t = hb[o], t[o]
        first = np.r_[True, hb[1:] != hb[:-1]]
        starts = np.flatnonzero(first)
        run = np.cumsum(first) - 1
        pos = np.arange(len(hb), dtype=np.int64) - starts[run]
        nlen = np.diff(np.r_[starts, len(hb)]).astype(np.int64)
        # bucket-relative offsets keep the rank identity terms < 3600*n
        trel = t - hb * np.int64(3600)
        contrib = trel * (2 * (pos + 1) - nlen[run] - 1)
        within = np.add.reduceat(contrib, starts)
        return pa.table(
            {
                "hb": pa.array(hb[starts]),
                "n": pa.array(nlen),
                "sum_t": pa.array(np.add.reduceat(t, starts)),
                "within": pa.array(within),
            }
        )

    sp = (
        ds.map_batches(prep_space, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(close_pairs, batch_format="pandas")
        .take_all()
    )
    bk = (
        ds.map_batches(prep_time, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(bucket_stats, batch_format="pandas")
        .take_all()
    )  # bounded: one row per occupied hour bucket
    pairs = sum(int(r["pairs"]) for r in sp)
    sum_close = sum(int(r["sum_dt"]) for r in sp)
    n = sum(int(r["n_own"]) for r in sp)
    bk.sort(key=lambda r: int(r["hb"]))
    sum_all = 0
    cnt_before = 0
    sum_before = 0
    for r in bk:  # Python ints: exact beyond int64
        nb, sb = int(r["n"]), int(r["sum_t"])
        sum_all += int(r["within"]) + sb * cnt_before - nb * sum_before
        cnt_before += nb
        sum_before += sb
    total = n * (n - 1) // 2
    mean_close = np.float64(sum_close) / np.float64(pairs)
    mean_all = np.float64(sum_all) / np.float64(total)
    return pa.table(
        {
            "n_events": pa.array([np.int64(n)]),
            "pairs_space": pa.array([np.int64(pairs)]),
            "sum_dt_close": pa.array([np.int64(sum_close)]),
            "sum_dt_all": pa.array([np.int64(sum_all)]),
            "mean_dt_close": pa.array([mean_close]),
            "mean_dt_all": pa.array([mean_all]),
            "mantel_ratio": pa.array([mean_close / mean_all]),
        }
    )


def spatial_join(
    ds: rd.Dataset,
    index: AdminIndex | None = None,
    *,
    index_ref=None,
    weights_ref=None,
    emit_names: bool = True,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int | None = 32768,
) -> rd.Dataset:
    """Attach admin assignment (and optionally weights) to a corpus Dataset.

    The polygon index is broadcast via ``ray.put`` exactly once; the actor
    pool autoscales within ``concurrency``.  ``emit_names=False`` keeps the
    hot path integer-only (``admin_idx``) — names are attached after
    aggregation from the broadcast pool (narrow-shuffle principle,
    SURVEY.md §7 hard part (e)).
    """
    if index_ref is None:
        index_ref = ray.put(index)
    return ds.map_batches(
        SpatialJoiner,
        fn_constructor_args=(index_ref, weights_ref, emit_names),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        # half-CPU reservation: join actors frequently wait on upstream, and
        # full-CPU pools can starve shuffle tasks in tiny sessions (a
        # 2-CPU session with two pipelines deadlocked on 2x min-1 pools)
        num_cpus=0.5,
    )


def time_knn_join(
    ds,
    tau_us: int,
    k: int = 5,
    id_col: str = "event_id",
    ts_col: str = "ts_us",
    n_shards: int = 64,
    bucket_us: int | None = None,
):
    """k-nearest-neighbours-within-window self-join on the TIME axis —
    the 1-D analog of :func:`radius_knn_join` (same semantics: up-to-k
    nearest OTHER points with |dt| <= ``tau_us``, ranked by (|dt|,
    neighbour id), isolated points emit nothing).  Distribution:
    time-bucket co-shuffle with a halo sweep — a point's in-window
    neighbours all lie within ``ceil(tau/bucket)`` buckets of its own —
    FIXED ``hash(bucket) % n_shards``, vectorized per-bucket |dt| blocks
    with an int64 sentinel (never float inf — the ranking stays
    all-integer).

    ``bucket_us`` is the COST knob, independent of the ``tau_us``
    semantics knob (the round-4 "radius is a cost knob" lesson): the
    per-bucket |dt| block is quadratic in bucket occupancy and one
    bucket is indivisible across shards, so time-DENSE inputs (many
    points per tau window) should pass ``bucket_us < tau_us`` — the
    replication factor grows as ``2*ceil(tau/bucket)+1`` runs but each
    block shrinks quadratically and shards rebalance.  Default
    ``bucket_us == tau_us`` (halo 1, 3 runs) suits sparse inputs."""
    import pandas as pd

    tau = np.int64(tau_us)
    width = np.int64(bucket_us if bucket_us is not None else tau_us)
    halo = int(-(-tau // width))  # ceil(tau/width): neighbour bucket reach
    SENT = np.int64(1) << np.int64(62)

    def prep(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        ts = b[ts_col].to_numpy().astype(np.int64)
        bkt = ts // width
        n = len(ids)
        parts = []
        for db in range(-halo, halo + 1):
            parts.append(
                pa.table(
                    {
                        "_bkt": pa.array(bkt + np.int64(db)),
                        id_col: pa.array(ids),
                        "_ts": pa.array(ts),
                        "_own": pa.array(np.full(n, db == 0)),
                    }
                )
            )
        out = pa.concat_tables(parts)
        shard = (
            (out["_bkt"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return out.append_column("_s", pa.array(shard))

    def resolve(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "t_rank": pa.array([], pa.int64()),
                "t_nn_id": pa.array([], pa.int64()),
                "dt_us": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        bkt = g["_bkt"].to_numpy().astype(np.int64)
        ids = g[id_col].to_numpy().astype(np.int64)
        ts = g["_ts"].to_numpy().astype(np.int64)
        own = g["_own"].to_numpy().astype(bool)
        o = np.lexsort((ids, bkt))
        bkt, ids, ts, own = bkt[o], ids[o], ts[o], own[o]
        starts = np.flatnonzero(np.r_[True, bkt[1:] != bkt[:-1]])
        ends = np.r_[starts[1:], len(bkt)]
        out_id, out_rank, out_nn, out_dt = [], [], [], []
        CHUNK = 1024
        for s, e in zip(starts, ends):
            osel = own[s:e]
            if not osel.any():
                continue
            cid, cts = ids[s:e], ts[s:e]
            oi_all, ots_all = cid[osel], cts[osel]
            kk = min(k, len(cid))
            for c0 in range(0, len(oi_all), CHUNK):
                oi = oi_all[c0 : c0 + CHUNK]
                ots = ots_all[c0 : c0 + CHUNK]
                dt = np.abs(ots[:, None] - cts[None, :])
                bad = (dt > tau) | (oi[:, None] == cid[None, :])
                dt = np.where(bad, SENT, dt)
                ordc = np.argsort(dt, axis=1, kind="stable")[:, :kk]
                dsel = np.take_along_axis(dt, ordc, axis=1)
                rows, cols = np.nonzero(dsel < SENT)
                if len(rows) == 0:
                    continue
                out_id.append(oi[rows])
                out_rank.append(cols.astype(np.int64) + 1)
                out_nn.append(cid[ordc[rows, cols]])
                out_dt.append(dsel[rows, cols])
        if not out_id:
            return empty
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "t_rank": pa.array(np.concatenate(out_rank)),
                "t_nn_id": pa.array(np.concatenate(out_nn)),
                "dt_us": pa.array(np.concatenate(out_dt)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(resolve, batch_format="pandas")
    )
