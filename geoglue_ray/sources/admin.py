"""Admin-polygon table + broadcastable spatial index.

Mirrors the reference's vector side: GADM-shaped admin hierarchy with a
declared primary key (``region.py:225-287`` pk ``GID_{level}``;
``Region.read_admin`` at ``region.py:111-122``), re-expressed as a small
Arrow table of WKB polygons (one row per admin-2 unit) plus an
``AdminIndex`` — the pickled polygon index each spatial-join actor loads
once in ``__init__`` (north_star: "stateful actor pools holding pickled
polygon indexes").

The index couples a GGrid cell covering (S2-covering equivalent; cells ->
candidate features via two sorted arrays + searchsorted) with the CSR
``PolygonSet`` for exact point-in-polygon refinement and vertex-mean
centroids for the kNN fallback.  Everything is numpy → cheaply picklable →
one ``ray.put`` on the driver, read by every actor (never re-shipped per
batch).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from geoglue_ray import cells as gcells
from geoglue_ray import fixtures as fx
from geoglue_ray.geom import PolygonSet, polygon_wkb

DEFAULT_INDEX_RES = 13  # ~0.044 deg cells.  Candidate-lookup-only
# resolution (assignment is decided by exact PIP, so results are
# res-independent — tested); finer cells cut candidate pairs/point
# 3.4 -> 2.3 and the PIP kernel's memory traffic by ~35% (measured),
# which is what matters when many join actors share one node's cache.
# Index size at this res: ~150k (cell, feature) entries ≈ 2.5 MB —
# still broadcast-trivial.  The emitted `cell` column stays at
# DEFAULT_CELL_RES (spatial.py) — unchanged output semantics.


def build_admin_table() -> pa.Table:
    """Deterministic GADM-shaped admin-2 table (triangle tessellation).

    Columns follow FIXTURES.md F2: pk ``admin_id`` (unique, asserted like
    ``config.py:88-91``), parent ``admin1_id``, ``name``, ``geometry_wkb``,
    per-feature bbox, and vertex-mean centroid.
    """
    idx = np.arange(fx.N_ADMIN2, dtype=np.int64)
    tri = idx % 2
    cell = idx // 2
    cx = (cell % fx.NX).astype(np.float64)
    cy = (cell // fx.NX).astype(np.float64)
    x0 = fx.LON0 + cx * fx.CELL
    y0 = fx.LAT0 + cy * fx.CELL
    x1, y1 = x0 + fx.CELL, y0 + fx.CELL

    wkbs = []
    for i in range(fx.N_ADMIN2):
        if tri[i] == 0:  # lower-left triangle
            ring = np.array(
                [[x0[i], y0[i]], [x1[i], y0[i]], [x0[i], y1[i]], [x0[i], y0[i]]]
            )
        else:  # upper-right triangle
            ring = np.array(
                [[x1[i], y0[i]], [x1[i], y1[i]], [x0[i], y1[i]], [x1[i], y0[i]]]
            )
        wkbs.append(polygon_wkb([ring]))

    gx, gy = fx.admin2_centroids()
    admin_id = fx.admin2_name(idx)
    a1 = fx.admin1_of(idx)
    admin1_id = np.char.mod("ADM1-%02d", a1)
    names = np.char.mod("Region %04d", idx)
    minx = x0  # both triangle orientations include an x0 vertex
    table = pa.table(
        {
            "admin_id": pa.array(admin_id.tolist()),
            "admin1_id": pa.array(admin1_id.tolist()),
            "name": pa.array(names.tolist()),
            "geometry_wkb": pa.array(wkbs, type=pa.binary()),
            "minx": minx,
            "miny": y0,
            "maxx": x1,
            "maxy": y1,
            "centroid_x": gx,
            "centroid_y": gy,
        }
    )
    # pk uniqueness assertion, as the reference validates at config load
    assert len(set(admin_id.tolist())) == len(table), "admin_id pk not unique"
    return table


def attach_geometry(stats: pa.Table, admin: pa.Table | None = None) -> pa.Table:
    """Keyed join of per-admin stats onto the polygon table — the engine's
    ``geom_plot``/``plot()`` geometry attach (``util.py:288-289``,
    ``plot.py:62-63``), always by ``admin_id`` key, never positional."""
    admin = admin if admin is not None else build_admin_table()
    aid = np.asarray(admin["admin_id"].to_pylist())
    sid = np.asarray(stats["admin_id"].to_pylist())
    pos = {a: i for i, a in enumerate(aid)}
    idx = np.array([pos[s] for s in sid], dtype=np.int64)
    taken = admin.take(pa.array(idx))
    out = stats
    for name in ("name", "geometry_wkb", "centroid_x", "centroid_y"):
        out = out.append_column(name, taken[name])
    return out


@dataclass
class AdminIndex:
    """Broadcast polygon index: GGrid covering -> candidates -> exact PIP."""

    polyset: PolygonSet
    admin_id: np.ndarray  # (F,) str
    admin1_id: np.ndarray  # (F,) str
    res: int
    cand_cells: np.ndarray  # sorted unique covering cell ids
    cand_off: np.ndarray  # (len(cand_cells)+1,) offsets into cand_feat
    cand_feat: np.ndarray  # feature indices, grouped by cell
    # centroid buckets at a coarse resolution for ring-expansion kNN
    knn_res: int = 7
    knn_cells: np.ndarray | None = None  # sorted unique coarse cells
    knn_off: np.ndarray | None = None
    knn_feat: np.ndarray | None = None

    @staticmethod
    def build(table: pa.Table, res: int = DEFAULT_INDEX_RES) -> "AdminIndex":
        wkbs = table["geometry_wkb"].to_pylist()
        polyset = PolygonSet.from_wkb(wkbs)
        pairs_c, pairs_f = [], []
        bb = polyset.bbox
        for f in range(polyset.n_features):
            cov = gcells.cover_bbox(bb[f, 0], bb[f, 1], bb[f, 2], bb[f, 3], res)
            pairs_c.append(cov)
            pairs_f.append(np.full(len(cov), f, dtype=np.int64))
        cc = np.concatenate(pairs_c)
        ff = np.concatenate(pairs_f)
        order = np.argsort(cc, kind="stable")
        cc, ff = cc[order], ff[order]
        uniq, start = np.unique(cc, return_index=True)
        off = np.concatenate([start, [len(cc)]]).astype(np.int64)
        # coarse centroid buckets for ring-expansion kNN (H3-ring analogue)
        knn_res = 7
        kcell = gcells.encode(polyset.centroid[:, 0], polyset.centroid[:, 1], knn_res)
        korder = np.argsort(kcell, kind="stable")
        kc, kf = kcell[korder], np.arange(polyset.n_features, dtype=np.int64)[korder]
        kuniq, kstart = np.unique(kc, return_index=True)
        koff = np.concatenate([kstart, [len(kc)]]).astype(np.int64)
        return AdminIndex(
            polyset=polyset,
            admin_id=np.asarray(table["admin_id"].to_pylist()),
            admin1_id=np.asarray(table["admin1_id"].to_pylist()),
            res=res,
            cand_cells=uniq,
            cand_off=off,
            cand_feat=ff,
            knn_res=knn_res,
            knn_cells=kuniq,
            knn_off=koff,
            knn_feat=kf,
        )

    # ----------------------------------------------------------- assignment
    def candidates(self, cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """cells -> CSR (pair_point_idx, pair_feature) candidate pairs."""
        pos = np.searchsorted(self.cand_cells, cell)
        pos = np.clip(pos, 0, len(self.cand_cells) - 1)
        hit = self.cand_cells[pos] == cell
        n = np.where(hit, self.cand_off[pos + 1] - self.cand_off[pos], 0)
        pt = np.repeat(np.arange(len(cell)), n)
        tot = int(n.sum())
        within = np.arange(tot) - np.repeat(np.cumsum(n) - n, n)
        feat = self.cand_feat[np.repeat(self.cand_off[pos], n) + within]
        return pt, feat

    def _knn_ring(self, lon: float, lat: float) -> int:
        """Ring-expansion nearest centroid (the at-scale kNN path, per the
        north_star's H3 ring-expansion candidate search): expand Chebyshev
        rings of coarse cells around the point until candidates appear,
        then widen by the found distance (in cells) + 1 so the true nearest
        cannot hide in a diagonal ring, and take the exact argmin."""
        n = 1 << self.knn_res
        cell_deg = 360.0 / n
        center = int(gcells.encode(np.array([lon]), np.array([lat]), self.knn_res)[0])
        cen = self.polyset.centroid

        def gather(k: int) -> np.ndarray:
            ring_cells = gcells.ring(center, k)
            pos = np.searchsorted(self.knn_cells, ring_cells)
            pos = np.clip(pos, 0, len(self.knn_cells) - 1)
            hit = self.knn_cells[pos] == ring_cells
            if not hit.any():
                return np.empty(0, dtype=np.int64)
            return np.concatenate(
                [
                    self.knn_feat[self.knn_off[p] : self.knn_off[p + 1]]
                    for p in pos[hit]
                ]
            )

        k = 0
        cands = gather(k)
        while len(cands) == 0 and k < n:
            k += 1
            cands = gather(k)
        d2 = (lon - cen[cands, 0]) ** 2 + (lat - cen[cands, 1]) ** 2
        d = float(np.sqrt(d2.min()))
        k2 = int(np.ceil(d / cell_deg)) + 1
        if k2 > k:
            cands = gather(k2)
            d2 = (lon - cen[cands, 0]) ** 2 + (lat - cen[cands, 1]) ** 2
        best = d2.min()
        return int(cands[d2 == best].min())  # lowest-index tie-break

    def assign(
        self,
        lon: np.ndarray,
        lat: np.ndarray,
        knn_method: str = "brute",
        cell: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Points -> (feature idx, via_knn flag).

        Exact PIP on GGrid candidates; points matching no polygon fall back
        to nearest-centroid kNN.  ``knn_method``: ``"brute"`` (vectorized
        over all centroids — exact, fine for sandbox-size admin sets and
        bit-identical to the SQL oracle) or ``"ring"`` (coarse-cell ring
        expansion — the 10^12-doc scale path; equal results, tested).
        Ties broken by lowest feature index, deterministically.
        ``cell`` may carry precomputed GGrid ids (from ``encode_cells``) at
        this index's resolution, skipping the re-encode.
        """
        if cell is None:
            cell = gcells.encode(lon, lat, self.res)
        pt, feat = self.candidates(cell)
        inside = self.polyset.contains_pairs(lon[pt], lat[pt], feat)
        out = np.full(len(lon), -1, dtype=np.int64)
        # lowest-feature-wins determinism: process hits in descending feature
        # order so the lowest index is written last
        hit_pt, hit_ft = pt[inside], feat[inside]
        order = np.argsort(-hit_ft, kind="stable")
        out[hit_pt[order]] = hit_ft[order]
        via_knn = out == -1
        if via_knn.any():
            miss = np.nonzero(via_knn)[0]
            if knn_method == "ring":
                out[miss] = [self._knn_ring(lon[i], lat[i]) for i in miss]
            else:
                cen = self.polyset.centroid
                d2 = (lon[miss, None] - cen[None, :, 0]) ** 2 + (
                    lat[miss, None] - cen[None, :, 1]
                ) ** 2
                out[miss] = np.argmin(d2, axis=1)
        return out, via_knn
