"""Pure-numpy computational geometry: WKB codec, vectorized point-in-polygon,
areas, bboxes.

Replaces the reference's delegation to shapely/geopandas/exactextract
(``/root/reference/src/geoglue/zonalstats.py:23-68`` spatial join with
coverage fractions; ``types.py:22-180`` ``Bbox`` algebra) with dependency-free
kernels suitable for Ray workers: polygons are stored in a flat CSR layout
(one coordinate array + ring offsets) so point-in-polygon over an arbitrary
(point, polygon) candidate list is a single vectorized crossing-number pass
with ``np.add.reduceat`` — no Python loop over rows in the hot path.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6

EARTH_RADIUS_KM = 6371.0088  # mean Earth radius (spherical model)

# WGS84 ellipsoid (public constants; the reference delegates to
# pyproj.Geod(ellps="WGS84") — types.py:76-82)
WGS84_A_KM = 6378.137
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)
WGS84_E = math.sqrt(WGS84_E2)


def _authalic_q(sin_phi):
    """Authalic-latitude integral q(φ) = (1-e²)[sinφ/(1-e²sin²φ) +
    atanh(e·sinφ)/e] — the exact ellipsoidal analogue of 2·sinφ in the
    spherical area line integral (q(90°)·a²·π = hemisphere area)."""
    s = np.asarray(sin_phi, dtype=np.float64)
    return (1.0 - WGS84_E2) * (
        s / (1.0 - WGS84_E2 * s * s) + np.arctanh(WGS84_E * s) / WGS84_E
    )


# --------------------------------------------------------------------- bbox
@dataclass(frozen=True)
class Bbox:
    """Axis-aligned box with the reference's partial-order semantics
    (containment ``<=``, intersection ``&`` — ``types.py:34-107``)."""

    minx: float
    miny: float
    maxx: float
    maxy: float

    def __le__(self, other: "Bbox") -> bool:  # self contained in other
        return (
            other.minx <= self.minx
            and other.miny <= self.miny
            and self.maxx <= other.maxx
            and self.maxy <= other.maxy
        )

    def __ge__(self, other: "Bbox") -> bool:
        return other <= self

    def __and__(self, other: "Bbox") -> "Bbox | None":
        minx, miny = max(self.minx, other.minx), max(self.miny, other.miny)
        maxx, maxy = min(self.maxx, other.maxx), min(self.maxy, other.maxy)
        if minx >= maxx or miny >= maxy:
            return None
        return Bbox(minx, miny, maxx, maxy)

    def enlarge(self, frac: float) -> "Bbox":
        dx, dy = (self.maxx - self.minx) * frac, (self.maxy - self.miny) * frac
        return Bbox(self.minx - dx, self.miny - dy, self.maxx + dx, self.maxy + dy)

    def overlap_fraction(self, other: "Bbox") -> float:
        """Geodetic-area overlap ratio, the reference's semantics
        (``types.py:84-89``): area(self ∩ other) / max(area(self),
        area(other)) on the WGS84 ellipsoid."""
        inter = self & other
        if inter is None:
            return 0.0
        return inter.geodetic_area_km2() / max(
            self.geodetic_area_km2(), other.geodetic_area_km2()
        )

    def coverage_fraction(self, other: "Bbox") -> float:
        """1.0 when ``other`` is contained in ``self``, else the overlap
        ratio (``types.py:91-94``)."""
        if self >= other:
            return 1.0
        return self.overlap_fraction(other)

    def contains(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        return (lon >= self.minx) & (lon < self.maxx) & (lat >= self.miny) & (lat < self.maxy)

    def spherical_area_km2(self) -> float:
        """Area on the sphere between two meridians and two parallels
        (exactextract's genuinely-spherical ``area_spherical_km2``
        coverage weight keeps this model)."""
        lam = math.radians(self.maxx - self.minx)
        band = math.sin(math.radians(self.maxy)) - math.sin(math.radians(self.miny))
        return EARTH_RADIUS_KM**2 * lam * band

    def geodetic_area_km2(self) -> float:
        """WGS84 ellipsoidal area between two meridians and two parallels
        — exact closed form via the authalic integral; matches the
        reference's ``pyproj.Geod`` bbox areas (``types.py:76-82``) where
        the spherical model is ~0.1-0.5% off."""
        lam = math.radians(self.maxx - self.minx)
        dq = float(
            _authalic_q(math.sin(math.radians(self.maxy)))
            - _authalic_q(math.sin(math.radians(self.miny)))
        )
        return WGS84_A_KM**2 * lam * dq / 2.0

    @staticmethod
    def from_string(s: str) -> "Bbox":
        minx, miny, maxx, maxy = (float(p) for p in s.split(","))
        return Bbox(minx, miny, maxx, maxy)

    def to_list(self) -> list[float]:
        return [self.minx, self.miny, self.maxx, self.maxy]


# ---------------------------------------------------------------- WKB codec
def polygon_wkb(rings: list[np.ndarray]) -> bytes:
    """Encode a polygon (list of (N,2) float64 rings, closed) as WKB (LE)."""
    out = [struct.pack("<BII", 1, _WKB_POLYGON, len(rings))]
    for ring in rings:
        ring = np.ascontiguousarray(ring, dtype="<f8")
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.tobytes())
    return b"".join(out)


def multipolygon_wkb(polygons: list[list[np.ndarray]]) -> bytes:
    """Encode a multipolygon (list of polygons, each a list of closed
    rings) as WKB (LE) — archipelago-style admin features
    (``tests/test_zonalstats.py:26`` drops two such rows)."""
    out = [struct.pack("<BII", 1, _WKB_MULTIPOLYGON, len(polygons))]
    for rings in polygons:
        out.append(polygon_wkb(rings))
    return b"".join(out)


def parse_wkb(buf: bytes) -> list[list[np.ndarray]]:
    """Decode WKB Polygon / MultiPolygon -> list of polygons (lists of rings)."""
    pos = 0

    def read_polygon() -> list[np.ndarray]:
        nonlocal pos
        byte_order, geom_type = buf[pos], struct.unpack_from("<I", buf, pos + 1)[0]
        if byte_order != 1 or geom_type != _WKB_POLYGON:
            raise ValueError(f"unsupported WKB (order={byte_order}, type={geom_type})")
        nrings = struct.unpack_from("<I", buf, pos + 5)[0]
        pos += 9
        rings = []
        for _ in range(nrings):
            npts = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
            ring = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=pos).reshape(npts, 2)
            pos += npts * 16
            rings.append(ring)
        return rings

    byte_order, geom_type = buf[0], struct.unpack_from("<I", buf, 1)[0]
    if geom_type == _WKB_MULTIPOLYGON:
        if byte_order != 1:
            raise ValueError("big-endian WKB not supported")
        n = struct.unpack_from("<I", buf, 5)[0]
        pos = 9
        return [read_polygon() for _ in range(n)]
    return [read_polygon()]


# ----------------------------------------------------- CSR polygon set + PIP
@dataclass
class PolygonSet:
    """Flat CSR layout of many (multi)polygons for vectorized kernels.

    ``xy[ring_off[i]:ring_off[i+1]]`` is ring ``i`` (closed: first == last
    vertex); ``poly_of_ring[i]`` maps each ring to its feature index;
    per-feature bboxes and vertex-mean centroids are precomputed.  Holes are
    handled naturally by the even-odd rule (a point inside a hole crosses
    the boundary an even number of times).
    """

    xy: np.ndarray  # (V, 2) float64, all rings concatenated
    ring_off: np.ndarray  # (R+1,) int64
    poly_of_ring: np.ndarray  # (R,) int64 feature index per ring
    n_features: int
    bbox: np.ndarray  # (F, 4) minx,miny,maxx,maxy
    centroid: np.ndarray  # (F, 2) vertex-mean centroid

    @staticmethod
    def from_wkb(wkbs: list[bytes]) -> "PolygonSet":
        xs, offs, ring_poly = [], [0], []
        bboxes = np.empty((len(wkbs), 4))
        cents = np.empty((len(wkbs), 2))
        for f, buf in enumerate(wkbs):
            polys = parse_wkb(buf)
            allpts = []
            for rings in polys:
                for ring in rings:
                    xs.append(ring)
                    offs.append(offs[-1] + len(ring))
                    ring_poly.append(f)
                allpts.append(rings[0][:-1])  # exterior ring, drop closing pt
            pts = np.concatenate(allpts)
            bboxes[f] = [pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()]
            cents[f] = pts.mean(axis=0)
        return PolygonSet(
            xy=np.concatenate(xs) if xs else np.empty((0, 2)),
            ring_off=np.asarray(offs, dtype=np.int64),
            poly_of_ring=np.asarray(ring_poly, dtype=np.int64),
            n_features=len(wkbs),
            bbox=bboxes,
            centroid=cents,
        )

    # ring list per feature (for candidate expansion)
    def rings_of(self, feature: int) -> np.ndarray:
        return np.nonzero(self.poly_of_ring == feature)[0]

    def _uniform_edge_arrays(self):
        """(ex1, ey1, ex2, ey2) each (F, E) when every feature is exactly
        one closed ring of a single shared vertex count, else None.
        Built once and cached (the set is immutable after construction);
        E excludes the closing duplicate vertex, matching the general
        path's ring-end edge mask."""
        if not hasattr(self, "_ue"):
            ring_len = np.diff(self.ring_off)
            uniform = (
                len(ring_len) == self.n_features
                and np.array_equal(self.poly_of_ring, np.arange(self.n_features))
                and len(np.unique(ring_len)) == 1
            )
            if uniform:
                nv = int(ring_len[0])
                v = self.xy.reshape(self.n_features, nv, 2)
                self._ue = (
                    v[:, :-1, 0].copy(),
                    v[:, :-1, 1].copy(),
                    v[:, 1:, 0].copy(),
                    v[:, 1:, 1].copy(),
                )
            else:
                self._ue = None
        return self._ue

    def contains_pairs(
        self, px: np.ndarray, py: np.ndarray, feat: np.ndarray
    ) -> np.ndarray:
        """Even-odd point-in-polygon for (point, candidate-feature) pairs.

        Fully vectorized: expands each pair to its feature's edges once and
        segment-sums ray crossings with ``np.add.reduceat``.  Cost is
        O(sum of candidate polygon edge counts) with no Python-per-row loop.
        """
        if len(px) == 0:
            return np.zeros(0, dtype=bool)
        ue = self._uniform_edge_arrays()
        if ue is not None:
            # uniform fast path: every feature is one ring of the same
            # vertex count (grid tessellations, the dominant admin shape),
            # so the pair->edge expansion is a plain (P, E) gather instead
            # of the CSR repeat/arange machinery below.  ~10x less
            # temporary memory traffic per call (measured 6.3 -> ~1.5 ms
            # per 17k pairs), which is what keeps 12 concurrent join
            # actors off the shared-cache ceiling.  Same crossing
            # arithmetic, bit-identical booleans.
            ex1, ey1, ex2, ey2 = ue
            x1, y1, x2, y2 = ex1[feat], ey1[feat], ex2[feat], ey2[feat]
            ppx, ppy = px[:, None], py[:, None]
            cond = (y1 > ppy) != (y2 > ppy)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x1 + (ppy - y1) / (y2 - y1) * (x2 - x1)
            cross = cond & (ppx < xint)
            return (cross.sum(axis=1) % 2) == 1
        # per-feature ring spans -> per-pair edge ranges (CSR over pairs)
        ring_len = np.diff(self.ring_off)
        # vertices per feature (including closing points)
        feat_nv = np.zeros(self.n_features, dtype=np.int64)
        np.add.at(feat_nv, self.poly_of_ring, ring_len)
        # build per-feature concatenated vertex index lists once (cached)
        if not hasattr(self, "_feat_vidx"):
            order = np.argsort(self.poly_of_ring, kind="stable")
            vidx_parts, ring_starts = [], self.ring_off[:-1]
            for r in order:
                vidx_parts.append(np.arange(ring_starts[r], self.ring_off[r + 1]))
            self._feat_vidx = np.concatenate(vidx_parts) if vidx_parts else np.empty(0, np.int64)
            self._feat_voff = np.concatenate(([0], np.cumsum(feat_nv)))
            # mark last vertex of each ring: its edge (to next vertex) is invalid
            ring_end_flag = np.zeros(len(self.xy), dtype=bool)
            ring_end_flag[self.ring_off[1:] - 1] = True
            self._ring_end_flag = ring_end_flag
        vidx, voff = self._feat_vidx, self._feat_voff

        pair_nv = feat_nv[feat]
        pair_off = np.concatenate(([0], np.cumsum(pair_nv)))
        total = int(pair_off[-1])
        # expanded vertex indices: for each pair, the feature's vertex list
        rep = np.repeat(np.arange(len(feat)), pair_nv)
        within = np.arange(total) - pair_off[rep]
        v = vidx[voff[feat][rep] + within]
        x1, y1 = self.xy[v, 0], self.xy[v, 1]
        vn = v + 1  # next vertex in the ring (invalid at ring ends)
        valid = ~self._ring_end_flag[v]
        x2 = np.where(valid, self.xy[np.minimum(vn, len(self.xy) - 1), 0], x1)
        y2 = np.where(valid, self.xy[np.minimum(vn, len(self.xy) - 1), 1], y1)
        ppx, ppy = px[rep], py[rep]
        # crossing test for edge (x1,y1)-(x2,y2) against ray +x from (ppx,ppy)
        cond = (y1 > ppy) != (y2 > ppy)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (ppy - y1) / (y2 - y1) * (x2 - x1)
        cross = valid & cond & (ppx < xint)
        counts = np.add.reduceat(cross.astype(np.int64), pair_off[:-1])
        counts[pair_nv == 0] = 0
        return (counts % 2) == 1


def _clip_halfplane(ring: np.ndarray, axis: int, bound: float, keep_le: bool) -> np.ndarray:
    """Sutherland–Hodgman clip of a closed ring against one axis-aligned
    half-plane (``coord <= bound`` if ``keep_le`` else ``coord >= bound``).
    Vectorized over the ring's edges; returns a closed ring (possibly
    empty).  With dyadic inputs and axis-aligned bounds every emitted
    intersection coordinate is exact (the interpolation divisor is a
    dyadic difference), which the coverage oracles rely on."""
    if len(ring) < 4:  # degenerate (closed ring needs >= 3 distinct pts)
        return np.empty((0, 2))
    p = ring[:-1]  # open ring
    q = np.roll(p, -1, axis=0)  # next vertex
    pc, qc = p[:, axis], q[:, axis]
    p_in = pc <= bound if keep_le else pc >= bound
    q_in = qc <= bound if keep_le else qc >= bound
    cross = p_in != q_in
    # intersection of each crossing edge with the boundary line
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(cross, (bound - pc) / np.where(qc == pc, 1.0, qc - pc), 0.0)
    other = 1 - axis
    io = p[:, other] + t * (q[:, other] - p[:, other])
    inter = np.empty((len(p), 2))
    inter[:, axis] = bound
    inter[:, other] = io
    # per edge emit: q if q_in; intersection if cross — in SH order
    # (inside->out: emit inter; out->inside: emit inter then q)
    parts = []
    for i in range(len(p)):  # ring vertex counts are tiny (admin polygons)
        if cross[i]:
            parts.append(inter[i])
        if q_in[i]:
            parts.append(q[i])
    if len(parts) < 3:
        return np.empty((0, 2))
    out = np.asarray(parts)
    return np.concatenate([out, out[:1]])


def clip_ring_rect(ring: np.ndarray, rx0: float, ry0: float, rx1: float, ry1: float) -> np.ndarray:
    """Clip a closed ring to an axis-aligned rectangle (4 half-plane SH
    passes); returns a closed ring (possibly empty)."""
    out = ring
    for axis, bound, keep_le in (
        (0, rx0, False),
        (0, rx1, True),
        (1, ry0, False),
        (1, ry1, True),
    ):
        out = _clip_halfplane(out, axis, bound, keep_le)
        if len(out) == 0:
            return out
    return out


def rect_coverage_area(
    polys: list[list[np.ndarray]], rx0: float, ry0: float, rx1: float, ry1: float
) -> float:
    """Planar area of (multi)polygon ∩ rectangle — exactextract's
    cell-coverage kernel (``/root/reference/src/geoglue/zonalstats.py:44-62``
    delegates this to exactextract; here it is an explicit rectangle clip).
    Ring 0 of each polygon is the exterior; further rings are holes
    (standard WKB), whose clipped area is subtracted."""
    total = 0.0
    for rings in polys:
        for i, ring in enumerate(rings):
            clipped = clip_ring_rect(ring, rx0, ry0, rx1, ry1)
            if len(clipped) == 0:
                continue
            a = abs(ring_area(clipped))
            total += a if i == 0 else -a
    return total


def ring_area(ring: np.ndarray) -> float:
    """Planar shoelace area (signed) of a closed ring."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def spherical_ring_area_km2(ring: np.ndarray) -> float:
    """Spherical area of a closed lon/lat ring (trapezoid line integral;
    kept as the model behind exactextract's ``area_spherical_km2``)."""
    lam = np.radians(ring[:, 0])
    phi = np.radians(ring[:, 1])
    s = np.sum((lam[1:] - lam[:-1]) * (np.sin(phi[1:]) + np.sin(phi[:-1])) / 2.0)
    return abs(float(s)) * EARTH_RADIUS_KM**2


def geodesic_ring_area_km2(ring: np.ndarray) -> float:
    """WGS84 ellipsoidal area of a closed lon/lat ring via the authalic-
    latitude line integral — the public closed form matching the
    reference's ``pyproj.Geod.polygon_area_perimeter`` (``types.py:76-82``)
    for lon/lat polylines (exact for graticule-aligned edges; trapezoid
    rule along slanted edges, same order as the reference's dense GADM
    vertices)."""
    lam = np.radians(ring[:, 0])
    q = _authalic_q(np.sin(np.radians(ring[:, 1])))
    s = np.sum((lam[1:] - lam[:-1]) * (q[1:] + q[:-1]) / 2.0)
    return abs(float(s)) * WGS84_A_KM**2 / 2.0
