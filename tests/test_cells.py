from __future__ import annotations

import numpy as np

from geoglue_ray import cells


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    for res in (5, 11, 16):
        c = cells.encode(lon, lat, res)
        r, x, y = cells.decode(c)
        assert (r == res).all()
        minx, miny, maxx, maxy = cells.cell_bounds(c)
        assert ((lon >= minx) & (lon <= maxx)).all()
        assert ((lat >= miny) & (lat <= maxy)).all()


def test_parent_contains():
    lon = np.array([12.34, -77.1])
    lat = np.array([45.6, -12.9])
    fine = cells.encode(lon, lat, 16)
    coarse = cells.encode(lon, lat, 10)
    np.testing.assert_array_equal(cells.parent(fine, 10), coarse)


def test_cover_bbox_contains_points():
    cov = set(cells.cover_bbox(102.0, 8.0, 102.5, 8.5, 11).tolist())
    pts_lon = np.array([102.01, 102.49, 102.25])
    pts_lat = np.array([8.01, 8.49, 8.25])
    enc = cells.encode(pts_lon, pts_lat, 11)
    assert set(enc.tolist()) <= cov


def test_ring_includes_neighbors():
    c = int(cells.encode(np.array([10.0]), np.array([10.0]), 11)[0])
    r1 = set(cells.ring(c, 1).tolist())
    assert c in r1 and len(r1) == 9


def test_hilbert_key_matches_scalar_reference():
    """Vectorized xy2d vs the canonical scalar walk, plus the defining
    property: consecutive curve positions are 4-neighbour grid steps."""
    from geoglue_ray.cells import hilbert_key

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    rng = np.random.default_rng(3)
    for order in (4, 10, 16):
        n = 1 << order
        xs = rng.integers(0, n, 200)
        ys = rng.integers(0, n, 200)
        ref = np.array([xy2d(n, int(a), int(b)) for a, b in zip(xs, ys)])
        assert np.array_equal(hilbert_key(xs, ys, order), ref)
    n = 16
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_key(xs.ravel(), ys.ravel(), order=4)
    pos = np.empty((n * n, 2), dtype=np.int64)
    pos[d] = np.c_[xs.ravel(), ys.ravel()]
    steps = np.abs(np.diff(pos, axis=0)).sum(1)
    assert (steps == 1).all()
