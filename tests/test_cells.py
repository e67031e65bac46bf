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
