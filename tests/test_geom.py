"""Unit tests for the pure-numpy geometry kernels (WKB, PIP, areas, Bbox)."""

from __future__ import annotations

import numpy as np

from geoglue_ray.geom import (
    Bbox,
    PolygonSet,
    parse_wkb,
    polygon_wkb,
    ring_area,
    spherical_ring_area_km2,
)


def square(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]])


def test_wkb_roundtrip():
    ring = square(1.0, 2.0, 3.0)
    polys = parse_wkb(polygon_wkb([ring]))
    assert len(polys) == 1 and len(polys[0]) == 1
    np.testing.assert_array_equal(polys[0][0], ring)


def test_pip_square_and_hole():
    outer = square(0, 0, 10)
    hole = square(4, 4, 2)  # even-odd: inside the hole -> outside the polygon
    ps = PolygonSet.from_wkb([polygon_wkb([outer, hole])])
    px = np.array([5.0, 1.0, 11.0, 4.5])
    py = np.array([1.0, 5.0, 5.0, 4.5])
    feat = np.zeros(4, dtype=np.int64)
    got = ps.contains_pairs(px, py, feat)
    np.testing.assert_array_equal(got, [True, True, False, False])


def test_pip_concave():
    # concave "L" shape; hand oracle
    ring = np.array(
        [[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4], [0, 0]], dtype=float
    )
    ps = PolygonSet.from_wkb([polygon_wkb([ring])])
    pts = np.array([[0.5, 0.5], [2.0, 0.5], [2.0, 2.0], [0.5, 3.0], [3.0, 3.0]])
    got = ps.contains_pairs(pts[:, 0], pts[:, 1], np.zeros(5, dtype=np.int64))
    np.testing.assert_array_equal(got, [True, True, False, True, False])


def test_pip_multi_candidate_pairs():
    a = PolygonSet.from_wkb([polygon_wkb([square(0, 0, 1)]), polygon_wkb([square(2, 0, 1)])])
    px = np.array([0.5, 0.5, 2.5, 2.5])
    py = np.array([0.5, 0.5, 0.5, 0.5])
    feat = np.array([0, 1, 0, 1], dtype=np.int64)
    got = a.contains_pairs(px, py, feat)
    np.testing.assert_array_equal(got, [True, False, False, True])


def test_multipolygon_pip():
    """Archipelago-style feature: two disjoint parts, one with a hole —
    inside either part counts as inside the feature (even-odd across all
    its rings)."""
    from geoglue_ray.geom import multipolygon_wkb

    island_a = [square(0, 0, 2)]
    island_b = [square(10, 10, 4), square(11, 11, 1)]  # with a lagoon hole
    buf = multipolygon_wkb([island_a, island_b])
    # roundtrip
    polys = parse_wkb(buf)
    assert len(polys) == 2 and len(polys[1]) == 2
    ps = PolygonSet.from_wkb([buf])
    assert ps.n_features == 1
    px = np.array([1.0, 12.5, 11.5, 5.0, 13.9])
    py = np.array([1.0, 12.5, 11.5, 5.0, 13.9])
    got = ps.contains_pairs(px, py, np.zeros(5, dtype=np.int64))
    # island A interior; island B interior; lagoon hole; open sea; island B edge region
    np.testing.assert_array_equal(got, [True, True, False, False, True])
    # feature bbox spans both parts
    np.testing.assert_array_equal(ps.bbox[0], [0, 0, 14, 14])


def test_ring_area():
    assert ring_area(square(0, 0, 2)) == 4.0
    # ~111km x ~111km cell at the equator
    area = spherical_ring_area_km2(square(0, 0, 1))
    assert 12300 < area < 12400


def test_bbox_algebra():
    a = Bbox(0, 0, 10, 10)
    b = Bbox(2, 2, 5, 5)
    assert b <= a and a >= b and not (a <= b)
    inter = a & Bbox(5, 5, 15, 15)
    assert inter == Bbox(5, 5, 10, 10)
    assert (a & Bbox(20, 20, 30, 30)) is None
    assert a.enlarge(0.1) == Bbox(-1, -1, 11, 11)
    assert abs(a.overlap_fraction(Bbox(5, 0, 15, 10)) - 0.5) < 1e-12
    assert Bbox.from_string("1,2,3,4").to_list() == [1, 2, 3, 4]
    # one-degree square at equator ~ 12364 km^2
    assert 12300 < Bbox(0, 0, 1, 1).spherical_area_km2() < 12400


def test_geodetic_area_wgs84():
    """WGS84 authalic-integral area: hemisphere matches 2*pi*Rq^2 (authalic
    radius 6371.0071810 km), bbox and ring forms agree, and the ellipsoid
    diverges from the sphere by the expected sub-percent latitude bias."""
    import numpy as np

    from geoglue_ray.geom import Bbox, geodesic_ring_area_km2

    hemi = Bbox(-180, 0, 180, 90).geodetic_area_km2()
    rq = 6371.0071810
    assert abs(hemi - 2 * np.pi * rq**2) / hemi < 1e-9
    b = Bbox(102, 8, 110, 24)
    ring = np.array(
        [[102.0, 8.0], [110.0, 8.0], [110.0, 24.0], [102.0, 24.0], [102.0, 8.0]]
    )
    assert abs(b.geodetic_area_km2() - geodesic_ring_area_km2(ring)) < 1e-6
    # ellipsoid vs sphere: small but nonzero, latitude-dependent
    rel = abs(b.geodetic_area_km2() - b.spherical_area_km2()) / b.geodetic_area_km2()
    assert 0 < rel < 0.01


def test_coverage_fraction_semantics():
    from geoglue_ray.geom import Bbox

    a = Bbox(0, 0, 10, 10)
    assert a.coverage_fraction(Bbox(2, 2, 5, 5)) == 1.0  # contained
    assert 0 < a.coverage_fraction(Bbox(5, 0, 15, 10)) < 1.0
    assert a.coverage_fraction(Bbox(20, 20, 30, 30)) == 0.0
