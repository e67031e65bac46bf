"""Bit-exactness of the fixture derivation: numpy vs DuckDB, and the
geometric engine (WKB + PIP + kNN) vs the closed-form arithmetic."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import geoglue_ray.fixtures as fx
from geoglue_ray.sources.admin import AdminIndex, build_admin_table
from geoglue_ray.sources.weights import build_weights_grid, lookup_weight


def _ids(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()


def test_numpy_matches_duckdb(duck, sf_dir):
    q = f"""WITH c AS ({fx.sql_corpus_cte()})
    SELECT id, lon, lat, value, event_time, {fx.sql_weight('lon','lat')} AS weight
    FROM c ORDER BY id"""
    df = duck.execute(q).fetchdf()
    ids = df["id"].to_numpy()
    lon, lat = fx.derive_lonlat(ids)
    assert np.array_equal(lon, df["lon"].to_numpy())
    assert np.array_equal(lat, df["lat"].to_numpy())
    assert np.array_equal(fx.derive_value(ids), df["value"].to_numpy())
    assert np.array_equal(
        fx.derive_event_time(ids), df["event_time"].to_numpy().astype("datetime64[us]")
    )
    assert np.array_equal(fx.derive_weight(lon, lat), df["weight"].to_numpy())


def test_engine_assignment_matches_arithmetic(sf_dir):
    ids = _ids(sf_dir)
    lon, lat = fx.derive_lonlat(ids)
    index = AdminIndex.build(build_admin_table())
    feat, via_knn = index.assign(lon, lat)
    a2 = fx.assign_admin2_arith(lon, lat)
    inside = a2 >= 0
    assert np.array_equal(feat[inside], a2[inside])
    assert np.array_equal(via_knn, ~inside)
    knn = fx.assign_knn_arith(lon[~inside], lat[~inside])
    assert np.array_equal(feat[~inside], knn)


def test_multipolygon_admin_index():
    """An archipelago admin feature (two disjoint parts) assigns points in
    EITHER part to the feature; a point in the gap falls back to kNN."""
    import pyarrow as pa

    from geoglue_ray.geom import multipolygon_wkb, polygon_wkb

    def square(x0, y0, s):
        return np.array(
            [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]],
            dtype=float,
        )

    tbl = pa.table(
        {
            "admin_id": ["A", "B"],
            "admin1_id": ["P", "P"],
            "name": ["solid", "archipelago"],
            "geometry_wkb": pa.array(
                [
                    polygon_wkb([square(0, 0, 2)]),
                    multipolygon_wkb([[square(10, 10, 2)], [square(20, 20, 2)]]),
                ],
                pa.binary(),
            ),
            "minx": [0.0, 10.0],
            "miny": [0.0, 10.0],
            "maxx": [2.0, 22.0],
            "maxy": [2.0, 22.0],
            "centroid_x": [1.0, 16.0],
            "centroid_y": [1.0, 16.0],
        }
    )
    index = AdminIndex.build(tbl)
    lon = np.array([1.0, 11.0, 21.0, 15.0])
    lat = np.array([1.0, 11.0, 21.0, 15.0])
    feat, via_knn = index.assign(lon, lat)
    assert feat.tolist() == [0, 1, 1, 1]
    assert via_knn.tolist() == [False, False, False, True]


def test_ring_knn_equals_brute():
    """The ring-expansion kNN scale path returns exactly the brute-force
    nearest centroid — fixture outside points and adversarial far points."""
    index = AdminIndex.build(build_admin_table())
    ids = np.arange(0, 500_000, 128)
    lon, lat = fx.derive_lonlat(ids)
    brute, _ = index.assign(lon, lat, knn_method="brute")
    ring, _ = index.assign(lon, lat, knn_method="ring")
    assert np.array_equal(brute, ring)
    rng = np.random.default_rng(5)
    flon, flat = rng.uniform(60, 150, 200), rng.uniform(-40, 60, 200)
    b, _ = index.assign(flon, flat, knn_method="brute")
    r, _ = index.assign(flon, flat, knn_method="ring")
    assert np.array_equal(b, r)


def test_weight_grid_lookup_matches_formula(sf_dir):
    ids = _ids(sf_dir)
    lon, lat = fx.derive_lonlat(ids)
    grid = build_weights_grid()
    assert np.array_equal(lookup_weight(lon, lat, grid), fx.derive_weight(lon, lat))


def test_no_point_on_cell_boundary(sf_dir):
    """The dyadic odd-numerator construction keeps every point strictly off
    admin-cell edges and triangle diagonals (see fixtures.py docstring)."""
    ids = np.arange(200_000)
    lon, lat = fx.derive_lonlat(ids)
    fxx = (lon - fx.LON0) / fx.CELL
    fyy = (lat - fx.LAT0) / fx.CELL
    assert not np.any(fxx == np.floor(fxx))
    assert not np.any(fyy == np.floor(fyy))
    fr = (fxx - np.floor(fxx)) + (fyy - np.floor(fyy))
    assert not np.any(fr == 1.0)


def test_admin_table_shape():
    t = build_admin_table()
    assert len(t) == fx.N_ADMIN2
    ids = t["admin_id"].to_pylist()
    assert len(set(ids)) == len(ids)  # pk uniqueness (config.py:88-91 analogue)
    a1 = set(t["admin1_id"].to_pylist())
    assert len(a1) == fx.NX1 * fx.NY1


def test_read_table_lance_dispatch(tmp_path):
    """Lance-or-parquet source dispatch: a Lance directory without the
    lance package is a loud ImportError (never a silent parquet fallback);
    no Lance directory -> parquet read."""
    import pyarrow.parquet as pq
    import pytest

    from geoglue_ray.sources.corpus import read_table

    try:
        import lance  # noqa: F401

        pytest.skip("lance installed; error path not reachable")
    except ImportError:
        pass
    import pyarrow as pa

    pq.write_table(pa.table({"a": [1, 2]}), tmp_path / "t.parquet")
    assert read_table(str(tmp_path / "t")).count() == 2
    (tmp_path / "t.lance").mkdir()
    with pytest.raises(ImportError, match="lance"):
        read_table(str(tmp_path / "t"))
