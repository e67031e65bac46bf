from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from geoglue_ray.grid import GridSpec
from geoglue_ray.sources.admin import attach_geometry, build_admin_table
from geoglue_ray.stages.normalize import canonical_sort, normalize, wrap_longitude


def test_wrap_longitude():
    lon = np.array([0.0, 190.0, 360.0, -190.0, 179.9, 540.0])
    out = wrap_longitude(lon)
    np.testing.assert_allclose(out, [0.0, -170.0, 0.0, 170.0, 179.9, -180.0])
    assert ((out >= -180) & (out < 180)).all()


def test_normalize_renames_and_wraps():
    t = pa.table({"longitude": [190.0, 10.0], "latitude": [5.0, -5.0], "v": [1, 2]})
    out = normalize(rd.from_arrow(t)).to_pandas()
    assert list(out.columns) == ["lon", "lat", "v"]
    assert out["lon"].tolist() == [-170.0, 10.0]


def test_canonical_sort_lat_desc_lon_asc():
    t = pa.table({"lon": [2.0, 1.0, 1.0], "lat": [0.0, 5.0, 0.0]})
    out = canonical_sort(rd.from_arrow(t)).to_pandas()
    assert out[["lat", "lon"]].values.tolist() == [[5.0, 1.0], [0.0, 1.0], [0.0, 2.0]]


def test_attach_geometry_keyed_not_positional():
    admin = build_admin_table()
    # stats deliberately NOT in admin-table order
    stats = pa.table({"admin_id": ["ADM2-0005", "ADM2-0001"], "mean": [5.0, 1.0]})
    out = attach_geometry(stats, admin)
    assert out["name"].to_pylist() == ["Region 0005", "Region 0001"]
    assert len(out["geometry_wkb"][0].as_py()) > 0


def test_gridspec_from_table_roundtrip():
    spec = GridSpec(xsize=5, ysize=4, xfirst=10.0, xinc=0.5, yfirst=3.0, yinc=-0.5)
    rr, cc = np.meshgrid(np.arange(4), np.arange(5), indexing="ij")
    lon, lat = spec.cell_lonlat(rr.ravel(), cc.ravel())
    t = pa.table({"longitude": lon, "latitude": lat})
    got = GridSpec.from_table(t)
    assert got.approx_equal(spec)
    assert spec.bbox() == (9.75, 1.25, 12.25, 3.25)
    # nearest-cell inverse
    r2, c2 = spec.lonlat_cell(lon, lat)
    assert np.array_equal(r2, rr.ravel()) and np.array_equal(c2, cc.ravel())
