"""Coverage-fraction zonal statistics: rect-clip kernel, coverage table,
op-param plumbing.  The end-to-end bit-exactness vs DuckDB is covered by
the oracle gate (``zonal_coverage``); these tests pin the geometry kernel
and the parameter semantics in isolation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from geoglue_ray.geom import rect_coverage_area


def tri_lower(x0=0.0, y0=0.0, s=1.0):
    return [
        [
            np.array(
                [[x0, y0], [x0 + s, y0], [x0, y0 + s], [x0, y0]], dtype=np.float64
            )
        ]
    ]


def test_rect_coverage_kernel():
    t = tri_lower()
    assert rect_coverage_area(t, 0, 0, 1, 1) == 0.5
    assert rect_coverage_area(t, 0, 0, 0.5, 0.5) == 0.25  # fully inside
    assert rect_coverage_area(t, 0.5, 0.5, 1, 1) == 0.0  # corner touch only
    # clamped-corner closed form T(.5) = .125 for the centered rect
    assert rect_coverage_area(t, 0.25, 0.25, 0.75, 0.75) == 0.125
    assert rect_coverage_area(t, -1, -1, 2, 2) == 0.5  # rect contains tri


def test_rect_coverage_hole_and_multipart():
    sq = [
        [
            np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=np.float64),
            np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], dtype=np.float64),
        ]
    ]
    assert rect_coverage_area(sq, 0, 0, 4, 4) == 12.0
    assert rect_coverage_area(sq, 0, 0, 2, 2) == 3.0
    two = tri_lower(0, 0) + tri_lower(10, 10)
    assert rect_coverage_area(two, 0, 0, 20, 20) == 1.0


def test_coverage_pairs_fractions_sum_to_one():
    """Cells interior to the admin bbox are fully covered: their fractions
    across overlapping triangles sum to exactly 1 (coverage partitions the
    cell); boundary-exterior cells sum to < 1 or are absent."""
    from geoglue_ray.sources.admin import AdminIndex, build_admin_table
    from geoglue_ray.sources.raster import raster_grid_spec
    from geoglue_ray.stages.coverage import coverage_pairs

    index = AdminIndex.build(build_admin_table())
    grid = raster_grid_spec()
    rows = np.repeat(np.arange(8, dtype=np.int64), grid.xsize)
    cols = np.tile(np.arange(grid.xsize, dtype=np.int64), 8)
    t = coverage_pairs(index, grid, rows, cols).to_pandas()
    assert (t["cov"] > 0).all()
    per_cell = t.groupby(["cell_row", "cell_col"])["cov"].sum()
    # col 32 lies east of the bbox -> no pairs at all
    assert 32 not in set(t["cell_col"])
    # row 0 straddles lat 24: covered fraction is exactly (24-23.8125)/0.25
    row0 = per_cell.xs(0, level="cell_row")
    assert np.allclose(row0.to_numpy(), 0.75) and (row0 == 0.75).all()
    # interior rows partition exactly
    interior = per_cell[per_cell.index.get_level_values(0) > 0]
    assert (interior == 1.0).all()


def test_coverage_weight_variants():
    from geoglue_ray.sources.admin import AdminIndex, build_admin_table
    from geoglue_ray.sources.raster import raster_grid_spec
    from geoglue_ray.stages.coverage import coverage_pairs

    index = AdminIndex.build(build_admin_table())
    grid = raster_grid_spec()
    rows = np.full(grid.xsize, 5, dtype=np.int64)
    cols = np.arange(grid.xsize, dtype=np.int64)
    plain = coverage_pairs(index, grid, rows, cols).to_pandas()
    cart = coverage_pairs(index, grid, rows, cols, "area_cartesian").to_pandas()
    sph = coverage_pairs(index, grid, rows, cols, "area_spherical_km2").to_pandas()
    cell_area = grid.xinc * abs(grid.yinc)
    assert np.array_equal(cart["cov"].to_numpy(), plain["cov"].to_numpy() * cell_area)
    # spherical cell areas at ~22.5N latitude: ~0.0625 deg^2 * (111km)^2 * cos(lat)
    ratio = sph["cov"].to_numpy() / plain["cov"].to_numpy()
    assert ((ratio > 600) & (ratio < 800)).all()
    with pytest.raises(ValueError, match="coverage_weight"):
        coverage_pairs(index, grid, rows, cols, "bogus")


def test_zonal_aggregate_param_validation():
    import ray.data as rd

    from geoglue_ray.stages.zonal import zonal_aggregate

    ds = rd.from_arrow(pa.table({"k": [1, 1, 2], "value": [1.0, None, 3.0]}))
    # default_value fills NODATA before aggregation
    out = (
        zonal_aggregate(ds, ["sum(default_value=7)", "count"], keys=["k"])
        .to_pandas()
        .set_index("k")
    )
    assert out.loc[1, "sum(default_value=7)"] == 8.0
    assert out.loc[1, "count"] == 2.0
    with pytest.raises(ValueError, match="skip_nulls"):
        zonal_aggregate(ds, ["sum(default_value=0)"], keys=["k"], skip_nulls=True)
    with pytest.raises(ValueError, match="conflicting"):
        zonal_aggregate(
            ds, ["sum(default_value=0)", "mean(default_value=1)"], keys=["k"]
        )
    with pytest.raises(ValueError, match="unknown op params"):
        zonal_aggregate(ds, ["sum(bogus_param=1)"], keys=["k"])
    with pytest.raises(ValueError, match="coverage_weight requires"):
        zonal_aggregate(ds, ["sum(coverage_weight=area_spherical_km2)"], keys=["k"])


def test_null_group_keys_kept():
    """SQL GROUP BY keeps NULL key groups — the factorized partial path
    must not silently drop them (round-1 ADVICE item)."""
    import ray.data as rd

    from geoglue_ray.stages.zonal import zonal_aggregate

    t = pa.table(
        {"k": pa.array(["a", None, None, "b"]), "value": [1.0, 2.0, 3.0, 4.0]}
    )
    out = zonal_aggregate(rd.from_arrow(t), ["sum"], keys=["k"]).to_pandas()
    assert len(out) == 3
    nullrow = out[out["k"].isna()]
    assert len(nullrow) == 1 and nullrow["sum"].iloc[0] == 5.0


def test_attach_coverage_empty_table_emits_zero_rows():
    """No polygon overlapping any cell -> AttachCoverage drops every row
    (inner semantics) instead of raising on the empty CSR."""
    from geoglue_ray.stages.coverage import AttachCoverage

    empty_cov = pa.table(
        {
            "cell_row": pa.array([], pa.int64()),
            "cell_col": pa.array([], pa.int64()),
            "admin_idx": pa.array([], pa.int64()),
            "cov": pa.array([], pa.float64()),
        }
    )
    st = AttachCoverage(empty_cov, xsize=8)
    batch = pa.table(
        {
            "cell_row": pa.array([0, 1], pa.int64()),
            "cell_col": pa.array([2, 3], pa.int64()),
            "value": pa.array([1.0, 2.0]),
        }
    )
    out = st(batch)
    assert len(out) == 0
    assert out.schema.names == ["cell_row", "cell_col", "value", "admin_idx", "cov"]


def test_fill_default_integer_columns():
    """default_value / default_weight on INTEGER value columns must fill
    nulls (cast before is_nan) instead of raising ArrowNotImplementedError."""
    from geoglue_ray.stages.zonal import _fill_default

    b = pa.table({"v": pa.array([1, None, 3], type=pa.int64())})
    out = _fill_default(b, "v", 7.0)
    assert out["v"].to_pylist() == [1.0, 7.0, 3.0]
    assert out["v"].type == pa.float64()


def test_coverage_join_path_matches_broadcast_exactly():
    """Forcing the beyond-broadcast hash-join topology (tiny pair budget)
    must reproduce the broadcast path's zonal_coverage output bit-for-bit
    — same rows, same float values, same dtypes."""
    from geoglue_ray.pipelines.raster import zonal_coverage

    a = zonal_coverage().to_pandas()  # broadcast CSR path (default budget)
    b = zonal_coverage(broadcast_pairs_below=0).to_pandas()  # join path
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) > 0
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert av.dtype == bv.dtype, c
        assert np.array_equal(av, bv, equal_nan=av.dtype.kind == "f"), c


def test_dasymetric_conserves_admin_totals(ray_session):
    """Dasymetric allocation is mass-preserving: per admin with nonzero
    ancillary mass, the cell allocations sum back to the admin's event
    count (up to the one rounded division per cell)."""
    import numpy as np

    from geoglue_ray.pipelines.queries import dasymetric_events

    df = dasymetric_events("/root/testdata/sf0.001").to_pandas()
    got = df.dropna(subset=["alloc"]).groupby("admin_id")["alloc"].sum()
    # recompute admin totals independently of the allocation path
    from geoglue_ray.pipelines.queries import events_zonal

    tot = events_zonal("/root/testdata/sf0.001").to_pandas().set_index("admin_id")["count"]
    joined = got.to_frame("alloc_sum").join(tot.rename("total"), how="inner")
    # only admins fully covered by >=1 cell can conserve; every admin in
    # the allocation output is such an admin
    assert len(joined) > 0
    assert np.allclose(joined["alloc_sum"], joined["total"], rtol=1e-12)
