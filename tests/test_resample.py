"""Resample/crop invariants, mirroring the reference test strategy
(``tests/test_resample.py:59-67``: sparse resampling strictly reduces the
NA fraction and never introduces NA where the dense variant had values)."""

from __future__ import annotations

import numpy as np
import pytest

from geoglue_ray.geom import Bbox
from geoglue_ray.grid import GridSpec
from geoglue_ray.stages.crop import crop_to_cover
from geoglue_ray.stages.resample import (
    bilinear,
    bilinear_sparse,
    check_coverage,
    inverse_distance,
    nearest,
)

SPEC = GridSpec(xsize=8, ysize=6, xfirst=0.0, xinc=1.0, yfirst=5.0, yinc=-1.0)


def _grid(with_nan=False):
    g = (np.arange(48, dtype=np.float64).reshape(6, 8) * 3 + 1) % 17
    if with_nan:
        g[1, 2] = np.nan
        g[4, 5] = np.nan
    return g


def test_identity_on_source_centers():
    """Resampling onto the source's own cell centers reproduces it exactly
    for every method (conformance across remapnn/remapbil/remapdis)."""
    g = _grid()
    rr, cc = np.meshgrid(np.arange(6), np.arange(8), indexing="ij")
    x, y = SPEC.cell_lonlat(rr.ravel(), cc.ravel())
    for fn in (nearest, inverse_distance):
        np.testing.assert_array_equal(fn(g, SPEC, x, y), g.ravel())
    # bilinear: interior centers only (edge cells fall outside the 4-corner hull)
    interior = (cc.ravel() < 7) & (rr.ravel() < 5)
    np.testing.assert_array_equal(
        bilinear(g, SPEC, x[interior], y[interior]), g.ravel()[interior]
    )


def test_bilinear_midpoint():
    g = _grid()
    # midpoint of 4 cells = mean of the corners
    x = np.array([0.5])
    y = np.array([4.5])
    expect = (g[0, 0] + g[0, 1] + g[1, 0] + g[1, 1]) / 4
    assert bilinear(g, SPEC, x, y)[0] == expect


def test_sparse_reduces_na_and_preserves_dense_values():
    """Reference invariant (tests/test_resample.py:59-67): the sparse
    variant has strictly fewer NAs than dense bilinear and agrees wherever
    dense is defined."""
    g = _grid(with_nan=True)
    xs = np.linspace(0.1, 6.9, 40)
    ys = np.linspace(0.1, 4.9, 40)
    X, Y = np.meshgrid(xs, ys)
    dense = bilinear(g, SPEC, X.ravel(), Y.ravel())
    sparse = bilinear_sparse(g, SPEC, X.ravel(), Y.ravel())
    assert np.isnan(sparse).sum() < np.isnan(dense).sum()
    ok = ~np.isnan(dense)
    np.testing.assert_allclose(sparse[ok], dense[ok])


def test_inverse_distance_skips_nan_corner():
    g = _grid(with_nan=True)
    v = inverse_distance(g, SPEC, np.array([2.3]), np.array([4.3]))  # near (1,2) NaN
    assert np.isfinite(v[0])


def test_coverage_check():
    assert check_coverage(SPEC, Bbox(0.0, 1.0, 6.0, 5.0))
    assert not check_coverage(SPEC, Bbox(-5.0, 0.0, 6.0, 5.0))


def test_crop_to_cover():
    src = Bbox(0, 0, 100, 100)
    out = crop_to_cover(src, Bbox(10, 10, 20, 20), Bbox(8, 8, 22, 22))
    assert out >= Bbox(8, 8, 22, 22)
    with pytest.raises(ValueError):  # source can't contain the needed crop
        crop_to_cover(Bbox(10, 10, 20, 20), Bbox(11, 11, 12, 12), Bbox(0, 0, 50, 50))


def test_resampler_rejects_unknown_method():
    from geoglue_ray.stages.resample import Resampler

    with pytest.raises(ValueError):
        Resampler(_grid(), SPEC, "remapcon")


def test_conservative_regrid_flux_and_bruteforce(ray_session):
    """remapcon: (a) brute-force 3x3 integer-overlap recompute matches,
    (b) the regrid conserves the spatial integral over the covered window
    exactly (sum of numerators == sum of source value x covered area)."""
    from geoglue_ray.pipelines.queries import resample_conservative
    from geoglue_ray.sources.weights import build_weights_grid
    from geoglue_ray.stages.resample import (
        CON_N,
        CON_SRC_U,
        CON_TINC_U,
        CON_X0_U,
        CON_YTOP_U,
    )

    out = resample_conservative("unused").to_pandas()
    assert len(out) == CON_N * CON_N
    grid = build_weights_grid().astype(np.int64)
    area = CON_TINC_U * CON_TINC_U

    # (a) brute-force recompute at a scattered subset of cells
    rng = np.random.default_rng(7)
    for idx in rng.choice(len(out), 64, replace=False):
        tr, tc = int(out["cell_row"].iloc[idx]), int(out["cell_col"].iloc[idx])
        tx0, ty0 = CON_X0_U + CON_TINC_U * tc, CON_YTOP_U - CON_TINC_U * (tr + 1)
        num = 0
        for wy in range(ty0 // CON_SRC_U, ty0 // CON_SRC_U + 3):
            for i in range(tx0 // CON_SRC_U, tx0 // CON_SRC_U + 3):
                ox = min(tx0 + CON_TINC_U, CON_SRC_U * (i + 1)) - max(tx0, CON_SRC_U * i)
                oy = min(ty0 + CON_TINC_U, CON_SRC_U * (wy + 1)) - max(ty0, CON_SRC_U * wy)
                if ox > 0 and oy > 0:
                    num += int(grid[wy, i]) * ox * oy
        assert out["resampled"].iloc[idx] == num / float(area)

    # (b) exact flux conservation: recover each cell's integer numerator
    # and compare against the analytic integral over the covered window
    nums = np.rint(out["resampled"].to_numpy() * area).astype(np.int64)
    x_lo, x_hi = CON_X0_U, CON_X0_U + CON_TINC_U * CON_N
    y_lo, y_hi = CON_YTOP_U - CON_TINC_U * CON_N, CON_YTOP_U
    wy, wx = np.indices(grid.shape)
    cov_x = np.clip(
        np.minimum(x_hi, CON_SRC_U * (wx + 1)) - np.maximum(x_lo, CON_SRC_U * wx), 0, None
    )
    cov_y = np.clip(
        np.minimum(y_hi, CON_SRC_U * (wy + 1)) - np.maximum(y_lo, CON_SRC_U * wy), 0, None
    )
    assert nums.sum() == (grid * cov_x * cov_y).sum()
