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
