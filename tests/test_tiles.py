"""Tile pyramid: rollup-by-parent must equal re-encoding every point at
every level (the invariant the oracle checks end-to-end at sf0.01 — here
against a pure-numpy reference, plus batch-split independence)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from geoglue_ray import cells
from geoglue_ray.stages.tiles import tile_pyramid


def _reference(lon, lat, v, res, n_levels):
    rows = []
    v = np.floor(v)
    for level in range(res, res - n_levels, -1):
        c = cells.encode(lon, lat, level)
        uniq, inv = np.unique(c, return_inverse=True)
        r, x, y = cells.decode(uniq)
        rows.append(
            pd.DataFrame(
                {
                    "level": r.astype(np.int64),
                    "cell_x": x.astype(np.int64),
                    "cell_y": y.astype(np.int64),
                    "n_obs": np.bincount(inv).astype(np.float64),
                    "sum_val": np.bincount(inv, weights=v),
                }
            )
        )
    out = pd.concat(rows, ignore_index=True)
    return out.sort_values(["level", "cell_x", "cell_y"]).reset_index(drop=True)


def _points(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-179.9, 179.9, n)
    lat = rng.uniform(-89.9, 89.9, n)
    v = np.floor(rng.uniform(0, 100, n))
    return lon, lat, v


def test_pyramid_matches_per_level_encode():
    lon, lat, v = _points()
    ds = rd.from_arrow(
        pa.table({"lon": pa.array(lon), "lat": pa.array(lat), "value": pa.array(v)})
    )
    got = (
        tile_pyramid(ds, res=9, n_levels=3)
        .to_pandas()
        .sort_values(["level", "cell_x", "cell_y"])
        .reset_index(drop=True)
    )
    want = _reference(lon, lat, v, 9, 3)
    pd.testing.assert_frame_equal(got, want)


def test_pyramid_batch_split_independent():
    lon, lat, v = _points(n=999, seed=11)
    t = pa.table({"lon": pa.array(lon), "lat": pa.array(lat), "value": pa.array(v)})
    outs = []
    for blocks in (1, 7):
        ds = rd.from_arrow(t).repartition(blocks)
        outs.append(
            tile_pyramid(ds, res=8, n_levels=2)
            .to_pandas()
            .sort_values(["level", "cell_x", "cell_y"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_pyramid_rejects_bad_levels():
    ds = rd.from_arrow(pa.table({"lon": [0.0], "lat": [0.0], "value": [1.0]}))
    import pytest

    with pytest.raises(ValueError):
        tile_pyramid(ds, res=3, n_levels=5)


def test_zorder_prefix_locality():
    """Morton invariant: shifting the key right by 2 gives the key of the
    parent 2x2 square — the property that makes z-sorted layouts prune
    spatial range reads."""
    import numpy as np

    from geoglue_ray.cells import zorder_key

    rng = np.random.default_rng(6)
    x = rng.integers(0, 1 << 16, 1000)
    y = rng.integers(0, 1 << 16, 1000)
    z = zorder_key(x, y)
    assert np.array_equal(z >> 2, zorder_key(x >> 1, y >> 1))
    # exact interleave on hand values
    assert zorder_key(np.array([3]), np.array([1]))[0] == 0b111
    assert zorder_key(np.array([0]), np.array([0xFFFF]))[0] == int(
        "10" * 16, 2
    )
