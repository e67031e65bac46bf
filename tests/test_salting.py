"""Explicit hot-key salting: the two-level salted merge must equal the
unsalted path bit-exactly on the skewed fixture (one mega-cell holds ~30%
of rows)."""

from __future__ import annotations

import numpy as np

from geoglue_ray.pipelines.zonal import corpus_with_admin
from geoglue_ray.stages.zonal import zonal_aggregate

OPS = ["mean", "sum", "count", "min", "max", "weighted_mean", "weighted_sum"]


def test_salted_equals_unsalted(sf_dir):
    ds = corpus_with_admin(sf_dir, with_spans=False, with_weights=True, emit_names=False)
    plain = (
        zonal_aggregate(ds, OPS, keys=["admin_idx"], weight_col="weight")
        .to_pandas()
        .sort_values("admin_idx")
        .reset_index(drop=True)
    )
    ds2 = corpus_with_admin(sf_dir, with_spans=False, with_weights=True, emit_names=False)
    salted = (
        zonal_aggregate(ds2, OPS, keys=["admin_idx"], weight_col="weight", salt=8)
        .to_pandas()
        .sort_values("admin_idx")
        .reset_index(drop=True)
    )
    assert list(salted.columns) == list(plain.columns)
    for c in plain.columns:
        a, b = plain[c].to_numpy(), salted[c].to_numpy()
        assert np.array_equal(a, b, equal_nan=(a.dtype.kind == "f")), c
