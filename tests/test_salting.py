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


def test_skewed_salted_equals_unsalted(sf_dir):
    """The mega-cell fixture (half the corpus teleported into ONE admin
    unit) must produce bit-identical results salted and unsalted, and the
    hot unit must actually be hot (~50% of rows)."""
    from geoglue_ray.pipelines.zonal import skewed_zonal

    plain = skewed_zonal(sf_dir, replicas=4).to_pandas()
    salted = skewed_zonal(sf_dir, replicas=4, salt=8).to_pandas()
    assert list(plain.columns) == list(salted.columns)
    for c in plain.columns:
        a, b = plain[c].to_numpy(), salted[c].to_numpy()
        assert np.array_equal(a, b, equal_nan=(a.dtype.kind == "f")), c
    counts = plain["count"].to_numpy()
    assert counts.max() >= 0.45 * counts.sum()  # one mega-cell


def test_fused_equals_zonal_pipeline(sf_dir):
    """The fused single-pool bench variant must equal the composed
    pipeline bit-exactly, including through the per-batch
    reduce_partials collapse and the _merge_partials final merge
    (integer-valued partial sums -> order-independent)."""
    from geoglue_ray.pipelines.zonal import fused_zonal_pipeline, zonal_pipeline

    fused = fused_zonal_pipeline(sf_dir, replicas=3).to_pandas()
    composed = zonal_pipeline(sf_dir, replicas=3).to_pandas()
    assert list(fused.columns) == list(composed.columns)
    assert len(fused) == len(composed)
    for c in fused.columns:
        a, b = fused[c].to_numpy(), composed[c].to_numpy()
        assert np.array_equal(a, b, equal_nan=(a.dtype.kind == "f")), c


def test_fused_merge_paths_identical(sf_dir):
    """Both final-merge selections (single-task reduce vs bucketed
    _merge_partials shuffle) must produce the identical table."""
    from geoglue_ray.pipelines.zonal import fused_zonal_pipeline

    single = fused_zonal_pipeline(sf_dir, replicas=2).to_pandas()
    bucketed = fused_zonal_pipeline(sf_dir, replicas=2, merge_bound=0).to_pandas()
    assert list(single.columns) == list(bucketed.columns)
    for c in single.columns:
        a, b = single[c].to_numpy(), bucketed[c].to_numpy()
        assert np.array_equal(a, b, equal_nan=(a.dtype.kind == "f")), c
