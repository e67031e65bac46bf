"""HyperLogLog: accuracy vs exact distinct, mergeability, distributed use."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from geoglue_ray.stages.sketch import _registers, approx_distinct, estimate, merge_registers


def test_hll_accuracy_across_scales():
    rng = np.random.default_rng(11)
    for true_n in (100, 5_000, 200_000):
        vals = rng.integers(0, 1 << 62, size=true_n * 2) % (1 << 62)
        vals = np.unique(vals)[:true_n]
        est = estimate(_registers(vals))
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_single_pass():
    rng = np.random.default_rng(12)
    vals = rng.integers(0, 1 << 62, size=50_000)
    whole = _registers(vals)
    parts = [_registers(c) for c in np.array_split(vals, 7)]
    merged = merge_registers(parts)
    assert np.array_equal(whole, merged)  # sketches merge losslessly


def test_approx_distinct_dataset():
    rng = np.random.default_rng(13)
    n = 120_000
    t = pa.table(
        {
            "grp": np.repeat(["a", "b"], n // 2),
            "v": np.concatenate(
                [rng.integers(0, 10_000, n // 2), rng.integers(0, 40_000, n // 2)]
            ),
        }
    )
    out = (
        approx_distinct(rd.from_arrow(t), ["grp"], "v")
        .to_pandas()
        .set_index("grp")["approx_distinct"]
    )
    exact_a = len(np.unique(t["v"].to_numpy()[: n // 2]))
    exact_b = len(np.unique(t["v"].to_numpy()[n // 2 :]))
    assert abs(out["a"] - exact_a) / exact_a < 0.05
    assert abs(out["b"] - exact_b) / exact_b < 0.05
