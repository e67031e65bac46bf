"""Deterministic splits + stratified sampling (stages/sample.py): pure
functions of the id hash — batch-split independent, rerun-stable, and
equal to a serial numpy reference (the SQL replica is covered by the
oracle gate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from geoglue_ray.functions.texthash import int_hash64
from geoglue_ray.stages.sample import (
    hash_split,
    split_of,
    split_summary,
    stratified_sample,
)


def test_split_of_matches_hash_buckets():
    ids = np.arange(10_000, dtype=np.int64)
    b = (int_hash64(ids) % np.uint64(10)).astype(np.int64)
    want = np.where(b >= 9, "test", np.where(b >= 8, "val", "train"))
    np.testing.assert_array_equal(split_of(ids).astype(str), want)
    # roughly 8/1/1
    frac = np.mean(b < 8)
    assert 0.75 < frac < 0.85


def test_hash_split_consistent_with_summary():
    ids = np.arange(3_000, dtype=np.int64)
    m = (ids % 17).astype(np.float64)
    t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(m)})
    ds = rd.from_arrow(t).repartition(5)
    tagged = hash_split(ds, "doc_id").to_pandas()
    want = (
        tagged.groupby("split", as_index=False)
        .agg(n_docs=("doc_id", "size"), sum_measure=("n_chars", "sum"))
        .astype({"n_docs": np.float64})
        .sort_values("split")
        .reset_index(drop=True)
    )
    got = (
        split_summary(ds, "doc_id", "n_chars")
        .to_pandas()
        .sort_values("split")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def _ref_sample(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.copy()
    df["sample_key"] = int_hash64(df["doc_id"].to_numpy()).view(np.int64)
    df["_u"] = df["sample_key"].to_numpy().view(np.uint64)
    df = df.sort_values(["lang", "_u", "doc_id"], kind="mergesort")
    df["rank"] = df.groupby("lang").cumcount() + 1
    out = df[df["rank"] <= k][["lang", "doc_id", "sample_key", "rank"]]
    return out.sort_values(["lang", "rank"]).reset_index(drop=True)


def test_stratified_sample_matches_reference_and_batch_splits():
    rng = np.random.default_rng(3)
    n = 5_000
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(n).astype(np.int64),
            "lang": rng.choice(["en", "fr", "de", "sw"], n),
        }
    )
    want = _ref_sample(df, k=13)
    for blocks in (1, 9):
        ds = rd.from_pandas(df).repartition(blocks)
        got = (
            stratified_sample(ds, "lang", "doc_id", 13)
            .to_pandas()
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_stratified_sample_small_stratum_keeps_all():
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64), "lang": ["xx"] * 5})
    got = stratified_sample(rd.from_pandas(df), "lang", "doc_id", 100).to_pandas()
    assert len(got) == 5
    assert set(got["rank"]) == {1, 2, 3, 4, 5}


def test_greedy_pack_semantics():
    """Boundary cases: exact fit stays in the pack, overflow opens a new
    one, an oversize doc gets its own pack, strata are independent."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.sample import greedy_pack

    t = pa.table(
        {
            "s": pa.array(["a"] * 5 + ["b"] * 2),
            "id": pa.array([1, 2, 3, 4, 5, 1, 2], pa.int64()),
            "n": pa.array([60, 40, 1, 200, 10, 100, 100], pa.int64()),
        }
    )
    out = (
        greedy_pack(rd.from_arrow(t).repartition(3), "s", "n", "id", capacity=100)
        .to_pandas()
        .sort_values(["s", "id"])
        .reset_index(drop=True)
    )
    # a: 60+40=100 exact fit -> pack 1; 1 -> pack 2; 200 oversize -> pack 3; 10 -> pack 4
    assert out.loc[out["s"] == "a", "pack_id"].tolist() == [1, 1, 2, 3, 4]
    assert out.loc[out["s"] == "a", "pack_fill"].tolist() == [60, 100, 1, 200, 10]
    # b: independent numbering
    assert out.loc[out["s"] == "b", "pack_id"].tolist() == [1, 2]


def test_weighted_sample_bias_and_exactness():
    """weighted_sample matches the brute-force priority rule exactly and
    overselects heavy rows (weight 50 vs 1), invariant to block splits."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.functions.texthash import kmv_hash64
    from geoglue_ray.stages.sample import weighted_sample

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    w = np.where(ids % 10 == 0, 50, 1).astype(np.int64)  # 10% heavy
    t = pa.table(
        {
            "g": pa.array(np.repeat(["x", "y"], n // 2)),
            "doc_id": pa.array(ids),
            "w": pa.array(w),
        }
    )
    pri = kmv_hash64(ids) // w.astype(np.uint64)
    import pandas as pd

    bf = pd.DataFrame({"g": t["g"].to_numpy(zero_copy_only=False), "doc_id": ids, "pri": pri})
    bf["rank"] = bf.sort_values(["pri", "doc_id"]).groupby("g").cumcount() + 1
    want = bf[bf["rank"] <= 30].sort_values(["g", "rank"])  # noqa: F841 — built below per group
    want_ids = {
        g: sub.sort_values(["pri", "doc_id"]).head(30)["doc_id"].tolist()
        for g, sub in bf.groupby("g")
    }
    for parts in (1, 7):
        got = (
            weighted_sample(rd.from_arrow(t).repartition(parts), "g", "doc_id", "w", 30)
            .to_pandas()
            .sort_values(["g", "rank"])
        )
        for g, sub in got.groupby("g"):
            assert sub["doc_id"].tolist() == want_ids[g]
    heavy_frac = (got["doc_id"] % 10 == 0).mean()
    assert heavy_frac > 0.5  # 10% of rows, >50% of the sample


def test_weighted_sample_rejects_nonpositive():
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from geoglue_ray.stages.sample import weighted_sample

    t = pa.table({"g": ["a"], "doc_id": pa.array([1], pa.int64()), "w": pa.array([0], pa.int64())})
    with pytest.raises(Exception, match="positive"):
        weighted_sample(rd.from_arrow(t), "g", "doc_id", "w", 5).to_pandas()
