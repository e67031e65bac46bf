"""Invariant tests for the training-data operators that have no SQL oracle
(near-dup detection, LSH similarity, language ID, fingerprints, media)."""

from __future__ import annotations

import numpy as np
import pytest

import __ray_entry__ as entrymod
from geoglue_ray.stages.dedup import char_ngram_jaccard, popcount64


@pytest.fixture(scope="module")
def q():
    return entrymod.queries()


def test_lang_id(q, sf_dir):
    df = q["lang_id"](sf_dir).to_pandas()
    assert len(df) == 500
    assert set(df["pred_lang"]) <= {"en", "es", "fr", "de", "zh"}
    assert ((df["lang_score"] >= 0) & (df["lang_score"] <= 1)).all()


def test_fingerprint_properties(q, sf_dir):
    df = q["doc_fingerprint"](sf_dir).to_pandas()
    assert len(df) == 500
    # distinct texts -> distinct fingerprints (high probability, deterministic)
    assert df["fingerprint"].nunique() == 500
    # determinism across runs
    df2 = q["doc_fingerprint"](sf_dir).to_pandas()
    assert df.equals(df2)


def test_fingerprint_order_sensitivity():
    import pyarrow as pa

    from geoglue_ray.stages.text import fingerprint

    t = pa.table({"text": ["alpha beta gamma", "gamma beta alpha", "alpha  beta gamma"]})
    out = fingerprint(t)["fingerprint"].to_pylist()
    assert out[0] != out[1]  # permutation-sensitive
    assert out[0] == out[2]  # whitespace-normalization-insensitive


def test_minhash_neardup_pairs(q, sf_dir):
    df = q["minhash_neardup"](sf_dir).to_pandas()
    if len(df):
        assert (df["doc_a"] < df["doc_b"]).all()
        assert ((df["est_jaccard"] >= 0.4) & (df["est_jaccard"] <= 1.0)).all()
        assert not df.duplicated(["doc_a", "doc_b"]).any()


def test_minhash_detects_true_duplicates():
    """A corpus with planted near-duplicates: MinHash+LSH must find them."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.dedup import minhash_neardup

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")  # high-jaccard variant
    other = "completely different content about ray data pipelines " * 5
    t = pa.table({"doc_id": [1, 2, 3, 4], "text": [base, near, other, base]})
    pairs = minhash_neardup(rd.from_arrow(t), threshold=0.35).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (1, 4) in got  # exact duplicate
    assert (1, 2) in got or (2, 4) in got  # near duplicate
    assert (1, 3) not in got and (2, 3) not in got  # unrelated


def test_lsh_bucket_keying_preserves_pairs():
    """The sharded shuffle key must yield byte-identical pair sets to
    single-group keying (n_shards=1): the shard is a function of the
    collision key, so co-location is preserved exactly."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.dedup import minhash_neardup, simhash_neardup

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(200)]
    docs = []
    for i in range(60):
        base = rng.choice(words, size=40).tolist()
        docs.append(" ".join(base))
        if i % 3 == 0:  # planted near-dup
            mut = list(base)
            mut[rng.integers(0, 40)] = "mutated"
            docs.append(" ".join(mut))
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})

    for fn, kw in [
        (minhash_neardup, {"threshold": 0.3}),
        (simhash_neardup, {"max_hamming": 8}),
    ]:
        a = fn(rd.from_arrow(t), n_shards=1, **kw).to_pandas()
        b = fn(rd.from_arrow(t), n_shards=64, **kw).to_pandas()
        key = ["doc_a", "doc_b"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert a.equals(b), f"{fn.__name__} pair set changed under bucketing"
        assert len(a) > 0  # the corpus must actually produce pairs

    # broadcast-sig vs shipped-sig modes are byte-identical too
    c = minhash_neardup(
        rd.from_arrow(t), threshold=0.3, broadcast_sigs_below=0
    ).to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    d = minhash_neardup(rd.from_arrow(t), threshold=0.3).to_pandas().sort_values(
        ["doc_a", "doc_b"]
    ).reset_index(drop=True)
    assert c.equals(d)


def test_minhash_broadcast_never_staged_on_driver():
    """Broadcast-sig mode must assemble the signature matrix in a Ray task,
    not on the driver: with a ~40 MB matrix (20k docs x 256 perms x 8 B),
    driver-side traced allocations during the run stay far below matrix
    size.  tracemalloc sees numpy buffers (the old ray.get + fancy-index
    staging allocated the full matrix here), so a regression trips this
    regardless of earlier RSS high-water marks."""
    import tracemalloc

    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.dedup import minhash_neardup

    n = 20000
    docs = [f"alpha{i % 701} beta{i % 997} gamma{i}" for i in range(n)]
    t = pa.table({"doc_id": list(range(n)), "text": docs})
    ds = rd.from_arrow(t)

    tracemalloc.start()
    base = tracemalloc.get_traced_memory()[0]
    out = minhash_neardup(ds, num_perm=256, bands=16, threshold=0.95)
    n_pairs = out.count()
    peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()
    assert n_pairs >= 0
    assert peak - base < 20 * 1024 * 1024, f"driver staged {peak - base} bytes"


def test_simhash_max_hamming_bound():
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.dedup import simhash_neardup

    with pytest.raises(ValueError, match="max_hamming"):
        simhash_neardup(
            rd.from_arrow(pa.table({"doc_id": [1], "text": ["x"]})), max_hamming=64
        )


def test_duplicate_clusters():
    """Min-label propagation: chain 1-2-3 and pair 7-9 resolve to two
    components labeled by their lowest member; transitive closure works."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.dedup import duplicate_clusters

    pairs = rd.from_arrow(
        pa.table({"doc_a": [1, 2, 7], "doc_b": [2, 3, 9]})
    )
    out = duplicate_clusters(pairs).to_pandas().set_index("doc_id")["cluster_id"]
    assert out.to_dict() == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}
    # empty graph
    empty = rd.from_arrow(pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}))
    assert duplicate_clusters(empty).count() == 0


def test_duplicate_clusters_large_edge_set():
    """10^6 edges (333k star components): the label-propagation loop must
    run with labels/edges as Datasets — nothing but scalar aggregates on
    the driver — and resolve every component to its lowest member."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.dedup import duplicate_clusters

    n_comp = 333_334
    c = np.arange(n_comp, dtype=np.int64) * 4
    doc_a = np.repeat(c, 3)
    doc_b = (c[:, None] + np.array([1, 2, 3])).reshape(-1)
    pairs = rd.from_arrow(pa.table({"doc_a": doc_a, "doc_b": doc_b}))
    out = duplicate_clusters(pairs)
    assert out.count() == 4 * n_comp
    # every node's cluster_id is its component's lowest member (c):
    # per-component label sum is 4*c -> total 4 * sum(c)
    assert out.sum("cluster_id") == 4 * int(c.sum())
    assert out.groupby("cluster_id").count().count() == n_comp


def test_simhash_neardup(q, sf_dir):
    df = q["simhash_neardup"](sf_dir).to_pandas()
    if len(df):
        assert (df["doc_a"] < df["doc_b"]).all()
        assert (df["hamming"] <= 4).all()


def test_simhash_banding_complete():
    """Pigeonhole completeness of threshold-derived banding: any pair
    within max_hamming shares at least one untouched band — including
    pairs the old fixed 4x16 banding missed (one flipped bit per 16-bit
    quarter)."""
    max_hamming = 4
    bands = max_hamming + 1
    width, extra = 64 // bands, 64 % bands
    shifts, widths, s = [], [], 0
    for i in range(bands):
        w = width + (1 if i < extra else 0)
        shifts.append(s)
        widths.append(w)
        s += w
    rng = np.random.default_rng(9)
    for _ in range(200):
        x = int(rng.integers(0, 1 << 63))
        flip_bits = rng.choice(64, size=max_hamming, replace=False)
        y = x
        for b in flip_bits:
            y ^= 1 << int(b)
        shared = any(
            (x >> sh) & ((1 << w) - 1) == (y >> sh) & ((1 << w) - 1)
            for sh, w in zip(shifts, widths)
        )
        assert shared
    # the adversarial case for the old scheme: bits 0, 16, 32, 48
    x = 0x123456789ABCDEF0
    y = x ^ (1 | (1 << 16) | (1 << 32) | (1 << 48))
    shared = any(
        (x >> sh) & ((1 << w) - 1) == (y >> sh) & ((1 << w) - 1)
        for sh, w in zip(shifts, widths)
    )
    assert shared  # 5 bands of ~13 bits cannot all be hit by 4 flips


def test_popcount():
    x = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    assert popcount64(x).tolist() == [0, 1, 2, 64]


def test_ngram_jaccard_scalar():
    assert char_ngram_jaccard("abcdef", "abcdef") == 1.0
    assert char_ngram_jaccard("abcdef", "uvwxyz") == 0.0


def test_ngram_vectorized_matches_scalar_reference():
    """The sharded vectorized ngram stage must reproduce the scalar
    set-based Jaccard bit-for-bit, including short (<n), empty and
    non-ASCII docs, across multiple blocks sharing a shard."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.dedup import ngram_jaccard_block

    texts = [
        "the quick brown fox", "the quick brown fax", "ab", "ab", "",
        "", "héllo wörld", "héllo wörld!", "xyzxyzxyz", "zyxzyxzyx",
    ]
    blocks = [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]
    ids = np.arange(len(texts), dtype=np.int64)
    t = pa.table({"doc_id": ids, "text": texts, "block": np.asarray(blocks, np.int64)})
    out = ngram_jaccard_block(
        rd.from_arrow(t), ["block"], threshold=0.0, n=3, n_shards=2
    ).to_pandas()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in out.itertuples()}
    expect = {}
    for i in range(len(texts)):
        for k in range(i + 1, len(texts)):
            if blocks[i] == blocks[k]:
                j = char_ngram_jaccard(texts[i], texts[k], 3)
                if j > 0:  # the contract (like the SQL oracle's gram join):
                    expect[(i, k)] = j  # only pairs sharing >= 1 gram appear
    assert got == expect  # exact float equality


def test_embed_knn_lsh_recall(q, sf_dir):
    """Multi-probe LSH recall vs exact brute force: >= 60% at k=10 even on
    the near-random sf embeddings (nbits=4, Hamming<=2 probes)."""
    exact = q["embed_knn"](sf_dir).to_pandas()
    approx = q["embed_knn_lsh"](sf_dir).to_pandas()
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact.query_id == qid]["neighbor_id"])
        a = set(approx[approx.query_id == qid]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls


def test_embed_knn_lsh_clustered_high_recall():
    """On clustered embeddings LSH prunes hard AND keeps recall >= 0.9."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.similarity import knn_bruteforce, knn_lsh

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 32)) * 4
    pts = np.repeat(centers, 50, axis=0) + rng.standard_normal((400, 32))
    t = pa.table(
        {
            "vec_id": np.arange(400, dtype=np.int64),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(pts.reshape(-1).astype(np.float32)), 32
            ),
        }
    )
    ds = rd.from_arrow(t)
    exact = knn_bruteforce(ds, [0, 50, 100], k=10).to_pandas()
    approx = knn_lsh(ds, [0, 50, 100], k=10, nbits=8, probe_hamming=2).to_pandas()
    recalls = []
    for qid in [0, 50, 100]:
        e = set(exact[exact.query_id == qid]["neighbor_id"])
        a = set(approx[approx.query_id == qid]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls


def test_embed_neardup(q, sf_dir):
    df = q["embed_neardup"](sf_dir).to_pandas()
    if len(df):
        assert (df["vec_a"] < df["vec_b"]).all()
        assert (df["cosine"] >= 0.3).all()


def test_embed_neardup_split_bounds_bucket_work():
    """Oversized LSH buckets are subdivided (second-level hyperplane
    split): planted exact duplicates are still found (identical vectors
    share every sub-bucket), and the skipped cross-pair work is recorded
    on the counters actor — capped work is never silent."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.counters import read_counters
    from geoglue_ray.stages.similarity import embedding_neardup

    rng = np.random.default_rng(5)
    base = rng.standard_normal((1000, 8))
    mat = np.concatenate([base, base[:20]])  # 20 planted exact dups
    ids = np.arange(len(mat), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), type=pa.float32()), 8
            ),
        }
    )
    read_counters(reset=True)
    out = embedding_neardup(
        rd.from_arrow(t),
        threshold=0.999,
        nbits=1,  # one giant bucket per sign -> forces the split path
        target_bucket_rows=32,
        split_above=64,
    ).to_pandas()
    got = set(zip(out["vec_a"], out["vec_b"]))
    for i in range(20):
        assert (i, 1000 + i) in got  # dups survive the split
    snap = read_counters()
    assert snap.get("embed_neardup_split_buckets", {}).get("rows", 0) >= 1
    assert snap.get("embed_neardup_pairs_skipped", {}).get("rows", 0) > 0


def test_embed_neardup_shard_keying_preserves_pairs():
    """The fixed-shard keying (hash(bucket) % n_shards) must emit exactly
    the pair set that raw-bucket grouping would: a per-bucket numpy
    reference (same einsum cosine, same split-path exclusion rule) is the
    ground truth, and the bucketize stage's shard cardinality stays at
    <= n_shards regardless of bucket count (the scale claim)."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.similarity import (
        _chain_norm,
        chain_bucket,
        chain_cosine,
        embedding_neardup,
        rademacher_signs,
    )

    rng = np.random.default_rng(17)
    base = rng.standard_normal((600, 16))
    mat = np.concatenate([base, base[:40] + rng.standard_normal((40, 16)) * 1e-4])
    ids = np.arange(len(mat), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), type=pa.float32()), 16
            ),
        }
    )
    n_shards = 8
    nbits = 6  # 64 buckets >> 8 shards: many buckets share a shard
    out = embedding_neardup(
        rd.from_arrow(t), threshold=0.98, nbits=nbits, n_shards=n_shards
    ).to_pandas()
    got = sorted(zip(out["vec_a"], out["vec_b"]))

    # reference: per-bucket exact pairs, same arithmetic
    m32 = mat.astype(np.float32)  # engine reads float32 from the table
    raw = np.asarray(m32, dtype=np.float64)
    norms = _chain_norm(raw)
    bk = chain_bucket(raw, rademacher_signs(16, nbits, seed=23))
    expect = []
    for b in np.unique(bk):
        sel = np.nonzero(bk == b)[0]
        sel = sel[np.argsort(ids[sel])]
        for i in range(len(sel)):
            for j in range(i + 1, len(sel)):
                c = float(
                    chain_cosine(
                        raw[sel[i] : sel[i] + 1],
                        raw[sel[j] : sel[j] + 1],
                        norms[sel[i] : sel[i] + 1],
                        norms[sel[j] : sel[j] + 1],
                    )[0]
                )
                if c >= 0.98:
                    expect.append((int(ids[sel[i]]), int(ids[sel[j]])))
    assert got == sorted(expect)
    assert len(got) >= 40  # the planted near-dups collide w.h.p.

    # group-count claim: many buckets compress to <= n_shards shuffle groups
    from geoglue_ray.stages.dedup import _shard_of

    shards = _shard_of(np.zeros(len(bk), dtype=np.int64), bk, n_shards)
    assert len(np.unique(bk)) > n_shards  # the old keying's group count
    assert len(np.unique(shards)) <= n_shards  # the new one


def test_media_features(q, sf_dir):
    df = q["media_features"](sf_dir).to_pandas()
    # one row per media span: sum over docs of doc_id % 3
    ids = np.arange(500)
    assert len(df) == int((ids % 3).sum())
    assert set(df["kind"]) <= {"image", "audio"}
    assert (df["payload_len"] == 64).all()
    assert ((df["n_distinct_bytes"] >= 1) & (df["n_distinct_bytes"] <= 64)).all()
    # deterministic stub decode across runs
    df2 = q["media_features"](sf_dir).to_pandas()
    assert df.equals(df2)


def test_media_feature_vectors_deterministic(sf_dir):
    """The (non-SQL-expressible) float feature vectors stay deterministic
    and match the per-row scalar decode stub."""
    from geoglue_ray.stages.media import _decode_impl, media_pipeline
    from geoglue_ray.sources.corpus import read_corpus

    out = media_pipeline(read_corpus(sf_dir, with_spans=True).limit(30)).to_pandas()
    assert len(out) > 0
    f1 = np.stack(out["feature"].to_numpy())
    out2 = media_pipeline(read_corpus(sf_dir, with_spans=True).limit(30)).to_pandas()
    assert np.array_equal(f1, np.stack(out2["feature"].to_numpy()))
    # batch decode == scalar decode
    r = out.iloc[0]
    assert bytes(r["payload"]) == _decode_impl(r["media_ref"], r["kind"])


def test_media_decode_rejects_unknown_kind():
    from geoglue_ray.stages.media import _decode_impl

    with pytest.raises(NotImplementedError):
        _decode_impl("media/1/1", "video")


def test_embed_knn_ivf_recall(q, sf_dir):
    """IVF recall gate vs exact brute force on the near-random sf
    embeddings (generous nprobe/nlist — unstructured recall tends to
    nprobe/nlist)."""
    df = q["embed_ivf_recall"](sf_dir).to_pandas()
    assert df["recall_ok"].all(), df


def test_embed_knn_ivf_clustered_prunes_and_recalls():
    """On clustered embeddings the IVF coarse quantizer discovers the
    clusters: probing 2 of 8 lists (1/4 of brute-force work) still
    recalls >= 0.9 of the true top-10 — the scale story for IVF."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.similarity import knn_bruteforce, knn_ivf

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 32)) * 4
    pts = np.repeat(centers, 50, axis=0) + rng.standard_normal((400, 32))
    t = pa.table(
        {
            "vec_id": np.arange(400, dtype=np.int64),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(pts.reshape(-1).astype(np.float32)), 32
            ),
        }
    )
    ds = rd.from_arrow(t)
    exact = knn_bruteforce(ds, [0, 50, 100], k=10).to_pandas()
    approx = knn_ivf(ds, [0, 50, 100], k=10, nlist=8, nprobe=2).to_pandas()
    recalls = []
    for qid in [0, 50, 100]:
        e = set(exact[exact.query_id == qid]["neighbor_id"])
        a = set(approx[approx.query_id == qid]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls


def test_ivf_restricts_to_probed_lists():
    """True inverted-file semantics: a neighbor outside every probed
    list of a query must not appear in that query's result, even if it
    is the globally nearest vector."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.similarity import (
        _normalize,
        _spherical_kmeans,
        knn_ivf,
    )

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((4, 16)) * 6
    pts = np.repeat(centers, 25, axis=0) + 0.1 * rng.standard_normal((100, 16))
    t = pa.table(
        {
            "vec_id": np.arange(100, dtype=np.int64),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(pts.reshape(-1).astype(np.float32)), 16
            ),
        }
    )
    ds = rd.from_arrow(t)
    out = knn_ivf(ds, [0], k=10, nlist=4, nprobe=1).to_pandas()
    # with nprobe=1 on tight clusters, every neighbor is from query 0's
    # own cluster (rows 0..24)
    assert len(out) > 0
    assert (out["neighbor_id"] < 25).all(), out
    # and the centroids the quantizer trains are deterministic
    smat = _normalize(pts.astype(np.float64))
    c1 = _spherical_kmeans(smat, 4)
    c2 = _spherical_kmeans(smat, 4)
    assert np.array_equal(c1, c2)


# ------------------------------------------------------ dedup_corpus
def test_survivor_corpus_paths_identical():
    """Broadcast and co-shuffle anti-join paths return the same row set,
    payload dtypes intact (the tagged union must not NaN-drift)."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.dedup import survivor_corpus

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(20)), pa.int64()),
                "lang": pa.array([f"l{i % 3}" for i in range(20)]),
                "n_chars": pa.array([i * 7 for i in range(20)], pa.int64()),
            }
        )
    )
    elim = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 3, 5, 19], pa.int64())})
    )
    bc = survivor_corpus(docs, elim, broadcast_below=10**6).to_pandas()
    sh = survivor_corpus(docs, elim, broadcast_below=0).to_pandas()
    bc = bc.sort_values("doc_id").reset_index(drop=True)
    sh = sh.sort_values("doc_id").reset_index(drop=True)
    assert list(bc["doc_id"]) == [i for i in range(20) if i not in (1, 3, 5, 19)]
    assert bc.equals(sh[bc.columns])
    assert str(sh["n_chars"].dtype) == "int64" and str(sh["lang"].dtype) == "object"


def test_survivor_corpus_empty_eliminated():
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.dedup import survivor_corpus

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([4, 2], pa.int64())}))
    elim = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    assert sorted(survivor_corpus(docs, elim).to_pandas()["doc_id"]) == [2, 4]


def test_dedup_corpus_composition(q, sf_dir):
    """Survivors = documents minus non-canonical cluster members; every
    cluster keeps exactly its minimum doc_id."""
    surv = q["dedup_corpus"](sf_dir).to_pandas()
    clus = q["dedup_clusters"](sf_dir).to_pandas()
    import pandas as pd

    all_ids = set(
        pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])["doc_id"]
    )
    eliminated = set(clus.loc[clus["cluster_id"] != clus["doc_id"], "doc_id"])
    assert set(surv["doc_id"]) == all_ids - eliminated
    keep_min = clus.groupby("cluster_id")["doc_id"].min()
    assert set(keep_min) <= set(surv["doc_id"])


# ------------------------------------------------------- round-3 text ops
def test_repetition_features_hand_case():
    import pyarrow as pa

    from geoglue_ray.stages.text import repetition_features

    t = pa.table({"doc_id": [0, 1, 2], "text": ["a a a b", "x y z", "solo"]})
    out = repetition_features(t)
    assert out["n_tokens"].to_pylist() == [4, 3, 1]
    assert out["n_distinct"].to_pylist() == [2, 3, 1]
    # "a a" occurs twice in doc 0; doc 2 has no bigram
    assert out["top_bigram_n"].to_pylist() == [2, 1, 0]
    assert out["rep_ratio"].to_pylist() == [0.5, 0.0, 0.0]


def test_repetition_features_batch_split_independent(sf_dir):
    import pyarrow.parquet as pq

    from geoglue_ray.stages.text import repetition_features

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    whole = repetition_features(t).to_pandas()
    parts = [
        repetition_features(t.slice(0, 123)).to_pandas(),
        repetition_features(t.slice(123)).to_pandas(),
    ]
    import pandas as pd

    split = pd.concat(parts, ignore_index=True)
    pd.testing.assert_frame_equal(whole, split)


def test_vocab_topk_matches_reference_and_shard_invariant(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from geoglue_ray.stages.text import vocab_topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    got = vocab_topk(ds, k=10, n_shards=64).to_pandas().reset_index(drop=True)
    got1 = vocab_topk(ds, k=10, n_shards=1).to_pandas().reset_index(drop=True)
    ref = duckdb.connect().execute(f"""
        SELECT tok AS token, count(*) AS n
        FROM (SELECT unnest(list_filter(string_split(text,' '), x -> x <> '')) AS tok
              FROM read_parquet('{sf_dir}/documents.parquet'))
        GROUP BY 1 ORDER BY n DESC, token LIMIT 10""").fetchdf()
    for df in (got, got1):
        s = df.sort_values(["n", "token"], ascending=[False, True]).reset_index(drop=True)
        assert s["token"].tolist() == ref["token"].tolist()
        assert s["n"].tolist() == ref["n"].tolist()


def test_hopping_window_fanout_is_exactly_two(ray_session, sf_dir):
    import pyarrow.parquet as pq

    from geoglue_ray.pipelines.queries import hopping_window

    out = hopping_window(sf_dir).to_pandas()
    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    assert out["count"].sum() == 2 * n_events


def test_tfidf_top_token_hand_case(ray_session):
    """3 docs: 'rare' appears in one doc (df=1, idf=3); argmax and the
    (score desc, token asc) tie-break verified by hand."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.text import tfidf_top_token

    docs = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "y x",        # x,y both df=3 -> idf=1, tf=1 -> tie at 1.0; 'x' < 'y'
                "x y z",      # z: df=1, idf=3 -> 3 beats x/y at 1.0
                "y y x rare", # y: tf=2*idf 1 = 2; rare: 1*3 = 3 -> 'rare'
            ],
        }
    )
    out = (
        tfidf_top_token(rd.from_arrow(docs).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["top_token"].tolist() == ["x", "z", "rare"]
    assert out["top_tfidf"].tolist() == [1.0, 3.0, 3.0]


def test_resize_and_frame_sampler_stages():
    """Resize = floor block mean per 4-byte block; frame sampler explodes
    every 2nd 8-byte frame; both batch-split independent."""
    import pyarrow as pa

    from geoglue_ray.stages.media import (
        FRAME_LEN,
        FRAME_STRIDE,
        PAYLOAD_LEN,
        RESIZE_FACTOR,
        DecodeMedia,
        FrameSampler,
        ResizeMedia,
    )

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "span_index": pa.array([1, 1, 2], pa.int32()),
            "kind": ["image", "audio", "image"],
            "media_ref": ["media/1/1", "media/2/1", "media/3/2"],
            "offset": pa.array([5, 6, 7], pa.int32()),
        }
    )
    dec = DecodeMedia()(t)
    raw = np.frombuffer(b"".join(dec["payload"].to_pylist()), np.uint8).reshape(3, -1)

    rz = ResizeMedia()(dec)
    out_len = PAYLOAD_LEN // RESIZE_FACTOR
    expect = raw.reshape(3, out_len, RESIZE_FACTOR).astype(np.int64).sum(2) // RESIZE_FACTOR
    got = np.frombuffer(b"".join(rz["resized"].to_pylist()), np.uint8).reshape(3, out_len)
    assert np.array_equal(got, expect.astype(np.uint8))
    assert rz["resized_sum"].to_pylist() == expect.sum(1).tolist()
    # split independence
    rz2 = pa.concat_tables([ResizeMedia()(dec.slice(0, 1)), ResizeMedia()(dec.slice(1))])
    assert rz2.equals(rz)

    fs = FrameSampler()(dec)
    nf = PAYLOAD_LEN // FRAME_LEN
    k = len(range(0, nf, FRAME_STRIDE))
    assert len(fs) == 3 * k
    assert fs["frame_index"].to_pylist()[:k] == list(range(0, nf, FRAME_STRIDE))
    f0 = raw[0].reshape(nf, FRAME_LEN).astype(np.int64).sum(1)
    assert fs["frame_sum"].to_pylist()[:k] == f0[::FRAME_STRIDE].tolist()
    assert "payload" not in fs.column_names


def test_regex_extractor_drops_nonmatches_and_validates():
    import pyarrow as pa
    import pytest

    from geoglue_ray.stages.text import RegexExtractor

    ex = RegexExtractor(r"m/(?P<a>\d+)", {"a": pa.int64()})
    t = pa.table({"media_ref": ["m/12", "nope", "m/7x"], "k": [1, 2, 3]})
    out = ex(t)
    assert out["a"].to_pylist() == [12, 7]
    assert out["k"].to_pylist() == [1, 3]
    with pytest.raises(ValueError, match="groups"):
        RegexExtractor(r"(\d+)(\w+)", {"only_one": pa.int64()})


def test_bloom_prefilter_exact_and_no_false_negatives():
    """The bloom broadcast: zero false negatives by construction (every
    member must report maybe=True), fp rate near the m/n=12,k=8 design
    point, and the bloomed co-shuffle anti-join equals the broadcast path
    on a corpus large enough for real false positives to occur."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.dedup import (
        _bloom_query,
        _build_bloom_impl,
        survivor_corpus,
    )

    rng = np.random.default_rng(11)
    members = np.unique(rng.integers(0, 2**62, 5000))
    bloom = _build_bloom_impl(
        len(members), "doc_id", pa.table({"doc_id": pa.array(members, pa.int64())})
    )
    assert _bloom_query(members, bloom["bits"], bloom["m"]).all()  # no FNs
    probes = np.unique(rng.integers(0, 2**62, 20000))
    probes = np.setdiff1d(probes, members)
    fp = _bloom_query(probes, bloom["bits"], bloom["m"]).mean()
    assert fp < 0.02, fp  # design point ~0.3%

    n = 30000
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "payload": pa.array([f"p{i}" for i in range(n)]),
            }
        )
    ).repartition(5)
    elim_ids = np.unique(rng.integers(0, n, 4000))
    elim = rd.from_arrow(pa.table({"doc_id": pa.array(elim_ids, pa.int64())}))
    bc = (
        survivor_corpus(docs, elim, broadcast_below=10**6)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sh = (
        survivor_corpus(docs, elim, broadcast_below=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(bc) == n - len(elim_ids)
    assert bc.equals(sh[bc.columns])


def test_decontaminate_planted():
    """Planted contamination: a verbatim copy and a half-copied doc of a
    benchmark document must flag; an unrelated doc must not."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.text import decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    half = "alpha beta gamma delta epsilon completely different tail words here"
    clean = "one two three four five six seven eight nine ten"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([bench_text, half, clean]),
        }
    )
    bench = pa.table({"doc_id": pa.array([99], pa.int64()), "text": pa.array([bench_text])})
    out = (
        decontaminate(rd.from_arrow(docs), rd.from_arrow(bench), threshold=0.3)
        .to_pandas()
        .set_index("doc_id")
    )
    assert bool(out.loc[1, "is_contaminated"])  # verbatim copy
    assert out.loc[1, "contam_frac"] == 1.0
    assert bool(out.loc[2, "is_contaminated"])  # 3 of 8 shingles shared
    assert not bool(out.loc[3, "is_contaminated"])
    assert out.loc[3, "n_overlap"] == 0


def test_bigram_topk_adjacency_and_empty_docs():
    """Bigrams never cross document boundaries, empty/1-token docs emit
    nothing (including an empty FIRST doc — the offset-alias edge), and
    the conditional probability divides exact in-position counts."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.text import bigram_topk

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["", "a b a b c", "solo", "b a", ""]),
        }
    )
    out = (
        bigram_topk(rd.from_arrow(docs).repartition(3), "text", k=10, n_shards=4)
        .to_pandas()
        .set_index(["tok1", "tok2"])
    )
    # pairs: (a,b)x2, (b,a)x1+1, (b,c)x1 ; never (c,solo) or (solo,b)
    assert out.loc[("a", "b"), "n_pairs"] == 2
    assert out.loc[("b", "a"), "n_pairs"] == 2
    assert out.loc[("b", "c"), "n_pairs"] == 1
    assert ("c", "solo") not in out.index and ("solo", "b") not in out.index
    # a starts 2 bigrams -> P(b|a)=1; b starts 3 -> P(a|b)=2/3
    assert out.loc[("a", "b"), "cond_p"] == 1.0
    assert out.loc[("b", "a"), "cond_p"] == 2.0 / 3.0
    assert out.loc[("b", "a"), "n_first"] == 3


def test_inverted_index_semantics():
    """Duplicate tokens within a doc post once, postings ascend by doc_id,
    the df band drops hapax and stop-band tokens; split-invariant."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.text import inverted_index

    docs = pa.table(
        {
            "doc_id": pa.array([3, 1, 2, 4], pa.int64()),
            "text": pa.array(
                ["cat dog cat", "dog bird", "cat stop", "stop rare"]
            ),
        }
    )
    for parts in (1, 3):
        out = (
            inverted_index(
                rd.from_arrow(docs).repartition(parts),
                "text",
                "doc_id",
                min_df=2,
                max_df=2,
                n_shards=4,
            )
            .to_pandas()
            .set_index("token")
            .sort_index()
        )
        assert list(out.index) == ["cat", "dog", "stop"]
        assert out.loc["cat", "postings"] == "2,3"  # dup within doc 3 posts once
        assert out.loc["dog", "postings"] == "1,3"
        assert out.loc["stop", "postings"] == "2,4"
        assert (out["df"] == 2).all()  # 'bird'/'rare' (df=1) dropped


def test_chunk_dedup_planted_duplicates(ray_session):
    """First-wins across docs, in-doc ordering preserved on reassembly,
    and a doc losing every chunk drops out."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.dedup import chunk_dedup

    docs = {
        0: "a b c d e f g h",          # chunks: "a b c d", "e f g h"
        1: "x y z w a b c d",          # "x y z w" kept, "a b c d" deduped
        2: "a b c d",                  # fully duplicated -> dropped
        3: "e f g h tail",             # "e f g h" deduped, "tail" kept
    }
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values())),
            }
        )
    ).repartition(3)
    out = (
        chunk_dedup(ds, chunk_tokens=4, n_shards=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 3]
    assert out["text_dedup"].tolist() == ["a b c d e f g h", "x y z w", "tail"]
    assert out["n_chunks_kept"].tolist() == [2, 1, 1]


def test_chunk_dedup_shard_count_invariance(ray_session):
    """Content-equality dedup must not depend on shard count (hash
    collisions co-locate, never merge)."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.dedup import chunk_dedup

    rng = np.random.default_rng(3)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(1, 12, size=60)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(60), pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(4)
    a = chunk_dedup(ds, chunk_tokens=2, n_shards=2).to_pandas()
    b = chunk_dedup(ds, chunk_tokens=2, n_shards=16).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_word_ngrams_boundaries():
    """n-grams never cross documents; docs shorter than n emit none;
    whitespace runs collapse like the SQL twin's split."""
    import pyarrow as pa

    from geoglue_ray.stages.text import word_ngrams

    col = pa.array(["a b c d e f", "x y", "  p  q r s  t  ", ""])
    grams, doc_idx, cnt = word_ngrams(col, n=5)
    assert list(cnt) == [2, 0, 1, 0]
    assert list(doc_idx) == [0, 0, 2]
    assert list(grams) == ["a b c d e", "b c d e f", "p q r s t"]


def test_global_prefix_sum_sparse_ids():
    """Two-pass distributed scan == serial exclusive cumsum in id order,
    with sparse non-dense ids spread across many range buckets."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.scan import global_prefix_sum

    rng = np.random.default_rng(11)
    ids = rng.choice(1_000_000, size=700, replace=False).astype(np.int64)
    vals = rng.integers(0, 500, size=700).astype(np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids), "v": pa.array(vals)}))
    got = (
        global_prefix_sum(ds, "doc_id", "v", range_size=4096, n_shards=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    o = np.argsort(ids)
    expect = np.r_[np.int64(0), np.cumsum(vals[o])[:-1]]
    assert np.array_equal(got["doc_id"].to_numpy(), ids[o])
    assert np.array_equal(got["start_offset"].to_numpy(), expect)
    assert np.array_equal(got["v"].to_numpy(), vals[o])


def _brute_bpe(texts, rounds):
    """Pure-Python BPE replay: str.replace is the same left-to-right
    non-overlapping semantics as Arrow replace_substring / SQL replace."""
    from collections import Counter

    docs = ["|" + t.replace(" ", "|") + "|" for t in texts]
    out = []
    for r in range(rounds):
        cnt = Counter()
        for d in docs:
            toks = d.strip("|").split("|")
            for i in range(len(toks) - 1):
                cnt[(toks[i], toks[i + 1])] += 1
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (t1, t2), n = best
        docs = [d.replace(f"|{t1}|{t2}|", f"|{t1}+{t2}|") for d in docs]
        out.append((r + 1, t1, t2, f"{t1}+{t2}", n))
    return out


def test_bpe_merges_matches_brute_force(ray_session):
    import ray.data as rd

    from geoglue_ray.stages.text import bpe_merges

    # adversarial: overlapping runs ('a a a a'), alternating pairs, ties
    texts = [
        "a a a a a",
        "a b a b a b",
        "b a b a",
        "c c c c c c",
        "a b c a b c",
        "x",
        "",
        "c c a a b b",
    ] * 3
    ds = rd.from_items([{"text": t} for t in texts]).repartition(4)
    got = [
        (int(r["round"]), r["tok1"], r["tok2"], r["merged"], int(r["n_pairs"]))
        for r in bpe_merges(ds, rounds=3, n_shards=4).take_all()
    ]
    want = _brute_bpe(texts, 3)
    assert got == want, (got, want)
    # merged tokens actually participate in later rounds
    assert any("+" in t1 or "+" in t2 for _, t1, t2, _, _ in got[1:]) or len(got) == 3


def test_kmeans_lloyd_matches_brute_force(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.similarity import kmeans_lloyd

    rng = np.random.default_rng(7)
    N, DIM, K, R = 120, 8, 3, 3
    mat = (rng.random((N, DIM), dtype=np.float32) - 0.5) * 1.8
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(N, dtype=np.int64)),
                "embedding": pa.array(list(mat), pa.list_(pa.float32())),
            }
        )
    ).repartition(4)
    got = kmeans_lloyd(ds, k=K, rounds=R, dim=DIM).to_pandas()

    OFF = 1 << 20
    q = np.floor(mat.astype(np.float64) * OFF + 0.5).astype(np.int64)
    cents = q[:K].copy()
    n = np.zeros(K, dtype=np.int64)
    for _ in range(R):
        d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        win = np.argmin(d2, axis=1)
        n = np.bincount(win, minlength=K)
        for j in range(K):
            if n[j]:
                S = q[win == j].sum(axis=0)
                cents[j] = (2 * (S + n[j] * OFF) + n[j]) // (2 * n[j]) - OFF
    want = cents.ravel()
    assert np.array_equal(
        got.sort_values(["cluster_id", "dim"])["centroid_q"].to_numpy(), want
    )
    assert np.array_equal(
        got.groupby("cluster_id")["n_members"].first().to_numpy(), n
    )
    assert n.sum() == N and (n > 0).all()


def test_pq_train_matches_brute_force(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.similarity import pq_train

    rng = np.random.default_rng(13)
    N, DIM, B, K, R = 90, 12, 3, 3, 2
    bd = DIM // B
    mat = (rng.random((N, DIM), dtype=np.float32) - 0.5) * 1.6
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(N, dtype=np.int64)),
                "embedding": pa.array(list(mat), pa.list_(pa.float32())),
            }
        )
    ).repartition(4)
    got = pq_train(ds, n_blocks=B, k=K, rounds=R, dim=DIM).to_pandas()

    OFF = 1 << 20
    q = np.floor(mat.astype(np.float64) * OFF + 0.5).astype(np.int64)
    for b in range(B):
        qb = q[:, b * bd : (b + 1) * bd]
        cents = qb[:K].copy()
        n = np.zeros(K, dtype=np.int64)
        for _ in range(R):
            d2 = ((qb[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            win = np.argmin(d2, axis=1)
            n = np.bincount(win, minlength=K)
            for j in range(K):
                if n[j]:
                    S = qb[win == j].sum(axis=0)
                    cents[j] = (2 * (S + n[j] * OFF) + n[j]) // (2 * n[j]) - OFF
        sub = got[got["block"] == b].sort_values(["cluster_id", "dim"])
        assert np.array_equal(sub["centroid_q"].to_numpy(), cents.ravel())
        assert np.array_equal(
            sub.groupby("cluster_id")["n_members"].first().to_numpy(), n
        )


def test_collocation_lift_no_driver_vocab():
    """collocation_lift must hold NO vocabulary-cardinality state on the
    driver (round-4 verdict): no take_all/to_pandas of unigram rows, no
    ray.put of a counts dict — only the scalar token total.  Correctness
    vs a brute-force lift on a small corpus."""
    import inspect

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.text import collocation_lift

    src = inspect.getsource(collocation_lift)
    assert "take_all" not in src
    assert "ray.put" not in src

    docs = [
        "new york new york city hall",
        "san francisco bay area san francisco",
        "new york state of mind",
        "the city of san francisco",
        "york minster is not in new york",
    ] * 3
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(docs))), "text": docs})
    ).repartition(4)
    got = (
        collocation_lift(ds, "text", k=10, min_count=3, n_shards=8)
        .to_pandas()
        .reset_index(drop=True)
    )
    # brute force
    toks = [t for d in docs for t in d.split()]
    total = len(toks)
    uni: dict[str, int] = {}
    for t in toks:
        uni[t] = uni.get(t, 0) + 1
    pairs: dict[tuple[str, str], int] = {}
    for d in docs:
        w = d.split()
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    rows = [
        (a, b, n, uni[a], uni[b],
         np.float64(np.int64(total) * np.int64(n))
         / np.float64(np.int64(uni[a]) * np.int64(uni[b])))
        for (a, b), n in pairs.items() if n >= 3
    ]
    exp = (
        pd.DataFrame(rows, columns=["tok1", "tok2", "n_pairs", "c1", "c2", "lift"])
        .sort_values(["lift", "tok1", "tok2"], ascending=[False, True, True],
                     kind="mergesort")
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_cdc_chunks_shift_resistance():
    """The CDC property fixed-window chunking lacks: inserting one token
    at a document's head changes only the chunks up to the first
    boundary after the insertion — the chunk-hash multiset of the
    suffix is preserved (boundaries are content-defined)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.dedup import cdc_chunk_stats

    rng = np.random.default_rng(17)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "eps", "zeta",
                      "eta", "theta", "iota", "kappa"])
    base = " ".join(rng.choice(vocab, size=120))

    def chunks_of(text: str) -> list[tuple[int, int]]:
        ds = rd.from_arrow(pa.table({"doc_id": [0], "text": [text]}))
        df = cdc_chunk_stats(ds, top_n=1000).to_pandas()
        # top_n census filters singletons; recover ALL chunks by running
        # the doc twice under two ids (every chunk then occurs >= 2x)
        ds2 = rd.from_arrow(
            pa.table({"doc_id": [0, 1], "text": [text, text]})
        )
        df = cdc_chunk_stats(ds2, top_n=100000).to_pandas()
        return sorted(
            (int(r.chash), int(r.n_tokens))
            for r in df.itertuples()
            for _ in range(int(r.n_occurrences) // 2)
        )

    orig = chunks_of(base)
    shifted = chunks_of("inserted " + base)
    orig_set = pd.Series(orig).value_counts()
    shift_set = pd.Series(shifted).value_counts()
    common = sum(min(orig_set.get(k, 0), shift_set.get(k, 0))
                 for k in set(orig_set.index) | set(shift_set.index))
    # all but the first couple of chunks survive the shift
    assert common >= len(orig) - 3, (common, len(orig), len(shifted))
    assert len(orig) > 10
