"""Similarity search over embedding columns.

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one float64 matmul against
  it and emits per-batch local top-k candidates; a final tiny top-k merge
  gives the exact global answer.  Shuffle payload = (k x queries) rows per
  batch, never the embedding table.
- :func:`knn_lsh` — scale path: random-hyperplane LSH buckets (sign bits)
  searched with multi-probe; approximate, verified against brute force in
  tests.  At 10^12 rows this is the IVF-style pruning layer; brute force
  remains the per-bucket kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(len(batch), -1)


def rademacher_signs(dim: int, nbits: int, seed: int = 23) -> np.ndarray:
    """Deterministic ±1 hyperplane entries (splitmix64 bit of the plane
    index) — the SQL-twin contract for the sign-LSH family: the SAME
    Python call generates the engine's planes and the literal ± terms in
    the oracle's projection chains (oracles.embed_knn_lsh /
    embed_neardup), so nothing RNG-stateful crosses the engine/SQL
    boundary.  Rademacher planes are a standard sign-random-projection
    family (the hyperplane LSH guarantee needs only symmetric
    zero-mean entries)."""
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the point
        idx = (
            np.arange(dim * nbits, dtype=np.uint64)
            + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
        )
        z = (idx + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return np.where(z & np.uint64(1), 1.0, -1.0).reshape(dim, nbits)


def _chain_project(mat: np.ndarray, signs: np.ndarray) -> np.ndarray:
    """Left-to-right ordered projection ``acc_j = ((s_0j*x_0) + s_1j*x_1)
    + ...`` — bit-identical to the left-associative SQL sum chain (numpy
    matmul's pairwise summation is NOT).  64 vectorized adds, not a
    per-row loop."""
    acc = np.zeros((mat.shape[0], signs.shape[1]))
    for d in range(mat.shape[1]):
        acc += mat[:, d : d + 1] * signs[d][None, :]
    return acc


def chain_bucket(mat_raw: np.ndarray, signs: np.ndarray) -> np.ndarray:
    """Sign-LSH bucket from the RAW (unnormalized) float64 matrix.  Raw
    on purpose: sign(sum ±x_d) is scale-invariant mathematically but NOT
    in float once x is divided by its norm — bucketing before any
    normalization keeps the SQL twin bit-exact."""
    bits = _chain_project(mat_raw, signs) > 0
    return bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))


def _chain_norm(mat: np.ndarray) -> np.ndarray:
    """sqrt of the left-to-right sum of squares (one correctly-rounded
    sqrt — SQL-mirrorable, unlike np.linalg.norm's pairwise sum)."""
    acc = np.zeros(mat.shape[0])
    for d in range(mat.shape[1]):
        acc += mat[:, d] * mat[:, d]
    return np.sqrt(acc)


def _chain_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    acc = np.zeros(a.shape[0])
    for d in range(a.shape[1]):
        acc += a[:, d] * b[:, d]
    return acc


def chain_cosine(a: np.ndarray, b: np.ndarray, na: np.ndarray, nb: np.ndarray) -> np.ndarray:
    """cosine = chain_dot / (na * nb): every op a single IEEE instruction
    mirrored term-for-term by the generated SQL expression, so a
    threshold test on the result is bit-exact across engines."""
    return _chain_dot(a, b) / (na * nb)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BatchTopK:
    """Actor-pool stage: per-batch exact top-k against broadcast queries."""

    def __init__(self, queries_ref, k: int, id_col: str, emb_col: str):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids: np.ndarray = q["ids"]
        self.qmat: np.ndarray = _normalize(q["mat"].astype(np.float64))
        # self-exclusion lookup built once per actor: sorted qids + the row
        # each sorted position maps to, so __call__ masks self-matches with
        # ONE searchsorted + masked assignment (O(B log Q)) — a per-query
        # Python loop would scan the batch Q times and dominate the matmul
        # at realistic query counts (10^4+)
        self._q_order = np.argsort(self.qids)
        self._q_sorted = self.qids[self._q_order]
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # LSH pruning can empty whole blocks
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        ids = batch[self.id_col].to_numpy()
        mat = _normalize(_emb_matrix(batch, self.emb_col))
        scores = self.qmat @ mat.T  # (Q, B)
        # self-match exclusion, vectorized (see __init__)
        pos = np.searchsorted(self._q_sorted, ids)
        pos = np.clip(pos, 0, len(self._q_sorted) - 1)
        hit = self._q_sorted[pos] == ids
        if hit.any():
            scores[self._q_order[pos[hit]], np.nonzero(hit)[0]] = -np.inf
        k = min(self.k, scores.shape[1])
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        rows = {
            "query_id": np.repeat(self.qids, k),
            "neighbor_id": ids[part.reshape(-1)],
            "score": np.take_along_axis(scores, part, axis=1).reshape(-1),
        }
        return pa.table(rows)


def knn_bruteforce(
    ds: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency=(1, 8),
) -> rd.Dataset:
    """Exact cosine top-k for ``query_ids`` over the embedding Dataset.

    Output: (query_id, neighbor_id, rank) with rank 1..k ordered by score
    descending, ties broken by neighbor_id ascending (deterministic).
    """
    qtab = ds.map_batches(
        lambda b: b.filter(pa.compute.is_in(b[id_col], value_set=pa.array(query_ids))),
        batch_format="pyarrow",
    ).take_all()
    qids = np.array([r[id_col] for r in qtab])
    qmat = np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in qtab])
    order = np.argsort(qids)
    queries_ref = ray.put({"ids": qids[order], "mat": qmat[order]})

    local = ds.map_batches(
        BatchTopK,
        fn_constructor_args=(queries_ref, k, id_col, emb_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    return _global_topk(local, k)


def _global_topk(local: rd.Dataset, k: int, n_shards: int = 64) -> rd.Dataset:
    """Global top-k per query from per-batch candidates.

    The shuffle key is ``hash(query_id) % n_shards`` — FIXED group count
    (grouping on raw query_id pays Ray's per-group Python once per
    query, which at a realistic 10^4+ queries dominates the tiny merge);
    each shard resolves ALL of its queries in one lexsort + run-rank
    pass.  Arrow in / Arrow out with explicitly TYPED (possibly empty)
    results: the sort machinery can hand the UDF empty partitions, and
    an untyped empty block diverges downstream schemas (the
    PandasBlockSchema([],[]) warning class from rounds 1-2)."""

    def shard(b: pa.Table) -> pa.Table:
        q = b["query_id"].to_numpy().astype(np.uint64)
        s = ((q * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(np.int64)
        return b.append_column("_qs", pa.array(s))

    def merge(g: pa.Table) -> pa.Table:
        qid = g["query_id"].to_numpy().astype(np.int64)
        nid = g["neighbor_id"].to_numpy().astype(np.int64)
        sc = g["score"].to_numpy()
        o = np.lexsort((nid, -sc, qid))  # per query: score desc, ties nid asc
        qid, nid = qid[o], nid[o]
        n = len(qid)
        brk = np.concatenate(([True], qid[1:] != qid[:-1])) if n else np.zeros(0, bool)
        starts = np.nonzero(brk)[0]
        lengths = np.diff(np.concatenate([starts, [n]]))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lengths)
        keep = pos < k
        return pa.table(
            {
                "query_id": pa.array(qid[keep], type=pa.int64()),
                "neighbor_id": pa.array(nid[keep], type=pa.int64()),
                "rank": pa.array(pos[keep] + 1),
            }
        )

    return (
        local.map_batches(shard, batch_format="pyarrow")
        .groupby("_qs")
        .map_groups(merge, batch_format="pyarrow")
    )


def _hamming_ball(b: int, nbits: int, radius: int) -> set[int]:
    out = {b}
    frontier = {b}
    for _ in range(radius):
        nxt = {x ^ (1 << i) for x in frontier for i in range(nbits)}
        out |= nxt
        frontier = nxt
    return out


def knn_lsh(
    ds: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    nbits: int = 4,
    probe_hamming: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> rd.Dataset:
    """Approximate top-k: bucket by deterministic Rademacher sign-LSH
    signature, exact search within the query's bucket plus all
    Hamming<=``probe_hamming`` probes (multi-probe LSH).  Recall/pruning
    trade off via (nbits, probe_hamming); the defaults are tuned for
    weakly-structured embeddings — clustered corpora can raise nbits
    substantially (tested in test_training_ops).  Buckets are computed
    from the RAW vectors via the ordered projection chain, so the bucket
    ids (and hence the candidate set) are bit-identical to the SQL twin
    (oracles.embed_knn_lsh); only the final cosine RANKING crosses
    engines as a float comparison (the embed_knn rank-only contract)."""
    first = ds.take(1)[0]
    dim = len(first[emb_col])
    signs = rademacher_signs(dim, nbits)
    qtab = ds.map_batches(
        lambda b: b.filter(pa.compute.is_in(b[id_col], value_set=pa.array(query_ids))),
        batch_format="pyarrow",
    ).take_all()
    qids = np.array([r[id_col] for r in qtab])
    qraw = np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in qtab])
    qbuckets = chain_bucket(qraw, signs)
    qmat = _normalize(qraw)
    accept = set().union(
        *[_hamming_ball(int(b), nbits, probe_hamming) for b in qbuckets]
    )
    signs_ref = ray.put(signs)
    accept_ref = ray.put(accept)

    def bucketize(batch: pa.Table) -> pa.Table:
        s = ray.get(signs_ref)
        acc = ray.get(accept_ref)
        bk = chain_bucket(_emb_matrix(batch, emb_col), s)
        mask = np.isin(bk, np.fromiter(acc, dtype=np.int64))
        return batch.filter(pa.array(mask)).append_column(
            "bucket", pa.array(bk[mask])
        )

    pruned = ds.map_batches(bucketize, batch_format="pyarrow")
    queries_ref = ray.put({"ids": qids, "mat": qmat})
    local = pruned.map_batches(
        BatchTopK,
        fn_constructor_args=(queries_ref, k, id_col, emb_col),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    return _global_topk(local, k)


def _spherical_kmeans(
    sample: np.ndarray, nlist: int, iters: int = 8, seed: int = 31
) -> np.ndarray:
    """Deterministic spherical k-means over a (pre-normalized) sample.

    Driver-side by design: the sample is small (thousands of rows) and
    the centroids are the broadcast state of the IVF index — the same
    train-small / broadcast / assign-streaming shape FAISS IVF uses.
    Empty cells keep their previous centroid (never NaN)."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)]
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)
        acc = np.zeros_like(cent)
        np.add.at(acc, assign, sample)
        counts = np.bincount(assign, minlength=len(cent))
        live = counts > 0
        acc[~live] = cent[~live]
        cent = _normalize(acc)
    return cent


class IVFTopK:
    """Actor-pool stage: IVF-restricted top-k against broadcast queries.

    Fuses the three IVF steps into one streaming pass over the corpus:
    assign each row to its nearest coarse centroid, drop rows whose list
    no query probes, score the survivors — each query only against rows
    in its own ``nprobe`` probed lists (true inverted-file semantics,
    not accept-set brute force).  State (centroids, queries, probe
    lists) loads once per actor from ``ray.put`` refs."""

    def __init__(self, queries_ref, cent_ref, probes_ref, k, id_col, emb_col):
        q = ray.get(queries_ref)
        self.qids: np.ndarray = q["ids"]
        self.qmat: np.ndarray = _normalize(q["mat"].astype(np.float64))
        self.cent: np.ndarray = ray.get(cent_ref)
        self.probes: np.ndarray = ray.get(probes_ref)  # (Q, nprobe) int64
        self.accept: np.ndarray = np.unique(self.probes)
        self._q_order = np.argsort(self.qids)
        self._q_sorted = self.qids[self._q_order]
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def _empty(self) -> pa.Table:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return self._empty()
        ids = batch[self.id_col].to_numpy()
        mat = _normalize(_emb_matrix(batch, self.emb_col))
        assign = (mat @ self.cent.T).argmax(axis=1)
        mask = np.isin(assign, self.accept)
        if not mask.any():
            return self._empty()
        ids, mat, assign = ids[mask], mat[mask], assign[mask]
        scores = self.qmat @ mat.T  # (Q, B')
        # per-query list restriction: query qi sees row j only when
        # assign[j] is one of its probed lists
        allowed = (assign[None, None, :] == self.probes[:, :, None]).any(axis=1)
        scores[~allowed] = -np.inf
        pos = np.searchsorted(self._q_sorted, ids)
        pos = np.clip(pos, 0, len(self._q_sorted) - 1)
        hit = self._q_sorted[pos] == ids
        if hit.any():
            scores[self._q_order[pos[hit]], np.nonzero(hit)[0]] = -np.inf
        k = min(self.k, scores.shape[1])
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        sc = np.take_along_axis(scores, part, axis=1).reshape(-1)
        keep = np.isfinite(sc)  # a query may have < k rows in its lists
        return pa.table(
            {
                "query_id": pa.array(np.repeat(self.qids, k)[keep]),
                "neighbor_id": pa.array(ids[part.reshape(-1)][keep]),
                "score": pa.array(sc[keep]),
            }
        )


def knn_ivf(
    ds: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 12,
    sample_size: int = 4096,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency=(1, 4),
    quantizer: str = "kmeans",
) -> rd.Dataset:
    """Approximate top-k via an inverted-file (IVF) coarse quantizer.

    Train spherical k-means centroids on a bounded sample (driver-side,
    deterministic), broadcast them, then one streaming pass assigns /
    prunes / scores per batch (:class:`IVFTopK`) and the standard
    fixed-shard merge (:func:`_global_topk`) resolves global top-k.
    Scale shape: train-once broadcast state, corpus never materialized,
    per-batch work one (B,d)x(d,nlist) assign matmul + one (Q,B') score
    matmul.  Recall/pruning trade off via (nlist, nprobe): on clustered
    corpora small nprobe/nlist gives high recall at ~nprobe/nlist of
    brute-force work (tested); on unstructured embeddings recall tends
    to nprobe/nlist, hence the generous defaults for the near-random
    fixture corpus (driver-gated by ``embed_ivf_recall``).

    ``quantizer="head"`` replaces the k-means training with a FIXED
    coarse quantizer — the ``nlist`` lowest-id vectors themselves (the
    FAISS pattern of supplying a pre-trained quantizer): every index
    decision (assignment argmax, probe ranking) is then a pure cosine
    ORDER over table rows, which a SQL twin can replicate row-for-row
    (oracles.embed_knn_ivf) — k-means' iterative float averaging is
    not SQL-expressible."""
    if quantizer == "head":
        head = ds.map_batches(
            lambda b: b.filter(
                pa.compute.less(b[id_col], pa.scalar(nlist))
            ),
            batch_format="pyarrow",
        ).take_all()
        head.sort(key=lambda r: r[id_col])
        cent = _normalize(
            np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in head])
        )
    else:
        sample = ds.limit(sample_size).to_pandas()
        smat = _normalize(np.stack(sample[emb_col].to_numpy()).astype(np.float64))
        cent = _spherical_kmeans(smat, nlist)

    qtab = ds.map_batches(
        lambda b: b.filter(pa.compute.is_in(b[id_col], value_set=pa.array(query_ids))),
        batch_format="pyarrow",
    ).take_all()
    qids = np.array([r[id_col] for r in qtab])
    qmat = _normalize(np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in qtab]))
    nprobe = min(nprobe, len(cent))
    qsims = qmat @ cent.T
    # deterministic probe set: full (sim desc, centroid asc) order — an
    # argpartition boundary tie would be resolved arbitrarily and the
    # SQL twin could not mirror it
    order = np.lexsort(
        (np.broadcast_to(np.arange(cent.shape[0]), qsims.shape), -qsims), axis=1
    )
    probes = order[:, :nprobe].astype(np.int64)

    local = ds.map_batches(
        IVFTopK,
        fn_constructor_args=(
            ray.put({"ids": qids, "mat": qmat}),
            ray.put(cent),
            ray.put(probes),
            k,
            id_col,
            emb_col,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return _global_topk(local, k)


def embedding_neardup(
    ds: rd.Dataset,
    threshold: float = 0.98,
    nbits: int | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    target_bucket_rows: int = 256,
    split_above: int | None = None,
    n_shards: int = 256,
) -> rd.Dataset:
    """Embedding-cosine near-duplicate pairs via LSH-bucketed blocking:
    bucket by deterministic Rademacher sign signature, exact pairwise
    cosine within buckets (near-identical vectors collide w.h.p.),
    canonical (a < b) pairs.  Buckets AND cosines use the ordered
    projection / dot chains (:func:`chain_bucket`,
    :func:`chain_cosine`), so for a fixed ``nbits`` the full output —
    pair set, threshold verdicts, the float cosine column itself — is
    bit-identical to the generated SQL twin (oracles.embed_neardup).

    Scale behaviour (derived, not fixed — the LSH banding-from-threshold
    lesson): when ``nbits`` is None it is sized from the corpus count so
    expected bucket occupancy ~ ``target_bucket_rows``; a bucket that
    still exceeds ``split_above`` (skew) is subdivided by a second-level
    hyperplane split — only within-sub-bucket pairs are compared, and the
    skipped cross-pair count is recorded on the ``counters`` actor
    (``embed_neardup_pairs_skipped``) so capped work is never silent.

    Shuffle topology: the pair stage groups on ``hash(bucket) % n_shards``
    — NOT the raw bucket id — so the group count is FIXED at ``n_shards``
    (~cluster cores) while bucket count grows as N/occupancy.  Ray's
    sort-based ``map_groups`` pays ~1 ms of per-group Python (measured,
    CLAUDE.md), which at 10^9 vectors and raw-bucket keying would be
    hours of pure dispatch.  Each shard task processes ALL of its buckets
    in one lexsort + run-detection pass; the pair set is byte-identical
    to bucket-keyed grouping (colliding rows stay co-located — tested).
    """
    from geoglue_ray.stages.counters import bump
    from geoglue_ray.stages.dedup import _run_pairs, _shard_of

    first = ds.take(1)[0]
    dim = len(first[emb_col])
    if nbits is None:
        n = ds.count()  # metadata-cheap on a parquet-backed source
        nbits = int(np.clip(np.ceil(np.log2(max(n, 2) / target_bucket_rows)), 4, 24))
    if split_above is None:
        split_above = 32 * target_bucket_rows
    signs_ref = ray.put(rademacher_signs(dim, nbits, seed=23))

    def bucketize(batch: pa.Table) -> pa.Table:
        s = ray.get(signs_ref)
        bk = chain_bucket(_emb_matrix(batch, emb_col), s)
        batch = batch.append_column("bucket", pa.array(bk))
        return batch.append_column(
            "shard", pa.array(_shard_of(np.zeros(len(bk), dtype=np.int64), bk, n_shards))
        )

    def _split_run(ids, mat, norms, bucket_val):
        """Second-level split of one oversized bucket: extra sign bits
        sized to target occupancy, deterministic per bucket; within-run
        pairs only (skipped cross-pairs logged on the counters actor).
        This skew path keeps RNG sub-planes — it only triggers above
        ``split_above`` rows per bucket, which the SQL-twin fixture never
        reaches (the skip counter makes any capped work visible)."""
        n = len(ids)
        extra = max(1, int(np.ceil(np.log2(n / target_bucket_rows))))
        rng = np.random.default_rng((23, int(bucket_val) & 0x7FFFFFFF))
        planes = rng.standard_normal((mat.shape[1], extra))
        sub = ((mat @ planes) > 0) @ (1 << np.arange(extra, dtype=np.int64))
        o2 = np.argsort(sub, kind="stable")  # id order preserved per sub
        sub_s, ids, mat, norms = sub[o2], ids[o2], mat[o2], norms[o2]
        ia, ib = _run_pairs(sub_s)
        s = chain_cosine(mat[ia], mat[ib], norms[ia], norms[ib])
        bump("embed_neardup_split_buckets", 1)
        bump("embed_neardup_pairs_skipped", n * (n - 1) // 2 - len(ia))
        return ids[ia], ids[ib], s

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "vec_a": np.array([], dtype=np.int64),
                "vec_b": np.array([], dtype=np.int64),
                "cosine": np.array([], dtype=np.float64),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        """ALL buckets of one shard in one vectorized pass: lexsort by
        (bucket, id) -> within-run pair indices -> one gathered einsum.
        Oversized runs (skew) are excluded from the joint pass and take
        the per-bucket split path (rare by construction)."""
        if len(g) < 2:
            return _empty()
        ids = g[id_col].to_numpy()
        buckets = g["bucket"].to_numpy()
        order = np.lexsort((ids, buckets))  # ids ascending within bucket
        ids, buckets = ids[order], buckets[order]
        mat = np.stack(g[emb_col].to_numpy()[order]).astype(np.float64)
        norms = _chain_norm(mat)
        boundary = np.concatenate(([True], buckets[1:] != buckets[:-1]))
        starts = np.nonzero(boundary)[0]
        lengths = np.diff(np.concatenate([starts, [len(ids)]]))
        out_a, out_b, out_s = [], [], []
        big = np.nonzero(lengths > split_above)[0]
        key = buckets
        if len(big):
            # singletonize oversized runs so the joint pass skips them
            key = buckets.copy()
            for r in big:
                s0, L = starts[r], lengths[r]
                key[s0 : s0 + L] = -(np.arange(L) + s0 + 1)
                a, b, s = _split_run(
                    ids[s0 : s0 + L],
                    mat[s0 : s0 + L],
                    norms[s0 : s0 + L],
                    buckets[s0],
                )
                out_a.append(a)
                out_b.append(b)
                out_s.append(s)
        ia, ib = _run_pairs(key)
        if len(ia):
            out_a.append(ids[ia])
            out_b.append(ids[ib])
            out_s.append(chain_cosine(mat[ia], mat[ib], norms[ia], norms[ib]))
        if not out_a:
            return _empty()
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        s = np.concatenate(out_s)
        keep = s >= threshold
        return pd.DataFrame({"vec_a": a[keep], "vec_b": b[keep], "cosine": s[keep]})

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    return bucketed.groupby("shard").map_groups(pairs, batch_format="pandas")


def pairwise_set_jaccard(
    ds: rd.Dataset,
    key_col: str,
    item_col: str,
    n_shards: int = 64,
) -> rd.Dataset:
    """Exact pairwise Jaccard similarity between per-key ITEM SETS via
    an inverted index — only key pairs sharing at least one item are
    ever generated (never the all-pairs square):

    1. distinct (key, item) pairs + per-key set sizes (fixed-shard
       dedup, bounded partials);
    2. invert: per ITEM, emit all key pairs sharing it (vectorized
       triangle expansion per item group);
    3. per-pair shared-item counts (fixed-shard sum), sizes joined by
       sorted lookup against the broadcast-size key-size table;
    4. ``jaccard = shared / (size_a + size_b - shared)`` — one division
       of exact integers.

    Partitioning assumption: a single item's key list must fit one task
    (salt hot items into sub-shards, as stages/dedup.py does for LSH
    buckets, if an item can be shared by millions of keys)."""
    import pandas as pd

    def prep(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy().astype(np.int64)
        it = b[item_col].to_numpy().astype(np.int64)
        shard = (
            (it.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_sj": pa.array(shard),
                "key": pa.array(k),
                "item": pa.array(it),
            }
        )

    def dedup_and_pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "_t": pa.array([], pa.int64()),
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        k = g["key"].to_numpy().astype(np.int64)
        it = g["item"].to_numpy().astype(np.int64)
        ki = np.unique(np.stack([it, k], axis=1), axis=0)
        it, k = ki[:, 0], ki[:, 1]
        # per-key size CONTRIBUTION from this item shard (summed later)
        uk, cnt = np.unique(k, return_counts=True)
        parts = [
            pa.table(
                {
                    "_t": pa.array(np.zeros(len(uk), np.int64)),
                    "a": pa.array(uk),
                    "b": pa.array(np.zeros(len(uk), np.int64)),
                    "n": pa.array(cnt.astype(np.int64)),
                }
            )
        ]
        # per-item key-pair expansion (items are grouped: `it` sorted)
        starts = np.r_[0, np.flatnonzero(it[1:] != it[:-1]) + 1, len(it)]
        pa_, pb_ = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            m = e - s
            if m < 2:
                continue
            ii, jj = np.triu_indices(m, k=1)
            pa_.append(k[s + ii])
            pb_.append(k[s + jj])
        if pa_:
            aa = np.concatenate(pa_)
            bb = np.concatenate(pb_)
            lo = np.minimum(aa, bb)
            hi = np.maximum(aa, bb)
            key = lo * np.int64(1 << 32) + hi
            ukey, inv = np.unique(key, return_inverse=True)
            n = np.zeros(len(ukey), np.int64)
            np.add.at(n, inv, 1)
            parts.append(
                pa.table(
                    {
                        "_t": pa.array(np.ones(len(ukey), np.int64)),
                        "a": pa.array(ukey // (1 << 32)),
                        "b": pa.array(ukey % (1 << 32)),
                        "n": pa.array(n),
                    }
                )
            )
        return pa.concat_tables(parts)

    tagged = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_sj")
        .map_groups(dedup_and_pairs, batch_format="pandas")
        .materialize()  # consumed by the size reduce AND the pair reduce
    )

    # key sizes: bounded by key cardinality x shard count — reduce small
    def pick_sizes(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["_t"], 0))
        return pa.table({"a": b["a"], "n": b["n"]})

    sizes = (
        tagged.map_batches(pick_sizes, batch_format="pyarrow")
        .to_pandas()
        .groupby("a", as_index=False)["n"]
        .sum()
    )
    skeys = sizes["a"].to_numpy()
    ssz = sizes["n"].to_numpy()
    o = np.argsort(skeys)
    skeys, ssz = skeys[o], ssz[o]

    def shard_pairs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["_t"], 1))
        sh = (
            (b["a"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_pj": pa.array(sh),
                "a": b["a"],
                "b": b["b"],
                "n": b["n"],
            }
        )

    def finish(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "key_a": pa.array([], pa.int64()),
                "key_b": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        agg = g.groupby(["a", "b"], as_index=False, dropna=False)["n"].sum()
        a = agg["a"].to_numpy()
        b = agg["b"].to_numpy()
        n = agg["n"].to_numpy().astype(np.int64)
        sa = ssz[np.searchsorted(skeys, a)]
        sb = ssz[np.searchsorted(skeys, b)]
        return pa.table(
            {
                "key_a": pa.array(a),
                "key_b": pa.array(b),
                "n_shared": pa.array(n),
                "jaccard": pa.array(n / (sa + sb - n)),
            }
        )

    return (
        tagged.map_batches(shard_pairs, batch_format="pyarrow")
        .groupby("_pj")
        .map_groups(finish, batch_format="pandas")
    )


def kmeans_lloyd(
    ds: rd.Dataset,
    k: int = 4,
    rounds: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> rd.Dataset:
    """Distributed Lloyd k-means over the embedding corpus, EXACT end to
    end: components quantize to integers at 2^-20 (the embed_centroids
    trick — power-of-two scaling of a float32 never rounds), so squared
    distances, argmin assignment (ties to the smallest cluster id) and
    the per-cluster component sums are all int64 arithmetic, and the
    M-step centroid is the round-half-up integer mean
    ``(2*(S + n*2^20) + n) // (2n) - 2^20`` — a non-negative floor
    division identical to SQL ``//``.  Every round is one streaming
    assign pass (broadcast k x dim centroid ints, one integer matmul
    per batch, per-batch partial sums) plus a (k x (dim+1))-row
    aggregate; nothing vector-scale ever shuffles or materializes.
    Seeds are the vectors with ``id < k``; an emptied cluster keeps its
    previous centroid (both sides mirror the rule).

    Returns k x dim rows: (cluster_id, dim, centroid_q, n_members)."""
    from geoglue_ray.stages.zonal import zonal_aggregate

    OFF = 1 << 20
    QS = float(OFF)

    def quant(b: pa.Table) -> np.ndarray:
        la = b[emb_col].combine_chunks()
        mat = np.asarray(la.flatten()).reshape(len(b), -1)
        return np.floor(mat.astype(np.float64) * QS + 0.5).astype(np.int64)

    import pyarrow.compute as pc

    seeds = ds.map_batches(
        lambda b: b.filter(pc.less(b[id_col], k)), batch_format="pyarrow"
    ).take_all()
    seeds.sort(key=lambda r: r[id_col])
    cents = np.stack(
        [
            np.floor(np.asarray(r[emb_col], dtype=np.float64) * QS + 0.5).astype(
                np.int64
            )
            for r in seeds
        ]
    )
    assert cents.shape == (k, dim)

    n_members = np.zeros(k, dtype=np.int64)
    for _ in range(rounds):

        def partial(b: pa.Table, *, c=cents.copy()) -> pa.Table:
            q = quant(b)
            # argmin ||q - c||^2 == argmin (|c|^2 - 2 q.c); first min ==
            # smallest cluster id, mirroring ORDER BY d2, cluster
            cc = (c * c).sum(axis=1)
            score = cc[None, :] - 2 * (q @ c.T)
            win = np.argmin(score, axis=1)
            ks, ds_, ss = [], [], []
            for j in range(len(c)):
                m = win == j
                nj = int(m.sum())
                if nj == 0:
                    continue
                ks.append(np.full(dim + 1, j, dtype=np.int64))
                ds_.append(np.r_[np.arange(dim, dtype=np.int64), -1])
                ss.append(np.r_[q[m].sum(axis=0), nj])  # dim=-1 row = count
            if not ks:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "dim": pa.array([], pa.int64()),
                        "s": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    "cluster": pa.array(np.concatenate(ks)),
                    "dim": pa.array(np.concatenate(ds_)),
                    "s": pa.array(np.concatenate(ss).astype(np.float64)),
                }
            )

        agg = zonal_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["sum"],
            keys=["cluster", "dim"],
            value_col="s",
        ).take_all()  # bounded: k x (dim + 1) rows
        S = np.zeros((k, dim), dtype=np.int64)
        n_members = np.zeros(k, dtype=np.int64)
        for row in agg:
            j, d, s = int(row["cluster"]), int(row["dim"]), int(row["sum"])
            if d < 0:
                n_members[j] = s
            else:
                S[j, d] = s
        new = cents.copy()
        nz = n_members > 0
        nn = n_members[nz][:, None]
        new[nz] = (2 * (S[nz] + nn * OFF) + nn) // (2 * nn) - OFF
        cents = new

    out = pa.table(
        {
            "cluster_id": pa.array(np.repeat(np.arange(k, dtype=np.int64), dim)),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), k)),
            "centroid_q": pa.array(cents.ravel()),
            "n_members": pa.array(np.repeat(n_members, dim)),
        }
    )
    return rd.from_arrow(out).sort(["cluster_id", "dim"])


def pq_train(
    ds: rd.Dataset,
    n_blocks: int = 4,
    k: int = 4,
    rounds: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> rd.Dataset:
    """PRODUCT-QUANTIZATION codebook training (the FAISS PQ shape — the
    memory-side complement of the IVF/LSH ANN family): the embedding
    splits into ``n_blocks`` contiguous sub-vectors and each block
    trains its own k-means codebook, ALL blocks in the same streaming
    pass per round (one batch scan computes every block's assignment
    and partial sums — never one pass per block).  Arithmetic is the
    kmeans_lloyd contract: 2^-20 integer quantization, int64 distances,
    first-min == smallest-centroid tie rule, round-half-up integer
    M-step, emptied codewords keep their previous centroid.

    Returns ``n_blocks * k * (dim/n_blocks)`` rows:
    (block, cluster_id, dim, centroid_q, n_members) — ``dim`` is the
    within-block component index."""
    import pyarrow.compute as pc

    from geoglue_ray.stages.zonal import zonal_aggregate

    assert dim % n_blocks == 0
    bd = dim // n_blocks
    OFF = 1 << 20
    QS = float(OFF)

    def quant(b: pa.Table) -> np.ndarray:
        la = b[emb_col].combine_chunks()
        mat = np.asarray(la.flatten()).reshape(len(b), -1)
        return np.floor(mat.astype(np.float64) * QS + 0.5).astype(np.int64)

    seeds = ds.map_batches(
        lambda b: b.filter(pc.less(b[id_col], k)), batch_format="pyarrow"
    ).take_all()
    seeds.sort(key=lambda r: r[id_col])
    seed_q = np.stack(
        [
            np.floor(np.asarray(r[emb_col], dtype=np.float64) * QS + 0.5).astype(
                np.int64
            )
            for r in seeds
        ]
    )  # (k, dim)
    # cents[b, j] = codeword j of block b, from seed vector j's block b
    cents = np.stack([seed_q[:, b * bd : (b + 1) * bd] for b in range(n_blocks)])

    n_members = np.zeros((n_blocks, k), dtype=np.int64)
    for _ in range(rounds):

        def partial(batch: pa.Table, *, c=cents.copy()) -> pa.Table:
            q = quant(batch)
            ks, bs_, ds_, ss = [], [], [], []
            for b in range(c.shape[0]):
                qb = q[:, b * bd : (b + 1) * bd]
                cc = (c[b] * c[b]).sum(axis=1)
                score = cc[None, :] - 2 * (qb @ c[b].T)
                win = np.argmin(score, axis=1)
                for j in range(c.shape[1]):
                    m = win == j
                    nj = int(m.sum())
                    if nj == 0:
                        continue
                    bs_.append(np.full(bd + 1, b, dtype=np.int64))
                    ks.append(np.full(bd + 1, j, dtype=np.int64))
                    ds_.append(np.r_[np.arange(bd, dtype=np.int64), -1])
                    ss.append(np.r_[qb[m].sum(axis=0), nj])
            if not ks:
                return pa.table(
                    {
                        "block": pa.array([], pa.int64()),
                        "cluster": pa.array([], pa.int64()),
                        "dim": pa.array([], pa.int64()),
                        "s": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    "block": pa.array(np.concatenate(bs_)),
                    "cluster": pa.array(np.concatenate(ks)),
                    "dim": pa.array(np.concatenate(ds_)),
                    "s": pa.array(np.concatenate(ss).astype(np.float64)),
                }
            )

        agg = zonal_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["sum"],
            keys=["block", "cluster", "dim"],
            value_col="s",
        ).take_all()  # bounded: n_blocks x k x (bd + 1)
        S = np.zeros((n_blocks, k, bd), dtype=np.int64)
        n_members = np.zeros((n_blocks, k), dtype=np.int64)
        for row in agg:
            b, j, d = int(row["block"]), int(row["cluster"]), int(row["dim"])
            s = int(row["sum"])
            if d < 0:
                n_members[b, j] = s
            else:
                S[b, j, d] = s
        new = cents.copy()
        nz = n_members > 0
        nn = n_members[nz][:, None]
        new[nz] = (2 * (S[nz] + nn * OFF) + nn) // (2 * nn) - OFF
        cents = new

    blk = np.repeat(np.arange(n_blocks, dtype=np.int64), k * bd)
    cid = np.tile(np.repeat(np.arange(k, dtype=np.int64), bd), n_blocks)
    dms = np.tile(np.arange(bd, dtype=np.int64), n_blocks * k)
    out = pa.table(
        {
            "block": pa.array(blk),
            "cluster_id": pa.array(cid),
            "dim": pa.array(dms),
            "centroid_q": pa.array(cents.reshape(-1)),
            "n_members": pa.array(np.repeat(n_members.reshape(-1), bd)),
        }
    )
    return rd.from_arrow(out).sort(["block", "cluster_id", "dim"])


def top_eigen(
    ds: rd.Dataset,
    rounds: int = 4,
    dim: int = 64,
    emb_col: str = "embedding",
    qscale: int = 1024,
    n_merge: int = 8,
) -> "pa.Table":
    """Leading eigenvector of the corpus's (uncentered) second-moment
    matrix by fixed-point POWER ITERATION — the spectral operator of an
    embedding pipeline (dominant direction / first PCA axis up to
    centering), exact end to end: components quantize at ``1/qscale``
    (power-of-two scaling + floor(x+0.5): identical in numpy and SQL),
    the Gram matrix ``C = sum q q^T`` accumulates in int64, and each
    round renormalizes with the kmeans offset trick
    ``((w + mx) * qscale) // mx - qscale`` (numerator non-negative, so
    DuckDB's truncating ``//`` equals numpy's floor), mx = max|w|.

    Scale shape: ONE streaming pass emits per-batch dxd partial Grams
    (payload = d*d rows per batch, never vectors), a fixed index-keyed
    shard merge bounds the shuffle, and the d*d result iterates on the
    driver — matrix size is model-dimension, not corpus, so rounds are
    free.  int64 bound: |C| <= n_vecs * qscale^2, exact while
    n_vecs < 2^63 / (d * qscale^2) (~2^33 at qscale 2^10; drop qscale to
    widen).

    Returns dim rows: (dim, v_q) — the eigenvector at fixed point
    qscale."""
    QS = float(qscale)

    def gram_partial(b: pa.Table) -> pa.Table:
        la = b[emb_col].combine_chunks()
        mat = np.asarray(la.flatten()).reshape(len(b), -1)
        q = np.floor(mat.astype(np.float64) * QS + 0.5).astype(np.int64)
        C = q.T @ q  # d x d int64
        idx = np.arange(dim * dim, dtype=np.int64)
        return pa.table(
            {
                "_sh": pa.array(idx % np.int64(n_merge)),
                "ij": pa.array(idx),
                "v": pa.array(C.ravel()),
            }
        )

    def merge(g):
        import pandas as pd

        s = g.groupby("ij", sort=False)["v"].sum().reset_index()
        return pd.DataFrame(
            {"ij": s["ij"].astype(np.int64), "v": s["v"].astype(np.int64)}
        )

    rows = (
        ds.map_batches(gram_partial, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(merge, batch_format="pandas")
        .take_all()
    )  # bounded: d*d rows
    C = np.zeros(dim * dim, dtype=np.int64)
    for r in rows:
        C[int(r["ij"])] = int(r["v"])
    C = C.reshape(dim, dim)

    v = np.full(dim, qscale, dtype=np.int64)
    for _ in range(rounds):
        w = C @ v
        mx = int(np.abs(w).max())
        v = ((w + mx) * np.int64(qscale)) // np.int64(mx) - np.int64(qscale)
    return pa.table(
        {
            "dim": pa.array(np.arange(dim, dtype=np.int64)),
            "v_q": pa.array(v),
        }
    )
