"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data dedup at corpus scale, Ray-Data-first:

- **Exact**: vectorized 64-bit content hash per batch (stable siphash via
  ``pd.util.hash_array`` — deterministic across workers) -> groupby(hash)
  keeping the lowest doc_id.  The shuffle moves (hash, doc_id) pairs only,
  never text.
- **MinHash+LSH**: shingle -> k-permutation minhash signature (vectorized
  universal hashing) -> band buckets -> ``groupby(band, bucket)`` ->
  candidate pairs -> signature-estimated Jaccard filter.  Shuffle payload
  is (band_hash, doc_id, signature) — signatures are k*8 bytes, not text.
- **SimHash**: 64-bit weighted-bit fingerprint; bands derived from the
  Hamming threshold (max_hamming+1 bands) so every qualifying pair is
  guaranteed (pigeonhole) to collide in at least one band — complete.
- **n-gram Jaccard**: exact character-n-gram Jaccard verification for
  candidate pairs within groups (``map_groups``).

All emit canonical (doc_a < doc_b) pairs, deduplicated, deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_MERSENNE = np.uint64((1 << 61) - 1)
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 (numpy<2 has no bitwise_count)."""
    return _POPCNT8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int64)


def content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stable vectorized 64-bit hash of the text column."""
    h = pd.util.hash_array(batch[text_col].to_numpy(zero_copy_only=False))
    return batch.append_column("content_hash", pa.array(h.view(np.int64)))


def exact_dedup(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text", n_shards: int = 64
) -> rd.Dataset:
    """One row per distinct text: (doc_id = lowest id, n_dups).

    Hash-partitioned first-wins, the classic exact-dedup shape; 64-bit
    hashes make collisions negligible and the shuffle narrow.

    Scale shape (round-3 rework): content_hash cardinality ~ corpus size,
    so a native ``groupby(content_hash)`` would pay Ray's per-group
    Python overhead N times (measured ~28 s at 200k keys, CLAUDE.md).
    Instead each batch partially reduces (hash -> min id, count) with one
    ``np.unique`` + ``reduceat`` pass, the shuffle key is ``hash %
    n_shards`` (FIXED group count, equal hashes co-located), and each
    shard merges its many hashes in one more vectorized pass.  Shuffle
    payload: one 24-byte partial row per distinct hash per batch.
    """

    def partial(b: pa.Table) -> pa.Table:
        t = content_hash(b, text_col)
        h = t["content_hash"].to_numpy()
        ids = t[id_col].to_numpy().astype(np.int64)
        uniq, inv = np.unique(h, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(len(uniq)))
        return pa.table(
            {
                "shard": pa.array(
                    (uniq.view(np.uint64) % np.uint64(n_shards)).astype(np.int64)
                ),
                "content_hash": pa.array(uniq),
                id_col: pa.array(np.minimum.reduceat(ids[order], starts)),
                "n_dups": pa.array(
                    np.diff(np.concatenate([starts, [len(ids)]])).astype(np.int64)
                ),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        h = g["content_hash"].to_numpy()
        ids = g[id_col].to_numpy()
        cnt = g["n_dups"].to_numpy()
        uniq, inv = np.unique(h, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(len(uniq)))
        return pd.DataFrame(
            {
                id_col: np.minimum.reduceat(ids[order], starts),
                "n_dups": np.add.reduceat(cnt[order], starts),
            }
        )

    parted = ds.map_batches(partial, batch_format="pyarrow")
    return parted.groupby("shard").map_groups(merge, batch_format="pandas")


# ----------------------------------------------------------------- MinHash
_MIX1 = np.uint64(0x9E3779B185EBCA87)  # shard mixing only (shuffle-internal)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)
# shingle-combine multipliers: SEMANTIC (they define the signatures) and
# deliberately < 2**62 so the DuckDB oracle's HUGEINT products of a
# multiplier with a full uint64 stay below 2**127 (texthash.py contract)
_SH_MUL1 = np.uint64(0x27D4EB2F165667C5)
_SH_MUL2 = np.uint64(0x165667B19E3779F9)
_SH_SHORT_SEED = np.uint64(1469598103)


def shingle_hash_batch(texts, k: int = 3):
    """Fully vectorized word-shingle hashing for a batch of documents.

    Tokens are hashed with the SQL-replicable :mod:`texthash` hash; a
    k-shingle's hash is an arithmetic combine of k consecutive token
    hashes (no string joins, no per-row Python) — every step mod-2**64,
    reproducible in DuckDB HUGEINT for the minhash oracle.  Returns
    (shingle_hashes, doc_offsets) in CSR layout; docs with < k tokens
    contribute one whole-doc shingle.
    """
    import pyarrow.compute as pc

    from geoglue_ray.functions.texthash import token_hash64

    toks = pc.utf8_split_whitespace(texts)
    n_tok = pc.list_value_length(toks).to_numpy().astype(np.int64)
    flat = toks.flatten() if hasattr(toks, "flatten") else pc.list_flatten(toks)
    th = token_hash64(flat.to_numpy(zero_copy_only=False))

    tok_off = np.concatenate(([0], np.cumsum(n_tok)))
    n_sh = np.where(n_tok >= k, n_tok - k + 1, (n_tok > 0).astype(np.int64))
    sh_off = np.concatenate(([0], np.cumsum(n_sh)))
    total = int(sh_off[-1])
    out = np.empty(total, dtype=np.uint64)

    # long docs: combine k consecutive token hashes with shifted views
    longd = n_tok >= k
    if longd.any():
        # global positions of each long doc's shingle starts
        starts = np.repeat(tok_off[:-1][longd], n_sh[longd])
        within = np.arange(int(n_sh[longd].sum())) - np.repeat(
            np.cumsum(n_sh[longd]) - n_sh[longd], n_sh[longd]
        )
        pos = starts + within
        h = th[pos] * _SH_MUL1
        for j in range(1, k):
            h = (h ^ th[pos + j]) * _SH_MUL2
        dest = np.repeat(sh_off[:-1][longd], n_sh[longd]) + within
        out[dest] = h
    # short docs (0 < n_tok < k): one combined hash of all their tokens
    shortd = (n_tok > 0) & (n_tok < k)
    if shortd.any():
        hs = np.full(int(shortd.sum()), _SH_SHORT_SEED, dtype=np.uint64)
        idxs = tok_off[:-1][shortd]
        nts = n_tok[shortd]
        for j in range(int(nts.max())):
            sel = nts > j
            hs[sel] = (hs[sel] ^ th[idxs[sel] + j]) * _SH_MUL2
        out[sh_off[:-1][shortd]] = hs
    return out, sh_off


class MinHasher:
    """Actor-pool stage: text -> minhash signature (num_perm x uint64).

    Universal-hash permutations ``(a*x + b) mod p`` with a fixed seed —
    identical on every actor, so signatures are globally comparable.  The
    whole batch is one (P, S_total) vectorized pass with per-doc
    ``minimum.reduceat``; no Python loop over documents.
    """

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.k = shingle_k
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """Signature of one shingle-hash set (used by tests)."""
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = shingles.astype(np.uint64)[None, :]
        # multiply-shift permutation family (wrapping uint64): ~3x faster
        # than mod-Mersenne and equally valid for minhash estimates
        h = self.a[:, None] * x + self.b[:, None]
        return h.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh, off = shingle_hash_batch(batch["text"].combine_chunks(), self.k)
        n_docs = len(batch)
        sigs = np.full((n_docs, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        nonempty = np.diff(off) > 0
        if sh.size:
            # one 1D pass per permutation (numpy's stride-0 broadcast on
            # uint64 is ~30x slower than explicit row ops), min-reduced per
            # doc segment; buffer reused across permutations
            starts = off[:-1][nonempty]
            buf = np.empty_like(sh)
            for i in range(self.num_perm):
                np.multiply(sh, self.a[i], out=buf)
                buf += self.b[i]
                sigs[nonempty, i] = np.minimum.reduceat(buf, starts)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1).view(np.int64)), self.num_perm
                ),
            }
        )


def _shard_of(band_id: np.ndarray, key: np.ndarray, n_shards: int) -> np.ndarray:
    """Shuffle shard for LSH pair generation: a deterministic function of
    the full collision key ``(band_id, band-key)``, so colliding rows are
    always co-located (pair output is byte-identical to band-only keying)
    while each map_groups task holds ~N*bands/n_shards rows instead of all
    N, and the group count is FIXED at n_shards (Ray pays per-group Python
    overhead, so thousands of tiny groups are as wrong as 16 huge ones —
    each shard processes its many buckets in one vectorized pass)."""
    if n_shards <= 1:
        return np.zeros(len(key), dtype=np.int64)
    mixed = key.astype(np.uint64) * _MIX1 + band_id.astype(np.uint64) * _MIX2
    return (mixed % np.uint64(n_shards)).astype(np.int64)


def _explode_bands(
    batch: pa.Table, bands: int, rows: int, n_shards: int = 256, with_sig: bool = True
) -> pa.Table:
    sig = (
        np.asarray(batch["sig"].combine_chunks().flatten())
        .view(np.uint64)
        .reshape(len(batch), -1)
    )
    n = len(batch)
    band_hash = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        chunk = sig[:, b * rows : (b + 1) * rows]
        h = np.full(n, np.uint64(1469598103), dtype=np.uint64)
        for r in range(rows):
            h = (h * np.uint64(1099511628211)) ^ chunk[:, r]
        band_hash[:, b] = h
    doc = np.repeat(batch["doc_id"].to_numpy(), bands)
    band_id = np.tile(np.arange(bands, dtype=np.int32), n)
    flat_hash = band_hash.reshape(-1)
    out = {
        "band_id": pa.array(band_id),
        "shard": pa.array(_shard_of(band_id, flat_hash, n_shards)),
        "band_hash": pa.array(flat_hash.view(np.int64)),
        "doc_id": pa.array(doc),
    }
    if with_sig:  # broadcast mode ships sigs once, not once per band
        sig_rep = np.repeat(sig, bands, axis=0)
        out["sig"] = pa.FixedSizeListArray.from_arrays(
            pa.array(sig_rep.reshape(-1).view(np.int64)), sig.shape[1]
        )
    return pa.table(out)


def _assemble_sig_broadcast_impl(*tabs: pa.Table) -> dict:
    """Concat signature blocks -> {sorted ids, row-aligned sig matrix}.
    Runs as a Ray task (see minhash_neardup): the driver never holds the
    matrix; only consumers (via :func:`_sig_lookup`) and the object store
    do."""
    tab = pa.concat_tables(tabs)
    ids = tab["doc_id"].to_numpy()
    mat = (
        np.asarray(tab["sig"].combine_chunks().flatten())
        .view(np.uint64)
        .reshape(len(tab), -1)
    )
    order = np.argsort(ids)
    return {"ids": ids[order], "mat": mat[order]}


_BLOOM_BITS_PER_ID = 12  # m/n=12, k=8 -> ~0.3% false positives
_BLOOM_K = 8


def _bloom_hashes(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Double-hashing basis (h1 + i*h2): two independent 64-bit mixes of
    the id; h2 forced odd so the probe sequence cycles the whole table."""
    from geoglue_ray.functions.texthash import int_hash64, kmv_hash64

    return kmv_hash64(ids), int_hash64(ids) | np.uint64(1)


def _bloom_query(ids: np.ndarray, bits: np.ndarray, m: int) -> np.ndarray:
    """True where the bloom MAY contain id (no false negatives)."""
    h1, h2 = _bloom_hashes(ids)
    maybe = np.ones(len(ids), dtype=bool)
    for i in range(_BLOOM_K):
        idx = ((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)
        maybe &= (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1 > 0
    return maybe


def _build_bloom_impl(n: int, id_col: str, *tabs: pa.Table) -> dict:
    """One-pass bloom build over the eliminated-id blocks.  Runs as a Ray
    task (block refs in, broadcastable dict out) so the driver holds
    neither the ids nor the bit array; memory = bits (n*12/8 bytes) + one
    block at a time."""
    m = max(64, int(n) * _BLOOM_BITS_PER_ID)
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    for t in tabs:
        ids = t[id_col].to_numpy().astype(np.int64)
        h1, h2 = _bloom_hashes(ids)
        for i in range(_BLOOM_K):
            idx = ((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)
            np.bitwise_or.at(bits, idx >> 3, (np.uint8(1) << (idx & 7).astype(np.uint8)))
    return {"bits": bits, "m": m}


def _get_bloom_task():
    import ray

    global _BLOOM_TASK
    if _BLOOM_TASK is None:
        _BLOOM_TASK = ray.remote(_build_bloom_impl)
    return _BLOOM_TASK


_BLOOM_TASK = None
_BLOOM_CACHE: dict = {}


def _bloom_lookup(ref):
    """Per-worker size-1 cached fetch of the broadcast bloom (the
    _sig_lookup pattern)."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    hit = _BLOOM_CACHE.get(key)
    if hit is None:
        import ray

        hit = ray.get(ref)
        _BLOOM_CACHE.clear()
        _BLOOM_CACHE[key] = hit
    return hit


def _get_assemble_task():
    """Lazily wrap the assembler as a Ray remote function (module import
    must not require an initialized Ray)."""
    import ray

    global _ASSEMBLE_TASK
    if _ASSEMBLE_TASK is None:
        _ASSEMBLE_TASK = ray.remote(_assemble_sig_broadcast_impl)
    return _ASSEMBLE_TASK


_ASSEMBLE_TASK = None


_SIG_CACHE: dict = {}


def _sig_lookup(ref):
    """Per-worker cached fetch of the broadcast (sorted ids, sig matrix).
    At most ONE entry is kept (replace on key miss): only one broadcast
    is live per pipeline run, and long-lived Ray workers across repeated
    runs would otherwise accumulate full signature-matrix copies (~1 GB
    each at the broadcast cap) until OOM."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    hit = _SIG_CACHE.get(key)
    if hit is None:
        import ray

        d = ray.get(ref)
        hit = (d["ids"], d["mat"])
        _SIG_CACHE.clear()
        _SIG_CACHE[key] = hit
    return hit


def _run_pairs(*sorted_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Within-run (equal adjacent composite key) pair indices for key
    arrays SORTED together; vectorized run detection, Python only over the
    (rare) multi-item runs."""
    n = len(sorted_keys[0])
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    diff = np.zeros(n - 1, dtype=bool)
    for k in sorted_keys:
        diff |= k[1:] != k[:-1]
    boundary = np.concatenate(([True], diff))
    starts = np.nonzero(boundary)[0]
    lengths = np.diff(np.concatenate([starts, [n]]))
    ia_parts, ib_parts = [], []
    for s, L in zip(starts[lengths > 1], lengths[lengths > 1]):
        a, b = np.triu_indices(int(L), k=1)
        ia_parts.append(a + s)
        ib_parts.append(b + s)
    if not ia_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(ia_parts), np.concatenate(ib_parts)


def _pair_reduce(
    pairs: rd.Dataset, val_col: str, reduce: str, n_buckets: int = 64
) -> rd.Dataset:
    """Global (doc_a, doc_b) dedup keeping the max/min of ``val_col`` (a
    pair can collide in several bands).  Pair cardinality scales with the
    corpus, so a native ``groupby([doc_a, doc_b])`` would pay Ray's
    per-group Python overhead once per pair (CLAUDE.md lesson); instead
    each batch pre-reduces its pairs vectorized and adds a FIXED
    ``hash(pair) % n_buckets`` shuffle key, and each bucket task reduces
    its many pairs in one lexsort + ``reduceat`` pass."""
    ufunc = np.maximum if reduce == "max" else np.minimum

    def _reduce_arrays(a, c, v):
        o = np.lexsort((c, a))
        a, c, v = a[o], c[o], v[o]
        bnd = np.concatenate(([True], (a[1:] != a[:-1]) | (c[1:] != c[:-1])))
        starts = np.nonzero(bnd)[0]
        return a[starts], c[starts], ufunc.reduceat(v, starts)

    def bucket(b: pa.Table) -> pa.Table:
        a, c, v = (
            b["doc_a"].to_numpy(),
            b["doc_b"].to_numpy(),
            b[val_col].to_numpy(),
        )
        if len(a):
            a, c, v = _reduce_arrays(a, c, v)  # per-batch partial reduce
        h = (a.astype(np.uint64) * _MIX1 + c.astype(np.uint64) * _MIX2) % np.uint64(
            n_buckets
        )
        return pa.table(
            {
                "_pb": pa.array(h.astype(np.int64)),
                "doc_a": pa.array(a),
                "doc_b": pa.array(c),
                val_col: pa.array(v),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        a, c, v = _reduce_arrays(
            g["doc_a"].to_numpy(), g["doc_b"].to_numpy(), g[val_col].to_numpy()
        )
        return pd.DataFrame({"doc_a": a, "doc_b": c, val_col: v})

    return (
        pairs.map_batches(bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(merge, batch_format="pandas")
    )


def _band_pairs(
    group: pd.DataFrame, threshold: float, sig_ref=None
) -> pd.DataFrame:
    """Candidate pairs for ALL (band, bucket) runs in one shard in one
    vectorized pass (lexsort by (band_id, band_hash) -> run detection ->
    per-run pairs): one pandas call per SHARD, never per bucket or band.
    Signatures come from the group's own ``sig`` column (shipped mode) or
    from the broadcast matrix (``sig_ref``).  Canonical (a < b) ordering."""
    if len(group) < 2:
        return _empty_pairs("est_jaccard")
    order = np.lexsort(
        (group["doc_id"].to_numpy(), group["band_hash"].to_numpy(),
         group["band_id"].to_numpy())
    )
    bid = group["band_id"].to_numpy()[order]
    bh = group["band_hash"].to_numpy()[order]
    ids = group["doc_id"].to_numpy()[order]
    ia, ib = _run_pairs(bid, bh)
    if not len(ia):
        return _empty_pairs("est_jaccard")
    if sig_ref is not None:
        ids_sorted, mat = _sig_lookup(sig_ref)
        pa_ = np.searchsorted(ids_sorted, ids[ia])
        pb_ = np.searchsorted(ids_sorted, ids[ib])
        est = (mat[pa_] == mat[pb_]).mean(axis=1)
    else:
        sig = np.stack(group["sig"].to_numpy()[order]).view(np.uint64)
        est = (sig[ia] == sig[ib]).mean(axis=1)
    keep = est >= threshold
    a, b = ids[ia[keep]], ids[ib[keep]]
    return pd.DataFrame(
        {
            "doc_a": np.minimum(a, b),
            "doc_b": np.maximum(a, b),
            "est_jaccard": est[keep].astype(np.float64),
        }
    )


def minhash_neardup(
    ds: rd.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    concurrency=(1, 8),
    n_shards: int = 256,
    broadcast_sigs_below: int = 2_000_000,
) -> rd.Dataset:
    """documents -> near-duplicate candidate pairs via MinHash+LSH.

    shingle/minhash (actor pool) -> band explode -> groupby(shard) ->
    vectorized within-bucket pairs -> global pair dedup (a pair can
    collide in several bands), keeping the max estimate.

    The shuffle key is a fixed-cardinality ``shard`` hashed from the full
    collision key ``(band_id, band_hash)``: colliding rows stay co-located
    (pair output is byte-identical to band-only keying) while each
    map_groups task holds ~N*bands/n_shards rows instead of all N — and,
    unlike keying on the bucket itself, the group count stays at
    ``n_shards`` (~cluster cores at scale) so Ray's per-group overhead is
    constant.  Each shard processes its many buckets in one lexsort +
    run-detection pass.

    Shuffle payload: when the corpus is small enough to broadcast its
    signature matrix (``count <= broadcast_sigs_below``; num_perm*8 bytes
    per doc — ~1 GB at the default cap), the explode ships only 28-byte
    (band, shard, hash, doc) rows and pair tasks read sigs from the one
    ``ray.put`` — a ~20x shuffle-volume cut vs shipping the signature
    with every band row, which remains the path (and the correct one)
    beyond the broadcast cap.  Pair sets and estimates are identical
    either way.
    """
    rows = num_perm // bands
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    try:  # metadata-cheap on parquet-backed inputs; None disables broadcast
        n_docs = ds.count()
    except Exception:  # pragma: no cover - exotic sources
        n_docs = None
    sig_ref = None
    if n_docs is not None and n_docs <= broadcast_sigs_below:
        import ray

        sigs = sigs.materialize()  # one computation for broadcast + explode
        # Assemble the broadcast OFF-driver: the block refs go straight
        # into a Ray task (zero-copy object-store reads) whose return IS
        # the broadcast object — driver RSS stays flat at any corpus size
        # instead of staging up to ~1 GB (num_perm*8 bytes x cap) here.
        sig_ref = _get_assemble_task().remote(*sigs.to_arrow_refs())
    exploded = sigs.map_batches(
        lambda b: _explode_bands(b, bands, rows, n_shards, with_sig=sig_ref is None),
        batch_format="pyarrow",
    )
    pairs = exploded.groupby("shard").map_groups(
        lambda g: _band_pairs(g, threshold, sig_ref), batch_format="pandas"
    )
    return _pair_reduce(pairs, "est_jaccard", "max")


# ----------------------------------------------------------------- SimHash
class SimHasher:
    """Actor-pool stage: 64-bit SimHash over token hashes (the
    SQL-replicable :mod:`texthash` hash, so the DuckDB oracle can
    recompute fingerprints bit-for-bit)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from geoglue_ray.functions.texthash import token_hash64

        toks = pc.utf8_split_whitespace(batch["text"])
        n_tok = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = pc.list_flatten(toks)
        th = token_hash64(flat.to_numpy(zero_copy_only=False))
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        ) * 2 - 1
        offsets = np.concatenate(([0], np.cumsum(n_tok)))
        acc = np.add.reduceat(
            np.concatenate([bits, np.zeros((1, 64), dtype=np.int64)]), offsets[:-1]
        )
        acc[n_tok == 0] = 0
        sh = (acc > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64))
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(sh.view(np.int64))}
        )


def _empty_pairs(third: str) -> pd.DataFrame:
    """Typed empty pair frame (object-dtype empties corrupt block schemas)."""
    return pd.DataFrame(
        {
            "doc_a": np.array([], dtype=np.int64),
            "doc_b": np.array([], dtype=np.int64),
            third: np.array([], dtype=np.int64 if third == "hamming" else np.float64),
        }
    )


def simhash_neardup(
    ds: rd.Dataset, max_hamming: int = 3, concurrency=(1, 8), n_shards: int = 256
) -> rd.Dataset:
    """COMPLETE near-dup pairs with Hamming(simhash) <= max_hamming.

    Banding is derived from the threshold: splitting 64 bits into
    ``max_hamming + 1`` bands guarantees (pigeonhole) that any pair within
    the threshold collides untouched in at least one band — so no
    qualifying pair is missed, at any configured threshold.  The shuffle
    key is a fixed-cardinality shard hashed from ``(band_id, chunk)`` —
    see minhash_neardup for why this bounds group size without changing
    the pair set or the group count."""
    if max_hamming >= 64:
        # one band per bit is the finest split; beyond that the pigeonhole
        # completeness guarantee cannot hold — fail loudly, never degrade
        raise ValueError(f"max_hamming must be < 64, got {max_hamming}")
    bands = max_hamming + 1
    width = 64 // bands  # first bands get an extra bit if 64 % bands != 0
    extra = 64 % bands
    shifts, widths, s = [], [], 0
    for i in range(bands):
        w = width + (1 if i < extra else 0)
        shifts.append(s)
        widths.append(w)
        s += w
    sigs = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=concurrency)

    def explode(b: pa.Table) -> pa.Table:
        sh = b["simhash"].to_numpy().view(np.uint64)
        n = len(sh)
        chunks = np.empty((n, bands), dtype=np.int64)
        for i in range(bands):
            mask = np.uint64((1 << widths[i]) - 1)
            chunks[:, i] = ((sh >> np.uint64(shifts[i])) & mask).astype(np.int64)
        flat = chunks.reshape(-1)
        bid = np.tile(np.arange(bands, dtype=np.int32), n)
        return pa.table(
            {
                "band_id": pa.array(bid),
                "shard": pa.array(_shard_of(bid, flat, n_shards)),
                "bucket": pa.array(flat),
                "doc_id": pa.array(np.repeat(b["doc_id"].to_numpy(), bands)),
                "simhash": pa.array(np.repeat(sh, bands).view(np.int64)),
            }
        )

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """All (band, bucket) runs of one shard in one vectorized pass
        (see _band_pairs)."""
        if len(g) < 2:
            return _empty_pairs("hamming")
        order = np.lexsort(
            (g["doc_id"].to_numpy(), g["bucket"].to_numpy(), g["band_id"].to_numpy())
        )
        bid = g["band_id"].to_numpy()[order]
        bk = g["bucket"].to_numpy()[order]
        ids = g["doc_id"].to_numpy()[order]
        ia, ib = _run_pairs(bid, bk)
        if not len(ia):
            return _empty_pairs("hamming")
        sh = g["simhash"].to_numpy()[order].view(np.uint64)
        ham = popcount64(np.ascontiguousarray(sh[ia] ^ sh[ib]))
        keep = ham <= max_hamming
        a, b = ids[ia[keep]], ids[ib[keep]]
        return pd.DataFrame(
            {"doc_a": np.minimum(a, b), "doc_b": np.maximum(a, b), "hamming": ham[keep]}
        )

    cand = sigs.map_batches(explode, batch_format="pyarrow")
    out = cand.groupby("shard").map_groups(band_pairs, batch_format="pandas")
    return _pair_reduce(out, "hamming", "min")


# ------------------------------------------------ duplicate-cluster resolve
def duplicate_clusters(
    pairs: rd.Dataset, max_iters: int = 64, n_buckets: int = 64, sort: bool = True
) -> rd.Dataset:
    """Connected components over candidate-duplicate pairs -> (doc_id,
    cluster_id) with cluster_id = the component's lowest doc_id.

    Fully distributed min-label propagation: labels live in a Dataset (no
    driver dict, no ``to_pandas`` of the edge set).  Each round runs a
    hash-bucketed join — edges and labels are co-partitioned by
    ``src % n_buckets`` via one tagged-union ``groupby(bucket)``, each
    bucket doing ONE vectorized pandas merge that emits (dst, src_label)
    messages plus (src, label) self-messages pre-keyed by the target
    node's bucket — then a second ``groupby(bucket)`` whose task runs a
    vectorized per-node min.  Two narrow int64 shuffles per round, group
    count pinned at ``n_buckets`` (never per-node groups: Ray's sort
    aggregation pays per-group Python overhead).  Labels are monotone
    non-increasing, so the fixpoint test is a cheap scalar ``sum(label)``
    comparison.  Rounds ~ component diameter (near-dup clusters are
    shallow); per-round working set is O(|E| + |V|) spread across the
    cluster, never resident on the driver.  Size ``n_buckets`` ~ cluster
    cores at scale.
    """
    import pyarrow as pa

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
    )
    P = np.int64(n_buckets)

    def symmetrize(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy()
        c = b["doc_b"].to_numpy()
        src = np.concatenate([a, c]).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(src % P),
                "src": pa.array(src),
                "dst": pa.array(np.concatenate([c, a]).astype(np.int64)),
                "_t": pa.array(np.zeros(2 * len(b), dtype=np.int8)),
                # placeholder so both union sides share one schema (no
                # NaN-fill -> float64 drift); int64.max surfaces misuse
                "label": pa.array(
                    np.full(2 * len(b), np.iinfo(np.int64).max, dtype=np.int64)
                ),
            }
        )

    edges = (
        pairs.select_columns(["doc_a", "doc_b"])
        .map_batches(symmetrize, batch_format="pyarrow")
        .materialize()  # reused every round; keep in the object store
    )
    if edges.count() == 0:
        return rd.from_arrow(empty)

    # initial labels: each node labels itself.  Per-bucket vectorized
    # np.unique — NEVER a per-node Ray groupby aggregate (Ray's sort
    # aggregation pays per-group Python overhead, pathological at 10^5+
    # distinct keys; the whole loop keeps group counts == n_buckets).
    def init_labels(g: pd.DataFrame) -> pd.DataFrame:
        nodes = np.unique(g["src"].to_numpy())
        return pd.DataFrame({"src": nodes, "label": nodes})

    labels = (
        edges.groupby("bucket")
        .map_groups(init_labels, batch_format="pandas")
        .materialize()
    )
    prev_sum = labels.sum("label")

    def merge_emit(g: pd.DataFrame) -> pd.DataFrame:
        """One vectorized merge per src-bucket: attach each edge's src
        label, emit neighbor messages + label self-messages, each message
        pre-keyed by its TARGET node's bucket (so the reduce shuffle needs
        no extra keying pass)."""
        e = g[g["_t"] == 0]
        l = g[g["_t"] == 1]
        m = e[["src", "dst"]].merge(l[["src", "label"]], on="src", how="left")
        node = np.concatenate([m["dst"].to_numpy(), l["src"].to_numpy()]).astype(np.int64)
        lbl = np.concatenate([m["label"].to_numpy(), l["label"].to_numpy()]).astype(np.int64)
        return pd.DataFrame({"bucket": node % P, "node": node, "label": lbl})

    def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
        """Per-bucket vectorized min-by-node (pandas groupby inside the
        task — one Python call per bucket, not per node)."""
        s = g.groupby("node", sort=False, dropna=False)["label"].min()
        return pd.DataFrame(
            {
                "src": s.index.to_numpy().astype(np.int64),
                "label": s.to_numpy().astype(np.int64),
            }
        )

    for _ in range(max_iters):
        tagged_labels = labels.map_batches(
            lambda b: pa.table(
                {
                    "bucket": pa.array(b["src"].to_numpy() % P),
                    "src": b["src"],
                    "dst": pa.compute.cast(b["src"], "int64"),  # unused on _t==1
                    "_t": pa.array(np.ones(len(b), dtype=np.int8)),
                    "label": b["label"],
                }
            ),
            batch_format="pyarrow",
        )
        msgs = edges.union(tagged_labels).groupby("bucket").map_groups(
            merge_emit, batch_format="pandas"
        )
        labels = (
            msgs.groupby("bucket")
            .map_groups(reduce_min, batch_format="pandas")
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:  # monotone non-increasing => fixpoint
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iters} iterations "
            "(component diameter exceeds the cap); raise max_iters"
        )
    out = labels.map_batches(
        lambda b: pa.table({"doc_id": b["src"], "cluster_id": b["label"]}),
        batch_format="pyarrow",
    )
    # the sort is presentation-only (driver-facing query); composed
    # pipelines (dedup_corpus) skip the all-to-all
    return out.sort("doc_id") if sort else out


# ----------------------------------------------------- n-gram Jaccard verify
def char_ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Scalar reference (tests + documentation of the semantics)."""
    sa = {a[i : i + n] for i in range(max(1, len(a) - n + 1))}
    sb = {b[i : i + n] for i in range(max(1, len(b) - n + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def char_gram_codes(texts, n: int = 3):
    """Per-doc DISTINCT char-n-gram codes in CSR layout (codes, offsets).

    For ``n <= 3`` each gram is packed EXACTLY (21 bits per code point —
    injective, collision-free, so the Jaccard counts match the scalar
    set semantics and the DuckDB substr oracle bit-for-bit); a short doc
    (length < n) contributes its whole text zero-padded, matching both
    ``a[0:n]`` slicing and SQL ``substr``.  For ``n > 3`` grams are
    combined with a 64-bit multiply-xor hash (collisions ~2^-64,
    documented weakening).  One vectorized pass per batch: code-point
    view of the concatenated batch text + shifted gathers, then a per-doc
    lexsort dedup — no per-row Python.
    """
    import pyarrow.compute as pc

    tl = texts.to_pylist()
    joined = "".join(tl)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    L = pc.utf8_length(texts).to_numpy().astype(np.int64)
    doc_off = np.concatenate(([0], np.cumsum(L)))
    n_g = np.maximum(L - n + 1, 1)
    g_off = np.concatenate(([0], np.cumsum(n_g)))
    total = int(g_off[-1])
    starts = np.repeat(doc_off[:-1], n_g)
    L_rep = np.repeat(L, n_g)
    within = np.arange(total, dtype=np.int64) - np.repeat(g_off[:-1], n_g)
    code = np.zeros(total, dtype=np.uint64)
    top = max(len(cp) - 1, 0)
    for j in range(n):
        ok = within + j < L_rep
        idx = np.minimum(starts + within + j, top)
        v = (cp[idx] if len(cp) else np.zeros(total, dtype=np.uint64)) * ok
        if n <= 3:  # exact 21-bit packing (code points < 2**21)
            code = (code << np.uint64(21)) | v
        else:  # hashed combine for wide grams
            code = (code ^ v) * _SH_MUL2
    # distinct per doc: sort within segments, drop adjacent duplicates
    doc_idx = np.repeat(np.arange(len(L), dtype=np.int64), n_g)
    o = np.lexsort((code, doc_idx))
    code_s, doc_s = code[o], doc_idx[o]
    keep = np.concatenate(
        ([True], (code_s[1:] != code_s[:-1]) | (doc_s[1:] != doc_s[:-1]))
    ) if total else np.zeros(0, dtype=bool)
    code_u, doc_u = code_s[keep], doc_s[keep]
    n_u = np.bincount(doc_u, minlength=len(L)).astype(np.int64)
    off_u = np.concatenate(([0], np.cumsum(n_u)))
    return code_u.view(np.int64), off_u


def ngram_jaccard_block(
    ds: rd.Dataset,
    block_cols: list[str],
    threshold: float = 0.3,
    n: int = 3,
    n_shards: int = 64,
) -> rd.Dataset:
    """Exact char-n-gram Jaccard pairs within blocking groups — the final
    exact-verify stage after LSH narrows candidates.

    Scale shape (round-3 rework): gram sets are computed ONCE per doc in a
    vectorized ``map_batches`` pass (:func:`char_gram_codes`) and shipped
    as a ``list<int64>`` column; the shuffle key is ``hash(block_cols) %
    n_shards`` — a FIXED group count independent of block cardinality
    (Ray pays ~1 ms of per-group Python; thousands of tiny blocks would
    dominate).  Each shard task resolves ALL of its blocks in one
    vectorized pass: explode (block, gram, doc) rows, lexsort, within-run
    pair indices (docs sharing a gram in the same block), run-length
    count per (doc_a, doc_b) = |intersection|, then one exact integer
    division.  Exact block equality is enforced INSIDE the task via
    factorized codes (shard-hash collisions only co-locate blocks, never
    merge them).  Results are bit-identical to the scalar set semantics
    (and the DuckDB oracle) because gram codes are injective for n<=3.
    """
    from geoglue_ray.stages.zonal import _factorize_keys

    def gramify(b: pa.Table) -> pa.Table:
        codes, offs = char_gram_codes(b["text"].combine_chunks(), n)
        h = np.zeros(len(b), dtype=np.uint64)
        for c in block_cols:
            arr = b[c].to_numpy(zero_copy_only=False)
            if arr.dtype.kind in "iu":
                v = arr.astype(np.uint64)
            else:
                v = pd.util.hash_array(arr).astype(np.uint64)
            h = h * _MIX1 + v
        out = {c: b[c] for c in block_cols}
        out["doc_id"] = b["doc_id"]
        out["shard"] = pa.array((h % np.uint64(n_shards)).astype(np.int64))
        out["grams"] = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()), pa.array(codes)
        )
        return pa.table(out)

    def pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if len(t) < 2:
            return empty
        ids = t["doc_id"].to_numpy().astype(np.int64)
        lc = t["grams"].combine_chunks()
        flat = np.asarray(lc.flatten())
        counts = pa.compute.list_value_length(lc).to_numpy().astype(np.int64)
        _, blk, _ = _factorize_keys(
            [t[c].to_numpy(zero_copy_only=False) for c in block_cols]
        )
        doc_rep = np.repeat(ids, counts)
        blk_rep = np.repeat(blk, counts)
        o = np.lexsort((doc_rep, flat, blk_rep))
        ia, ib = _run_pairs(blk_rep[o], flat[o])
        if not len(ia):
            return empty
        a, b_ = doc_rep[o][ia], doc_rep[o][ib]  # a < b: doc-sorted runs,
        # and a doc appears at most once per (block, gram) run (distinct grams)
        o2 = np.lexsort((b_, a))
        a2, b2 = a[o2], b_[o2]
        bnd = np.concatenate(([True], (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])))
        starts = np.nonzero(bnd)[0]
        inter = np.diff(np.concatenate([starts, [len(a2)]]))
        doc_a, doc_b = a2[starts], b2[starts]
        os_ = np.argsort(ids)
        ids_s, cnt_s = ids[os_], counts[os_]
        na = cnt_s[np.searchsorted(ids_s, doc_a)]
        nb = cnt_s[np.searchsorted(ids_s, doc_b)]
        j = inter / (na + nb - inter)
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": pa.array(doc_a[keep]),
                "doc_b": pa.array(doc_b[keep]),
                "jaccard": pa.array(j[keep]),
            }
        )

    grams = ds.map_batches(gramify, batch_format="pyarrow")
    return grams.groupby("shard").map_groups(pairs, batch_format="pyarrow")


# ------------------------------------------------- edit-distance near-dup
def _pad_codepoints(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Code-point matrix ``[n, Lmax+1]`` (uint32, zero-padded) + char
    lengths.  One vectorized pass over the concatenated UTF-32 buffer —
    no per-row Python beyond a single ``join``.  Character (not byte)
    indexing matches SQL ``levenshtein``'s character semantics for all of
    Unicode, not just ASCII."""
    n = len(texts)
    L = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    Lmax = int(L.max()) if n else 0
    M = np.zeros((n, Lmax + 1), dtype=np.uint32)
    if Lmax:
        cp = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
        rows = np.repeat(np.arange(n, dtype=np.int64), L)
        offs = np.concatenate(([0], np.cumsum(L)))
        cols = np.arange(int(offs[-1]), dtype=np.int64) - np.repeat(offs[:-1], L)
        M[rows, cols] = cp
    return M, L


def banded_levenshtein(
    A: np.ndarray, La: np.ndarray, B: np.ndarray, Lb: np.ndarray, k: int
) -> np.ndarray:
    """Exact Levenshtein distance clipped at ``k + 1``, vectorized ACROSS
    pairs: a Ukkonen band of width ``2k+1`` per pair, the only Python loop
    over rows of the longest string — every step one ``[n_pairs, 2k+1]``
    int32 kernel (min / compare / prefix-scan).

    Callers must pre-filter to ``|La - Lb| <= k`` (necessary for a finite
    in-band answer).  Clipping at ``k + 1`` is exact for every kept pair:
    DP cell values along an optimal alignment path are non-decreasing, so
    a distance-``<= k`` pair never routes through a clipped (``> k``)
    cell.  The intra-row left-neighbour dependency is resolved as a
    min-plus prefix scan: ``D[i,j] = min_v<=j (D0[i,v] + (j-v))`` =
    ``minimum.accumulate(D0 - j) + j``.
    """
    P = len(La)
    if P == 0:
        return np.empty(0, np.int64)
    if np.any(np.abs(La - Lb) > k):  # contract: banding is complete only then
        raise ValueError("banded_levenshtein requires |len(a)-len(b)| <= k")
    INF = np.int32(k + 1)
    W = 2 * k + 1
    w = np.arange(W, dtype=np.int64)
    res = np.full(P, int(INF), dtype=np.int64)
    done0 = La == 0
    res[done0] = np.minimum(Lb[done0], k + 1)
    # row 0: D[0, j] = j on the band j = w - k (out-of-range slots = INF)
    j0 = w - k
    prev = np.where(
        (j0[None, :] >= 0) & (j0[None, :] <= Lb[:, None]),
        np.minimum(np.maximum(j0, 0), k + 1)[None, :],
        INF,
    ).astype(np.int32)
    Bw = B.shape[1]
    Lmax = int(La.max())
    for i in range(1, Lmax + 1):
        j = i - k + w  # [W] column index of each band slot at this row
        a_ch = A[:, i - 1][:, None]  # [P, 1]
        b_ch = B[:, np.clip(j - 1, 0, Bw - 1)]  # [P, W] gather of B[j-1]
        sub = prev + (a_ch != b_ch)  # D[i-1, j-1] + substitution cost
        up = np.concatenate(  # D[i-1, j] lives one slot right in prev
            [prev[:, 1:], np.full((P, 1), INF, np.int32)], axis=1
        ) + np.int32(1)
        cur = np.minimum(sub, up).astype(np.int32)
        # invalid columns (j < 1 or j > len(b)) cannot seed the scan; a
        # clipped INF there is safe — those columns only ever feed other
        # invalid columns (paths move rightward/diagonally)
        cur[(j[None, :] < 1) | (j[None, :] > Lb[:, None])] = INF
        if 0 >= i - k:  # column j == 0 is in band: boundary D[i, 0] = i
            cur[:, k - i] = min(i, k + 1)
        # left-to-right min-plus scan (insertion chain within the row)
        t = cur - w.astype(np.int32)
        np.minimum.accumulate(t, axis=1, out=t)
        cur = np.minimum(t + w.astype(np.int32), INF)
        sel = La == i
        if sel.any():
            res[sel] = cur[sel, Lb[sel] - i + k]
        prev = cur
    return res


def edit_neardup(
    ds: rd.Dataset,
    max_edits: int = 8,
    block_cols: list[str] | None = None,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Exact edit-distance (Levenshtein ``<= max_edits``) near-dup pairs —
    the classic fuzzy-dedup verifier missing between exact hash equality
    and token/gram similarity (reference analogue: the dedup family's
    exact-verify stage, cf. ngram_jaccard_block).

    Candidate generation is LENGTH BANDING: ``|len(a) - len(b)| <= k`` is
    necessary for ``lev <= k``, and with ``bucket = len // (k+1)`` any
    qualifying pair sits in the same or adjacent buckets.  Each doc is
    emitted to the two anchor groups ``{bucket, bucket+1}``; a pair is
    resolved exactly once, in the group anchored at ``max(bucket_a,
    bucket_b)``.  Shuffle payload is (shard, text) — each doc ships twice,
    nothing quadratic ever moves.  A shard task resolves ALL its anchors
    in one lexsort + within-run pair pass (:func:`_run_pairs`), then runs
    one banded DP vectorized across the surviving candidates.

    Partitioning assumption (100 TB): length banding alone leaves
    O(docs-per-length-window^2) candidates per band — pass ``block_cols``
    (language, source, or an upstream LSH bucket) to bound group sizes;
    exact block equality is enforced inside the task via factorized codes
    (shard-hash collisions co-locate blocks, never merge them).
    """
    import pyarrow.compute as pc

    from geoglue_ray.stages.zonal import _factorize_keys

    k = int(max_edits)
    cols = list(block_cols or [])
    width = np.int64(k + 1)

    def prep(b: pa.Table) -> pa.Table:
        L = pc.utf8_length(b[text_col]).to_numpy().astype(np.int64)
        bucket = L // width
        h = np.zeros(len(b), dtype=np.uint64)
        for c in cols:
            arr = b[c].to_numpy(zero_copy_only=False)
            v = (
                arr.astype(np.uint64)
                if arr.dtype.kind in "iu"
                else pd.util.hash_array(arr).astype(np.uint64)
            )
            h = h * _MIX1 + v
        parts = []
        for off in (0, 1):  # emit to anchor = bucket and bucket + 1
            anchor = bucket + off
            shard = (
                (h * _MIX1 + anchor.astype(np.uint64)) % np.uint64(n_shards)
            ).astype(np.int64)
            out = {c: b[c] for c in cols}
            out[id_col] = b[id_col]
            out[text_col] = b[text_col]
            out["_lb"] = pa.array(L)
            out["_bucket"] = pa.array(bucket)
            out["_anchor"] = pa.array(anchor)
            out["shard"] = pa.array(shard)
            parts.append(pa.table(out))
        return pa.concat_tables(parts)

    def pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "lev": pa.array([], pa.int64()),
            }
        )
        if len(t) < 2:
            return empty
        ids = t[id_col].to_numpy().astype(np.int64)
        lb = t["_lb"].to_numpy().astype(np.int64)
        bucket = t["_bucket"].to_numpy().astype(np.int64)
        anchor = t["_anchor"].to_numpy().astype(np.int64)
        _, code, _ = _factorize_keys(
            [t[c].to_numpy(zero_copy_only=False) for c in cols] + [anchor]
        )
        o = np.lexsort((ids, code))
        ia, ib = _run_pairs(code[o])
        if not len(ia):
            return empty
        bk, an, ln = bucket[o], anchor[o], lb[o]
        keep = (np.maximum(bk[ia], bk[ib]) == an[ia]) & (
            np.abs(ln[ia] - ln[ib]) <= k
        )
        ia, ib = ia[keep], ib[keep]
        if not len(ia):
            return empty
        # pad code points once for the docs that actually appear in pairs
        used = np.unique(np.concatenate([ia, ib]))
        texts = t[text_col].take(pa.array(o[used])).to_pylist()
        M, L = _pad_codepoints(texts)
        pos = np.empty(len(o), dtype=np.int64)
        pos[used] = np.arange(len(used))
        ua, ub = pos[ia], pos[ib]
        lev = banded_levenshtein(M[ua], L[ua], M[ub], L[ub], k)
        ok = lev <= k
        ids_s = ids[o]
        return pa.table(
            {
                "doc_a": pa.array(ids_s[ia[ok]]),
                "doc_b": pa.array(ids_s[ib[ok]]),
                "lev": pa.array(lev[ok]),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return prepped.groupby("shard").map_groups(pairs, batch_format="pyarrow")


# ---------------------------------------------- chunk dedup + reassembly
def chunk_dedup(
    ds: rd.Dataset,
    chunk_tokens: int = 4,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Sub-document (chunk-level) exact dedup with document REASSEMBLY —
    the C4/RefinedWeb curation shape: split every document into windows
    of ``chunk_tokens`` whitespace tokens, keep each distinct chunk's
    globally FIRST occurrence (ordered by ``(doc_id, chunk_id)``), and
    rebuild each document from its surviving chunks in order.  Documents
    that lose every chunk drop out entirely.

    All string work is Arrow-kernel vectorized: ``pc.split_pattern``
    tokenizes, chunk strings are re-materialized zero-copy by rebasing
    the token ListArray's offsets onto chunk boundaries and one
    ``pc.binary_join`` (no per-chunk Python), and reassembly is a second
    offsets-rebase + ``binary_join`` over the kept chunks.

    Scale shape: chunks ship ONCE to a fixed-shard content group
    (``hash(chunk) % n_shards`` co-locates equal chunks; equality is
    decided on the strings via factorize, so hash collisions co-locate
    but never merge), survivors ship once more to a doc-shard for
    reassembly — two linear shuffles, no broadcast, no driver state.
    """
    import pyarrow.compute as pc

    from geoglue_ray.functions.texthash import int_hash64

    W = int(chunk_tokens)

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy().astype(np.int64)
        n = offs[1:] - offs[:-1]  # tokens per doc (>= 1: '' splits to [''])
        c = -(-n // W)
        rows = np.repeat(np.arange(len(b), dtype=np.int64), c)
        total = int(c.sum())
        chunk_id = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(c) - c, c
        )
        starts = offs[:-1][rows] + chunk_id * W
        # chunk i spans [starts[i], starts[i+1]): within a doc chunks are
        # contiguous, and a doc's last chunk ends where the next doc starts
        new_offs = np.concatenate([starts, offs[-1:]]).astype(np.int32)
        chunk_list = pa.ListArray.from_arrays(pa.array(new_offs), toks.values)
        chunk = pc.binary_join(chunk_list, " ")
        shard = (
            pd.util.hash_array(chunk.to_numpy(zero_copy_only=False))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_cs": pa.array(shard),
                id_col: b[id_col].take(pa.array(rows)),
                "chunk_id": pa.array(chunk_id),
                "chunk": chunk,
            }
        )

    def first_wins(g: pd.DataFrame) -> pa.Table:
        doc = g[id_col].to_numpy().astype(np.int64)
        cid = g["chunk_id"].to_numpy().astype(np.int64)
        if len(doc) == 0:  # empty group: typed full-schema empty
            return pa.table(
                {
                    "_rs": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "chunk_id": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                }
            )
        code, _ = pd.factorize(g["chunk"].to_numpy())  # content equality
        o = np.lexsort((cid, doc, code))
        keep = o[np.r_[True, code[o][1:] != code[o][:-1]]]
        shard = (int_hash64(doc[keep]) % np.uint64(n_shards)).astype(np.int64)
        return pa.table(
            {
                "_rs": pa.array(shard),
                id_col: pa.array(doc[keep]),
                "chunk_id": pa.array(cid[keep]),
                "chunk": pa.array(g["chunk"].to_numpy()[keep].astype(object)),
            }
        )

    def reassemble(g: pd.DataFrame) -> pa.Table:
        doc = g[id_col].to_numpy().astype(np.int64)
        cid = g["chunk_id"].to_numpy().astype(np.int64)
        if len(doc) == 0:  # empty group: typed full-schema empty
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_chunks_kept": pa.array([], pa.int64()),
                    "text_dedup": pa.array([], pa.string()),
                }
            )
        o = np.lexsort((cid, doc))
        doc, cid = doc[o], cid[o]
        chunks = pa.array(g["chunk"].to_numpy()[o].astype(object))
        bnd = np.r_[True, doc[1:] != doc[:-1]]
        starts = np.nonzero(bnd)[0]
        cnt = np.diff(np.r_[starts, len(doc)]).astype(np.int64)
        offs = np.concatenate([starts, [len(doc)]]).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs), chunks), " "
        )
        return pa.table(
            {
                id_col: pa.array(doc[starts]),
                "n_chunks_kept": pa.array(cnt),
                "text_dedup": joined,
            }
        )

    kept = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("_cs")
        .map_groups(first_wins, batch_format="pandas")
    )
    return kept.groupby("_rs").map_groups(reassemble, batch_format="pandas")


# ------------------------------------------------------ survivor anti-join
def survivor_corpus(
    docs: rd.Dataset,
    eliminated: rd.Dataset,
    id_col: str = "doc_id",
    broadcast_below: int = 5_000_000,
    n_shards: int = 64,
) -> rd.Dataset:
    """Anti-join: the rows of ``docs`` whose id is NOT in ``eliminated``
    (a single-column id Dataset) — the "keep the canonical copy" step of
    a composed dedup pipeline.

    Two paths, selected by eliminated-id count:

    * **broadcast** (``count <= broadcast_below``, ~40 MB of int64 at the
      default cap): the ids are collected once, sorted, ``ray.put`` once,
      and every map task drops members with one vectorized
      ``searchsorted`` probe.  ``docs`` streams — no shuffle at all.
    * **co-shuffle** (beyond the cap): tagged union of ``docs`` (full
      payload, ``_t=1``) and ``eliminated`` (null payload, ``_t=0``),
      hash-partitioned on ``id % n_shards`` — FIXED group count (Ray's
      per-group Python overhead stays constant; CLAUDE.md lesson), both
      sides of each id co-located, one vectorized ``np.isin`` per shard.
      Schema-tagged union stays Arrow end to end (typed nulls, never a
      pandas NaN-fill) so payload dtypes survive the shuffle bit-exact.

    Both paths return byte-identical row sets (tested)."""
    import ray

    schema = docs.schema()
    # one execution of the (potentially expensive) eliminated-id lineage:
    # both paths below consume it twice (count + batch iteration / tag);
    # without this the whole upstream dedup DAG runs twice
    eliminated = eliminated.materialize()
    try:
        n_elim = eliminated.count()
    except Exception:  # pragma: no cover - exotic sources
        n_elim = None

    if n_elim is not None and n_elim <= broadcast_below:
        if n_elim == 0:
            return docs
        elim_ids = np.sort(
            np.concatenate(
                [
                    b[id_col].to_numpy()
                    for b in eliminated.iter_batches(batch_format="pyarrow")
                ]
            ).astype(np.int64)
        )
        ref = ray.put(elim_ids)

        def drop_members(b: pa.Table) -> pa.Table:
            elim = ray.get(ref)  # zero-copy read from the object store
            ids = b[id_col].to_numpy().astype(np.int64)
            pos = np.searchsorted(elim, ids)
            pos[pos == len(elim)] = 0
            return b.filter(pa.array(elim[pos] != ids))

        return docs.map_batches(drop_members, batch_format="pyarrow")

    P = np.int64(n_shards)
    names = list(schema.names)

    def tag_docs(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        cols = {"_bucket": pa.array(ids % P), "_t": pa.array(np.ones(len(b), np.int8))}
        for n in names:
            cols[n] = b[n]
        return pa.table(cols)

    def tag_elim(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        cols = {"_bucket": pa.array(ids % P), "_t": pa.array(np.zeros(len(b), np.int8))}
        for n, t in zip(schema.names, schema.types):
            cols[n] = pa.array(ids) if n == id_col else pa.nulls(len(b), t)
        return pa.table(cols)

    def shard_filter(t: pa.Table) -> pa.Table:
        tt = t["_t"].to_numpy()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        keep = (tt == 1) & ~np.isin(ids, ids[tt == 0])
        return t.filter(pa.array(keep)).drop_columns(["_bucket", "_t"])

    to_check = docs
    definite_keep = None
    if n_elim is not None and n_elim > 0:
        # Bloom pre-filter (scale path): a compact bit array of the
        # eliminated ids, built OFF-driver in one Ray task and broadcast.
        # No false negatives, so rows the bloom rejects are DEFINITE keeps
        # and bypass the all-to-all shuffle entirely; only the ~0.3%
        # false-positive "maybe" rows (plus real members) co-shuffle for
        # the exact check.  Shuffle volume drops from |docs| full-payload
        # rows to |eliminated| + fp x |docs|.  Cost: ``docs`` is consumed
        # by both branches, so its lineage executes twice — the right
        # trade when docs is a column-pruned file read (the composed-dedup
        # case); materialize expensive lineages first (CLAUDE.md rule).
        bloom_ref = _get_bloom_task().remote(
            n_elim, id_col, *eliminated.to_arrow_refs()
        )

        def _maybe_mask(b: pa.Table) -> np.ndarray:
            bloom = _bloom_lookup(bloom_ref)
            return _bloom_query(
                b[id_col].to_numpy().astype(np.int64), bloom["bits"], bloom["m"]
            )

        definite_keep = docs.map_batches(
            lambda b: b.filter(pa.array(~_maybe_mask(b))), batch_format="pyarrow"
        )
        to_check = docs.map_batches(
            lambda b: b.filter(pa.array(_maybe_mask(b))), batch_format="pyarrow"
        )

    tagged = to_check.map_batches(tag_docs, batch_format="pyarrow").union(
        eliminated.map_batches(tag_elim, batch_format="pyarrow")
    )
    checked = tagged.groupby("_bucket").map_groups(
        shard_filter, batch_format="pyarrow"
    )
    return checked if definite_keep is None else definite_keep.union(checked)


def dedup_corpus(
    docs_text: rd.Dataset,
    docs_keep: rd.Dataset,
    threshold: float = 0.4,
    broadcast_below: int = 5_000_000,
) -> rd.Dataset:
    """Composed end-to-end fuzzy dedup — the pipeline an LLM-corpus user
    actually runs: MinHash+LSH candidate pairs over ``docs_text`` ->
    connected components -> drop every cluster member except the lowest
    doc_id -> ``docs_keep`` rows that survive.

    Exact duplicates need no separate pre-pass for the survivor SET:
    identical texts produce identical signatures, collide in every band
    with est_jaccard 1.0 >= threshold, and land in one component whose
    minimum is exactly the exact-dedup representative.  (Running
    :func:`exact_dedup` first is a throughput optimization at high dup
    rates, not a semantic stage.)

    Scale shape: pairs and labels stream through the fixed-shard
    machinery of :func:`minhash_neardup` / :func:`duplicate_clusters`;
    the eliminated-id set (cluster members minus canonicals) is the only
    small side and feeds :func:`survivor_corpus`'s two-path anti-join."""
    labels = duplicate_clusters(
        minhash_neardup(docs_text, threshold=threshold), sort=False
    )
    eliminated = labels.map_batches(
        lambda b: b.filter(
            pa.compute.not_equal(b["cluster_id"], b["doc_id"])
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )
    return survivor_corpus(docs_keep, eliminated, broadcast_below=broadcast_below)


def cdc_chunk_stats(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 4,
    mask: int = 8,
    top_n: int = 20,
    n_shards: int = 64,
) -> rd.Dataset:
    """CONTENT-DEFINED chunking duplicate statistics — the Rabin/FastCDC
    shape fixed-window :func:`chunk_dedup` cannot provide: chunk
    boundaries fall where a rolling hash of the last ``w`` tokens hits
    ``H % mask == 0``, so an insertion near a document's head shifts
    only the chunk it lands in (fixed windows re-align EVERY downstream
    chunk).  Emits the top ``top_n`` duplicated chunks across the corpus
    as (chunk content hash, token count, occurrences, distinct docs).

    Everything is SQL-replicable (the texthash discipline): token hashes
    via :func:`token_hash64`; the rolling hash is three mod-2^64
    multiply-adds (C1/C4/C5, each < 2^62 so the HUGEINT twin never
    overflows when each product is reduced before the sum — numpy's
    uint64 wraparound equals the per-term-mod form); the chunk content
    hash is XOR of per-token hashes rotated by in-chunk offset % 64
    (order-sensitive, exactly `bit_xor` of the two's-complement view in
    DuckDB).  A document's last token always closes a chunk; documents
    shorter than ``w`` become one chunk.

    Scale shape: one streaming pass — per batch, the whole flattened
    token array segments vectorized (shifted adds, one
    ``bitwise_xor.reduceat``) and collapses to (hash, n_tokens, doc)
    partial counts (~tokens/mask rows); a fixed chunk-hash shard merge
    counts occurrences + distinct docs, filters singletons, per-shard
    top-k, then one <= n_shards*top_n global sort.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from geoglue_ray.functions.texthash import C1, C4, C5, int_hash64, token_hash64

    P = np.uint64(n_shards)
    assert w == 4, "rolling hash is pinned to w=4 (three lag multipliers)"

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "chash": pa.array([], pa.int64()),
                "ntok": pa.array([], pa.int64()),
                "doc": pa.array([], pa.int64()),
                "occ": pa.array([], pa.int64()),
                "_s": pa.array([], pa.int64()),
            }
        )
        toks = pc.split_pattern(b[text_col], pattern=" ")
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        doc_ids = b[id_col].to_numpy().astype(np.int64)
        doc_of = np.repeat(np.arange(len(b)), lens)
        keep = flat != ""
        flat, doc_of = flat[keep], doc_of[keep]
        n = len(flat)
        if n == 0:
            return empty
        h = token_hash64(flat.astype(str))
        # within-doc 0-based position
        new_doc = np.r_[True, doc_of[1:] != doc_of[:-1]]
        doc_starts = np.flatnonzero(new_doc)
        p = np.arange(n, dtype=np.int64) - np.repeat(
            doc_starts, np.diff(np.r_[doc_starts, n])
        )
        # rolling hash of the last w tokens (garbage where p < w-1, unused)
        H = h.copy()
        for k, c in ((1, C1), (2, C4), (3, C5)):
            sh = np.zeros(n, np.uint64)
            sh[k:] = h[:-k]
            H = H + np.uint64(c) * sh
        bnd = (p >= w - 1) & (H % np.uint64(mask) == np.uint64(0))
        bnd[np.r_[doc_starts[1:] - 1, n - 1]] = True  # doc ends close chunks
        starts_flag = np.r_[True, bnd[:-1]] | new_doc
        sidx = np.flatnonzero(starts_flag)
        clen = np.diff(np.r_[sidx, n]).astype(np.int64)
        r = (np.arange(n, dtype=np.int64) - np.repeat(sidx, clen)).astype(
            np.uint64
        ) % np.uint64(64)
        # shift amount 64 is undefined for uint64 (mod-64 on x86): clamp
        # the dead branch so np.where never evaluates h >> 64
        amt = np.where(r == 0, np.uint64(1), np.uint64(64) - r)
        rot = (h << r) | np.where(r == 0, np.uint64(0), h >> amt)
        chash = np.bitwise_xor.reduceat(rot, sidx).view(np.int64)
        cdoc = doc_ids[doc_of[sidx]]
        # collapse to per-batch (hash, ntok, doc) occurrence counts
        o = np.lexsort((cdoc, clen, chash))
        chash, clen, cdoc = chash[o], clen[o], cdoc[o]
        first = np.r_[
            True,
            (chash[1:] != chash[:-1])
            | (clen[1:] != clen[:-1])
            | (cdoc[1:] != cdoc[:-1]),
        ]
        starts2 = np.flatnonzero(first)
        occ = np.diff(np.r_[starts2, len(chash)]).astype(np.int64)
        chash, clen, cdoc = chash[starts2], clen[starts2], cdoc[starts2]
        return pa.table(
            {
                "chash": pa.array(chash),
                "ntok": pa.array(clen),
                "doc": pa.array(cdoc),
                "occ": pa.array(occ),
                "_s": pa.array((int_hash64(chash) % P).astype(np.int64)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["chash", "n_tokens", "n_occurrences", "n_docs"]
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "chash": pd.Series([], dtype=np.int64),
                    "n_tokens": pd.Series([], dtype=np.int64),
                    "n_occurrences": pd.Series([], dtype=np.int64),
                    "n_docs": pd.Series([], dtype=np.int64),
                }
            )[cols]
        ch = g["chash"].to_numpy().astype(np.int64)
        nt = g["ntok"].to_numpy().astype(np.int64)
        dc = g["doc"].to_numpy().astype(np.int64)
        oc = g["occ"].to_numpy().astype(np.int64)
        o = np.lexsort((dc, nt, ch))
        ch, nt, dc, oc = ch[o], nt[o], dc[o], oc[o]
        grp = np.r_[True, (ch[1:] != ch[:-1]) | (nt[1:] != nt[:-1])]
        gid = np.cumsum(grp) - 1
        n_grp = gid[-1] + 1
        occ_tot = np.bincount(gid, weights=oc, minlength=n_grp).astype(np.int64)
        # docs are sorted within each group: distinct = run starts
        doc_new = grp | np.r_[True, dc[1:] != dc[:-1]]
        ndocs = np.bincount(gid, weights=doc_new, minlength=n_grp).astype(
            np.int64
        )
        gs = np.flatnonzero(grp)
        out = pd.DataFrame(
            {
                "chash": ch[gs],
                "n_tokens": nt[gs],
                "n_occurrences": occ_tot,
                "n_docs": ndocs,
            }
        )
        out = out[out["n_occurrences"] >= 2]
        return (
            out.sort_values(
                ["n_occurrences", "chash", "n_tokens"],
                ascending=[False, True, True],
                kind="mergesort",
            )
            .head(top_n)
            .reset_index(drop=True)[cols]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(merge, batch_format="pandas")
        .sort(
            ["n_occurrences", "chash", "n_tokens"],
            descending=[True, False, False],
        )
        .limit(top_n)
    )
