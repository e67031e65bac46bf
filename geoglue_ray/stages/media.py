"""Multimodal span stages: explode, decode (stubbed), feature extraction.

Interleaved documents carry media spans (``kind in {image, audio}``) as
opaque references inside the ``spans`` list<struct> column.  The Ray-side
plumbing here is real and tested — schema handling, list explosion with
parent-row bookkeeping, actor-pool decode with per-actor model setup,
bounded batch sizes for wide binary payloads — while the actual
image/audio codecs are **stubbed** (the container has no PIL/ffmpeg):
``DecodeMedia`` produces a deterministic fake byte payload, and
``MediaFeaturizer`` a deterministic feature vector, both clearly marked.
Swap ``_decode_impl`` for a real codec in production.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

FEATURE_DIM = 16


def explode_media_spans(batch: pa.Table) -> pa.Table:
    """spans list<struct> -> one row per media span (kind != 'text'),
    keeping (doc_id, span_index, kind, media_ref, offset).

    Pure Arrow: list_flatten + list_parent_indices, then a vectorized
    filter — no per-row Python.
    """
    spans = batch["spans"].combine_chunks()
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans).to_numpy()
    kind = flat.field("kind")
    is_media = pc.invert(pc.equal(kind, "text"))
    # span index within the doc
    offsets = np.asarray(spans.offsets)
    first = offsets[:-1]
    span_idx = np.arange(len(flat)) - first[parent]
    doc_ids = batch["doc_id"].to_numpy()
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids[parent]),
            "span_index": pa.array(span_idx.astype(np.int32)),
            "kind": kind,
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        }
    )
    return tbl.filter(is_media)


PAYLOAD_LEN = 64
_KNOWN_KINDS = ("image", "audio")


def _payload_bytes(seeds: np.ndarray) -> np.ndarray:
    """Deterministic stub payload matrix (n, PAYLOAD_LEN) uint8.

    SQL-replicable by design (the texthash HUGEINT mod-2**64 contract):
    ``byte[i] = (((seed+1)*C1 + (i+1)*C2) mod 2**64) >> 56`` with the
    seed = sum of the media_ref's ASCII codes — so the media_features
    oracle can recompute every byte exactly in DuckDB.  All SQL
    intermediates stay below 2**127 (seed < 2**32, C1 < 2**62)."""
    from geoglue_ray.functions.texthash import C1, C2

    i = np.arange(PAYLOAD_LEN, dtype=np.uint64) + np.uint64(1)
    h = (seeds.astype(np.uint64) + np.uint64(1))[:, None] * np.uint64(C1) + i[
        None, :
    ] * np.uint64(C2)
    return (h >> np.uint64(56)).astype(np.uint8)


def _decode_impl(media_ref: str, kind: str) -> bytes:
    """STUB: deterministic fake payload.  A real deployment replaces this
    with PIL/libav decode of the bytes behind ``media_ref``.  Raises for
    unknown kinds exactly as a real codec dispatch would."""
    if kind not in _KNOWN_KINDS:
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    seed = np.frombuffer(media_ref.encode(), dtype=np.uint8).sum()
    return _payload_bytes(np.asarray([seed]))[0].tobytes()


class DecodeMedia:
    """Actor-pool stage: media_ref -> raw payload bytes.

    ``__init__`` is where a real codec/model handle loads (once per
    actor); keep ``batch_size`` small — payload rows are wide.
    """

    def __init__(self):
        self.codec_name = "stub-codec-v1"  # real: load PIL/libav here

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"]
        bad = pc.invert(pc.is_in(kinds, value_set=pa.array(_KNOWN_KINDS)))
        if pc.any(bad).as_py():
            k = kinds.filter(bad)[0].as_py()
            raise NotImplementedError(f"no decoder for kind={k!r}")
        # vectorized seed: ASCII-code sum per ref via one reduceat over
        # the batch's concatenated ref bytes (refs are ASCII by contract)
        refs = batch["media_ref"].combine_chunks()
        joined = "".join(refs.to_pylist()).encode()
        lens = pc.binary_length(refs).to_numpy().astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
        seeds = (
            np.add.reduceat(np.frombuffer(joined, dtype=np.uint8).astype(np.int64), offs)
            if len(joined)
            else np.zeros(len(batch), dtype=np.int64)
        )
        mat = _payload_bytes(seeds)
        payload = pa.Array.from_buffers(
            pa.binary(PAYLOAD_LEN), len(batch), [None, pa.py_buffer(mat.tobytes())]
        )
        # opaque binary column with typed metadata (codec/content type) —
        # the multimodal-column convention
        field = pa.field(
            "payload",
            pa.binary(PAYLOAD_LEN),
            metadata={"codec": self.codec_name, "content": "media-bytes"},
        )
        return batch.append_column(field, payload)


class MediaFeaturizer:
    """Actor-pool stage: payload bytes -> FEATURE_DIM float32 vector plus
    the SQL-checkable ``n_distinct_bytes`` histogram moment.

    STUB model: byte-histogram projection with a fixed random matrix
    (loaded once per actor — the shape a real embedding model load
    takes).  The float features are not SQL-replicable (Gaussian matrix)
    — the integer moment IS, and gates the histogram arithmetic in the
    driver's media_features oracle.
    """

    def __init__(self, dim: int = FEATURE_DIM, seed: int = 5):
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((256, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            batch = batch.append_column(
                "feature",
                pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.float32()), self.proj.shape[1]
                ),
            )
            return batch.append_column("n_distinct_bytes", pa.array([], pa.int64()))
        raw = np.frombuffer(
            b"".join(batch["payload"].to_pylist()), dtype=np.uint8
        ).reshape(n, -1)
        # one bincount for the whole batch: per-row histograms via
        # row-offset byte indices (no per-row Python)
        idx = raw.astype(np.int64) + np.arange(n)[:, None] * 256
        hist = (
            np.bincount(idx.reshape(-1), minlength=n * 256)
            .reshape(n, 256)
            .astype(np.float32)
        )
        feat = hist @ self.proj
        batch = batch.append_column(
            "feature",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feat.reshape(-1)), self.proj.shape[1]
            ),
        )
        return batch.append_column(
            "n_distinct_bytes", pa.array((hist > 0).sum(axis=1).astype(np.int64))
        )


def media_pipeline(
    ds: rd.Dataset, concurrency=(1, 4), decode_batch_size: int = 1024
) -> rd.Dataset:
    """corpus (with spans) -> exploded media -> decode -> features.

    Decode/featurize run as actor pools with a bounded ``batch_size`` so
    payload rows never blow a worker heap (multimodal sizing rule)."""
    media = ds.map_batches(explode_media_spans, batch_format="pyarrow")
    decoded = media.map_batches(
        DecodeMedia,
        batch_format="pyarrow",
        batch_size=decode_batch_size,
        concurrency=concurrency,
    )
    return decoded.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=decode_batch_size,
        concurrency=concurrency,
    )


RESIZE_FACTOR = 4  # 64-byte payload -> 16 bytes, 4:1 block-mean pooling
FRAME_LEN = 8  # payload = 8 frames x 8 bytes for the frame sampler
FRAME_STRIDE = 2  # keep every 2nd frame


class ResizeMedia:
    """Actor-pool stage: block-mean downsample of the decoded payload —
    the stub stand-in for an image resize (a real deployment swaps the
    pooling for PIL ``Image.resize`` loaded once per actor in
    ``__init__``).  The pooling is floor-of-integer-mean per
    ``RESIZE_FACTOR`` block, so the resized bytes are SQL-replicable and
    the ``media_resize`` oracle recomputes them exactly.  Emits the
    resized payload as a typed fixed-width binary column plus its
    ``resized_sum`` checksum."""

    def __init__(self, factor: int = RESIZE_FACTOR):
        if PAYLOAD_LEN % factor:
            raise ValueError(f"factor {factor} must divide {PAYLOAD_LEN}")
        self.factor = factor  # real: codec/interp config loads here

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        out_len = PAYLOAD_LEN // self.factor
        field = pa.field(
            "resized",
            pa.binary(out_len),
            metadata={"codec": "stub-resize-v1", "content": "media-bytes"},
        )
        if n == 0:
            empty = pa.Array.from_buffers(pa.binary(out_len), 0, [None, pa.py_buffer(b"")])
            batch = batch.append_column(field, empty)
            return batch.append_column("resized_sum", pa.array([], pa.int64()))
        raw = np.frombuffer(b"".join(batch["payload"].to_pylist()), dtype=np.uint8)
        pooled = (
            raw.reshape(n, out_len, self.factor).astype(np.int64).sum(axis=2)
            // self.factor
        )
        arr = pa.Array.from_buffers(
            pa.binary(out_len),
            n,
            [None, pa.py_buffer(pooled.astype(np.uint8).tobytes())],
        )
        batch = batch.append_column(field, arr)
        return batch.append_column("resized_sum", pa.array(pooled.sum(axis=1)))


class FrameSampler:
    """Actor-pool stage: payload -> every ``stride``-th fixed-length
    frame, ONE OUTPUT ROW PER SAMPLED FRAME (the video frame-sampling
    explode shape; a real deployment replaces the byte slicing with
    libav keyframe extraction in ``__call__`` and the demuxer open in
    ``__init__``).  Emits (parent columns, frame_index, frame bytes,
    frame_sum); the integer ``frame_sum`` is SQL-replicable."""

    def __init__(self, frame_len: int = FRAME_LEN, stride: int = FRAME_STRIDE):
        if PAYLOAD_LEN % frame_len:
            raise ValueError(f"frame_len {frame_len} must divide {PAYLOAD_LEN}")
        self.frame_len = frame_len
        self.stride = stride  # real: demuxer/codec handle loads here

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        nf = PAYLOAD_LEN // self.frame_len
        sampled = np.arange(0, nf, self.stride)
        k = len(sampled)
        field = pa.field(
            "frame",
            pa.binary(self.frame_len),
            metadata={"codec": "stub-frames-v1", "content": "media-bytes"},
        )
        keep = [c for c in batch.column_names if c != "payload"]
        if n == 0:
            out = batch.select(keep)
            out = out.append_column("frame_index", pa.array([], pa.int32()))
            empty = pa.Array.from_buffers(
                pa.binary(self.frame_len), 0, [None, pa.py_buffer(b"")]
            )
            out = out.append_column(field, empty)
            return out.append_column("frame_sum", pa.array([], pa.int64()))
        raw = np.frombuffer(b"".join(batch["payload"].to_pylist()), dtype=np.uint8)
        frames = raw.reshape(n, nf, self.frame_len)[:, sampled, :]
        parent = np.repeat(np.arange(n), k)
        out = batch.select(keep).take(pa.array(parent))
        out = out.append_column(
            "frame_index", pa.array(np.tile(sampled, n).astype(np.int32))
        )
        arr = pa.Array.from_buffers(
            pa.binary(self.frame_len),
            n * k,
            [None, pa.py_buffer(frames.reshape(n * k, self.frame_len).tobytes())],
        )
        out = out.append_column(field, arr)
        return out.append_column(
            "frame_sum", pa.array(frames.astype(np.int64).sum(axis=2).reshape(-1))
        )


def _payload_matrix(batch: pa.Table, col: str = "payload") -> np.ndarray:
    """(n, PAYLOAD_LEN) uint8 view of the fixed-size-binary payload
    column (zero-copy modulo the combine)."""
    arr = batch[col].combine_chunks()
    buf = arr.buffers()[1]
    start = arr.offset * PAYLOAD_LEN
    return np.frombuffer(buf, dtype=np.uint8)[
        start : start + len(arr) * PAYLOAD_LEN
    ].reshape(len(arr), PAYLOAD_LEN)


def content_dupe_groups(ds: rd.Dataset, n_shards: int = 64) -> rd.Dataset:
    """Decoded-CONTENT duplicate groups over media payloads — the
    multimodal content-digest dedup step (a production pipeline hashes
    decoded pixels/samples so the same asset behind different refs
    dedups; with this stub codec, refs whose ASCII-code sums collide
    decode to byte-identical payloads, which is exactly that
    population).  Grouping is by the EXACT payload bytes: a perceptual
    aHash/dHash is the production swap-in for near-duplicates, but the
    stub's payload space is measured to collapse those to one bucket,
    so content identity is the semantically meaningful grouping here.

    Emits one row per (kind, payload) group with >= 2 members:
    (kind, byte_sum, n_items, first_doc_id, first_span_index) — the
    representative is the (doc_id, span_index)-first member and
    byte_sum is the SQL-replayable payload witness.  Shape: 64-byte
    keyed rows co-shuffle on a content-hash fixed shard, one
    factorize + lexsort run pass per shard — never all-pairs."""
    import pandas as pd

    def keyed(b: pa.Table) -> pa.Table:
        mat = _payload_matrix(b)
        m64 = mat.astype(np.int64)
        bs = m64.sum(axis=1)
        words = mat.view(np.uint64).reshape(len(mat), -1)
        M = np.uint64(0x9E3779B185EBCA87)
        k = np.zeros(len(mat), dtype=np.uint64)
        for j in range(words.shape[1]):
            k = k * M + words[:, j]
        return pa.table(
            {
                "_mc": pa.array((k % np.uint64(n_shards)).astype(np.int64)),
                "kind": b["kind"],
                "payload": b["payload"],
                "byte_sum": pa.array(bs),
                "doc_id": b["doc_id"],
                "span_index": pa.array(
                    b["span_index"].to_numpy().astype(np.int64)
                ),
            }
        )

    def groups(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.array([], pa.string()),
                "byte_sum": pa.array([], pa.int64()),
                "n_items": pa.array([], pa.int64()),
                "first_doc_id": pa.array([], pa.int64()),
                "first_span_index": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        kc, kuniq = pd.factorize(g["kind"], use_na_sentinel=False)
        pc_, _ = pd.factorize(g["payload"], use_na_sentinel=False)
        bs = g["byte_sum"].to_numpy().astype(np.int64)
        doc = g["doc_id"].to_numpy().astype(np.int64)
        sp = g["span_index"].to_numpy().astype(np.int64)
        o = np.lexsort((sp, doc, pc_, kc))
        kc, pc_, bs, doc, sp = kc[o], pc_[o], bs[o], doc[o], sp[o]
        new = np.r_[True, (kc[1:] != kc[:-1]) | (pc_[1:] != pc_[:-1])]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, len(kc)])
        keep = lens >= 2
        s = starts[keep]
        return pa.table(
            {
                "kind": pa.array(kuniq[kc[s]].astype(str)),
                "byte_sum": pa.array(bs[s]),
                "n_items": pa.array(lens[keep].astype(np.int64)),
                "first_doc_id": pa.array(doc[s]),
                "first_span_index": pa.array(sp[s]),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("_mc")
        .map_groups(groups, batch_format="pandas")
    )
