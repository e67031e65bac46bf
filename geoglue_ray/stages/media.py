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


def _decode_impl(media_ref: str, kind: str) -> bytes:
    """STUB: deterministic fake payload.  A real deployment replaces this
    with PIL/libav decode of the bytes behind ``media_ref``.  Raises for
    unknown kinds exactly as a real codec dispatch would."""
    if kind not in ("image", "audio"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    seed = np.frombuffer(media_ref.encode(), dtype=np.uint8).sum()
    rng = np.random.default_rng(int(seed))
    return rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()


class DecodeMedia:
    """Actor-pool stage: media_ref -> raw payload bytes.

    ``__init__`` is where a real codec/model handle loads (once per
    actor); keep ``batch_size`` small — payload rows are wide.
    """

    def __init__(self):
        self.codec_name = "stub-codec-v1"  # real: load PIL/libav here

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payload = [_decode_impl(r, k) for r, k in zip(refs, kinds)]
        # opaque binary column with typed metadata (codec/content type) —
        # the multimodal-column convention
        field = pa.field(
            "payload",
            pa.binary(),
            metadata={"codec": self.codec_name, "content": "media-bytes"},
        )
        return batch.append_column(field, pa.array(payload, type=pa.binary()))


class MediaFeaturizer:
    """Actor-pool stage: payload bytes -> FEATURE_DIM float32 vector.

    STUB model: byte-histogram projection with a fixed random matrix
    (loaded once per actor — the shape a real embedding model load takes).
    """

    def __init__(self, dim: int = FEATURE_DIM, seed: int = 5):
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((256, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pays = batch["payload"].to_pylist()
        hist = np.zeros((len(pays), 256), dtype=np.float32)
        for i, p in enumerate(pays):
            b = np.frombuffer(p, dtype=np.uint8)
            np.add.at(hist[i], b, 1.0)
        feat = hist @ self.proj
        return batch.append_column(
            "feature",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feat.reshape(-1)), self.proj.shape[1]
            ),
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
