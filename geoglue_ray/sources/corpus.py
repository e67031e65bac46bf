"""Interleaved document corpus source.

Reads the ``documents`` parquet table and derives the interleaved
text+media corpus of ``BASELINE.json``'s ``input_hint``:
``(doc_id: string, spans: list<struct<kind,text,media_ref,offset>>)`` plus
the observation columns (lon, lat, value, event_time) every geospatial
stage consumes.  Derivation is the deterministic arithmetic in
:mod:`geoglue_ray.fixtures` — bit-exact against the DuckDB oracles.

The spans column is built **once** here as Arrow list<struct> (no Python
per-row loop: children are assembled from numpy take/repeat index math) and
must flow through every later stage byte-exact in order (per-row
span-sequence equality invariant).  Stages therefore never touch ``spans``;
wide shuffles project it away and re-attach by ``doc_id`` (SURVEY.md §7
hard part (e)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from geoglue_ray import fixtures as fx

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)


def read_table(path_base: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned read of a table stored as Lance or parquet.

    The stated input contract (``BASELINE.json`` input_hint) is Lance
    tables; the sandbox driver supplies parquet.  Dispatch on what exists:
    ``<path_base>.lance`` (a Lance dataset directory) is read through
    Ray's native ``read_lance`` (column projection pushed down, one block
    per fragment — the same streaming shape as the parquet path), else
    ``<path_base>.parquet``.  The ``lance`` package is import-gated: a
    Lance directory without the package is a loud, actionable error, never
    a silent parquet fallback.
    """
    import os

    lance_dir = path_base if path_base.endswith(".lance") else f"{path_base}.lance"
    if os.path.isdir(lance_dir):
        try:
            return rd.read_lance(lance_dir, columns=columns)
        except ImportError as e:
            raise ImportError(
                f"Lance dataset found at {lance_dir!r} but the 'lance' package "
                "is not installed in this environment; install pylance or "
                "provide the table as parquet"
            ) from e
    return rd.read_parquet(f"{path_base}.parquet", columns=columns)


def read_documents(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned read of the raw documents table (Lance or parquet)."""
    return read_table(f"{sf_dir}/documents", columns=columns)


def build_spans(ids: np.ndarray, texts: pa.Array, n_chars: np.ndarray) -> pa.Array:
    """Vectorized list<struct> spans: span 0 = the full text; then
    ``id % 3`` media spans (image/audio alternating) with synthetic refs."""
    ids = np.asarray(ids, dtype=np.int64)
    n_media = (ids % 3).astype(np.int64)
    n_spans = 1 + n_media
    offsets = np.concatenate(([0], np.cumsum(n_spans))).astype(np.int32)
    total = int(offsets[-1])

    row = np.repeat(np.arange(len(ids)), n_spans)  # parent row per span
    first = np.concatenate(([0], np.cumsum(n_spans)[:-1]))
    j = np.arange(total) - first[row]  # span ordinal within row (0..2)

    is_text = j == 0
    # kind via dictionary take: 0=text, 1=image, 2=audio — no string kernel
    kind_code = np.where(is_text, 0, np.where((ids[row] + j) % 2 == 0, 1, 2))
    kind = pa.array(["text", "image", "audio"], type=pa.string()).take(
        pa.array(kind_code, type=pa.int64())
    )

    # text child: full text for span 0, empty otherwise — via take on an
    # extended array (index len(ids) == empty string)
    texts_ext = pa.concat_arrays(
        [texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts,
         pa.array([""], type=pa.string())]
    )
    text_idx = np.where(is_text, row, len(ids))
    text_child = texts_ext.take(pa.array(text_idx, type=pa.int64()))

    # media_ref "media/{id}/{j}": one ids->str conversion, tiny lookup for j
    ids_str = ids.astype("U20")
    jtag = np.array(["", "/1", "/2"], dtype="U2")[np.minimum(j, 2)]
    media_ref = np.where(
        is_text, "", np.char.add(np.char.add("media/", ids_str[row]), jtag)
    )
    offset = np.where(is_text, 0, n_chars[row] + j - 1).astype(np.int32)

    struct = pa.StructArray.from_arrays(
        [
            kind,
            text_child,
            pa.array(media_ref),
            pa.array(offset),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    return pa.ListArray.from_arrays(pa.array(offsets), struct)


class DeriveObservations:
    """`map_batches` stage: raw documents batch -> interleaved corpus batch.

    Appends ``doc_id`` (string form), ``spans``, ``lon``, ``lat``,
    ``value``, ``event_time`` — all exact per fixtures.  ``id_offset``
    supports deterministic corpus replication for benchmarking (replica r
    shifts ids by ``r * stride`` so every replica lands at new coords).
    """

    def __init__(self, id_offset: int = 0, with_spans: bool = True):
        self.id_offset = id_offset
        self.with_spans = with_spans

    def derive(self, batch: pa.Table, id_offset: int) -> pa.Table:
        ids = batch["doc_id"].to_numpy() + id_offset
        lon, lat = fx.derive_lonlat(ids)
        out = batch.set_column(
            batch.schema.get_field_index("doc_id"),
            "doc_id",
            pa.array(ids),
        )
        if self.with_spans and "text" in batch.column_names:
            n_chars = (
                batch["n_chars"].to_numpy()
                if "n_chars" in batch.column_names
                else np.zeros(len(ids), np.int64)
            )
            spans = build_spans(ids, batch["text"].combine_chunks(), n_chars)
            out = out.append_column(pa.field("spans", SPAN_TYPE), spans)
        out = out.append_column("lon", pa.array(lon))
        out = out.append_column("lat", pa.array(lat))
        out = out.append_column("value", pa.array(fx.derive_value(ids)))
        out = out.append_column(
            "event_time", pa.array(fx.derive_event_time(ids), type=pa.timestamp("us"))
        )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.derive(batch, self.id_offset)


class ReplicaGenerator(DeriveObservations):
    """Actor-pool stage turning replica indices into derived corpus shards.

    The raw documents table (small side) is broadcast once via ``ray.put``
    and fetched per actor in ``__init__``; each input row ``r`` (from
    ``rd.range(replicas)``) yields the full derived corpus with ids shifted
    by ``r * stride`` — the bench stand-in for reading a many-fragment
    10^12-row corpus (parallelism = replica count, each shard a distinct
    id/key range).  An actor pool (not plain tasks) on purpose: a task
    stage here would fuse with the downstream join stage and inherit its
    row-based ``batch_size``, collapsing the whole expansion into one task
    (replica indices are 1 row = 5000 output rows); the actor boundary
    keeps the expansion's own batching and parallelism.
    """

    def __init__(self, table_ref, stride: int, with_spans: bool = True):
        super().__init__(with_spans=with_spans)
        import ray

        self.table: pa.Table = (
            ray.get(table_ref) if isinstance(table_ref, ray.ObjectRef) else table_ref
        )
        self.stride = stride

    def __call__(self, batch: pa.Table):
        # one output table per input batch (several replicas concatenated):
        # fewer, larger blocks keep object-store/serialization overhead per
        # row low — the dominant hidden cost at high replica counts
        parts = [
            self.derive(self.table, int(r) * self.stride)
            for r in batch["id"].to_numpy()
        ]
        if parts:
            yield pa.concat_tables(parts)


def read_corpus(
    sf_dir: str,
    replicas: int = 1,
    with_spans: bool = True,
    columns: list[str] | None = None,
    concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    """documents.parquet -> interleaved corpus Dataset.

    ``replicas > 1`` expands deterministic id-shifted copies from one
    broadcast copy of the table (bench scale-up; stand-in for the 10^12-row
    corpus — each replica is a distinct shard of ids so data volume and key
    cardinality both grow).
    """
    cols = columns if columns is not None else ["doc_id", "text", "n_chars"]
    if replicas == 1:
        return read_documents(sf_dir, columns=cols).map_batches(
            DeriveObservations(with_spans=with_spans), batch_format="pyarrow"
        )
    import pyarrow.parquet as pq
    import ray

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=cols)
    # ~10 replicas (~50k rows) per output block: large enough to amortize
    # per-block costs, small enough to stream with backpressure
    return rd.range(replicas).map_batches(
        ReplicaGenerator,
        fn_constructor_args=(ray.put(tbl), len(tbl), with_spans),
        batch_format="pyarrow",
        batch_size=10,
        concurrency=concurrency or (1, 8),
    )
