"""Per-row span-sequence equality — the input_hint invariant: the
interleaved spans column must survive every stage byte-exact in order."""

from __future__ import annotations

import pyarrow.parquet as pq

import geoglue_ray.fixtures as fx
from geoglue_ray.pipelines.zonal import corpus_with_admin
from geoglue_ray.sources.corpus import build_spans, read_corpus


def expected_spans(ids, texts, n_chars):
    out = []
    for i, t, nc in zip(ids, texts, n_chars):
        spans = [{"kind": "text", "text": t, "media_ref": "", "offset": 0}]
        for j in range(1, 1 + i % 3):
            spans.append(
                {
                    "kind": "image" if (i + j) % 2 == 0 else "audio",
                    "text": "",
                    "media_ref": f"media/{i}/{j}",
                    "offset": int(nc + j - 1),
                }
            )
        out.append(spans)
    return out


def test_build_spans_matches_row_oracle(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"])
    ids = t["doc_id"].to_numpy()
    spans = build_spans(ids, t["text"].combine_chunks(), t["n_chars"].to_numpy())
    got = spans.to_pylist()
    want = expected_spans(ids.tolist(), t["text"].to_pylist(), t["n_chars"].to_numpy())
    assert got == want


def test_spans_survive_pipeline(sf_dir):
    """Spans pass through derive -> encode -> spatial join unchanged, in order."""
    src = read_corpus(sf_dir).to_pandas().sort_values("doc_id")
    joined = corpus_with_admin(sf_dir).to_pandas().sort_values("doc_id")
    assert list(joined["doc_id"]) == list(src["doc_id"])
    for a, b in zip(src["spans"], joined["spans"]):
        la = [tuple(s.values()) for s in a]
        lb = [tuple(s.values()) for s in b]
        assert la == lb


def test_n_spans_formula(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"])
    ids = t["doc_id"].to_numpy()
    spans = build_spans(ids, t["text"].combine_chunks(), t["n_chars"].to_numpy())
    import numpy as np
    import pyarrow.compute as pc

    assert np.array_equal(
        pc.list_value_length(spans).to_numpy().astype(np.int64), fx.derive_n_spans(ids)
    )
