"""crop_parquet: read-time predicate pushdown equals in-memory crop."""

from __future__ import annotations

import numpy as np

from geoglue_ray.geom import Bbox
from geoglue_ray.sources.corpus import read_corpus
from geoglue_ray.stages.crop import crop, crop_parquet


def test_crop_parquet_pushdown_equals_crop(sf_dir, tmp_path):
    # materialize the derived corpus as partitioned parquet
    ds = read_corpus(sf_dir, with_spans=False)
    out = tmp_path / "corpus"
    ds.write_parquet(str(out))

    bbox = Bbox(104.0, 10.0, 106.0, 14.0)
    pushed = crop_parquet(str(out), bbox, columns=["doc_id", "lon", "lat"]).to_pandas()
    full = crop(read_corpus(sf_dir, with_spans=False), bbox).to_pandas()[
        ["doc_id", "lon", "lat"]
    ]
    a = pushed.sort_values("doc_id").reset_index(drop=True)
    b = full.sort_values("doc_id").reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in a.columns:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy())


def test_media_payload_metadata(sf_dir):
    from geoglue_ray.stages.media import media_pipeline

    ds = read_corpus(sf_dir, with_spans=True).limit(50)
    out = media_pipeline(ds)
    schema = out.schema().base_schema
    meta = schema.field("payload").metadata
    assert meta[b"codec"] == b"stub-codec-v1"
