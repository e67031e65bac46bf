"""Pin the provenance of the executor's empty-schema warning.

bench.py filters exactly one Ray log line — ``Operator produced a
RefBundle with a different schema than the previous one ... new
schema: .`` — on the claim that it is emitted by Ray's Sort machinery
for empty partitions even when every UDF in the pipeline returns
fully-typed Arrow tables.  This test IS that claim: a minimal pure-Ray
pipeline (typed generator -> groupby over a key whose cardinality is
far below the partition count -> typed map_groups UDF) reproduces the
warning with zero geoglue_ray code involved, proving the noise is
Ray-internal (ray 2.49.2, streaming_executor_state.py) and not a
schema leak from our stages.  If a Ray upgrade fixes the empty-bundle
schema, this test fails and the bench filter should be deleted.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


class _Capture(logging.Filter):
    def __init__(self) -> None:
        super().__init__()
        self.hits: list[str] = []

    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        if "Operator produced a RefBundle with a different schema" in msg:
            self.hits.append(msg)
        return True


def test_sort_empty_partition_warning_is_ray_internal():
    # UDFs defined inside the test: closures serialize by value, so the
    # workers don't need this test module importable
    def _typed_gen(batch: pa.Table) -> pa.Table:
        # 4 distinct keys over many rows: sort partitions beyond the key
        # cardinality are structurally empty
        seed = batch["id"][0].as_py()
        rng = np.random.default_rng(seed)
        n = 20_000
        return pa.table(
            {
                "k": pa.array(rng.integers(0, 4, n), type=pa.int64()),
                "v": pa.array(rng.random(n), type=pa.float64()),
            }
        )

    def _typed_first(df):
        # fully-typed non-empty pandas output for every group the UDF sees
        return df.head(1)

    cap = _Capture()
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    prev_level = logger.level
    logger.setLevel(logging.WARNING)
    logger.addFilter(cap)
    try:
        out = (
            rd.range(16, override_num_blocks=16)
            .map_batches(_typed_gen, batch_format="pyarrow", batch_size=None)
            .groupby("k")
            .map_groups(_typed_first, batch_format="pandas")
            .to_pandas()
        )
    finally:
        logger.removeFilter(cap)
        logger.setLevel(prev_level)
    assert len(out) == 4  # the pipeline itself is correct
    if not cap.hits:
        pytest.fail(
            "Ray no longer emits the empty-schema RefBundle warning for "
            "sort partitions — delete the _DropEmptySchemaWarn filter in "
            "bench.py, it is masking nothing now."
        )
    # every captured instance is the empty-new-schema variant the bench
    # filter targets, emitted despite fully-typed UDF outputs end to end
    assert all("new schema: ." in m or "PandasBlockSchema" in m for m in cap.hits)


def test_schema_hash_warning_is_pyarrow_internal(tmp_path):
    """Pin the second filtered bench warning: ``Failed to hash the
    schemas (for deduplication): unhashable type: 'dict'``.

    pyarrow 16's ``Schema.__hash__`` raises TypeError whenever the
    schema carries key/value metadata (it hashes the raw metadata
    dict), so Ray's ``unify_schemas`` dedup short-circuit
    (transform_pyarrow.py) warns on EVERY read of a pandas-written
    parquet file — including the driver's own testdata, whose files all
    carry the ``pandas`` metadata key.  Nothing geoglue_ray emits is
    involved.  If a pyarrow upgrade makes metadata-bearing schemas
    hashable, this test fails and bench.py's _DropSchemaHashWarn filter
    must be deleted.
    """
    import pandas as pd

    meta_schema = pa.schema(
        [pa.field("a", pa.int64())], metadata={b"k": b"v"}
    )
    with pytest.raises(TypeError):
        hash(meta_schema)
    assert isinstance(hash(pa.schema([pa.field("a", pa.int64())])), int)

    # end-to-end: a pandas-written parquet read through Ray Data emits
    # the warning with zero geoglue_ray code in the plan
    path = str(tmp_path / "pandas_meta.parquet")
    pd.DataFrame({"a": [1, 2, 3]}).to_parquet(path)
    assert pa.parquet.read_schema(path).metadata is not None

    class _Capture(logging.Filter):
        def __init__(self) -> None:
            super().__init__()
            self.hits: list[str] = []

        def filter(self, record: logging.LogRecord) -> bool:
            if "Failed to hash the schemas" in record.getMessage():
                self.hits.append(record.getMessage())
            return True

    cap = _Capture()
    logger = logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    )
    prev_level = logger.level
    logger.setLevel(logging.WARNING)
    logger.addFilter(cap)
    try:
        assert rd.read_parquet(path, override_num_blocks=2).count() == 3
    finally:
        logger.removeFilter(cap)
        logger.setLevel(prev_level)
    if not cap.hits:
        pytest.fail(
            "Ray no longer warns on unhashable parquet schemas — delete "
            "the _DropSchemaHashWarn filter in bench.py, it is masking "
            "nothing now."
        )
    assert all("unhashable type: 'dict'" in m for m in cap.hits)


def test_to_pandas_of_typed_empty_loses_columns():
    """Ray quirk pin: Dataset.to_pandas() on a TYPED zero-row dataset
    returns a 0-column frame (the schema survives at the Dataset level,
    only the pandas conversion drops it).  interval_join's property test
    reads empty results defensively because of this; when a Ray upgrade
    fixes the conversion this test fails and the workaround can go."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"a": pa.array([], pa.int64())}))
    assert ds.schema().names == ["a"]
    assert list(ds.to_pandas().columns) == []  # the quirk
