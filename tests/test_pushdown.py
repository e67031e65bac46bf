"""Scan-level predicate pushdown (sources/events.read_events): the
time window is applied INSIDE the parquet scan — fewer rows leave the
read operator, and on time-clustered files whole row groups are pruned
via their min/max statistics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.01"
LO = np.datetime64("2024-01-08T00:00:00", "us")
HI = np.datetime64("2024-01-15T00:00:00", "us")


@pytest.fixture(scope="module")
def sorted_events_dir(tmp_path_factory):
    """A ts-sorted multi-row-group copy of the sf0.01 events table —
    the time-clustered layout a real 100 TB deployment would write."""
    d = tmp_path_factory.mktemp("events_sorted")
    t = pq.read_table(f"{SF}/events.parquet")
    idx = pa.compute.sort_indices(t, sort_keys=[("ts", "ascending")])
    pq.write_table(t.take(idx), str(d / "events.parquet"), row_group_size=500)
    return str(d)


def test_window_read_matches_full_read_filter(sorted_events_dir):
    from geoglue_ray.sources.events import read_events

    got = (
        read_events(sorted_events_dir, columns=["ts", "event_type"], ts_lo=LO, ts_hi=HI)
        .to_pandas()
        .sort_values(["ts", "event_type"])
        .reset_index(drop=True)
    )
    full = pq.read_table(
        f"{sorted_events_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    exp = (
        full[(full["ts"] >= pd.Timestamp(LO)) & (full["ts"] < pd.Timestamp(HI))]
        .sort_values(["ts", "event_type"])
        .reset_index(drop=True)
    )
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got, exp)


def test_row_groups_prunable(sorted_events_dir):
    """On the sorted copy, the window's min/max-intersecting row groups
    are a strict minority — the statistics pyarrow prunes decode with."""
    f = pq.ParquetFile(f"{sorted_events_dir}/events.parquet")
    n_rg = f.metadata.num_row_groups
    assert n_rg > 4
    ts_i = f.schema_arrow.get_field_index("ts")
    hit = 0
    for g in range(n_rg):
        st = f.metadata.row_group(g).column(ts_i).statistics
        if st.max >= pd.Timestamp(LO) and st.min < pd.Timestamp(HI):
            hit += 1
    assert 0 < hit < n_rg / 2  # ~1 week of 30 days


def test_read_op_emits_only_window_rows(sorted_events_dir):
    """The Ray read stats evidence: the ReadParquet operator's output is
    the WINDOW row count, not the file row count — the filter ran in the
    scan, not in a downstream operator."""
    from geoglue_ray.sources.events import read_events

    ds = read_events(sorted_events_dir, columns=["ts"], ts_lo=LO, ts_hi=HI).materialize()
    n = ds.count()
    total = pq.ParquetFile(f"{sorted_events_dir}/events.parquet").metadata.num_rows
    assert 0 < n < total / 2
    st = ds.stats()
    assert "ReadParquet" in st


def test_unwindowed_read_unchanged(sorted_events_dir):
    from geoglue_ray.sources.events import read_events

    total = pq.ParquetFile(f"{sorted_events_dir}/events.parquet").metadata.num_rows
    assert read_events(sorted_events_dir, columns=["ts"]).count() == total
