from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from geoglue_ray.stages.join import asof_join


def _ts(vals):
    return pa.array(np.array(vals, dtype="datetime64[us]"), type=pa.timestamp("us"))


def test_asof_join_backward_semantics():
    left = rd.from_arrow(
        pa.table(
            {
                "k": [1, 1, 1, 2],
                "lt": _ts(["2020-01-01T05", "2020-01-01T10", "2020-01-01T00", "2020-01-01T05"]),
                "ev": [10, 11, 12, 13],
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": [1, 1, 2],
                "rt": _ts(["2020-01-01T02", "2020-01-01T08", "2020-01-01T06"]),
                "obs": [1.0, 2.0, 3.0],
            }
        )
    )
    out = (
        asof_join(left, right, key="k", left_ts="lt", right_ts="rt", right_cols=["obs"])
        .to_pandas()
        .sort_values("ev")
        .reset_index(drop=True)
    )
    # ev=10 (05:00) -> 02:00 obs=1; ev=11 (10:00) -> 08:00 obs=2;
    # ev=12 (00:00) -> no match (dropped); ev=13 key 2 (05:00) < 06:00 -> dropped
    assert out["ev"].tolist() == [10, 11]
    assert out["obs"].tolist() == [1.0, 2.0]


def test_asof_join_rejects_right_ties():
    left = rd.from_arrow(pa.table({"k": [1], "lt": _ts(["2020-01-02"]), "ev": [1]}))
    right = rd.from_arrow(
        pa.table({"k": [1, 1], "rt": _ts(["2020-01-01", "2020-01-01"]), "obs": [1.0, 2.0]})
    )
    with pytest.raises(Exception):  # surfaced through Ray as a task error
        asof_join(
            left, right, key="k", left_ts="lt", right_ts="rt", right_cols=["obs"]
        ).to_pandas()


def test_hash_equijoin_semantics(ray_session):
    """Inner semantics with duplicate keys on both sides, unmatched rows
    dropped, result invariant to shard count, dtypes preserved."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.join import hash_equijoin

    left = pd.DataFrame(
        {"k": [1, 1, 2, 3, 5], "lv": ["a", "b", "c", "d", "e"]}
    )
    right = pd.DataFrame({"rk": [1, 2, 2, 4], "rv": [10.5, 20.5, 21.5, 40.5]})
    expect = (
        left.merge(right.rename(columns={"rk": "k"}), on="k", how="inner")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    for n_shards in (1, 7):
        lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(3)
        rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(2)
        got = (
            hash_equijoin(lds, rds, "k", "rk", n_shards=n_shards)
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, expect)


def test_hash_equijoin_rejects_column_clash(ray_session):
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from geoglue_ray.stages.join import hash_equijoin

    a = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame({"k": [1], "v": [1]})))
    b = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame({"k2": [1], "v": [2]})))
    with pytest.raises(ValueError, match="clash"):
        hash_equijoin(a, b, "k", "k2")


def test_hash_equijoin_variants(ray_session):
    """left / semi / anti against the pandas reference, with duplicate
    probe keys (semi/anti must not duplicate left rows) and typed nulls
    surviving the left join."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.join import hash_equijoin

    left = pd.DataFrame({"k": [1, 2, 3, 3], "lv": [10, 20, 30, 31]})
    right = pd.DataFrame({"rk": [1, 1, 3], "rv": [1.5, 1.25, 3.5]})

    def run(how):
        lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(2)
        rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(2)
        return hash_equijoin(lds, rds, "k", "rk", n_shards=5, how=how).to_pandas()

    lj = run("left").sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    ref = (
        left.merge(right.rename(columns={"rk": "k"}), on="k", how="left")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert lj["k"].tolist() == ref["k"].tolist()
    assert lj["lv"].dtype.kind == "i"  # typed nulls, no float widening
    assert lj["rv"].isna().tolist() == ref["rv"].isna().tolist()
    assert lj["rv"].dropna().tolist() == ref["rv"].dropna().tolist()

    semi = run("semi").sort_values(["k", "lv"]).reset_index(drop=True)
    assert semi["k"].tolist() == [1, 3, 3]  # no duplication from rk=1 twice
    anti = run("anti")
    assert anti["k"].tolist() == [2]


def test_session_overlaps_shard_invariant(ray_session, sf_dir):
    """The bucket-explode pair dedup (count a pair only in its
    overlap-start bucket) must make the result independent of shard
    count."""
    from geoglue_ray.pipelines.queries import session_overlaps

    a = session_overlaps(sf_dir, n_shards=1).to_pandas()
    b = session_overlaps(sf_dir, n_shards=64).to_pandas()
    assert a.equals(b)
    assert a["n_overlaps"].sum() > 0


def test_interval_join_exact_and_typed():
    """interval_join: hand-checkable overlap set, each pair exactly once
    even when it spans several buckets, int64/string dtypes preserved
    through the tagged union (no float64 NaN-fill), point-side support."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.join import interval_join

    left = pa.table(
        {
            "lid": pa.array([1, 2, 3], pa.int64()),
            "ls": pa.array([0, 95, 250], pa.int64()),
            "le": pa.array([120, 105, 260], pa.int64()),
        }
    )
    right = pa.table(
        {
            "rname": pa.array(["a", "b", "c"], pa.string()),
            "rs": pa.array([100, 200, 50], pa.int64()),
            "re": pa.array([110, 300, 60], pa.int64()),
        }
    )
    out = (
        interval_join(
            rd.from_arrow(left).repartition(2),
            rd.from_arrow(right),
            on=("ls", "le", "rs", "re"),
            bucket_width=10,  # intervals span many buckets: dedup must hold
            n_shards=8,
        )
        .to_pandas()
        .sort_values(["lid", "rname"])
        .reset_index(drop=True)
    )
    # brute-force oracle
    want = sorted(
        (int(l), r)
        for l, ls, le in zip(*[left[c].to_numpy() for c in ("lid", "ls", "le")])
        for r, rs, re in zip(*[right[c].to_numpy() for c in ("rname", "rs", "re")])
        if ls <= re and rs <= le
    )
    got = list(zip(out["lid"].tolist(), out["rname"].tolist()))
    assert got == want and len(want) == 4  # (1,a),(1,c),(2,a),(3,b)
    assert out["lid"].dtype == np.int64 and out["ls"].dtype == np.int64
    assert out["rname"].dtype == object

    # point-in-interval special case (start == end on the left)
    pts = pa.table(
        {"pid": pa.array([7, 8], pa.int64()), "p": pa.array([55, 400], pa.int64())}
    )
    out2 = interval_join(
        rd.from_arrow(pts),
        rd.from_arrow(right),
        on=("p", "p", "rs", "re"),
        bucket_width=100,
        n_shards=4,
    ).to_pandas()
    assert sorted(zip(out2["pid"], out2["rname"])) == [(7, "c")]


def test_hot_key_salted_equijoin_equals_plain():
    """Salt-replicated hot keys: identical result sets to the unsalted
    join for every how mode, on a corpus where one key holds ~40% of the
    left side (the mega-key shape)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.join import hash_equijoin

    rng = np.random.default_rng(5)
    n = 6000
    lkeys = np.where(rng.random(n) < 0.4, 7, rng.integers(0, 300, n)).astype(np.int64)
    left = pa.table(
        {"k": pa.array(lkeys), "lv": pa.array(np.arange(n, dtype=np.int64))}
    )
    rkeys = np.r_[np.full(40, 7), rng.integers(0, 300, 400)].astype(np.int64)
    right = pa.table(
        {"rk": pa.array(rkeys), "rv": pa.array(np.arange(len(rkeys), dtype=np.int64))}
    )
    for how in ("inner", "left", "semi", "anti"):
        plain = (
            hash_equijoin(
                rd.from_arrow(left).repartition(3),
                rd.from_arrow(right),
                "k",
                "rk",
                how=how,
            )
            .to_pandas()
            .sort_values(["k", "lv"] + (["rv"] if how in ("inner", "left") else []))
            .reset_index(drop=True)
        )
        salted = (
            hash_equijoin(
                rd.from_arrow(left).repartition(3),
                rd.from_arrow(right),
                "k",
                "rk",
                how=how,
                hot_keys=[7],
                hot_salt=4,
            )
            .to_pandas()
            .sort_values(["k", "lv"] + (["rv"] if how in ("inner", "left") else []))
            .reset_index(drop=True)
        )
        assert plain.equals(salted), how
        assert len(plain) > 0


def test_hash_equijoin_outer():
    """FULL OUTER: unmatched rows from both sides survive, key populated
    from whichever side exists, other side typed-null (never float-drift
    on int columns that do match)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.join import hash_equijoin

    left = pa.table(
        {"k": pa.array([1, 2, 3], pa.int64()), "lv": pa.array(["a", "b", "c"])}
    )
    right = pa.table(
        {"rk": pa.array([2, 3, 4], pa.int64()), "rv": pa.array([20.0, 30.0, 40.0])}
    )
    out = (
        hash_equijoin(rd.from_arrow(left), rd.from_arrow(right), "k", "rk", how="outer")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["lv"].tolist() == ["a", "b", "c", None]
    rv = out["rv"].to_numpy()
    assert np.isnan(rv[0]) and rv[1:].tolist() == [20.0, 30.0, 40.0]
    assert out["k"].dtype == np.int64


def test_cooccur_topk_bruteforce_duplicates_and_ties():
    """cooccur_topk vs brute force on random baskets: duplicate items in
    a basket count once, the (count desc, item1, item2) cutoff is a total
    order, and block splits don't change the answer."""
    import itertools

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.join import cooccur_topk

    rng = np.random.default_rng(23)
    rows = []
    for basket in range(300):
        items = rng.integers(0, 40, rng.integers(1, 7))
        items = np.r_[items, items[:1]]  # plant a duplicate
        rows += [(basket, int(i)) for i in items]
    df = pd.DataFrame(rows, columns=["b", "i"])
    counts: dict = {}
    for _, g in df.groupby("b"):
        for a, c in itertools.combinations(sorted(set(g["i"])), 2):
            counts[(a, c)] = counts.get((a, c), 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    t = pa.table({"b": pa.array(df["b"], pa.int64()), "i": pa.array(df["i"], pa.int64())})
    for parts in (1, 8):
        got = cooccur_topk(
            rd.from_arrow(t).repartition(parts), "b", "i", top_n=25, n_shards=8
        ).to_pandas()
        got_list = [((r.item1, r.item2), r.n_baskets) for r in got.itertuples()]
        assert got_list == [((a, c), n) for (a, c), n in want]


def test_interval_join_hot_bucket_salting_equality():
    """Salted interval_join (hot mega-bucket split over sub-keys, build
    side replicated) returns the exact same pair set as unsalted,
    including lefts spanning multiple buckets and the pair-once rule."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.join import interval_join

    rng = np.random.default_rng(31)
    # points: 60% crammed into bucket 5 (width 100 -> [500, 600)), rest spread
    n = 800
    hot = rng.integers(500, 600, int(n * 0.6))
    cold = rng.integers(0, 2000, n - len(hot))
    pt = np.r_[hot, cold].astype(np.int64)
    left = pa.table({"l_id": pa.array(np.arange(n, dtype=np.int64)), "ls": pa.array(pt), "le": pa.array(pt)})
    # windows: some long (span many buckets), some inside the hot bucket
    ws = rng.integers(0, 1900, 150).astype(np.int64)
    wlen = rng.integers(1, 400, 150).astype(np.int64)
    right = pa.table(
        {
            "w_id": pa.array(np.arange(150, dtype=np.int64)),
            "rs": pa.array(ws),
            "re": pa.array(ws + wlen),
        }
    )

    def run(**kw):
        out = interval_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(3),
            ("ls", "le", "rs", "re"),
            bucket_width=100,
            n_shards=16,
            **kw,
        ).to_pandas()
        return sorted(map(tuple, out[["l_id", "w_id"]].to_numpy()))

    plain = run()
    salted = run(hot_buckets=np.array([5], dtype=np.int64), hot_salt=4)
    assert plain == salted
    assert len(plain) > 1000  # non-trivial overlap volume


def test_setsim_join_matches_brute_force(ray_session):
    """Random baskets (with planted duplicate items) vs an O(n^2) exact
    Jaccard reference; rational threshold, shard-count invariance."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.join import setsim_join

    rng = np.random.default_rng(13)
    sets = {
        k: set(rng.choice(20, size=int(rng.integers(1, 8)), replace=True))
        for k in range(40)
    }
    ok = np.array(
        [k for k, s in sets.items() for _ in range(len(s) + 1)], np.int64
    )
    it = np.array(
        [i for _, s in sets.items() for i in (list(s) + [next(iter(s))])],
        np.int64,
    )  # one repeated item per basket: distinct-collapse must dedupe it
    ds = rd.from_arrow(
        pa.table({"ok": pa.array(ok), "item": pa.array(it)})
    ).repartition(4)
    exp = []
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        un = len(sets[a] | sets[b])
        if 2 * inter >= un:
            exp.append((a, b, inter, un, inter / un))
    for n_shards in (4, 16):
        out = (
            setsim_join(ds, "ok", "item", 1, 2, n_shards=n_shards)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        got = list(out.itertuples(index=False, name=None))
        assert got == exp


def test_setsim_join_prefix_filter_matches_legacy():
    """The prefix-filtered path (df-ordered prefixes + in-place verify)
    must be bit-identical to the legacy count-all-shared-items path —
    including hub items (high df) and duplicate postings."""
    import pandas as pd

    from geoglue_ray.stages.join import setsim_join

    rng = np.random.default_rng(5)
    rows = []
    for s in range(800):
        for i in rng.choice(120, size=int(rng.integers(1, 7)), replace=False):
            rows.append((s, int(i)))
        if rng.random() < 0.4:
            rows.append((s, 777))  # hub item in ~40% of sets
    df = pd.DataFrame(rows, columns=["ok", "item"])
    df = pd.concat([df, df.sample(frac=0.25, random_state=2)])  # dup postings
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    for num, den in ((1, 2), (1, 3), (2, 3)):
        a = (
            setsim_join(rd.from_arrow(tbl), "ok", "item", num, den,
                        n_shards=8, prefix_filter=False)
            .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
        b = (
            setsim_join(rd.from_arrow(tbl), "ok", "item", num, den,
                        n_shards=8, prefix_filter=True)
            .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
        assert len(a) > 0
        pd.testing.assert_frame_equal(a, b)
