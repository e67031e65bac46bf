"""Property-based tests (hypothesis) for the pure kernels: PIP vs the
closed-form assignment on arbitrary ids, Bbox algebra laws, logfmt
round-trips, cell-encode containment, op-grammar parsing."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import geoglue_ray.fixtures as fx
from geoglue_ray import cells
from geoglue_ray.functions.logfmt import logfmt_line, parse_logfmt
from geoglue_ray.geom import Bbox
from geoglue_ray.ops import parse_op


@st.composite
def bboxes(draw):
    minx = draw(st.floats(-179, 178, allow_nan=False))
    miny = draw(st.floats(-89, 88, allow_nan=False))
    w = draw(st.floats(0.1, 10))
    h = draw(st.floats(0.1, 10))
    return Bbox(minx, miny, minx + w, miny + h)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 10_000_000), min_size=1, max_size=200, unique=True))
def test_pip_matches_arithmetic_for_any_ids(ids):
    """For every conceivable doc id, the WKB ray-casting assignment equals
    the closed-form floor/triangle arithmetic (inside points) and the kNN
    centroid argmin (outside points)."""
    from geoglue_ray.sources.admin import AdminIndex, build_admin_table

    global _IDX
    if "_IDX" not in globals():
        _IDX = AdminIndex.build(build_admin_table())
    arr = np.asarray(ids, dtype=np.int64)
    lon, lat = fx.derive_lonlat(arr)
    feat, via_knn = _IDX.assign(lon, lat)
    a2 = fx.assign_admin2_arith(lon, lat)
    inside = a2 >= 0
    assert np.array_equal(feat[inside], a2[inside])
    assert np.array_equal(via_knn, ~inside)
    if (~inside).any():
        knn = fx.assign_knn_arith(lon[~inside], lat[~inside])
        assert np.array_equal(feat[~inside], knn)


@settings(max_examples=100, deadline=None)
@given(bboxes(), bboxes())
def test_bbox_intersection_laws(a, b):
    ab = a & b
    ba = b & a
    assert ab == ba  # commutative
    if ab is not None:
        assert ab <= a and ab <= b  # intersection contained in both
        assert 0.0 < a.overlap_fraction(b) <= 1.0
    else:
        assert a.overlap_fraction(b) == 0.0
    assert a & a == a
    assert a <= a.enlarge(0.5)


@settings(max_examples=100, deadline=None)
@given(
    st.dictionaries(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=1,
            max_size=8,
        ),
        st.text(max_size=30),
        min_size=1,
        max_size=5,
    )
)
def test_logfmt_roundtrip_fuzz(d):
    line = logfmt_line(**d)
    assert parse_logfmt(line) == {k: str(v) for k, v in d.items()}


@settings(max_examples=100, deadline=None)
@given(
    st.floats(-179.999, 179.999, allow_nan=False),
    st.floats(-89.999, 89.999, allow_nan=False),
    st.integers(3, 20),
)
def test_cell_encode_contains_point(lon, lat, res):
    # containment holds to within float rounding of the encode (a point a
    # half-ulp below a boundary may round into the upper cell — the encode
    # is still deterministic, which is what the join relies on)
    eps = 1e-9
    c = cells.encode(np.array([lon]), np.array([lat]), res)
    minx, miny, maxx, maxy = cells.cell_bounds(c)
    assert minx[0] - eps <= lon <= maxx[0] + eps
    assert miny[0] - eps <= lat <= maxy[0] + eps
    # parent at a coarser resolution contains the child cell exactly
    if res > 3:
        p = cells.parent(c, res - 2)
        pminx, pminy, pmaxx, pmaxy = cells.cell_bounds(p)
        assert pminx[0] <= minx[0] and pmaxx[0] >= maxx[0]
        assert pminy[0] <= miny[0] and pmaxy[0] >= maxy[0]


@settings(max_examples=100, deadline=None)
@given(
    st.sampled_from(
        ["mean", "sum", "count", "min", "max", "weighted_mean", "weighted_sum", "area_weighted_sum"]
    ),
    st.dictionaries(
        st.sampled_from(["default_value", "default_weight", "coverage_weight"]),
        st.sampled_from(["0", "1", "area_spherical_km2"]),
        max_size=3,
    ),
)
def test_op_grammar_roundtrip(name, params):
    s = name if not params else f"{name}({','.join(f'{k}={v}' for k, v in params.items())})"
    spec = parse_op(s)
    assert spec.name == name
    assert spec.param_dict == params


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(0, 12), min_size=0, max_size=30),
    st.lists(st.integers(0, 12), min_size=0, max_size=30),
    st.sampled_from(["inner", "left", "semi", "anti"]),
)
def test_hash_equijoin_matches_pandas(lkeys, rkeys, how):
    """Randomized join keys (duplicates, empties, disjoint sets) against
    the pandas reference for every join variant."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.join import hash_equijoin

    left = pd.DataFrame(
        {"k": pd.array(lkeys, dtype="int64"), "lv": pd.array(range(len(lkeys)), dtype="int64")}
    )
    right = pd.DataFrame(
        {"rk": pd.array(rkeys, dtype="int64"),
         "rv": pd.array([x * 0.5 for x in range(len(rkeys))], dtype="float64")}
    )
    lt, rt = pa.Table.from_pandas(left), pa.Table.from_pandas(right)
    lds = rd.from_arrow(lt).repartition(3)
    rds = rd.from_arrow(rt).repartition(2)
    got = hash_equijoin(
        lds, rds, "k", "rk", n_shards=4, how=how,
        left_schema=lt.schema, right_schema=rt.schema,
    ).to_pandas()
    if got.empty:
        # a fully-empty join result may surface as a column-less frame
        # (Ray groupby over zero groups); assert the reference agrees
        if how in ("inner", "left"):
            assert left.merge(right.rename(columns={"rk": "k"}), on="k", how=how).empty
        else:
            hit = left["k"].isin(right["rk"])
            assert left[hit if how == "semi" else ~hit].empty
        return
    got = got.sort_values(
        ["k", "lv"] + (["rv"] if how in ("inner", "left") else [])
    ).reset_index(drop=True)
    if how in ("inner", "left"):
        ref = left.merge(right.rename(columns={"rk": "k"}), on="k", how=how)
        ref = ref.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
        assert got["k"].tolist() == ref["k"].tolist()
        assert got["lv"].tolist() == ref["lv"].tolist()
        assert got["rv"].isna().tolist() == ref["rv"].isna().tolist()
        assert got["rv"].dropna().tolist() == ref["rv"].dropna().tolist()
    else:
        hit = left["k"].isin(right["rk"])
        ref = left[hit if how == "semi" else ~hit]
        ref = ref.sort_values(["k", "lv"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 9)),
        min_size=1,
        max_size=60,
    )
)
def test_value_rank_matches_duckdb(rows):
    """Randomized keys/values (heavy ties) against DuckDB rank()."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.sketch import value_rank

    df = pd.DataFrame(rows, columns=["k", "v"])
    df["v"] = df["v"].astype("float64")
    df["rid"] = range(len(df))
    ref = duckdb.connect().execute(
        "SELECT rid, rank() OVER (PARTITION BY k ORDER BY v) AS rank "
        "FROM df ORDER BY rid"
    ).fetchdf()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    got = value_rank(ds, "k", "v").to_pandas().sort_values("rid").reset_index(drop=True)
    assert got["rank"].tolist() == ref["rank"].tolist()


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 80)),
        min_size=0,
        max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 80)),
        min_size=0,
        max_size=25,
    ),
    st.sampled_from([7, 50, 1000]),
)
def test_interval_join_matches_bruteforce(lspec, rspec, width):
    """interval_join == the quadratic reference on random intervals for
    any bucket width (incl. one covering everything), exactly-once pairs,
    empty sides included."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.join import interval_join

    left = pa.table(
        {
            "lid": pa.array(range(len(lspec)), pa.int64()),
            "ls": pa.array([s for s, _ in lspec], pa.int64()),
            "le": pa.array([s + d for s, d in lspec], pa.int64()),
        }
    )
    right = pa.table(
        {
            "rid": pa.array(range(len(rspec)), pa.int64()),
            "rs": pa.array([s for s, _ in rspec], pa.int64()),
            "re": pa.array([s + d for s, d in rspec], pa.int64()),
        }
    )
    ds = interval_join(
        rd.from_arrow(left),
        rd.from_arrow(right),
        on=("ls", "le", "rs", "re"),
        bucket_width=width,
        n_shards=5,
    )
    # the Dataset-level schema survives empty joins (typed zero-row
    # block unioned in); ray's to_pandas drops columns at zero rows
    # (pinned in test_ray_internals), so read pairs defensively
    assert "lid" in ds.schema().names and "rid" in ds.schema().names
    out = ds.to_pandas()
    got = sorted(zip(out["lid"], out["rid"])) if len(out) else []
    want = sorted(
        (li, ri)
        for li, (ls, ld) in enumerate(lspec)
        for ri, (rs, rd_) in enumerate(rspec)
        if ls <= rs + rd_ and rs <= ls + ld
    )
    assert got == want
