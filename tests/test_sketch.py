"""HyperLogLog: accuracy vs exact distinct, mergeability, distributed use."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from geoglue_ray.stages.sketch import _registers, approx_distinct, estimate, merge_registers


def test_hll_accuracy_across_scales():
    rng = np.random.default_rng(11)
    for true_n in (100, 5_000, 200_000):
        vals = rng.integers(0, 1 << 62, size=true_n * 2) % (1 << 62)
        vals = np.unique(vals)[:true_n]
        est = estimate(_registers(vals))
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_single_pass():
    rng = np.random.default_rng(12)
    vals = rng.integers(0, 1 << 62, size=50_000)
    whole = _registers(vals)
    parts = [_registers(c) for c in np.array_split(vals, 7)]
    merged = merge_registers(parts)
    assert np.array_equal(whole, merged)  # sketches merge losslessly


def test_deterministic_sample_reproducible_and_uniform():
    from geoglue_ray.stages.sketch import deterministic_sample

    t = pa.table({"k": np.arange(100_000, dtype=np.int64), "v": np.arange(100_000)})
    s1 = deterministic_sample(rd.from_arrow(t), 0.1, "k").to_pandas()
    s2 = deterministic_sample(rd.from_arrow(t), 0.1, "k").to_pandas()
    assert s1.equals(s2)  # reproducible
    assert abs(len(s1) / 100_000 - 0.1) < 0.01  # ~rate
    # per-key consistency: a subset dataset samples the same keys
    sub = deterministic_sample(rd.from_arrow(t.slice(0, 50_000)), 0.1, "k").to_pandas()
    assert set(sub["k"]) == set(s1[s1["k"] < 50_000]["k"])
    # different seed -> different sample
    s3 = deterministic_sample(rd.from_arrow(t), 0.1, "k", seed=1).to_pandas()
    assert set(s3["k"]) != set(s1["k"])


def test_approx_quantiles():
    from geoglue_ray.stages.sketch import approx_quantiles

    rng = np.random.default_rng(21)
    vals = rng.normal(100, 15, size=300_000)
    t = pa.table({"k": np.arange(len(vals), dtype=np.int64), "v": vals})
    est = approx_quantiles(rd.from_arrow(t), "v", [0.1, 0.5, 0.9], k=4096, key_col="k")
    for q, e in est.items():
        true = np.quantile(vals, q)
        assert abs(e - true) < 1.5, (q, e, true)  # ~0.1 sigma at k=4096
    # determinism
    est2 = approx_quantiles(rd.from_arrow(t), "v", [0.1, 0.5, 0.9], k=4096, key_col="k")
    assert est == est2


def test_approx_distinct_dataset():
    rng = np.random.default_rng(13)
    n = 120_000
    t = pa.table(
        {
            "grp": np.repeat(["a", "b"], n // 2),
            "v": np.concatenate(
                [rng.integers(0, 10_000, n // 2), rng.integers(0, 40_000, n // 2)]
            ),
        }
    )
    out = (
        approx_distinct(rd.from_arrow(t), ["grp"], "v")
        .to_pandas()
        .set_index("grp")["approx_distinct"]
    )
    exact_a = len(np.unique(t["v"].to_numpy()[: n // 2]))
    exact_b = len(np.unique(t["v"].to_numpy()[n // 2 :]))
    assert abs(out["a"] - exact_a) / exact_a < 0.05
    assert abs(out["b"] - exact_b) / exact_b < 0.05


def test_exact_quantiles_matches_duckdb_and_batch_splits():
    """exact_quantiles must reproduce DuckDB quantile_disc/median on an
    adversarial histogram (skewed keys, heavy ties, odd/even counts,
    single-row key) independent of block structure."""
    import duckdb
    import pandas as pd

    from geoglue_ray.stages.sketch import exact_quantiles

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "k": np.r_[
                np.repeat("heavy", 10_001),  # odd count, few distinct values
                rng.choice(["a", "b", "c"], 4_000),
                ["solo"],
            ],
            "v": np.r_[
                rng.integers(0, 7, 10_001),
                rng.integers(0, 1_000, 4_000),
                [42],
            ].astype(np.float64),
        }
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """SELECT k AS admin, CAST(count(*) AS DOUBLE) n_rows,
                  quantile_disc(v, 0.25) p25, quantile_disc(v, 0.75) p75,
                  median(v) median_val
           FROM t GROUP BY 1 ORDER BY 1"""
    ).fetchdf()
    for blocks in (1, 13):
        ds = rd.from_pandas(df.rename(columns={"k": "admin"})).repartition(blocks)
        got = (
            exact_quantiles(ds, "admin", "v", quantiles=(0.25, 0.75))
            .to_pandas()
            .sort_values("admin")
            .reset_index(drop=True)[["admin", "n_rows", "p25", "p75", "median_val"]]
        )
        pd.testing.assert_frame_equal(got, want.rename(columns={"k": "admin"}))


def test_value_rank_ties_and_partitions(ray_session):
    """RANK semantics with ties (equal values share the rank; next rank
    skips), singleton partitions, and block-split independence."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.sketch import value_rank

    df = pd.DataFrame(
        {
            "k": ["a"] * 6 + ["b"] * 3 + ["c"],
            "v": [5.0, 1.0, 5.0, 2.0, 1.0, 9.0, 3.0, 3.0, 3.0, 7.0],
            "rid": range(10),
        }
    )
    ref = duckdb.connect().execute(
        "SELECT rid, rank() OVER (PARTITION BY k ORDER BY v) AS rank "
        "FROM df ORDER BY rid"
    ).fetchdf()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    got = value_rank(ds, "k", "v").to_pandas().sort_values("rid").reset_index(drop=True)
    assert got["rank"].tolist() == ref["rank"].tolist()


def test_count_min_one_sided_and_split_independent(ray_session):
    """CMS estimates never undercount, respect the e/width*N bound on a
    skewed stream, and are block-split independent (sum-mergeable)."""
    import math

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.sketch import count_min_counts

    rng = np.random.default_rng(11)
    # zipf-ish skew: key 0 is hot
    keys = np.concatenate([np.zeros(5000, np.int64), rng.integers(1, 2000, 15000)])
    rng.shuffle(keys)
    df = pd.DataFrame({"k": keys})
    q = np.array([0, 1, 7, 1999], dtype=np.int64)
    exact = np.array([(keys == x).sum() for x in q])
    ests = []
    for nparts in (1, 9):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(nparts)
        est = count_min_counts(ds, "k", q, width=4096)
        assert (est >= exact).all()
        assert (est - exact <= math.ceil(math.e / 4096 * len(keys))).all()
        ests.append(est)
    assert np.array_equal(ests[0], ests[1])


def test_kmv_distinct_accuracy_branches_and_partition_invariance():
    """KMV: exact below k, ~1/sqrt(k-2) error above k, block-split
    invariant (set semantics), and multi-group separation."""
    from geoglue_ray.stages.sketch import kmv_distinct

    k = 128
    # exact branch: fewer than k distinct values
    tab = pa.table(
        {
            "g": pa.array(["a"] * 200 + ["b"] * 300),
            "v": pa.array(
                np.r_[np.arange(50), np.arange(50), np.arange(50), np.arange(50),
                      np.arange(100), np.arange(100), np.arange(100)].astype(np.int64)
            ),
        }
    )
    out = {
        r["g"]: r["approx_distinct"]
        for r in kmv_distinct(rd.from_arrow(tab), ["g"], "v", k=k).take_all()
    }
    assert out == {"a": 50.0, "b": 100.0}

    # estimation branch: n >> k, error within 5 sigma; invariant to blocks
    n = 20000
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 8000, n)  # ~7200 distinct
    tab2 = pa.table({"g": pa.array(["x"] * n), "v": pa.array(vals.astype(np.int64))})
    exact = len(np.unique(vals))
    ests = []
    for parts in (1, 7):
        ds = rd.from_arrow(tab2).repartition(parts)
        est = kmv_distinct(ds, ["g"], "v", k=k).take_all()[0]["approx_distinct"]
        ests.append(est)
        assert abs(est - exact) / exact < 5.0 / np.sqrt(k - 2)
    assert ests[0] == ests[1]  # merge topology cannot change the sketch


def test_kmv_hash_sql_twin_exact():
    """kmv_hash64 == its DuckDB HUGEINT replica, bit for bit."""
    import duckdb

    from geoglue_ray.functions.texthash import kmv_hash64, sql_kmv_hash

    ids = np.r_[0, 1, 2, 7, 255, 8000, 2**31, 2**62 - 1, 2**63 - 1]
    want = kmv_hash64(ids)
    con = duckdb.connect()
    got = con.execute(
        f"SELECT i, {sql_kmv_hash('i')} AS h FROM (SELECT unnest(?::BIGINT[]) AS i) ORDER BY i",
        [ids.tolist()],
    ).fetchall()
    # HUGEINT values exceed int64: compare as python ints, never fetchnumpy
    assert {i: int(h) for i, h in got} == {
        int(i): int(w) for i, w in zip(ids, want)
    }


def test_weighted_median_matches_duckdb_and_splits():
    """weighted_median vs the SQL window rule on random integer weights,
    invariant to block splits, heavy value ties included."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.sketch import weighted_median

    rng = np.random.default_rng(9)
    n = 4000
    tab = pa.table(
        {
            "k": pa.array(rng.integers(0, 7, n).astype(np.int64)),
            "v": pa.array(rng.integers(0, 12, n).astype(np.float64)),
            "w": pa.array(rng.integers(1, 50, n).astype(np.float64)),
        }
    )
    con = duckdb.connect()
    con.register("t", tab)
    want = con.execute(
        """
        WITH h AS (SELECT k, v, sum(w) AS w FROM t GROUP BY 1, 2),
        cw AS (SELECT k, v, sum(w) OVER (PARTITION BY k ORDER BY v) AS cumw,
                      sum(w) OVER (PARTITION BY k) AS totw FROM h)
        SELECT k, CAST(max(totw) AS DOUBLE) AS total_w,
               min(v) FILTER (2*cumw >= totw) AS wmedian
        FROM cw GROUP BY 1 ORDER BY 1
        """
    ).fetchdf()
    for parts in (1, 9):
        got = (
            weighted_median(rd.from_arrow(tab).repartition(parts), "k", "v", "w")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert np.array_equal(got["k"].to_numpy(), want["k"].to_numpy())
        assert np.array_equal(got["total_w"].to_numpy(), want["total_w"].to_numpy())
        assert np.array_equal(got["wmedian"].to_numpy(), want["wmedian"].to_numpy())


def test_gini_matches_duckdb_and_splits():
    """gini vs the SQL row_number rule on random non-negative integers,
    heavy ties included, invariant to block splits; uniform values give
    low G, concentrated values high G."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.sketch import gini

    rng = np.random.default_rng(17)
    n = 5000
    k = rng.integers(0, 6, n).astype(np.int64)
    v = rng.integers(0, 9, n).astype(np.float64)
    v[k == 5] = (rng.random(n) < 0.05)[k == 5] * 1000.0  # concentrated key
    tab = pa.table({"k": pa.array(k), "v": pa.array(v)})
    con = duckdb.connect()
    con.register("t", tab)
    want = con.execute(
        """
        WITH r AS (SELECT k, CAST(v AS BIGINT) AS vi,
                          row_number() OVER (PARTITION BY k ORDER BY v) AS rn FROM t),
        s AS (SELECT k, CAST(count(*) AS BIGINT) n_obs, CAST(sum(vi) AS BIGINT) total,
                     CAST(sum(rn*vi) AS BIGINT) rsum FROM r GROUP BY 1)
        SELECT k, n_obs, total,
               CAST(2*rsum-(n_obs+1)*total AS DOUBLE)/CAST(n_obs*total AS DOUBLE) AS gini
        FROM s ORDER BY 1
        """
    ).fetchdf()
    for parts in (1, 11):
        got = (
            gini(rd.from_arrow(tab).repartition(parts), "k", "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        for col in ("k", "n_obs", "total"):
            assert np.array_equal(got[col].to_numpy(), want[col].to_numpy()), col
        assert np.array_equal(got["gini"].to_numpy(), want["gini"].to_numpy())
    g = got.set_index("k")["gini"]
    assert g.loc[5] > 0.9  # 5% of rows hold all the mass
    assert (g.loc[:4] < 0.5).all()  # near-uniform keys


def test_outlier_counts_matches_duckdb_and_flags_planted():
    """outlier_counts vs the HUGEINT moment rule on random integers with
    planted extreme values; split-invariant; the tight key flags nothing."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.sketch import outlier_counts

    rng = np.random.default_rng(41)
    n = 6000
    k = rng.integers(0, 5, n).astype(np.int64)
    v = rng.integers(40, 61, n).astype(np.float64)  # tight cluster
    plant = (k == 3) & (rng.random(n) < 0.01)
    v[plant] = 5000.0  # far outliers in key 3 only
    v[k == 4] = 50.0  # constant key: zero variance, zero outliers
    tab = pa.table({"k": pa.array(k), "v": pa.array(v)})
    con = duckdb.connect()
    con.register("t", tab)
    want = con.execute(
        """
        WITH g AS (SELECT k, CAST(v AS BIGINT) vi FROM t),
        s AS (SELECT k, CAST(count(*) AS BIGINT) n, CAST(sum(vi) AS BIGINT) sv,
                     CAST(sum(vi*vi) AS BIGINT) svv FROM g GROUP BY 1)
        SELECT g.k, max(s.n) n_obs,
               CAST(max(s.sv) AS DOUBLE)/CAST(max(s.n) AS DOUBLE) mean_val,
               CAST(count(*) FILTER (
                 (s.n::HUGEINT*g.vi - s.sv)*(s.n::HUGEINT*g.vi - s.sv)
                   > 4::HUGEINT*(s.n::HUGEINT*s.svv - s.sv::HUGEINT*s.sv)
               ) AS BIGINT) n_outliers
        FROM g JOIN s ON g.k = s.k GROUP BY 1 ORDER BY 1
        """
    ).fetchdf()
    for parts in (1, 9):
        got = (
            outlier_counts(rd.from_arrow(tab).repartition(parts), "k", "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        for col in ("k", "n_obs", "n_outliers"):
            assert np.array_equal(got[col].to_numpy(), want[col].to_numpy()), col
        assert np.array_equal(got["mean_val"].to_numpy(), want["mean_val"].to_numpy())
    byk = got.set_index("k")["n_outliers"]
    assert byk.loc[3] == int(plant.sum())  # every planted extreme flagged
    assert byk.loc[4] == 0  # zero-variance key flags nothing


def test_comoment_stats_bruteforce_and_splits():
    """comoment_stats vs numpy population moments computed per key in
    exact integer arithmetic; invariant to block splits."""
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.sketch import comoment_stats

    rng = np.random.default_rng(53)
    n = 3000
    k = rng.integers(0, 4, n).astype(np.int64)
    x = rng.integers(0, 100, n).astype(np.int64)
    y = (x // 2 + rng.integers(0, 10, n)).astype(np.int64)  # correlated
    import pandas as pd

    want = {}
    for key in np.unique(k):
        xi, yi = x[k == key].astype(object), y[k == key].astype(object)  # exact py ints
        nn = len(xi)
        sx, sy = sum(xi), sum(yi)
        sxx, syy, sxy = sum(xi * xi), sum(yi * yi), sum(xi * yi)
        want[int(key)] = (
            nn,
            float(sx) / nn,
            float(sy) / nn,
            float(nn * sxx - sx * sx) / float(nn * nn),
            float(nn * syy - sy * sy) / float(nn * nn),
            float(nn * sxy - sx * sy) / float(nn * nn),
        )
    t = pa.table({"k": pa.array(k), "x": pa.array(x), "y": pa.array(y)})
    for parts in (1, 8):
        got = (
            comoment_stats(rd.from_arrow(t).repartition(parts), "k", "x", "y")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        for r in got.itertuples():
            nn, mx, my, vx, vy, cxy = want[int(r.k)]
            assert (r.n_obs, r.mean_x, r.mean_y) == (nn, mx, my)
            assert (r.var_x, r.var_y, r.cov_xy) == (vx, vy, cxy)
    assert (got["cov_xy"] > 0).all()  # built-in correlation


def test_majority_minority_matches_duckdb_with_ties():
    """majority/minority/variety vs the row_number rule; planted exact
    count ties must break to the smaller value; split-invariant."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.sketch import majority_minority

    rng = np.random.default_rng(61)
    n = 4000
    k = rng.integers(0, 6, n).astype(np.int64)
    v = rng.integers(0, 15, n).astype(np.float64)
    # key 5: values 7 and 9 forced to the exact same (max) count
    sel = k == 5
    v[sel] = rng.integers(0, 5, sel.sum())
    idx5 = np.flatnonzero(sel)
    v[idx5[:600][:300]] = 7.0
    v[idx5[:600][300:]] = 9.0
    tab = pa.table({"k": pa.array(k), "v": pa.array(v)})
    con = duckdb.connect()
    con.register("t", tab)
    want = con.execute(
        """
        WITH h AS (SELECT k, v, CAST(count(*) AS BIGINT) c FROM t GROUP BY 1,2),
        r AS (SELECT k, v, c,
                     row_number() OVER (PARTITION BY k ORDER BY c DESC, v) rj,
                     row_number() OVER (PARTITION BY k ORDER BY c ASC, v) rn FROM h)
        SELECT k, max(v) FILTER (rj=1) majority_val, max(c) FILTER (rj=1) majority_n,
               max(v) FILTER (rn=1) minority_val, max(c) FILTER (rn=1) minority_n,
               CAST(count(*) AS BIGINT) variety
        FROM r GROUP BY 1 ORDER BY 1
        """
    ).fetchdf()
    for parts in (1, 10):
        got = (
            majority_minority(rd.from_arrow(tab).repartition(parts), "k", "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        for col in want.columns:
            assert np.array_equal(got[col].to_numpy(), want[col].to_numpy()), col
    assert got.set_index("k").loc[5, "majority_val"] == 7.0  # tie -> smaller value


def test_diversity_sanity_and_duckdb():
    """Simpson/dominance vs the SQL rule; constant key -> simpson 0 /
    dominance 1; near-uniform key -> simpson near 1 - 1/V."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from geoglue_ray.stages.sketch import diversity

    rng = np.random.default_rng(71)
    n = 3000
    k = rng.integers(0, 3, n).astype(np.int64)
    v = rng.integers(0, 20, n).astype(np.float64)
    v[k == 2] = 7.0  # constant key
    tab = pa.table({"k": pa.array(k), "v": pa.array(v)})
    con = duckdb.connect()
    con.register("t", tab)
    want = con.execute(
        """
        WITH h AS (SELECT k, v, CAST(count(*) AS BIGINT) c FROM t GROUP BY 1,2),
        s AS (SELECT k, CAST(sum(c) AS BIGINT) n, CAST(sum(c*c) AS BIGINT) sq,
                     CAST(max(c) AS BIGINT) cmax, CAST(count(*) AS BIGINT) variety
              FROM h GROUP BY 1)
        SELECT k, n n_obs, variety,
               CAST(n*n - sq AS DOUBLE)/CAST(n*n AS DOUBLE) simpson,
               CAST(cmax AS DOUBLE)/CAST(n AS DOUBLE) dominance
        FROM s ORDER BY 1
        """
    ).fetchdf()
    got = (
        diversity(rd.from_arrow(tab).repartition(7), "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for col in want.columns:
        assert np.array_equal(got[col].to_numpy(), want[col].to_numpy()), col
    byk = got.set_index("k")
    assert byk.loc[2, "simpson"] == 0.0 and byk.loc[2, "dominance"] == 1.0
    assert byk.loc[0, "simpson"] > 0.9
