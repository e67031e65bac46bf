"""Named query pipelines — the driver-facing `queries()` implementations.

Each function takes ``sf_dir`` and returns a ``ray.data.Dataset`` whose
rows/columns match the DuckDB oracle in :mod:`geoglue_ray.oracles`
bit-exactly.  All pipelines are streaming Dataset compositions; none calls
``ray.init``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from geoglue_ray import fixtures as fx
from geoglue_ray.pipelines.zonal import DEFAULT_OPS, corpus_with_admin, zonal_pipeline
from geoglue_ray.sources.corpus import read_corpus
from geoglue_ray.stages.spatial import encode_cells, spatial_join
from geoglue_ray.stages.zonal import zonal_aggregate


def corpus_derive(sf_dir: str) -> rd.Dataset:
    """Derived interleaved corpus incl. n_spans computed from the real
    spans column (validates list<struct> construction end to end)."""
    ds = read_corpus(sf_dir, with_spans=True)

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lon": b["lon"],
                "lat": b["lat"],
                "value": b["value"],
                "event_time": b["event_time"],
                "n_spans": pc.cast(pc.list_value_length(b["spans"]), pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow").sort("doc_id")


def spatial_join_query(sf_dir: str) -> rd.Dataset:
    ds = corpus_with_admin(sf_dir)
    return ds.select_columns(["doc_id", "admin_id", "admin1_id", "via_knn"]).sort("doc_id")


def knn_outside(sf_dir: str) -> rd.Dataset:
    ds = corpus_with_admin(sf_dir)
    ds = ds.map_batches(
        lambda b: b.filter(b["via_knn"]), batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "admin_id"]).sort("doc_id")


def zonal_stats(sf_dir: str) -> rd.Dataset:
    return zonal_pipeline(sf_dir, ops=DEFAULT_OPS)


def zonal_stats_admin1(sf_dir: str) -> rd.Dataset:
    ds = corpus_with_admin(sf_dir)
    out = zonal_aggregate(ds, ["sum", "count", "min", "max"], keys=["admin1_id"])
    return out.sort("admin1_id")


def daily_admin1(sf_dir: str) -> rd.Dataset:
    """Corpus -> daily counts/sums per admin-1 (hierarchy roll-up)."""
    from geoglue_ray.stages.timeagg import add_time_key, key_to_timestamp

    ds = corpus_with_admin(sf_dir, emit_names=False)

    def a1(b: pa.Table) -> pa.Table:
        idx = b["admin_idx"].to_numpy().astype(np.int64)
        return b.append_column("a1_idx", pa.array(fx.admin1_of(idx).astype(np.int32)))

    ds = add_time_key(ds.map_batches(a1, batch_format="pyarrow"), "D")
    out = zonal_aggregate(ds, ["count", "sum"], keys=["a1_idx", "time_key"])
    out = key_to_timestamp(out)
    pool = pa.array(np.char.mod("ADM1-%02d", np.arange(fx.NX1 * fx.NY1)).tolist())

    def project(b: pa.Table) -> pa.Table:
        idx = pa.compute.cast(b["a1_idx"], "int64")
        return pa.table(
            {
                "admin1_id": pool.take(idx),
                "day": b["time_key"],
                "count": b["count"],
                "sum": b["sum"],
            }
        )

    return out.map_batches(project, batch_format="pyarrow").sort(["admin1_id", "day"])


def weekly_events(sf_dir: str) -> rd.Dataset:
    """events -> (event_type, W-MON week): count + sum(floor(value))."""
    from geoglue_ray.stages.timeagg import add_time_key, key_to_timestamp

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "ts": b["ts"],
                "value": pa.array(np.floor(b["value"].to_numpy())),
            }
        )

    ds = add_time_key(ds.map_batches(prep, batch_format="pyarrow"), "W-MON", time_col="ts")
    out = zonal_aggregate(ds, ["count", "sum"], keys=["event_type", "time_key"])
    out = key_to_timestamp(out)

    def rename(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("time_key")
        return b.set_column(i, "week", b["time_key"])

    return out.map_batches(rename, batch_format="pyarrow").sort(["event_type", "week"])


def timeshift_local_daily(sf_dir: str) -> rd.Dataset:
    """Corpus shifted UTC->+07:00 with the instant/accum off-by-one
    (``cds.py:298-356``), then daily counts/sums per vartype."""
    from geoglue_ray.stages.timeagg import add_time_key, key_to_timestamp, timeshift_hours

    ds = read_corpus(sf_dir, with_spans=False)

    def vt(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        return b.append_column("vt_code", pa.array((ids % 2).astype(np.int8)))

    ds = ds.map_batches(vt, batch_format="pyarrow")
    pool = pa.array(["instant", "accum"])

    def vt_name(b: pa.Table) -> pa.Table:
        return b.append_column("vartype", pool.take(pa.compute.cast(b["vt_code"], "int64")))

    ds = ds.map_batches(vt_name, batch_format="pyarrow")
    ds = timeshift_hours(ds, 7, vartype_col="vartype")
    ds = add_time_key(ds, "D")
    out = zonal_aggregate(ds, ["count", "sum"], keys=["vt_code", "time_key"])
    out = key_to_timestamp(out)

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vartype": pool.take(pa.compute.cast(b["vt_code"], "int64")),
                "local_day": b["time_key"],
                "count": b["count"],
                "sum": b["sum"],
            }
        )

    return out.map_batches(project, batch_format="pyarrow").sort(["vartype", "local_day"])


def hourly_check(sf_dir: str) -> rd.Dataset:
    """Distinct observation hours per day (``cds.py:53-55`` invariant)."""
    from geoglue_ray.stages.timeagg import key_to_timestamp
    from geoglue_ray.stages.validate import count_distinct

    ds = read_corpus(sf_dir, with_spans=False)

    def keys(b: pa.Table) -> pa.Table:
        ts = b["event_time"].to_numpy()
        day = ts.astype("datetime64[D]").astype(np.int32)
        hour = (ts.astype("datetime64[h]").astype(np.int64) % 24).astype(np.int32)
        return pa.table({"time_key": day, "hour": hour})

    out = count_distinct(
        ds.map_batches(keys, batch_format="pyarrow"), ["time_key"], ["hour"], "n_hours"
    )
    out = key_to_timestamp(out)

    def rename(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("time_key")
        return b.set_column(i, "day", b["time_key"])

    return out.map_batches(rename, batch_format="pyarrow").sort("day")


def approx_distinct_users(sf_dir: str) -> rd.Dataset:
    """KMV (bottom-k) approximate distinct users per event type — the
    mergeable-sketch partial/final pattern with a BIT-EXACT DuckDB twin
    (estimate = one correctly-rounded division; HLL's linear-counting
    branch needs ``ln``, which DuckDB reproduces only to the last ulp, so
    the HLL variant stays gate-checked via approx_distinct_check instead).
    k=128: at sf0.01 (150 distinct/type) the ESTIMATION branch runs; the
    <k exact branch is driver-visible at sf0.001."""
    from geoglue_ray.stages.sketch import kmv_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    return kmv_distinct(ds, ["event_type"], "user_id", k=128).sort("event_type")


def approx_distinct_check(sf_dir: str) -> rd.Dataset:
    """Driver-visible HLL accuracy gate: per event type, the EXACT
    distinct-user count plus a boolean asserting the HLL estimate lands
    within 5% of it.  The DuckDB oracle recomputes the exact count and
    asserts TRUE — so an HLL accuracy regression fails the driver's hash
    compare, not just a local pytest.  The exact side is
    :func:`count_distinct` — per-batch dedup then a FIXED-shard shuffle,
    never a native groupby on the raw (type, user) tuple (whose
    cardinality scales with users; Ray's sort aggregate pays per-group
    Python, ~28 s at 200k keys, CLAUDE.md)."""
    from geoglue_ray.stages.sketch import approx_distinct
    from geoglue_ray.stages.validate import count_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    est = approx_distinct(ds, ["event_type"], "user_id")
    exact = count_distinct(ds, ["event_type"], ["user_id"], "count")

    est_df = est.to_pandas()  # <= |event_type| rows: tiny by construction
    exact_df = exact.to_pandas()
    m = exact_df.merge(est_df, on="event_type")
    ok = (m["approx_distinct"] - m["count"]).abs() / m["count"] <= 0.05
    out = pa.table(
        {
            "event_type": pa.array(m["event_type"]),
            "exact_distinct": pa.array(m["count"].to_numpy().astype(np.int64)),
            "within_5pct": pa.array(ok.to_numpy()),
        }
    )
    return rd.from_arrow(out).sort("event_type")


def embed_lsh_recall(sf_dir: str) -> rd.Dataset:
    """Driver-visible LSH-recall gate: mean multi-probe LSH recall vs the
    exact brute-force kNN must clear 0.6 on the near-random sf
    embeddings.  The oracle asserts the bound holds (TRUE), so a recall
    regression fails the driver's hash compare."""
    exact = embed_knn(sf_dir).to_pandas()  # 40 rows (4 queries x k=10)
    approx = embed_knn_lsh(sf_dir).to_pandas()
    qids = sorted(exact["query_id"].unique())
    recalls = []
    for qid in qids:
        e = set(exact.loc[exact["query_id"] == qid, "neighbor_id"])
        a = set(approx.loc[approx["query_id"] == qid, "neighbor_id"])
        recalls.append(len(e & a) / len(e))
    out = pa.table(
        {
            "query_id": pa.array(np.asarray(qids, dtype=np.int64)),
            "recall_ok": pa.array([bool(np.mean(recalls) >= 0.6)] * len(qids)),
        }
    )
    return rd.from_arrow(out).sort("query_id")


def region_revenue(sf_dir: str) -> rd.Dataset:
    """lineitem -> supplier -> nation -> region revenue (TPC-H Q5 shape).

    The three-table dimension chain (region 5 x nation 25 x supplier
    ~SF*1k rows — broadcast-small at every scale) is composed
    driver-side into ONE dense suppkey -> region-code array, broadcast
    via ``ray.put``; each lineitem batch maps suppkey -> region with an
    array gather and partial-aggregates revenue per region (card 5), so
    the shuffle is key-cardinality rows — never a 4-way join exchange.
    Revenue = ``floor(l_extendedprice * (1.0 - l_discount))``: the
    product is one IEEE double op (bit-identical between numpy and SQL)
    and the floor makes distributed sum order-independent."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    n_to_r = np.empty(nat.num_rows, dtype=np.int64)
    n_to_r[nat["n_nationkey"].to_numpy()] = nat["n_regionkey"].to_numpy()
    s_to_r = np.empty(int(sup["s_suppkey"].to_numpy().max()) + 1, dtype=np.int64)
    s_to_r[sup["s_suppkey"].to_numpy()] = n_to_r[sup["s_nationkey"].to_numpy()]
    r_names = np.empty(reg.num_rows, dtype=object)
    r_names[reg["r_regionkey"].to_numpy()] = np.asarray(
        reg["r_name"].to_pylist(), dtype=object
    )
    n_regions = len(r_names)
    lut_ref = ray.put(s_to_r)

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        code = lut[b["l_suppkey"].to_numpy()]
        rev = np.floor(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
        )
        return pa.table(
            {
                "_r": pa.array(np.arange(n_regions, dtype=np.int64)),
                "n_items": pa.array(
                    np.bincount(code, minlength=n_regions).astype(np.float64)
                ),
                "revenue": pa.array(np.bincount(code, weights=rev, minlength=n_regions)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "r_name": [r_names[int(g["_r"].iloc[0])]],
                "n_items": [g["n_items"].sum()],
                "revenue": [g["revenue"].sum()],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_r")
        .map_groups(merge, batch_format="pandas")
    )
    return out.sort("r_name")


def revenue_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(region, nation) revenue — the grouping-sets
    primitive.  The supplier->nation dimension chain is composed into one
    dense broadcast LUT; lineitem batches partial-collapse to nation
    cardinality (25), and the rollup levels (region subtotals, grand
    total) are derived in one bounded driver step — sums of exact
    integer-valued-double nation sums, so every level matches DuckDB's
    per-grouping-set SUM bit-for-bit.  Rolled-up key levels use the
    'ALL' sentinel (never NULL) to keep block schemas typed."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    n_nat = nat.num_rows
    s_to_n = np.empty(int(sup["s_suppkey"].to_numpy().max()) + 1, dtype=np.int64)
    s_to_n[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()
    n_names = np.empty(n_nat, dtype=object)
    n_names[nat["n_nationkey"].to_numpy()] = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    n_to_r = np.empty(n_nat, dtype=np.int64)
    n_to_r[nat["n_nationkey"].to_numpy()] = nat["n_regionkey"].to_numpy()
    r_names = np.empty(reg.num_rows, dtype=object)
    r_names[reg["r_regionkey"].to_numpy()] = np.asarray(reg["r_name"].to_pylist(), dtype=object)
    lut_ref = ray.put(s_to_n)

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        code = lut[b["l_suppkey"].to_numpy()]
        rev = np.floor(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
        )
        return pa.table(
            {
                "_n": pa.array(np.arange(n_nat, dtype=np.int64)),
                "revenue": pa.array(np.bincount(code, weights=rev, minlength=n_nat)),
            }
        )

    # partials are nation-cardinality x block-count — provably bounded
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    by_n = np.zeros(n_nat, dtype=np.float64)
    np.add.at(by_n, parts["_n"].to_numpy(), parts["revenue"].to_numpy())
    rows_r = [r_names[n_to_r[n]] for n in range(n_nat)]
    by_region: dict[str, float] = {}
    for n in range(n_nat):
        by_region[rows_r[n]] = by_region.get(rows_r[n], 0.0) + by_n[n]
    out = pd.DataFrame(
        {
            "r_name": rows_r + sorted(by_region) + ["ALL"],
            "n_name": [n_names[n] for n in range(n_nat)]
            + ["ALL"] * len(by_region)
            + ["ALL"],
            "revenue": list(by_n)
            + [by_region[r] for r in sorted(by_region)]
            + [float(sum(by_region.values()))],
        }
    )
    return pa.Table.from_pandas(
        out.sort_values(["r_name", "n_name"]).reset_index(drop=True),
        preserve_index=False,
    )


def redact_docs(sf_dir: str) -> rd.Dataset:
    """Vectorized regex masking — the PII-redaction primitive of a
    training-data pipeline: every standalone occurrence of the masked
    terms is counted and replaced in one RE2 kernel pass per Arrow batch
    (`pc.count_substring_regex` / `pc.replace_substring_regex`; both
    engines run RE2, so replacement positions agree exactly)."""
    import pyarrow.compute as pc

    pat = r"\b(key|part|table)\b"
    ds = read_documents_cols(sf_dir, ["doc_id", "text"])

    def red(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_masked": pc.count_substring_regex(b["text"], pat).cast(
                    pa.int64()
                ),
                "text_redacted": pc.replace_substring_regex(
                    b["text"], pat, "<TERM>"
                ),
            }
        )

    return ds.map_batches(red, batch_format="pyarrow").sort("doc_id")


def brand_stats(sf_dir: str) -> rd.Dataset:
    """lineitem joined to part by broadcast dense-key gather, grouped by
    brand (card 25): sum/min/max of floored measures so every aggregate
    is order-independent (min/max of partials = global min/max)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    from geoglue_ray.stages.zonal import _factorize_keys

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    brands = np.empty(int(part["p_partkey"].to_numpy().max()) + 1, dtype=object)
    brands[part["p_partkey"].to_numpy()] = np.asarray(
        part["p_brand"].to_pylist(), dtype=object
    )
    lut_ref = ray.put(brands)

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        brand = lut[b["l_partkey"].to_numpy()]
        qty = np.floor(b["l_quantity"].to_numpy())
        price = np.floor(b["l_extendedprice"].to_numpy())
        rev = np.floor(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
        )
        key_vals, inv, n_groups = _factorize_keys([brand])
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(n_groups))
        ends = np.concatenate([starts[1:], [len(inv)]])
        return pa.table(
            {
                "p_brand": pa.array(key_vals[0]),
                "n_items": pa.array((ends - starts).astype(np.float64)),
                "sum_qty": pa.array(np.add.reduceat(qty[order], starts)),
                "revenue": pa.array(np.add.reduceat(rev[order], starts)),
                "min_price": pa.array(np.minimum.reduceat(price[order], starts)),
                "max_price": pa.array(np.maximum.reduceat(price[order], starts)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_brand": [g["p_brand"].iloc[0]],
                "n_items": [g["n_items"].sum()],
                "sum_qty": [g["sum_qty"].sum()],
                "revenue": [g["revenue"].sum()],
                "min_price": [g["min_price"].min()],
                "max_price": [g["max_price"].max()],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .map_groups(merge, batch_format="pandas")
    )
    return out.sort("p_brand")


def topk_by_admin1(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Top-k documents by value within each admin-1 (deterministic ties:
    value desc, doc_id asc) — groupby + per-group sorted head."""
    import pandas as pd

    ds = corpus_with_admin(sf_dir, with_spans=False)
    ds = ds.select_columns(["admin1_id", "doc_id", "value"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "doc_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = ds.groupby("admin1_id").map_groups(topk, batch_format="pandas")
    return out.sort(["admin1_id", "rank"])


def distinct_sources(sf_dir: str) -> rd.Dataset:
    """Exact COUNT(DISTINCT source) per lang via partial-deduped shuffle."""
    from geoglue_ray.stages.validate import count_distinct

    ds = read_documents_cols(sf_dir, ["lang", "source"])
    return count_distinct(ds, ["lang"], ["source"], "n_sources").sort("lang")


def events_sessionize(
    sf_dir: str, gap_minutes: int = 30, n_shards: int = 64
) -> rd.Dataset:
    """Session windows per user (gap > 30 min starts a new session) — the
    streaming-shaped pattern: co-partition by key, sort by time within the
    partition, window vectorized (Ray Data has no event-time windows).

    Scale shape (round-3 rework): the shuffle key is ``hash(user) %
    n_shards`` — FIXED group count; grouping on raw user_id pays Ray's
    per-group Python overhead once per user (CLAUDE.md), and user
    cardinality scales with the corpus.  Each shard task sessionizes ALL
    of its users in one lexsort + vectorized break-detection +
    ``reduceat`` pass: a session break is a user change OR a gap over
    the threshold.  Sums are over integer-valued measures -> exact."""
    import pandas as pd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return pa.table(
            {
                "_us": pa.array(shard),
                "user_id": b["user_id"],
                "ts": b["ts"],
                "v": pa.array(np.floor(b["value"].to_numpy())),
            }
        )

    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        v = g["v"].to_numpy()
        o = np.lexsort((ts, uid))
        uid, ts, v = uid[o], ts[o], v[o]
        brk = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            brk[1:] = (uid[1:] != uid[:-1]) | (np.diff(ts) > gap)
        starts = np.nonzero(brk)[0]
        ends = np.concatenate([starts[1:], [len(uid)]])
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "session_start": ts[starts],
                "n_events": (ends - starts).astype(np.float64),
                "sum_val": np.add.reduceat(v, starts),
            }
        )

    out = ds.map_batches(prep, batch_format="pyarrow").groupby("_us").map_groups(
        sessions, batch_format="pandas"
    )
    return out.sort(["user_id", "session_start"])


def events_asof_obs(sf_dir: str) -> rd.Dataset:
    """As-of join: each event (admin-assigned, time-aligned into the
    observation window) picks up the most recent per-admin observation
    aggregate at or before its timestamp — the bucketed sort-merge as-of
    pattern, matching DuckDB ASOF JOIN bit-exactly."""
    import ray

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table
    from geoglue_ray.stages.join import asof_join

    # right side: per-(admin, hour) observation sums (unique right ts per key)
    right = corpus_with_admin(sf_dir, with_spans=False, emit_names=False)
    right = zonal_aggregate(right, ["sum"], keys=["admin_idx", "event_time"])

    def rn(b: pa.Table) -> pa.Table:
        # align the union-side schemas (admin_idx int64, event_time us) so
        # the tagged union's blocks unify without divergence warnings
        return pa.table(
            {
                "admin_idx": pa.compute.cast(b["admin_idx"], "int64"),
                "event_time": pa.compute.cast(b["event_time"], pa.timestamp("us")),
                "obs_value": b["sum"],
            }
        )

    right = right.map_batches(rn, batch_format="pyarrow")

    # left side: events with derived admin + aligned timestamp
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    ds = ds.map_batches(DeriveEventObservations(), batch_format="pyarrow")
    ds = ds.map_batches(encode_cells, batch_format="pyarrow")
    index = AdminIndex.build(build_admin_table())
    ds = spatial_join(ds, index_ref=ray.put(index), emit_names=False)

    def align(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        ts = fx.T0 + ((ids % 1440) * 3_600_000_000).astype("timedelta64[us]")
        return pa.table(
            {
                "event_id": pa.compute.cast(b["event_id"], "int64"),
                "admin_idx": pa.compute.cast(b["admin_idx"], "int64"),
                "ts_aligned": pa.array(ts, type=pa.timestamp("us")),
            }
        )

    left = ds.map_batches(align, batch_format="pyarrow")
    joined = asof_join(
        left, right, key="admin_idx", left_ts="ts_aligned",
        right_ts="event_time", right_cols=["obs_value"],
    )
    names = pa.array(fx.admin2_name(np.arange(fx.N_ADMIN2)).tolist())

    def project(b: pa.Table) -> pa.Table:
        # explicit casts to the declared output schema: the pandas
        # map_groups round-trip float64-ifies side-exclusive int columns
        # (NaN fill) and can shift timestamp units — the driver hashes
        # values by type, so emit exactly what the oracle emits
        idx = pa.compute.cast(b["admin_idx"], "int64")
        return pa.table(
            {
                "event_id": pa.compute.cast(b["event_id"], "int64"),
                "admin_id": names.take(idx),
                "ts_aligned": pa.compute.cast(b["ts_aligned"], pa.timestamp("us")),
                "matched_time": pa.compute.cast(b["event_time"], pa.timestamp("us")),
                "obs_value": pa.compute.cast(b["obs_value"], "float64"),
            }
        )

    return joined.map_batches(project, batch_format="pyarrow").sort("event_id")


N_BANDS = 16


def value_bands(sf_dir: str) -> rd.Dataset:
    """Range join: each doc's value lands in the quadratic band
    ``[k*k*256, (k+1)*(k+1)*256)`` — broadcast interval lookup."""
    from geoglue_ray.stages.join import range_join_broadcast

    ds = read_corpus(sf_dir, with_spans=False)
    k = np.arange(N_BANDS, dtype=np.int64)
    out = range_join_broadcast(
        ds,
        "value",
        bounds_lo=(k * k * 256).astype(np.float64),
        band_cols={
            "band_id": k,
            "band_name": np.char.mod("band-%02d", k),
        },
        top=float(N_BANDS * N_BANDS * 256),
    )
    return out.select_columns(["doc_id", "value", "band_id", "band_name"]).sort("doc_id")


def rolling_daily_admin(sf_dir: str) -> rd.Dataset:
    """Windowed aggregate: 7-row rolling sum of daily per-admin value sums
    (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW, ordered by day)."""
    from geoglue_ray.stages.join import rolling_window
    from geoglue_ray.stages.timeagg import add_time_key, key_to_timestamp

    ds = corpus_with_admin(sf_dir, with_spans=False, emit_names=False)
    ds = add_time_key(ds, "D")
    daily = zonal_aggregate(ds, ["sum"], keys=["admin_idx", "time_key"])
    rolled = rolling_window(daily, "admin_idx", "time_key", "sum", window=7)
    rolled = key_to_timestamp(rolled)
    names = pa.array(fx.admin2_name(np.arange(fx.N_ADMIN2)).tolist())

    def project(b: pa.Table) -> pa.Table:
        idx = pa.compute.cast(b["admin_idx"], "int64")
        return pa.table(
            {
                "admin_id": names.take(idx),
                "day": b["time_key"],
                "day_sum": b["sum"],
                "roll_sum": b["roll_sum"],
                "roll_n": b["roll_n"],
            }
        )

    return rolled.map_batches(project, batch_format="pyarrow").sort(["admin_id", "day"])


# ------------------------------------------------------- relational queries
def q1_pricing(sf_dir: str) -> rd.Dataset:
    """TPC-H-Q1-shaped pricing summary over lineitem (integer measures via
    floor so distributed sums match serial SQL exactly).

    One streaming pass: each batch partially aggregates BOTH measures per
    (flag, status) — one output row per key per batch — and a tiny final
    ``map_groups`` (group count = key cardinality, 6) merges the partials.
    No driver-side merge, no double read, no materialize."""
    import pandas as pd

    from geoglue_ray.stages.zonal import _factorize_keys

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        qty = np.floor(b["l_quantity"].to_numpy())
        price = np.floor(b["l_extendedprice"].to_numpy())
        key_vals, inv, n_groups = _factorize_keys(
            [
                b["l_returnflag"].to_numpy(zero_copy_only=False),
                b["l_linestatus"].to_numpy(zero_copy_only=False),
            ]
        )
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(n_groups))
        return pa.table(
            {
                "l_returnflag": pa.array(key_vals[0]),
                "l_linestatus": pa.array(key_vals[1]),
                "sum_qty": pa.array(np.add.reduceat(qty[order], starts)),
                "n_rows": pa.array(
                    np.diff(np.concatenate([starts, [len(inv)]])).astype(np.float64)
                ),
                "sum_price": pa.array(np.add.reduceat(price[order], starts)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [g["l_returnflag"].iloc[0]],
                "l_linestatus": [g["l_linestatus"].iloc[0]],
                "sum_qty": [g["sum_qty"].sum()],
                "n_rows": [g["n_rows"].sum()],
                "sum_price": [g["sum_price"].sum()],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .map_groups(merge, batch_format="pandas")
    )
    return out.sort(["l_returnflag", "l_linestatus"])


def segment_revenue(sf_dir: str) -> rd.Dataset:
    """orders joined to customer by broadcast lookup (small side via
    ray.put — never a shuffle join), grouped by market segment."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust["c_custkey"].to_numpy()
    order = np.argsort(keys)
    lookup_ref = ray.put(
        {
            "keys": keys[order],
            "seg": cust["c_mktsegment"].combine_chunks().take(pa.array(order)),
        }
    )
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    class AttachSegment:
        """Broadcast hash/merge join side: vectorized searchsorted lookup
        into the sorted key array + Arrow take of the dictionary values."""

        def __init__(self, ref):
            d = ray.get(ref)
            self.keys: np.ndarray = d["keys"]
            self.seg: pa.Array = d["seg"]

        def __call__(self, b: pa.Table) -> pa.Table:
            ck = b["o_custkey"].to_numpy()
            pos = np.clip(np.searchsorted(self.keys, ck), 0, len(self.keys) - 1)
            # inner-join semantics: drop orders whose custkey is absent
            # (an unchecked lookup would silently attach a neighbor's
            # segment; safe only under FK integrity, which we don't assume)
            hit = self.keys[pos] == ck
            price = np.floor(b["o_totalprice"].to_numpy())[hit]
            return pa.table(
                {
                    "c_mktsegment": self.seg.take(pa.array(pos[hit], type=pa.int64())),
                    "price": pa.array(price),
                }
            )

    ds = ds.map_batches(
        AttachSegment, fn_constructor_args=(lookup_ref,), batch_format="pyarrow",
        concurrency=(1, 4),
    )
    out = zonal_aggregate(ds, ["count", "sum", "min", "max"], keys=["c_mktsegment"], value_col="price")
    return out.sort("c_mktsegment")


# --------------------------------------------------------- crop / resample
CROP_BBOX = (104.0, 10.0, 106.0, 14.0)


def crop_bbox(sf_dir: str) -> rd.Dataset:
    from geoglue_ray.geom import Bbox
    from geoglue_ray.stages.crop import crop

    ds = read_corpus(sf_dir, with_spans=False)
    out = crop(ds, Bbox(*CROP_BBOX))
    return out.select_columns(["doc_id", "lon", "lat", "value"]).sort("doc_id")


def _weights_dense_north():
    """Weights grid as (row 0 = north) dense array + matching spec."""
    from geoglue_ray.sources.weights import build_weights_grid, weights_grid_spec

    return build_weights_grid()[::-1].copy(), weights_grid_spec()


def _resample_weights_to_era5(method: str) -> rd.Dataset:
    import ray

    from geoglue_ray.sources.raster import raster_grid_spec
    from geoglue_ray.stages.resample import Resampler, target_grid_dataset

    dense, spec = _weights_dense_north()
    ds = target_grid_dataset(raster_grid_spec())
    out = ds.map_batches(
        Resampler,
        fn_constructor_args=(ray.put(dense), spec, method),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return out.select_columns(["cell_row", "cell_col", "resampled"]).sort(
        ["cell_row", "cell_col"]
    )


def resample_nearest(sf_dir: str) -> rd.Dataset:
    return _resample_weights_to_era5("remapnn")


def resample_bilinear(sf_dir: str) -> rd.Dataset:
    return _resample_weights_to_era5("remapbil")


def resample_idw(sf_dir: str) -> rd.Dataset:
    """Inverse-distance resampling (CDO ``remapdis``, reference
    resample.py:96,153-154) of the weights grid onto the ERA5 grid — the
    4-neighbor 1/d weighted mean (stages/resample.inverse_distance).
    Every float op is a correctly-rounded IEEE chain mirrored verbatim by
    the DuckDB oracle, so the result is bit-exact."""
    return _resample_weights_to_era5("remapdis")


def resample_kriging(sf_dir: str) -> rd.Dataset:
    """Ordinary-kriging resampling of the weights grid onto the ERA5
    grid — the geostatistical interpolator on top of the variogram
    family (stages/resample.kriging3): 3 nearest of the 4 surrounding
    centers, LINEAR variogram (the exact-arithmetic model — weights are
    slope-invariant), closed-form bordered solve.  Every float op is a
    fixed correctly-rounded IEEE chain mirrored verbatim by the DuckDB
    twin, so the result (negative screening weights and all) is
    bit-exact."""
    return _resample_weights_to_era5("remapok")


def resample_conservative(sf_dir: str) -> rd.Dataset:
    """First-order conservative regrid (CDO ``remapcon``, reference
    resample.py:81-161's remap grammar) of the integer weights field onto
    a deliberately NON-NESTED 0.1875-deg target grid: both grids put cell
    boundaries on the shared 1/256-deg lattice but never align, so every
    target cell straddles 2-3 source cells per axis with genuine
    fractional overlap areas.  Overlap lengths are exact int64 lattice
    units -> order-independent integer numerator, one final division —
    bit-exact vs the SQL twin, and flux-conserving (test_resample)."""
    import ray

    from geoglue_ray.sources.weights import build_weights_grid
    from geoglue_ray.stages.resample import (
        ConservativeRegridder,
        conservative_target_cells,
    )

    out = conservative_target_cells().map_batches(
        ConservativeRegridder,
        fn_constructor_args=(ray.put(build_weights_grid()),),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return out.sort(["cell_row", "cell_col"])


def events_extract(sf_dir: str) -> rd.Dataset:
    """Raster value extraction at observation point locations — the
    point-sampling face of raster<->vector fusion (rasterio ``sample`` /
    exactextract point queries; the reference reads fields at admin
    units, this reads them at raw observations): each event's derived
    (lon, lat) samples the ERA5 t2m hour-0 field by SPARSE bilinear
    (fill/mask semantics, so NaN ocean holes never bleed), NULL outside
    the grid interior.  The field is a tiny dense array broadcast once
    via ray.put into the Resampler pool; events stream through in
    batches — no shuffle at all, the 100 TB shape for small-side raster
    x huge point corpus."""
    import ray

    from geoglue_ray.sources.raster import (
        RXSIZE,
        RYSIZE,
        raster_grid_spec,
        raster_value,
    )
    from geoglue_ray.stages.resample import Resampler

    r, c = np.meshgrid(np.arange(RYSIZE), np.arange(RXSIZE), indexing="ij")
    dense = raster_value(np.zeros_like(r), r, c, 0).reshape(RYSIZE, RXSIZE)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def derive(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {"event_id": b["event_id"], "lon": pa.array(lon), "lat": pa.array(lat)}
        )

    out = ds.map_batches(derive, batch_format="pyarrow").map_batches(
        Resampler,
        fn_constructor_args=(ray.put(dense), raster_grid_spec(), "sremapbil"),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return out.select_columns(["event_id", "resampled"]).sort("event_id")


def resample_sparse(sf_dir: str) -> rd.Dataset:
    """ERA5 t2m hour-0 field (NaN ocean holes) -> fine 0.125-deg grid via
    sparse bilinear (``resample.py:19-78`` fill/mask semantics)."""
    import ray

    from geoglue_ray.grid import GridSpec
    from geoglue_ray.sources.raster import RXSIZE, RYSIZE, raster_grid_spec, raster_value
    from geoglue_ray.stages.resample import Resampler, target_grid_dataset

    r, c = np.meshgrid(np.arange(RYSIZE), np.arange(RXSIZE), indexing="ij")
    dense = raster_value(np.zeros_like(r), r, c, 0).reshape(RYSIZE, RXSIZE)
    dst = GridSpec(xsize=60, ysize=100, xfirst=102.25, xinc=0.125, yfirst=21.4375, yinc=-0.125)
    ds = target_grid_dataset(dst)
    out = ds.map_batches(
        Resampler,
        fn_constructor_args=(ray.put(dense), raster_grid_spec(), "sremapbil"),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return out.select_columns(["cell_row", "cell_col", "resampled"]).sort(
        ["cell_row", "cell_col"]
    )


# ------------------------------------------------------ training-data ops
def token_count_query(sf_dir: str) -> rd.Dataset:
    from geoglue_ray.stages.text import token_count

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(token_count, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_tokens"]).sort("doc_id")


def text_quality(sf_dir: str) -> rd.Dataset:
    from geoglue_ray.stages.text import QualityScorer

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=(1, 4))
    return out.select_columns(
        ["doc_id", "n_tokens", "n_stopwords", "stop_ratio", "mean_token_len"]
    ).sort("doc_id")


def contamination_ngram(sf_dir: str) -> rd.Dataset:
    """Benchmark-decontamination check — the training-corpus hygiene op:
    the DISTINCT word 5-grams of a stand-in eval set (docs with
    ``doc_id % 97 == 0``) are collected once (eval-set-bounded) and
    broadcast; every document then reports how many of its own 5-gram
    instances appear in the set and the contaminated fraction (a single
    exact-int division, NULL under 5 tokens).  Two passes over a
    column-pruned file read (the acceptable double-consumption class);
    membership is one hash-probe pass per batch against the per-worker
    cached broadcast."""
    import ray

    from geoglue_ray.stages.text import benchmark_ngram_partial, contamination_score

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    bench_rows = ds.map_batches(
        benchmark_ngram_partial, batch_format="pyarrow"
    ).to_pandas()  # bounded: distinct-per-batch n-grams of the eval docs
    ref = ray.put(frozenset(bench_rows["ng"]))
    out = ds.map_batches(
        contamination_score, batch_format="pyarrow", fn_kwargs={"bench_ref": ref}
    )
    return out.sort("doc_id")


def pack_offsets(sf_dir: str, context: int = 256) -> rd.Dataset:
    """LM sequence packing — concatenate documents in id order and chunk
    the token stream into fixed training context windows: each doc's
    global start offset comes from the distributed two-pass prefix scan
    (stages/scan.global_prefix_sum — range-bucket partials, driver
    exclusive scan of the bounded range table, broadcast bases, one
    co-shuffled in-range cumsum pass), then window id / in-window
    position / boundary-crossing flag are pure integer arithmetic.
    Exact int64 end to end, mirrored by the SQL running-window twin."""
    from geoglue_ray.stages.scan import global_prefix_sum

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])

    def lens(b: pa.Table) -> pa.Table:
        t = b["text"].combine_chunks() if isinstance(b["text"], pa.ChunkedArray) else b["text"]
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(t), pattern=r"\s+")
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
            }
        )

    scanned = global_prefix_sum(
        ds.map_batches(lens, batch_format="pyarrow"),
        "doc_id",
        "n_tokens",
        range_size=1024,
    )
    C = np.int64(context)

    def finalize(b: pa.Table) -> pa.Table:
        start = b["start_offset"].to_numpy().astype(np.int64)
        n = b["n_tokens"].to_numpy().astype(np.int64)
        pos = start % C
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": b["n_tokens"],
                "start_offset": b["start_offset"],
                "bin": pa.array(start // C),
                "pos_in_bin": pa.array(pos),
                "crosses_boundary": pa.array(pos + n > C),
            }
        )

    return scanned.map_batches(finalize, batch_format="pyarrow").sort("doc_id")


def lang_id(sf_dir: str) -> rd.Dataset:
    from geoglue_ray.stages.text import LangId

    ds = read_documents_cols(sf_dir, ["doc_id", "text", "lang"])
    out = ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))
    return out.select_columns(["doc_id", "lang", "pred_lang", "lang_score"]).sort("doc_id")


def doc_fingerprint(sf_dir: str) -> rd.Dataset:
    from geoglue_ray.stages.text import fingerprint

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(fingerprint, batch_format="pyarrow")
    return out.select_columns(["doc_id", "fingerprint"]).sort("doc_id")


def dedup_exact(sf_dir: str) -> rd.Dataset:
    from geoglue_ray.stages.dedup import exact_dedup

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    return exact_dedup(ds).sort("doc_id")


def minhash_neardup(sf_dir: str) -> rd.Dataset:
    from geoglue_ray.stages.dedup import minhash_neardup as mh

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    return mh(ds, threshold=0.4).sort(["doc_a", "doc_b"])


def simhash_neardup(sf_dir: str) -> rd.Dataset:
    from geoglue_ray.stages.dedup import simhash_neardup as sh

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    return sh(ds, max_hamming=4).sort(["doc_a", "doc_b"])


def ngram_neardup(sf_dir: str) -> rd.Dataset:
    from geoglue_ray.stages.dedup import ngram_jaccard_block

    ds = read_documents_cols(sf_dir, ["doc_id", "text", "lang", "n_chars"])

    def block(b: pa.Table) -> pa.Table:
        return b.append_column(
            "block", pa.array(b["n_chars"].to_numpy() // 64)
        )

    return ngram_jaccard_block(
        ds.map_batches(block, batch_format="pyarrow"), ["lang", "block"], threshold=0.5
    ).sort(["doc_a", "doc_b"])


def edit_neardup(sf_dir: str) -> rd.Dataset:
    """Exact Levenshtein near-dup pairs (<= 8 edits) within language blocks
    — the classic fuzzy-dedup verifier; candidates via adjacent length
    bands (complete for the |Δlen| <= 8 necessary condition)."""
    from geoglue_ray.stages.dedup import edit_neardup as ed

    ds = read_documents_cols(sf_dir, ["doc_id", "text", "lang"])
    return ed(ds, max_edits=8, block_cols=["lang"]).sort(["doc_a", "doc_b"])


def dedup_chunks(sf_dir: str) -> rd.Dataset:
    """Sub-document chunk dedup + reassembly (C4/RefinedWeb curation
    shape): 4-token windows, global first-wins by (doc_id, chunk_id),
    documents rebuilt from surviving chunks — all Arrow-kernel
    vectorized (stages/dedup.chunk_dedup)."""
    from geoglue_ray.stages.dedup import chunk_dedup

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    return chunk_dedup(ds, chunk_tokens=4).sort("doc_id")


def dedup_clusters(sf_dir: str) -> rd.Dataset:
    """Near-duplicate clusters: MinHash+LSH pairs -> connected components."""
    from geoglue_ray.stages.dedup import duplicate_clusters, minhash_neardup as mh

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    return duplicate_clusters(mh(ds, threshold=0.4)).sort("doc_id")


def dup_cluster_sizes(sf_dir: str) -> rd.Dataset:
    """Duplicate-cluster SIZE distribution — the headline table of every
    dedup paper (how much of the corpus sits in 2-clusters vs mega-
    clusters): MinHash+LSH pairs -> connected components -> per-cluster
    member counts -> histogram (cluster_size, n_clusters, n_docs).
    Composition of oracle-backed operators; the histogram is
    size-cardinality bounded."""
    from geoglue_ray.stages.dedup import duplicate_clusters, minhash_neardup as mh

    import pandas as pd

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    labels = duplicate_clusters(mh(ds, threshold=0.4))

    def part(b: pa.Table) -> pa.Table:
        # per-batch (cluster_id, members) partial counts
        cid = b["cluster_id"].to_numpy().astype(np.int64)
        u, c = np.unique(cid, return_counts=True)
        return pa.table(
            {"cluster_id": pa.array(u), "m": pa.array(c.astype(np.int64))}
        )

    per = (
        labels.map_batches(part, batch_format="pyarrow")
        .to_pandas()  # bounded: clustered docs << corpus (LSH pair set)
        .groupby("cluster_id", sort=True)["m"]
        .sum()
    )
    sizes = per.to_numpy().astype(np.int64)
    u, c = np.unique(sizes, return_counts=True)
    return rd.from_arrow(
        pa.table(
            {
                "cluster_size": pa.array(u),
                "n_clusters": pa.array(c.astype(np.int64)),
                "n_docs": pa.array((u * c).astype(np.int64)),
            }
        )
    )


def dedup_corpus(sf_dir: str) -> rd.Dataset:
    """Composed fuzzy dedup end to end: LSH pairs -> components -> the
    surviving (canonical) corpus rows with their payload columns."""
    from geoglue_ray.stages.dedup import dedup_corpus as dc

    text = read_documents_cols(sf_dir, ["doc_id", "text"])
    keep = read_documents_cols(sf_dir, ["doc_id", "lang", "n_chars"])
    return dc(text, keep, threshold=0.4).sort("doc_id")


def embed_centroids(sf_dir: str) -> rd.Dataset:
    """Grouped embedding centroids per label — the k-means/M-step shape —
    with an ORDER-INDEPENDENT exactness story: each float32 component is
    quantized to integers at 2^-20 resolution (``floor(x*2^20 + 0.5)``,
    exact: power-of-two scaling of a float32 never rounds), so the
    distributed partial sums are integer-valued and the centroid is one
    final division — bit-exact vs the DuckDB twin regardless of block
    order.  The quantized centroid differs from the float centroid by
    < 2^-20 per component (bounded, documented), which is what makes a
    verifiable distributed mean over floats possible at all."""
    from geoglue_ray.stages.zonal import zonal_aggregate

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def explode(b: pa.Table) -> pa.Table:
        lab = b["label"].to_numpy()
        la = b["embedding"].combine_chunks()
        mat = np.asarray(la.flatten()).reshape(len(b), -1)
        q = np.floor(mat.astype(np.float64) * 1048576.0 + 0.5)
        dim = mat.shape[1]
        return pa.table(
            {
                "label": pa.array(np.repeat(lab, dim)),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int32), len(b))),
                "v": pa.array(q.reshape(-1)),
            }
        )

    agg = zonal_aggregate(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["mean", "count"],
        keys=["label", "dim"],
        value_col="v",
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": b["label"],
                "dim": b["dim"],
                "centroid_q": b["mean"],
                "n_vecs": b["count"],
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort(["label", "dim"])


def embed_knn(sf_dir: str) -> rd.Dataset:
    from geoglue_ray.stages.similarity import knn_bruteforce

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_bruteforce(ds, query_ids=[0, 1, 2, 3], k=10).sort(["query_id", "rank"])


def embed_knn_lsh(sf_dir: str) -> rd.Dataset:
    """Multi-probe sign-LSH approximate kNN.  Oracle-backed: buckets are
    bit-exact across engines (deterministic Rademacher planes + ordered
    projection chains, stages/similarity.chain_bucket), so the SQL twin
    reproduces the exact candidate set; the final ranking is the
    embed_knn rank-only cosine-order contract."""
    from geoglue_ray.stages.similarity import knn_lsh

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_lsh(ds, query_ids=[0, 1, 2, 3], k=10).sort(["query_id", "rank"])


def embed_knn_ivf(sf_dir: str) -> rd.Dataset:
    """IVF approximate kNN with the FIXED head coarse quantizer (the
    nlist lowest-id vectors), so assignment and probe selection are pure
    cosine orders a SQL twin replicates row-for-row; the k-means-trained
    quantizer stays available as knn_ivf(quantizer="kmeans") (recall
    behaviour tested on clustered corpora in test_training_ops)."""
    from geoglue_ray.stages.similarity import knn_ivf

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_ivf(
        ds, query_ids=[0, 1, 2, 3], k=10, quantizer="head"
    ).sort(["query_id", "rank"])


def embed_ivf_recall(sf_dir: str) -> rd.Dataset:
    """Driver-visible IVF-recall gate (the embed_lsh_recall pattern):
    mean IVF kNN recall vs exact brute force must clear 0.6.  The sf
    embeddings are near-random (no cluster structure), so recall tends
    to nprobe/nlist — the clustered-corpus case where IVF prunes hard
    at high recall is covered in tests/test_training_ops.py."""
    exact = embed_knn(sf_dir).to_pandas()
    approx = embed_knn_ivf(sf_dir).to_pandas()
    qids = sorted(exact["query_id"].unique())
    recalls = []
    for qid in qids:
        e = set(exact.loc[exact["query_id"] == qid, "neighbor_id"])
        a = set(approx.loc[approx["query_id"] == qid, "neighbor_id"])
        recalls.append(len(e & a) / len(e))
    out = pa.table(
        {
            "query_id": pa.array(np.asarray(qids, dtype=np.int64)),
            "recall_ok": pa.array([bool(np.mean(recalls) >= 0.6)] * len(qids)),
        }
    )
    return rd.from_arrow(out).sort("query_id")


def embed_neardup(sf_dir: str) -> rd.Dataset:
    from geoglue_ray.stages.similarity import embedding_neardup

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # sf embeddings are near-random (top cosine ~0.37): 0.3 keeps the
    # output non-empty while still selecting the closest pairs.  nbits
    # pinned to 4 so the SQL twin's projection chains are a fixed set
    # (the corpus-size-derived nbits stays the library default); the
    # cosine column itself is bit-exact (ordered dot/norm chains).
    return embedding_neardup(ds, threshold=0.3, nbits=4).sort(["vec_a", "vec_b"])


def media_explode(sf_dir: str) -> rd.Dataset:
    from geoglue_ray.stages.media import explode_media_spans

    ds = read_corpus(sf_dir, with_spans=True)
    out = ds.map_batches(explode_media_spans, batch_format="pyarrow")
    return out.sort(["doc_id", "span_index"])


def media_features(sf_dir: str) -> rd.Dataset:
    """Full media pipeline (explode -> decode -> featurize) projected to
    its SQL-replicable moments: the stub decode's payload bytes are
    defined by HUGEINT-reproducible arithmetic (stages/media.py
    ``_payload_bytes``), so payload length / byte sum / distinct-byte
    count are recomputed exactly by the DuckDB oracle — the decode AND
    featurizer (histogram) stages are both driver-gated.  The float
    feature vector itself stays engine-side (Gaussian projection, not
    SQL-expressible; determinism pinned in tests)."""
    from geoglue_ray.stages.media import media_pipeline

    ds = read_corpus(sf_dir, with_spans=True)
    out = media_pipeline(ds)

    def summarize(b: pa.Table) -> pa.Table:
        raw = (
            np.frombuffer(b"".join(b["payload"].to_pylist()), dtype=np.uint8).reshape(
                len(b), -1
            )
            if len(b)
            else np.zeros((0, 1), dtype=np.uint8)
        )
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "span_index": b["span_index"],
                "kind": b["kind"],
                "payload_len": pa.array(
                    np.full(len(b), raw.shape[1] if len(b) else 0, dtype=np.int64)
                ),
                "byte_sum": pa.array(raw.sum(axis=1, dtype=np.int64)),
                "n_distinct_bytes": b["n_distinct_bytes"],
            }
        )

    return out.map_batches(summarize, batch_format="pyarrow").sort(["doc_id", "span_index"])


def read_documents_cols(sf_dir: str, cols: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)


class DeriveEventObservations:
    """events table -> geospatial observations keyed by event_id.

    The measure is ``floor(value)`` — integer-valued, so distributed sums
    match the serial SQL oracle exactly (see fixtures module docstring).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        lon, lat = fx.derive_lonlat(ids)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "value": pa.array(np.floor(batch["value"].to_numpy())),
            }
        )


def events_contingency(sf_dir: str) -> pa.Table:
    """Contingency table + chi-square decomposition over (admin unit x
    event type): observed counts, row/col totals, expected counts and
    per-cell chi-square terms — the spatial association analysis.  Counts
    partial-collapse per batch to cell cardinality (admins x types,
    bounded), so the only driver-resident data is the contingency table
    itself; the float chain (exp = rt*ct/tot, term = d*d/exp) is
    elementary-op-identical to the SQL twin."""
    import pandas as pd
    import ray

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    )

    def derive(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow")
    ds = ds.map_batches(encode_cells, batch_format="pyarrow")
    index = AdminIndex.build(build_admin_table())
    ds = spatial_join(ds, index_ref=ray.put(index))

    def partial(b: pa.Table) -> pa.Table:
        a = b["admin_id"].to_numpy(zero_copy_only=False)
        t = b["event_type"].to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return pa.table(
                {
                    "admin_id": pa.array([], pa.string()),
                    "event_type": pa.array([], pa.string()),
                    "obs": pa.array([], pa.int64()),
                }
            )
        ca, ua = pd.factorize(a)
        ct_, ut = pd.factorize(t)
        packed = ca.astype(np.int64) * len(ut) + ct_
        cnt = np.bincount(packed, minlength=len(ua) * len(ut))
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "admin_id": pa.array(ua[nz // len(ut)].astype(object)),
                "event_type": pa.array(ut[nz % len(ut)].astype(object)),
                "obs": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    # partials are (admins x types) x block-count — provably bounded
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby(["admin_id", "event_type"], as_index=False, sort=True)[
        "obs"
    ].sum()
    admin = g["admin_id"].to_numpy()
    typ = g["event_type"].to_numpy()
    obs = g["obs"].to_numpy().astype(np.int64)
    ca, _ = pd.factorize(admin)
    ctc, _ = pd.factorize(typ)
    rt = np.bincount(ca, weights=obs).astype(np.int64)[ca]
    ct2 = np.bincount(ctc, weights=obs).astype(np.int64)[ctc]
    tot = int(obs.sum())
    exp = rt.astype(np.float64) * ct2 / tot
    d = obs - exp
    out = pd.DataFrame(
        {
            "admin_id": admin,
            "event_type": typ,
            "obs": obs,
            "rt": rt,
            "ct": ct2,
            "exp_cnt": exp,
            "chi2_term": d * d / exp,
        }
    ).sort_values(["admin_id", "event_type"])
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def events_lq(sf_dir: str) -> pa.Table:
    """Location quotient per (admin-1, event type) — the regional-
    concentration index (LQ > 1: the type is over-represented in that
    zone relative to its global share): ``(obs/row_total) /
    (col_total/grand_total)``, the events_contingency count machinery
    on the coarser admin-1 key with the two-ratio division chain
    mirrored in SQL.  Counts partial-collapse per batch to (32 x types)
    cardinality before the driver."""
    import pandas as pd
    import ray

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    )

    def derive(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow")
    ds = ds.map_batches(encode_cells, batch_format="pyarrow")
    index = AdminIndex.build(build_admin_table())
    ds = spatial_join(ds, index_ref=ray.put(index))

    def partial(b: pa.Table) -> pa.Table:
        a = b["admin1_id"].to_numpy(zero_copy_only=False)
        t = b["event_type"].to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return pa.table(
                {
                    "admin1_id": pa.array([], pa.string()),
                    "event_type": pa.array([], pa.string()),
                    "obs": pa.array([], pa.int64()),
                }
            )
        ca, ua = pd.factorize(a)
        ct_, ut = pd.factorize(t)
        packed = ca.astype(np.int64) * len(ut) + ct_
        cnt = np.bincount(packed, minlength=len(ua) * len(ut))
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "admin1_id": pa.array(ua[nz // len(ut)].astype(object)),
                "event_type": pa.array(ut[nz % len(ut)].astype(object)),
                "obs": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby(["admin1_id", "event_type"], as_index=False, sort=True)[
        "obs"
    ].sum()
    admin = g["admin1_id"].to_numpy()
    typ = g["event_type"].to_numpy()
    obs = g["obs"].to_numpy().astype(np.int64)
    ca, _ = pd.factorize(admin)
    ctc, _ = pd.factorize(typ)
    rt = np.bincount(ca, weights=obs).astype(np.int64)[ca]
    ct2 = np.bincount(ctc, weights=obs).astype(np.int64)[ctc]
    tot = int(obs.sum())
    lq = (obs.astype(np.float64) / rt.astype(np.float64)) / (
        ct2.astype(np.float64) / np.float64(tot)
    )
    out = pd.DataFrame(
        {
            "admin1_id": admin,
            "event_type": typ,
            "obs": obs,
            "zone_total": rt,
            "type_total": ct2,
            "lq": lq,
        }
    ).sort_values(["admin1_id", "event_type"])
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def od_matrix(sf_dir: str, n_shards: int = 64, n_shards2: int = 32) -> rd.Dataset:
    """Origin-destination flow matrix from per-user event trajectories —
    the movement-analytics aggregate over the admin lattice: every
    consecutive event pair of a user is one trip from the origin's admin
    unit to the destination's; emit trip counts and DISTINCT mover
    counts per (o_admin, d_admin).

    Scale shape: admin assignment streams through the broadcast PIP pool
    (integer ``admin_idx`` hot path, names attached at the end); pairs
    form inside FIXED user-hash shards (all of a user's rows co-locate,
    one lexsort + run pass); per-shard partials are (o, d)-cardinality
    with per-shard distinct-user counts — VALID to sum globally because
    each user lives in exactly one shard — then a second fixed-shard
    merge.  All-integer outputs, bit-exact vs the SQL lag() twin."""
    import pandas as pd
    import ray

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table

    admin_tbl = build_admin_table()
    names = admin_tbl["admin_id"].combine_chunks()
    index_ref = ray.put(AdminIndex.build(admin_tbl))

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def prep(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    ds = ds.map_batches(prep, batch_format="pyarrow")
    ds = ds.map_batches(encode_cells, batch_format="pyarrow")
    ds = spatial_join(ds, index_ref=index_ref, emit_names=False)

    def shard(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        s = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return pa.table(
            {
                "_us": pa.array(s),
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
                "a": pc.cast(b["admin_idx"], pa.int64()),
            }
        )

    _PEMPTY = {
        "_s2": np.array([], dtype=np.int64),
        "o": np.array([], dtype=np.int64),
        "d": np.array([], dtype=np.int64),
        "n_trips": np.array([], dtype=np.int64),
        "n_users": np.array([], dtype=np.int64),
    }

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(_PEMPTY)
        uid = g["user_id"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        a = g["a"].to_numpy()
        o_ = np.lexsort((eid, t, uid))
        uid, a = uid[o_], a[o_]
        same = uid[1:] == uid[:-1]
        if not same.any():
            return pd.DataFrame(_PEMPTY)
        pack = (a[:-1][same] << np.int64(20)) | a[1:][same]
        u = uid[1:][same]
        o2 = np.lexsort((u, pack))
        p2, u2 = pack[o2], u[o2]
        newp = np.r_[True, p2[1:] != p2[:-1]]
        starts = np.flatnonzero(newp)
        trips = np.diff(np.r_[starts, len(p2)]).astype(np.int64)
        newu = newp | np.r_[True, u2[1:] != u2[:-1]]
        users = np.add.reduceat(newu.astype(np.int64), starts)
        pk = p2[starts]
        return pd.DataFrame(
            {
                "_s2": (pk % np.int64(n_shards2)).astype(np.int64),
                "o": pk >> np.int64(20),
                "d": pk & np.int64((1 << 20) - 1),
                "n_trips": trips,
                "n_users": users,
            }
        )

    def merge(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "o_admin": pa.array([], pa.string()),
                    "d_admin": pa.array([], pa.string()),
                    "n_trips": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        pk = (g["o"].to_numpy() << np.int64(20)) | g["d"].to_numpy()
        o_ = np.argsort(pk, kind="stable")
        pk = pk[o_]
        starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
        return pa.table(
            {
                "o_admin": names.take(pa.array((pk >> np.int64(20))[starts])),
                "d_admin": names.take(
                    pa.array((pk & np.int64((1 << 20) - 1))[starts])
                ),
                "n_trips": pa.array(
                    np.add.reduceat(g["n_trips"].to_numpy()[o_], starts)
                ),
                "n_users": pa.array(
                    np.add.reduceat(g["n_users"].to_numpy()[o_], starts)
                ),
            }
        )

    partials = (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("_us")
        .map_groups(pairs, batch_format="pandas")
    )
    return (
        partials.groupby("_s2")
        .map_groups(merge, batch_format="pandas")
        .sort(["o_admin", "d_admin"])
    )


def user_trajectories(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Per-user movement trajectories — each user's events in time order
    with the planar step distance from the previous location (the
    movement-analytics operator over the interleaved corpus).  All of a
    user's rows co-locate on ``hash(user) % n_shards`` (FIXED group
    count); one lexsort + run-detection pass per shard computes sequence
    numbers and consecutive diffs.  ``step = sqrt(dx*dx + dy*dy)`` — the
    explicit chain, never np.hypot (CLAUDE.md): subtract, two multiplies,
    add, correctly-rounded sqrt, all mirrored by the SQL window twin;
    NaN on each user's first event (SQL NULL lag)."""
    import pandas as pd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "_us": pa.array(shard),
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    def steps(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "seq": pa.array([], pa.int64()),
                    "step_dist": pa.array([], pa.float64()),
                }
            )
        uid = g["user_id"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        o = np.lexsort((eid, t, uid))
        uid, eid, lon, lat = uid[o], eid[o], lon[o], lat[o]
        first = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(first)
        run = np.cumsum(first) - 1
        seq = np.arange(len(uid), dtype=np.int64) - starts[run] + 1
        step = np.full(len(uid), np.nan)
        dx = lon[1:] - lon[:-1]
        dy = lat[1:] - lat[:-1]
        step[1:] = np.sqrt(dx * dx + dy * dy)
        step[first] = np.nan
        return pa.table(
            {
                "user_id": pa.array(uid),
                "event_id": pa.array(eid),
                "seq": pa.array(seq),
                "step_dist": pa.array(step),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_us")
        .map_groups(steps, batch_format="pandas")
        .sort(["user_id", "seq"])
    )


def events_nn(sf_dir: str) -> rd.Dataset:
    """Bounded-radius nearest-neighbour join among observation points —
    each event's closest other event within 1/16 deg (planar, ties to
    the smallest id), NULL when isolated (stages/spatial.radius_nn_join:
    grid-bucket co-shuffle at cell size == radius, 3x3 ring candidates,
    vectorized per-cell distance blocks).  The point x point spatial
    join; bit-exact vs the SQL self-join twin."""
    from geoglue_ray.stages.spatial import radius_nn_join

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def derive(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {"event_id": b["event_id"], "lon": pa.array(lon), "lat": pa.array(lat)}
        )

    ds = ds.map_batches(derive, batch_format="pyarrow")
    return radius_nn_join(ds, radius=0.0625, id_col="event_id").sort("event_id")


def events_knn(sf_dir: str) -> rd.Dataset:
    """k-nearest-neighbours-within-radius self-join (k=3) among the
    observation points — each event's up-to-3 closest other events
    within 1/16 deg, ranked by (distance, neighbour id)
    (stages/spatial.radius_knn_join: the radius_nn_join ring-bucket
    co-shuffle with a stable per-cell top-k instead of argmin).  The
    k>1 generalization of events_nn; bit-exact vs the window-rank SQL
    twin."""
    from geoglue_ray.stages.spatial import radius_knn_join

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def derive(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {"event_id": b["event_id"], "lon": pa.array(lon), "lat": pa.array(lat)}
        )

    ds = ds.map_batches(derive, batch_format="pyarrow")
    return radius_knn_join(ds, radius=0.0625, k=3, id_col="event_id").sort(
        ["event_id", "rank"]
    )


def events_triangles(sf_dir: str) -> rd.Dataset:
    """Per-node triangle count, degree and local clustering coefficient
    over the in-radius proximity graph among the observation points
    (stages/spatial.triangle_stats: radius_edges ring-bucket edge list,
    wedge generation at the smallest endpoint, one co-shuffled closure
    join on the packed (v, w) key, fixed-shard count merges, two
    hash_equijoin(left) attaches).  The distributed node-iterator
    triangle enumeration; clustering = 2*T/(deg*(deg-1)) is a single
    division of exact int64s — bit-exact vs the triple self-join SQL
    twin."""
    from geoglue_ray.stages.spatial import triangle_stats

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def derive(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {"event_id": b["event_id"], "lon": pa.array(lon), "lat": pa.array(lat)}
        )

    ds = ds.map_batches(derive, batch_format="pyarrow")
    # radius 1/32 (not the events_nn 1/16): wedge cost is sum C(deg, 2)
    # and the SQL triple-join twin is quartic-ish in density — 1/32 keeps
    # the sf0.01 driver check inside single-digit seconds on both sides
    return triangle_stats(ds, radius=0.03125, id_col="event_id").sort("event_id")


def events_g(sf_dir: str) -> pa.Table:
    """Nearest-neighbour distance distribution (Ripley's G function) at
    four dyadic radii — the third classic point-pattern summary next to
    K (events_ripley) and the quadrat test: ``G(r) = fraction of points
    whose NN distance <= r`` (NN bounded at 1/16 deg = max radius, so
    the ring pass stays exact; isolated points count in the denominator
    only).  A composition: radius_nn_join -> per-batch threshold counts
    -> a bounded driver sum; integer counts and single divisions
    mirrored against the events_nn SQL construction."""
    from geoglue_ray.stages.spatial import radius_nn_join

    radii = (1 / 64, 2 / 64, 3 / 64, 4 / 64)
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def derive(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {"event_id": b["event_id"], "lon": pa.array(lon), "lat": pa.array(lat)}
        )

    nn = radius_nn_join(
        ds.map_batches(derive, batch_format="pyarrow"),
        radius=0.0625,
        id_col="event_id",
    )

    def partial(b: pa.Table) -> pa.Table:
        d = b["nn_dist"].to_numpy(zero_copy_only=False)
        cnt = np.array(
            [int((d <= r).sum()) for r in radii] + [len(d)], dtype=np.int64
        )  # NaN (isolated) compares False; total counts every point
        return pa.table(
            {
                "ri": pa.array(np.arange(len(radii) + 1, dtype=np.int64)),
                "cnt": pa.array(cnt),
            }
        )

    rows = nn.map_batches(partial, batch_format="pyarrow").take_all()
    acc = np.zeros(len(radii) + 1, dtype=np.int64)
    for r in rows:
        acc[int(r["ri"])] += int(r["cnt"])
    n = acc[-1]
    return pa.table(
        {
            "radius": pa.array(np.array(radii)),
            "n_le": pa.array(acc[: len(radii)]),
            "n_points": pa.array(np.full(len(radii), n, dtype=np.int64)),
            "g_est": pa.array(
                acc[: len(radii)].astype(np.float64) / np.float64(n)
            ),
        }
    )


def colocation_quotient(sf_dir: str) -> rd.Dataset:
    """Colocation quotient (CLQ, Leslie & Kronenfeld) over event types —
    which categories cluster NEAR each other: for every event with an
    in-radius nearest neighbour, tally (own type -> neighbour type)
    pairs and normalize by the types' global shares,
    ``CLQ = (C_ab/n_a) / (n_b'/(N-1))`` with ``n_b' = n_b - 1`` on the
    diagonal.  Composition of three engine operators: the grid-bucket
    radius NN join, TWO co-shuffled hash equijoins attaching own and
    neighbour types (type lookups are corpus-sized — never broadcast),
    and the bounded (|types|^2) aggregate.  Integer counts + a
    three-division chain mirrored by the SQL twin."""
    import pandas as pd

    from geoglue_ray.stages.join import hash_equijoin
    from geoglue_ray.stages.spatial import radius_nn_join

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    )
    tc = zonal_aggregate(
        ev, ["count"], keys=["event_type"], value_col="event_id"
    ).to_pandas()  # |types| rows, bounded
    n_by = dict(zip(tc["event_type"], tc["count"].astype(np.int64)))
    n_total = int(sum(n_by.values()))

    def derive(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {"event_id": b["event_id"], "lon": pa.array(lon), "lat": pa.array(lat)}
        )

    nn = radius_nn_join(
        ev.select_columns(["event_id"]).map_batches(derive, batch_format="pyarrow"),
        radius=0.0625,
    )

    def keep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["nn_id"]))
        return b.select(["event_id", "nn_id"])

    nn = nn.map_batches(keep, batch_format="pyarrow")

    def t_a(b: pa.Table) -> pa.Table:
        return pa.table({"eid_a": b["event_id"], "type_a": b["event_type"]})

    def t_b(b: pa.Table) -> pa.Table:
        return pa.table({"eid_b": b["event_id"], "type_b": b["event_type"]})

    j = hash_equijoin(nn, ev.map_batches(t_a, batch_format="pyarrow"), "event_id", "eid_a")
    j = hash_equijoin(j, ev.map_batches(t_b, batch_format="pyarrow"), "nn_id", "eid_b")
    c = zonal_aggregate(j, ["count"], keys=["type_a", "type_b"], value_col="nn_id")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        na = df["type_a"].map(n_by).to_numpy().astype(np.float64)
        nb = df["type_b"].map(n_by).to_numpy().astype(np.int64)
        nbp = (nb - (df["type_a"] == df["type_b"]).to_numpy()).astype(np.float64)
        cnt = df["count"].to_numpy()
        return pd.DataFrame(
            {
                "type_a": df["type_a"],
                "type_b": df["type_b"],
                "n_pairs": cnt.astype(np.int64),
                "clq": (cnt / na) / (nbp / np.float64(n_total - 1)),
            }
        )

    return c.map_batches(final, batch_format="pandas").sort(["type_a", "type_b"])


def cell_nearest_event(sf_dir: str) -> rd.Dataset:
    """Distance to the nearest event per raster cell (bounded radius
    0.25 deg) — the distance-to-nearest-facility surface: the two-table
    grid-bucket NN lookup (stages/spatial.radius_nn_lookup) with cell
    centers as queries and the event corpus as candidates; NULL for
    cells with no event in range.  The radius_nn_join exactness chain;
    bit-exact vs the SQL pre-filtered self-join twin."""
    from geoglue_ray.sources.raster import RINC, RXFIRST, RXSIZE, RYFIRST, RYSIZE
    from geoglue_ray.stages.spatial import radius_nn_lookup

    rr, cc = np.meshgrid(np.arange(RYSIZE), np.arange(RXSIZE), indexing="ij")
    rr, cc = rr.ravel(), cc.ravel()
    cells = rd.from_arrow(
        pa.table(
            {
                "q_id": pa.array(rr * RXSIZE + cc),
                "lon": pa.array(RXFIRST + cc * RINC),
                "lat": pa.array(RYFIRST - rr * RINC),
            }
        )
    )
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def derive(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {"c_id": b["event_id"], "lon": pa.array(lon), "lat": pa.array(lat)}
        )

    nn = radius_nn_lookup(
        cells,
        ev.map_batches(derive, batch_format="pyarrow"),
        radius=0.25,
        q_id="q_id",
        c_id="c_id",
    )

    def project(b: pa.Table) -> pa.Table:
        q = b["q_id"].to_numpy()
        return pa.table(
            {
                "cell_row": pa.array(q // RXSIZE),
                "cell_col": pa.array(q % RXSIZE),
                "nn_event": b["nn_id"],
                "nn_dist": b["nn_dist"],
            }
        )

    return nn.map_batches(project, batch_format="pyarrow").sort(
        ["cell_row", "cell_col"]
    )


def events_dbscan(sf_dir: str) -> rd.Dataset:
    """Density-based clustering (deterministic DBSCAN, eps = 1/16 deg,
    min_pts = 2) of the diffuse observation points — core/border/noise
    roles and min-core-id cluster labels (stages/spatial.dbscan:
    grid-bucket neighbour counts, once-emitted core edges, distributed
    min-label CC, nearest-core border attachment).  The dense city blob
    (id % 10 < 3) is excluded by id arithmetic — its one percolated
    component costs the SQL twin an O(size^2) recursive closure; the
    diffuse subset yields 1108 small clusters / 824 borders / 3602 noise
    points at sf0.01.  Bit-exact vs the recursive-CTE twin."""
    from geoglue_ray.stages.spatial import dbscan

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def derive(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        keep = (ids % 128 == 0) | (ids % 10 >= 3)
        ids = ids[keep]
        lon, lat = fx.derive_lonlat(ids)
        return pa.table(
            {"event_id": pa.array(ids), "lon": pa.array(lon), "lat": pa.array(lat)}
        )

    ds = ds.map_batches(derive, batch_format="pyarrow")
    return dbscan(ds, eps=0.0625, min_pts=2).sort("event_id")


def user_stops(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Trajectory stop detection (stay-points): per user, maximal runs of
    CONSECUTIVE events whose step distance stays within 3/8 deg, kept
    when the run has >= 3 points — the movement-analytics "dwell"
    operator downstream of user_trajectories.  Gaps-and-islands on the
    (ts, event_id) total order: user-hash co-location, one lexsort +
    boundary cumsum + reduceat pass per shard.  Exactness: the step test
    compares SQUARED distance to the dyadic 9/64 (no sqrt); stop
    centroids go through the exact integer lattice (every fixture lon/lat
    is a multiple of 2^-21, so lon*2^21 is an exact int64, summed then
    divided once) — all mirrored by the SQL window twin."""
    import pandas as pd

    R2 = 0.140625  # (3/8)^2, exact dyadic
    SCALE = 2097152.0  # 2^21: every fixture coordinate is a multiple of 2^-21

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "_us": pa.array(shard),
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    def stops(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "stop_id": pa.array([], pa.int64()),
                "n_points": pa.array([], pa.int64()),
                "t_start": pa.array([], pa.timestamp("us")),
                "t_end": pa.array([], pa.timestamp("us")),
                "dwell_us": pa.array([], pa.int64()),
                "centroid_lon": pa.array([], pa.float64()),
                "centroid_lat": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        uid = g["user_id"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        o = np.lexsort((eid, t, uid))
        uid, lon, lat, t = uid[o], lon[o], lat[o], t[o]
        first = np.r_[True, uid[1:] != uid[:-1]]
        step2 = np.zeros(len(uid))
        dx = lon[1:] - lon[:-1]
        dy = lat[1:] - lat[:-1]
        step2[1:] = dx * dx + dy * dy
        brk = first | (step2 > R2)
        sid = np.cumsum(brk)  # global island counter within the shard
        ustarts = np.flatnonzero(first)
        urun = np.cumsum(first) - 1
        stop_id = sid - sid[ustarts[urun]] + 1  # per-user 1-based numbering
        bs = np.flatnonzero(brk)
        be = np.r_[bs[1:], len(uid)]
        npts = be - bs
        ulon = (lon * SCALE).astype(np.int64)  # exact lattice units
        ulat = (lat * SCALE).astype(np.int64)
        su = np.add.reduceat(ulon, bs)
        sv = np.add.reduceat(ulat, bs)
        keep = npts >= 3
        if not keep.any():
            return empty
        nk = npts[keep].astype(np.float64)
        return pa.table(
            {
                "user_id": pa.array(uid[bs][keep]),
                "stop_id": pa.array(stop_id[bs][keep]),
                "n_points": pa.array(npts[keep].astype(np.int64)),
                "t_start": pa.array(t[bs][keep].astype("datetime64[us]")),
                "t_end": pa.array(t[be - 1][keep].astype("datetime64[us]")),
                "dwell_us": pa.array(t[be - 1][keep] - t[bs][keep]),
                "centroid_lon": pa.array(su[keep].astype(np.float64) / nk / SCALE),
                "centroid_lat": pa.array(sv[keep].astype(np.float64) / nk / SCALE),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_us")
        .map_groups(stops, batch_format="pandas")
        .sort(["user_id", "stop_id"])
    )


def trajectory_hausdorff(sf_dir: str, n_shards: int = 32) -> rd.Dataset:
    """Discrete Hausdorff distance (squared, planar) between each of the
    4 lowest-id users' trajectories and EVERY other user's — the
    trajectory-similarity operator of movement analytics.  Scale shape =
    knn_bruteforce's broadcast-vs-stream: the bounded query trajectories
    ship once via ray.put, the corpus streams through one map_batches
    (per batch: one (Q_pts x B) distance block per query user; the
    A->B direction emits per-(query-point, user) partial MINs, the B->A
    direction per-user partial MAXes of in-batch-complete minima), and a
    fixed-shard merge on hash(other_user) resolves both directions —
    shuffle payload is (query-traj size + 1) x user cardinality, never
    the corpus.  min/max of bit-exact single-op d2 chains are
    order-free, so the SQL twin matches bit-for-bit."""
    import pandas as pd
    import ray

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])

    def derive(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    pts = ds.map_batches(derive, batch_format="pyarrow")

    # user-cardinality distinct scan -> the 4 smallest ids (deterministic)
    def uniq_users(b: pa.Table) -> pa.Table:
        return pa.table({"u": pa.array(np.unique(b["user_id"].to_numpy()))})

    users = np.unique(
        np.concatenate(
            [
                b["u"].to_numpy()
                for b in pts.map_batches(uniq_users, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")
            ]
        )
    )
    qset = users[:4].astype(np.int64)

    qrows = pts.map_batches(
        lambda b: b.filter(
            pa.compute.is_in(b["user_id"], value_set=pa.array(qset))
        ),
        batch_format="pyarrow",
    ).take_all()
    qtraj = {}
    for r in qrows:
        qtraj.setdefault(int(r["user_id"]), []).append((r["lon"], r["lat"]))
    qref = ray.put(
        {
            int(u): (
                np.array([p[0] for p in v]),
                np.array([p[1] for p in v]),
            )
            for u, v in qtraj.items()
        }
    )

    def partials(b: pa.Table, *, ref=qref) -> pa.Table:
        empty = pa.table(
            {
                "_s": pa.array([], pa.int64()),
                "_t": pa.array([], pa.int8()),
                "qu": pa.array([], pa.int64()),
                "qp": pa.array([], pa.int64()),
                "cu": pa.array([], pa.int64()),
                "v": pa.array([], pa.float64()),
            }
        )
        if len(b) == 0:
            return empty
        q = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        cu = b["user_id"].to_numpy().astype(np.int64)
        lon = b["lon"].to_numpy()
        lat = b["lat"].to_numpy()
        o = np.argsort(cu, kind="stable")
        cu, lon, lat = cu[o], lon[o], lat[o]
        out = {k: [] for k in ("_t", "qu", "qp", "cu", "v")}
        for uq, (qlon, qlat) in q.items():
            keep = cu != uq  # a trajectory is not compared with itself
            if not keep.any():
                continue
            klon, klat, kcu = lon[keep], lat[keep], cu[keep]
            kstarts = np.flatnonzero(np.r_[True, kcu[1:] != kcu[:-1]])
            dx = qlon[:, None] - klon[None, :]
            dy = qlat[:, None] - klat[None, :]
            d2 = dx * dx + dy * dy
            # A->B: per (query point, corpus user) min over this batch
            mins = np.minimum.reduceat(d2, kstarts, axis=1)  # (Qp, U)
            nq, nu = mins.shape
            out["_t"].append(np.zeros(nq * nu, np.int8))
            out["qu"].append(np.full(nq * nu, uq, np.int64))
            out["qp"].append(np.repeat(np.arange(nq, dtype=np.int64), nu))
            out["cu"].append(np.tile(kcu[kstarts], nq))
            out["v"].append(mins.reshape(-1))
            # B->A: per corpus point the min over ALL query points is
            # complete within the batch; emit per-user partial max
            minb = d2.min(axis=0)
            maxs = np.maximum.reduceat(minb, kstarts)
            out["_t"].append(np.ones(len(kstarts), np.int8))
            out["qu"].append(np.full(len(kstarts), uq, np.int64))
            out["qp"].append(np.full(len(kstarts), -1, np.int64))
            out["cu"].append(kcu[kstarts])
            out["v"].append(maxs)
        if not out["_t"]:
            return empty
        cu_all = np.concatenate(out["cu"])
        shard = (
            (cu_all.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_s": pa.array(shard),
                "_t": pa.array(np.concatenate(out["_t"])),
                "qu": pa.array(np.concatenate(out["qu"])),
                "qp": pa.array(np.concatenate(out["qp"])),
                "cu": pa.array(cu_all),
                "v": pa.array(np.concatenate(out["v"])),
            }
        )

    def merge(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "query_user": pa.array([], pa.int64()),
                "other_user": pa.array([], pa.int64()),
                "hausdorff_d2": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        t = g["_t"].to_numpy().astype(np.int8)
        qu = g["qu"].to_numpy().astype(np.int64)
        qp = g["qp"].to_numpy().astype(np.int64)
        cu = g["cu"].to_numpy().astype(np.int64)
        v = g["v"].to_numpy()
        # A->B: min per (qu, cu, qp) across batches, then max per (qu, cu)
        a = t == 0
        key_full = np.lexsort((qp[a], cu[a], qu[a]))
        aq, ac, ap, av = qu[a][key_full], cu[a][key_full], qp[a][key_full], v[a][key_full]
        brk = np.r_[True, (aq[1:] != aq[:-1]) | (ac[1:] != ac[:-1]) | (ap[1:] != ap[:-1])]
        st = np.flatnonzero(brk)
        mn = np.minimum.reduceat(av, st)
        gq, gc = aq[st], ac[st]
        brk2 = np.r_[True, (gq[1:] != gq[:-1]) | (gc[1:] != gc[:-1])]
        st2 = np.flatnonzero(brk2)
        h1 = np.maximum.reduceat(mn, st2)
        pq, pc = gq[st2], gc[st2]
        # B->A: max per (qu, cu)
        bsel = ~a
        o2 = np.lexsort((cu[bsel], qu[bsel]))
        bq, bc, bv = qu[bsel][o2], cu[bsel][o2], v[bsel][o2]
        brk3 = np.r_[True, (bq[1:] != bq[:-1]) | (bc[1:] != bc[:-1])]
        st3 = np.flatnonzero(brk3)
        h2 = np.maximum.reduceat(bv, st3)
        # the two directions cover the same (qu, cu) set within a shard
        assert len(st2) == len(st3) and np.array_equal(pq, bq[st3]) and np.array_equal(pc, bc[st3])
        return pa.table(
            {
                "query_user": pa.array(pq),
                "other_user": pa.array(pc),
                "hausdorff_d2": pa.array(np.maximum(h1, h2)),
            }
        )

    return (
        pts.map_batches(partials, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(merge, batch_format="pandas")
        .sort(["query_user", "other_user"])
    )


def _scaled_coords(b: pa.Table, key: str) -> pa.Table:
    """(key, ix, iy) with ix = (lon-102)*2^20, iy = (lat-8)*2^20 — exact
    integers because fixture coordinates are dyadic on a >= 2^-20 grid
    (fixtures.derive_lonlat; the 102/8 shifts are exact)."""
    ids = b["event_id"].to_numpy()
    lon, lat = fx.derive_lonlat(ids)
    return pa.table(
        {
            key: b[key],
            "ix": pa.array(((lon - 102.0) * 1048576.0).astype(np.int64)),
            "iy": pa.array(((lat - 8.0) * 1048576.0).astype(np.int64)),
        }
    )


def user_gyration(sf_dir: str) -> rd.Dataset:
    """Radius of gyration + mean center per user over their event
    locations — the canonical human-mobility dispersion statistic
    (rog = sqrt of the mean squared distance to the centroid =
    sqrt(var_x + var_y)); stages/sketch.dispersion_stats over exact
    integer-scaled coordinates, bit-exact vs the SQL sum twin."""
    from geoglue_ray.stages.sketch import dispersion_stats

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])
    ds = ds.map_batches(lambda b: _scaled_coords(b, "user_id"), batch_format="pyarrow")
    return dispersion_stats(ds, "user_id", "ix", "iy").sort("user_id")


def events_sde(sf_dir: str) -> rd.Dataset:
    """Standard-deviational-ellipse second moments + mean center per
    event type — the ArcGIS "directional distribution" operator (is one
    event type's footprint stretched along an axis?): population var_x /
    var_y / cov_xy in degrees^2 via the same exact integer-scaled sums
    as user_gyration (orientation angle deliberately absent — atan2
    doesn't reproduce across engines)."""
    from geoglue_ray.stages.sketch import dispersion_stats

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    )
    ds = ds.map_batches(
        lambda b: _scaled_coords(b, "event_type"), batch_format="pyarrow"
    )
    return dispersion_stats(ds, "event_type", "ix", "iy").sort("event_type")


def events_benford(sf_dir: str) -> pa.Table:
    """Benford leading-digit conformance test over the positive event
    values — the fraud/data-quality screen: observed counts per leading
    digit 1-9 (pure integer arithmetic: repeated //10), expected
    ``n * log10(1 + 1/d)`` and per-digit chi-square terms.  The Benford
    probabilities enter BOTH engines as the same Python-computed double
    literals (the oracle is built in Python), so the float chain is
    mirrored exactly.  Per-batch 9-bin partials -> driver sum."""
    import math

    def partial(b: pa.Table) -> pa.Table:
        # cents-integer view: value is a 2-decimal measure; *100 lands
        # within ~1e-10 of an integer, so round-to-nearest matches
        # DuckDB's CAST(value*100 AS BIGINT) exactly (never a .5 tie),
        # and scaling by 100 preserves the leading digit
        vf = b["value"].to_numpy(zero_copy_only=False)
        v = np.round(vf[vf > 0] * 100.0).astype(np.int64)
        d = v.copy()
        for _ in range(6):  # cents < 10^7: six shifts reach 1 digit
            d = np.where(d >= 10, d // 10, d)
        cnt = np.bincount(d, minlength=10)[1:10].astype(np.int64)
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                "cnt": pa.array(cnt),
            }
        )

    rows = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )  # bounded: 9 rows per block
    obs = np.zeros(9, dtype=np.int64)
    for r in rows:
        obs[int(r["digit"]) - 1] += int(r["cnt"])
    n = int(obs.sum())
    p = np.array([math.log10(1.0 + 1.0 / d) for d in range(1, 10)])
    exp = np.float64(n) * p
    diff = obs.astype(np.float64) - exp
    return pa.table(
        {
            "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
            "obs": pa.array(obs),
            "expected": pa.array(exp),
            "chi2_term": pa.array(diff * diff / exp),
        }
    )


def events_quadrat(sf_dir: str) -> pa.Table:
    """Quadrat-count test for complete spatial randomness over the
    in-bbox events — the classic point-pattern first test: counts per
    half-degree quadrat (the FULL 16x32 grid including empties), sample
    variance-mean ratio and the chi-square index of dispersion
    ``(Q-1) * VMR`` (VMR >> 1 = clustered).  Per-batch bincount partials
    collapse to the 512-quadrat cardinality before the driver sees
    anything (the ripley_k bounded-result shape); cleared-denominator
    integer variance, so the SQL zero-filled-grid twin is bit-exact."""
    NQX, NQY = 16, 32
    Q = NQX * NQY

    def partial(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        ok = (lon >= 102.0) & (lon < 110.0) & (lat >= 8.0) & (lat < 24.0)
        qx = np.floor((lon[ok] - 102.0) / 0.5).astype(np.int64)
        qy = np.floor((lat[ok] - 8.0) / 0.5).astype(np.int64)
        cnt = np.bincount(qy * NQX + qx, minlength=Q).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"q": pa.array(nz), "cnt": pa.array(cnt[nz])})

    rows = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )  # bounded: <= 512 rows per input block, merged here
    cnt = np.zeros(Q, dtype=np.int64)
    for r in rows:
        cnt[int(r["q"])] += int(r["cnt"])
    s = int(cnt.sum())
    ss = int((cnt * cnt).sum())
    mean = np.float64(s) / np.float64(Q)
    var = np.float64(Q * ss - s * s) / np.float64(Q * (Q - 1))
    vmr = var / mean
    return pa.table(
        {
            "n_events": pa.array([np.int64(s)]),
            "n_quadrats": pa.array([np.int64(Q)]),
            "max_count": pa.array([np.int64(cnt.max())]),
            "mean_count": pa.array([mean]),
            "var_count": pa.array([var]),
            "vmr": pa.array([vmr]),
            "chi2": pa.array([np.float64(Q - 1) * vmr]),
        }
    )


def events_knox(sf_dir: str) -> pa.Table:
    """Knox space-time interaction test over the observation points —
    do spatially close events also cluster in time (the epidemiological
    outbreak-detection statistic): exact counts of unordered pairs close
    in space (d <= 1/32 deg), close in time (|dt| <= 2 h), and both,
    with the expected both-count under independence and the Knox ratio
    (stages/spatial.knox_counts: grid-bucket + time-bucket exactly-once
    pair counting, integer partials, two single divisions).  Bit-exact
    vs the SQL self-join twin."""
    from geoglue_ray.stages.spatial import knox_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def derive(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        lon, lat = fx.derive_lonlat(ids)
        return pa.table(
            {
                "event_id": b["event_id"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "ts_us": pa.array(b["ts"].to_numpy().astype(np.int64)),
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow")
    return knox_counts(ds, eps=0.03125, tau_us=2 * 3_600_000_000)


def events_mantel(sf_dir: str) -> pa.Table:
    """Mantel-type space-time interaction statistic — the continuous
    companion of events_knox: mean |dt| (seconds) among spatially close
    pairs (d <= 1/32 deg) vs mean |dt| over ALL pairs, ratio < 1 =
    interaction (stages/spatial.mantel_counts: the knox grid-bucket
    pass with an int64 |dt| accumulator + an hour-bucket rank-identity
    pass that never enumerates the C(n,2) pairs).  Bit-exact vs the SQL
    box-self-join + window rank-identity twin."""
    from geoglue_ray.stages.spatial import mantel_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def derive(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        lon, lat = fx.derive_lonlat(ids)
        return pa.table(
            {
                "event_id": b["event_id"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "ts_us": pa.array(b["ts"].to_numpy().astype(np.int64)),
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow")
    return mantel_counts(ds, eps=0.03125)


def events_ripley(sf_dir: str) -> pa.Table:
    """Ripley's K / L point-pattern statistics of the in-bbox events at
    four dyadic radii (naive estimator, no edge correction) — clustered
    vs dispersed detection (stages/spatial.ripley_k: the radius_nn_join
    grid-bucket ring co-shuffle counting all radii per vectorized cell
    block; integer pair counts, single-op K and L chains)."""
    from geoglue_ray.stages.spatial import ripley_k

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def derive(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        ok = (lon >= 102.0) & (lon < 110.0) & (lat >= 8.0) & (lat < 24.0)
        return pa.table(
            {
                "event_id": b["event_id"].filter(pa.array(ok)),
                "lon": pa.array(lon[ok]),
                "lat": pa.array(lat[ok]),
            }
        )

    return ripley_k(
        ds.map_batches(derive, batch_format="pyarrow"), area=128.0
    )


def events_cross_k(sf_dir: str) -> pa.Table:
    """Bivariate Ripley cross-K / cross-L between purchase and view
    events (in-bbox) at four dyadic radii — are purchases clustered
    around views beyond density (stages/spatial.cross_k: the ripley_k
    ring co-shuffle counting ordered A->B pairs once from the A point's
    own cell)?  Integer pair counts, single-division K — bit-exact vs
    the SQL prefiltered A-x-B join twin."""
    from geoglue_ray.stages.spatial import cross_k

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    )

    def derive(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        ok = (lon >= 102.0) & (lon < 110.0) & (lat >= 8.0) & (lat < 24.0)
        return pa.table(
            {
                "event_id": b["event_id"].filter(pa.array(ok)),
                "event_type": b["event_type"].filter(pa.array(ok)),
                "lon": pa.array(lon[ok]),
                "lat": pa.array(lat[ok]),
            }
        )

    return cross_k(
        ds.map_batches(derive, batch_format="pyarrow"),
        type_col="event_type",
        type_a="purchase",
        type_b="view",
        area=128.0,
    )


def events_ripley_env(sf_dir: str, n_sims: int = 8) -> pa.Table:
    """Ripley K with a complete-spatial-randomness SIMULATION ENVELOPE —
    the publication-grade point-pattern test: observed K per radius
    (salted stages/spatial.ripley_k) against the min/max K of ``n_sims``
    deterministic CSR patterns of the SAME point count, all simulated
    patterns resolved in ONE extra co-shuffle (stages/spatial.
    ripley_multi keys the ring pass on (pattern, cell)).  Simulated
    coordinates are odd-numerator dyadic fractions from the STRONG
    kmv_hash64 mixer over (sim, event_id) — the light Lehmer map is
    linear mod 2^17, making every simulation a translate of one pattern
    (measured: degenerate k_lo == k_hi envelope) — and the mixer has an
    exact HUGEINT SQL twin; K chains and envelope min/max are
    mirrored single ops.  ``inside_env`` false = CSR rejected at that
    radius."""
    from geoglue_ray.functions.texthash import kmv_hash64
    from geoglue_ray.stages.spatial import ripley_multi

    radii = (1 / 64, 2 / 64, 3 / 64, 4 / 64)
    obs = events_ripley(sf_dir).to_pandas()

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def simulate(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy().astype(np.int64)
        lon, lat = fx.derive_lonlat(ids)
        ok = (lon >= 102.0) & (lon < 110.0) & (lat >= 8.0) & (lat < 24.0)
        ids = ids[ok]
        parts = []
        for s in range(n_sims):
            h = kmv_hash64(np.int64(s) * np.int64(1 << 32) + ids)
            h1 = (h & np.uint64(131071)).astype(np.int64)
            h2 = ((h >> np.uint64(17)) & np.uint64(32767)).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        "event_id": pa.array(ids),
                        "pattern": pa.array(np.full(len(ids), s, dtype=np.int64)),
                        "lon": pa.array(
                            102.0 + (2.0 * h1.astype(np.float64) + 1.0)
                            * (8.0 / 262144.0)
                        ),
                        "lat": pa.array(
                            8.0 + (2.0 * h2.astype(np.float64) + 1.0)
                            * (16.0 / 65536.0)
                        ),
                    }
                )
            )
        return pa.concat_tables(parts)

    sims = ripley_multi(
        ds.map_batches(simulate, batch_format="pyarrow"),
        pattern_col="pattern",
        radii=radii,
        area=128.0,
    ).to_pandas()
    n = int(sims["n_points"].iloc[0]) if len(sims) else 0
    nf = np.float64(n * (n - 1))
    sims["k_sim"] = (128.0 * sims["n_pairs"].astype(np.float64)) / nf
    env = sims.groupby("radius")["k_sim"].agg(["min", "max"])
    k_obs = obs["k_est"].to_numpy()
    k_lo = env["min"].to_numpy()
    k_hi = env["max"].to_numpy()
    return pa.table(
        {
            "radius": pa.array(np.array(radii)),
            "n_pairs": pa.array(obs["n_pairs"].to_numpy().astype(np.int64)),
            "k_obs": pa.array(k_obs),
            "k_lo": pa.array(k_lo),
            "k_hi": pa.array(k_hi),
            "inside_env": pa.array((k_lo <= k_obs) & (k_obs <= k_hi)),
        }
    )


def events_density(sf_dir: str) -> rd.Dataset:
    """Smoothed point-density surface — events binned to the ERA5 grid
    (edge-aligned floor bins, exact dyadic arithmetic), zero-filled to
    the full lattice, then 3x3 focal sum/mean smoothing via the stencil
    operator: the KDE-style heatmap as a composition of partial-collapse
    binning (shuffle payload = grid cardinality, never event count) and
    the halo-exchange stencil.  Bit-exact vs the SQL twin (integer
    counts, single-division mean)."""
    from geoglue_ray.sources.raster import RXSIZE, RYSIZE
    from geoglue_ray.stages.stencil import focal_stats

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def bin_counts(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        r = np.floor((24.0625 - lat) / 0.25).astype(np.int64)
        c = np.floor((lon - 102.0) / 0.25).astype(np.int64)
        ok = (r >= 0) & (r < RYSIZE) & (c >= 0) & (c < RXSIZE)
        packed = r[ok] * RXSIZE + c[ok]
        cnt = np.bincount(packed, minlength=RYSIZE * RXSIZE)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "r": pa.array(nz // RXSIZE),
                "c": pa.array(nz % RXSIZE),
                "cnt": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    # partials are grid-cardinality rows per block — provably bounded
    parts = ds.map_batches(bin_counts, batch_format="pyarrow").take_all()
    grid = np.zeros(RYSIZE * RXSIZE, dtype=np.int64)
    for row in parts:
        grid[int(row["r"]) * RXSIZE + int(row["c"])] += int(row["cnt"])
    rr, cc = np.divmod(np.arange(RYSIZE * RXSIZE, dtype=np.int64), RXSIZE)
    dense = pa.table(
        {
            "valid_time": pa.array(
                np.full(len(rr), np.datetime64(fx.T0, "us")), pa.timestamp("us")
            ),
            "cell_row": pa.array(rr),
            "cell_col": pa.array(cc),
            "variable": pa.array(np.repeat("density", len(rr))),
            "value": pa.array(grid.astype(np.float64)),
        }
    )
    out = focal_stats(
        rd.from_arrow(dense), ops=("sum", "mean"), variable="density"
    )
    return out.select_columns(
        ["cell_row", "cell_col", "n_nb", "focal_sum", "focal_mean"]
    ).sort(["cell_row", "cell_col"])


def events_zonal(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    ds = ds.map_batches(DeriveEventObservations(), batch_format="pyarrow")
    ds = ds.map_batches(encode_cells, batch_format="pyarrow")
    import ray

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table

    index = AdminIndex.build(build_admin_table())
    ds = spatial_join(ds, index_ref=ray.put(index))
    out = zonal_aggregate(ds, ["count", "sum", "min", "max"], keys=["admin_id"])

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "admin_id": b["admin_id"],
                "count": b["count"],
                "sum_val": b["sum"],
                "min_val": b["min"],
                "max_val": b["max"],
            }
        )

    return out.map_batches(rename, batch_format="pyarrow").sort("admin_id")


def dasymetric_events(sf_dir: str) -> rd.Dataset:
    """Dasymetric areal interpolation — the population-downscaling move
    of the GIS toolbox: each admin unit's EVENT COUNT is redistributed
    over the raster cells it contains, proportional to each cell's
    ancillary weight (the weights field at the cell center), i.e.
    ``alloc = total * w / wsum``.  The big side (events -> admin counts)
    streams through the broadcast PIP pool; the cell lattice and both
    per-admin lookup tables are admin/lattice-cardinality small sides
    (bounded ``to_pandas``, broadcast into the final cell pass).
    ``total * w`` is an exact int64 product and the one division mirrors
    the SQL ``CAST(total*w AS DOUBLE)/CAST(wsum AS DOUBLE)``."""
    import pandas as pd
    import ray

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table
    from geoglue_ray.sources.raster import RINC, RXFIRST, RXSIZE, RYFIRST, RYSIZE
    from geoglue_ray.sources.weights import build_weights_grid, lookup_weight

    rr, cc = np.meshgrid(np.arange(RYSIZE), np.arange(RXSIZE), indexing="ij")
    rr, cc = rr.ravel(), cc.ravel()
    lon = RXFIRST + cc * RINC
    lat = RYFIRST - rr * RINC
    w = lookup_weight(lon, lat, build_weights_grid()).astype(np.int64)
    cells = rd.from_arrow(
        pa.table(
            {
                "cell_row": pa.array(rr.astype(np.int64)),
                "cell_col": pa.array(cc.astype(np.int64)),
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "w": pa.array(w),
            }
        )
    )
    index_ref = ray.put(AdminIndex.build(build_admin_table()))
    cells = spatial_join(
        cells.map_batches(encode_cells, batch_format="pyarrow"), index_ref=index_ref
    )
    # lattice-cardinality (RYSIZE x RXSIZE) and consumed twice: materialize
    cells = cells.select_columns(["cell_row", "cell_col", "admin_id", "w"]).materialize()

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    ev = ev.map_batches(DeriveEventObservations(), batch_format="pyarrow")
    ev = ev.map_batches(encode_cells, batch_format="pyarrow")
    ev = spatial_join(ev, index_ref=index_ref)
    tot = zonal_aggregate(ev, ["count"], keys=["admin_id"]).to_pandas()
    totals = dict(zip(tot["admin_id"], tot["count"].astype(np.int64)))
    ws = zonal_aggregate(cells, ["sum"], keys=["admin_id"], value_col="w").to_pandas()
    wsums = dict(zip(ws["admin_id"], ws["sum"].astype(np.int64)))

    def alloc(df: pd.DataFrame) -> pd.DataFrame:
        t = df["admin_id"].map(totals).fillna(0).astype(np.int64)
        s = df["admin_id"].map(wsums).astype(np.int64)
        num = (t * df["w"].to_numpy()).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            df["alloc"] = num / s.to_numpy().astype(np.float64)
        return df

    return cells.map_batches(alloc, batch_format="pandas").sort(
        ["cell_row", "cell_col"]
    )


def tile_pyramid(sf_dir: str, res: int = 10, n_levels: int = 4) -> rd.Dataset:
    """Multi-resolution tile pyramid over the events table (the north_star
    tiling surface): aggregate to GGrid cells at ``res`` and roll up
    through coarser levels via the bit-shift ``parent()`` move.  The
    oracle re-encodes every point independently at every level, so the
    pyramid invariant (parent of finer == coarser encode) is proven by
    two implementations that share no code path."""
    from geoglue_ray.stages.tiles import tile_pyramid as pyramid

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    ds = ds.map_batches(DeriveEventObservations(), batch_format="pyarrow")
    return pyramid(ds, res=res, n_levels=n_levels).sort(["level", "cell_x", "cell_y"])


def split_assign(sf_dir: str) -> rd.Dataset:
    """Deterministic train/val/test assignment (hash(doc_id) % 10 ->
    8/1/1) summarized per split — shuffle-free; the SQL oracle recomputes
    every assignment through the HUGEINT replica of int_hash64."""
    from geoglue_ray.stages.sample import split_summary

    ds = read_documents_cols(sf_dir, ["doc_id", "n_chars"])
    return split_summary(ds, "doc_id", "n_chars").sort("split")


def stratified_sample(sf_dir: str, k: int = 20) -> rd.Dataset:
    """Deterministic k-per-language sample: the k docs with the smallest
    id hash per stratum (hash-ordered reservoir) — reproducible across
    reruns, batch splits, and the SQL oracle."""
    from geoglue_ray.stages.sample import stratified_sample as strat

    ds = read_documents_cols(sf_dir, ["doc_id", "lang"])
    return strat(ds, "lang", "doc_id", k).sort(["lang", "rank"])


def host_cap_docs(sf_dir: str, k: int = 25) -> rd.Dataset:
    """Per-host document cap — the web-curation throttle that stops any
    single source dominating a training corpus: keep only the k LONGEST
    documents per source (ties to the smallest doc_id), with their rank.
    Exact two-level top-k (stages/sample.measure_topk), no corpus
    shuffle; all-integer, bit-exact vs the row_number() twin."""
    from geoglue_ray.stages.sample import measure_topk

    ds = read_documents_cols(sf_dir, ["doc_id", "source", "n_chars"])
    return measure_topk(ds, "source", "doc_id", "n_chars", k).sort(
        ["source", "rank"]
    )


PLANT_OFFSET = 10_000_000
PLANT_EPS = 0.05
PLANT_THRESHOLD = 0.99


def _planted_twins(b: pa.Table) -> pa.Table:
    """Each embedding row + a deterministically perturbed twin
    (vec_id + PLANT_OFFSET, cosine vs original ~0.9988): twin = unit(v) +
    eps * unit(noise), noise derived per (id, coord) from the
    SQL-replicable int hash — vectorized, batch-split-independent."""
    from geoglue_ray.functions.texthash import int_hash64
    from geoglue_ray.stages.similarity import _emb_matrix, _normalize

    ids = b["vec_id"].to_numpy()
    mat = _normalize(_emb_matrix(b, "embedding"))
    n, dim = mat.shape
    h = int_hash64((ids[:, None] * np.int64(dim) + np.arange(dim)).ravel())
    noise = (h.reshape(n, dim).astype(np.float64) / 2.0**64) - 0.5
    twins = mat + PLANT_EPS * _normalize(noise)

    def lists(m: np.ndarray) -> pa.Array:
        off = np.arange(0, (len(m) + 1) * dim, dim, dtype=np.int32)
        return pa.ListArray.from_arrays(pa.array(off), pa.array(m.ravel()))

    return pa.table(
        {
            "vec_id": pa.array(np.concatenate([ids, ids + PLANT_OFFSET])),
            "embedding": pa.concat_arrays([lists(mat), lists(twins)]),
        }
    )


def embed_neardup_recall(sf_dir: str) -> rd.Dataset:
    """Driver-visible recall gate for embedding near-dup (the planted-pair
    design): every embedding gets a near-identical twin (cosine ~0.9988
    >> any organic pair, max ~0.37 on the sf corpus), so the exact pair
    set at threshold 0.99 IS the planted set; embedding_neardup must
    recover >= 0.8 of it.  n_planted (= corpus count) is oracle-checked
    alongside the boolean."""
    from geoglue_ray.stages.similarity import embedding_neardup

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    planted = ds.map_batches(_planted_twins, batch_format="pyarrow")
    pairs = embedding_neardup(planted, threshold=PLANT_THRESHOLD)

    def is_planted(b: pa.Table) -> pa.Table:
        a = b["vec_a"].to_numpy()
        bb = b["vec_b"].to_numpy()
        return pa.table({"hit": pa.array((bb - a == PLANT_OFFSET).astype(np.int64))})

    n_planted = ds.count()
    found = int(pairs.map_batches(is_planted, batch_format="pyarrow").sum("hit") or 0)
    out = pa.table(
        {
            "n_planted": pa.array([np.int64(n_planted)]),
            "recall_ok": pa.array([bool(found / n_planted >= 0.8)]),
        }
    )
    return rd.from_arrow(out)


def quantiles_admin1(sf_dir: str) -> rd.Dataset:
    """EXACT per-admin-1 quantiles + median via the value-histogram
    aggregate (stages/sketch.exact_quantiles): shuffle payload is
    (admin, distinct-value) histogram rows — the corpus measure is
    integer-valued in [0, 65536), so the histogram is bounded no matter
    the corpus size.  Mirrors DuckDB quantile_disc / median exactly."""
    from geoglue_ray.stages.sketch import exact_quantiles

    ds = corpus_with_admin(sf_dir)
    ds = ds.select_columns(["admin1_id", "value"])
    out = exact_quantiles(ds, "admin1_id", "value", quantiles=(0.25, 0.75))
    return out.sort("admin1_id")


def gini_admin1(sf_dir: str) -> rd.Dataset:
    """EXACT per-admin-1 Gini coefficient of the observation measure —
    the inequality/concentration statistic a data-quality audit runs per
    region (stages/sketch.gini: histogram partials, closed-form
    rank-weighted sum per value run, exact int64 chain, one division).
    Shuffle payload is (admin x distinct-value) histogram rows."""
    from geoglue_ray.stages.sketch import gini

    ds = corpus_with_admin(sf_dir)
    ds = ds.select_columns(["admin1_id", "value"])
    return gini(ds, "admin1_id", "value").sort("admin1_id")


def majority_admin1(sf_dir: str) -> rd.Dataset:
    """exactextract's majority/minority/variety zonal statistics per
    admin-1 (reference zonalstats.py drives exactextract, whose op set
    includes these; the engine's op grammar covers the arithmetic family,
    this covers the categorical one) — stages/sketch.majority_minority,
    smallest-value tie-break, bit-exact vs the row_number twin."""
    from geoglue_ray.stages.sketch import majority_minority

    ds = corpus_with_admin(sf_dir)
    ds = ds.select_columns(["admin1_id", "value"])
    return majority_minority(ds, "admin1_id", "value").sort("admin1_id")


def diversity_admin1(sf_dir: str) -> rd.Dataset:
    """Simpson diversity + dominance of the measure distribution per
    admin-1 (stages/sketch.diversity): landscape-ecology zonal
    statistics, each one double division over exact int64 sums."""
    from geoglue_ray.stages.sketch import diversity

    ds = corpus_with_admin(sf_dir)
    ds = ds.select_columns(["admin1_id", "value"])
    return diversity(ds, "admin1_id", "value").sort("admin1_id")


def covariance_admin1(sf_dir: str) -> rd.Dataset:
    """EXACT per-admin-1 bivariate profile of (value, population weight):
    means, population variances and covariance — every statistic one
    double division of exact int64 moment sums (stages/sketch.
    comoment_stats), so the SQL twin matches bit-for-bit."""
    from geoglue_ray.stages.sketch import comoment_stats

    ds = corpus_with_admin(sf_dir, with_spans=False, with_weights=True)
    ds = ds.select_columns(["admin1_id", "value", "weight"])
    return comoment_stats(ds, "admin1_id", "value", "weight").sort("admin1_id")


def trend_admin1(sf_dir: str) -> rd.Dataset:
    """EXACT per-admin-1 OLS temporal trend of the observation value —
    slope/intercept of value vs observation hour (the warming-rate-per-
    zone analysis): cleared-denominator slope, one double division of
    exact int64 sums (stages/sketch.trend_stats), so the SQL twin
    matches bit-for-bit."""
    from geoglue_ray.stages.sketch import trend_stats

    T0 = np.datetime64(fx.T0, "us")
    ds = corpus_with_admin(sf_dir, with_spans=False)

    def hourly(b: pa.Table) -> pa.Table:
        h = (
            (b["event_time"].to_numpy() - T0)
            .astype("timedelta64[h]")
            .astype(np.int64)
        )
        return pa.table(
            {"admin1_id": b["admin1_id"], "t": pa.array(h), "value": b["value"]}
        )

    ds = ds.map_batches(hourly, batch_format="pyarrow")
    return trend_stats(ds, "admin1_id", "t", "value").sort("admin1_id")


def outliers_admin1(sf_dir: str) -> rd.Dataset:
    """EXACT per-admin-1 two-sigma outlier screen — |x - mean| > 2*std
    without sqrt or per-row division: the all-integer comparison
    (n*x - S)^2 > 4*(n*SS - S^2) evaluated once per distinct value run of
    the histogram (stages/sketch.outlier_counts)."""
    from geoglue_ray.stages.sketch import outlier_counts

    ds = corpus_with_admin(sf_dir)
    ds = ds.select_columns(["admin1_id", "value"])
    return outlier_counts(ds, "admin1_id", "value", n_sigma=2).sort("admin1_id")


def weighted_median_admin1(sf_dir: str) -> rd.Dataset:
    """EXACT population-weighted median per admin-1 — the reference's
    weighted zonal grammar (zonalstats.py:43-63) extended to an order
    statistic: the weight is the worldpop-shaped grid value at each
    observation (integer-valued), so cumulative-weight comparisons are
    all-integer and the SQL window twin reproduces the result bit-exact
    (stages/sketch.weighted_median histogram path)."""
    from geoglue_ray.stages.sketch import weighted_median

    ds = corpus_with_admin(sf_dir, with_spans=False, with_weights=True)
    ds = ds.select_columns(["admin1_id", "value", "weight"])
    return weighted_median(ds, "admin1_id", "value", "weight").sort("admin1_id")


def curation_pipeline(sf_dir: str) -> rd.Dataset:
    """The end-to-end LLM-corpus curation flow a 100-TB user runs:
    quality filter (integer predicates: n_tokens >= 8 and at least one
    stopword) -> MinHash+LSH near-dup survivor corpus over the FILTERED
    docs -> deterministic train/val/test assignment summarized per
    split.  Every stage streams; the only small side is the eliminated-id
    set inside survivor_corpus's anti-join.  One recursive-CTE oracle
    replays the whole chain (filter -> shingle/permute/band -> component
    closure -> anti-join -> hash split) bit-exactly."""
    from geoglue_ray.stages.dedup import dedup_corpus as dc
    from geoglue_ray.stages.sample import split_summary
    from geoglue_ray.stages.text import QualityScorer

    ds = read_documents_cols(sf_dir, ["doc_id", "text", "n_chars"])
    scored = ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=(1, 4))

    def keep_quality(b: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.greater_equal(b["n_tokens"], 8), pc.greater_equal(b["n_stopwords"], 1)
        )
        return b.filter(ok)

    kept = scored.map_batches(keep_quality, batch_format="pyarrow")
    survivors = dc(
        kept.select_columns(["doc_id", "text"]),
        kept.select_columns(["doc_id", "n_chars"]),
        threshold=0.4,
    )
    return split_summary(survivors, "doc_id", "n_chars").sort("split")


def vocab_top(sf_dir: str) -> rd.Dataset:
    """EXACT global top-20 vocabulary over the documents corpus — the
    canonical high-cardinality explode-aggregate: per-batch partial
    counts, fixed-shard exact merge, per-shard top-k, tiny global
    sort/limit (see stages/text.vocab_topk for the scale contract)."""
    from geoglue_ray.stages.text import vocab_topk

    ds = read_documents_cols(sf_dir, ["text"])
    return vocab_topk(ds, "text", k=20)


def doc_repetition(sf_dir: str) -> rd.Dataset:
    """Per-doc repetition/quality signals (Gopher-style): distinct-token
    count, top-bigram multiplicity, repeated-token ratio.  One vectorized
    map_batches pass; the SQL twin replays token hashes and the 2-shingle
    combine in HUGEINT arithmetic."""
    from geoglue_ray.stages.text import repetition_features

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(repetition_features, batch_format="pyarrow")
    return out.drop_columns(["text"]).sort("doc_id")


def hopping_window(sf_dir: str, ts_lo=None, ts_hi=None) -> rd.Dataset:
    """Hopping (sliding) window aggregate over the event stream: window
    length 2h, hop 1h — every event lands in exactly two windows.  The
    explode is a per-batch concat (2x row fan-out, narrow columns), the
    aggregate is the fixed-bucket partial-merge path — no raw-row
    shuffle, payload bounded by (windows x event types).  Optional
    ``[ts_lo, ts_hi)`` restricts the stream AT THE SCAN (row-group
    predicate pushdown, sources/events.read_events)."""
    from geoglue_ray.sources.events import read_events

    HOUR = 3_600_000_000  # microseconds

    ds = read_events(
        sf_dir, columns=["ts", "event_type", "value"], ts_lo=ts_lo, ts_hi=ts_hi
    )

    def explode(b: pa.Table) -> pa.Table:
        t = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        w1 = (t // HOUR) * HOUR
        w = np.concatenate([w1 - HOUR, w1]).astype("datetime64[us]")
        et = b["event_type"].to_numpy(zero_copy_only=False)
        v = np.floor(b["value"].to_numpy())
        return pa.table(
            {
                "window_start": pa.array(w),
                "event_type": pa.array(np.concatenate([et, et])),
                "value": pa.array(np.concatenate([v, v])),
            }
        )

    ex = ds.map_batches(explode, batch_format="pyarrow")
    out = zonal_aggregate(ex, ["count", "sum"], keys=["window_start", "event_type"])
    return out.sort(["window_start", "event_type"])


def hopping_distinct_users(sf_dir: str) -> rd.Dataset:
    """DISTINCT-count over hopping windows — the streaming COUNT
    (DISTINCT) every dashboard asks for and naive aggregation gets
    wrong (a user seen twice in a window must count once): 2h windows
    hopping 1h (each event in exactly two), per-window EXACT distinct
    users via per-batch (window, user) dedup partials -> fixed
    (window, user)-hash shard dedup -> window-cardinality counts.
    Shuffle payload is distinct (window, user) pairs, never events."""
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64

    HOUR = 3_600_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def explode(b: pa.Table) -> pa.Table:
        t = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        w1 = (t // HOUR) * HOUR
        w = np.concatenate([w1 - HOUR, w1])
        u = b["user_id"].to_numpy().astype(np.int64)
        u2 = np.concatenate([u, u])
        # per-batch dedup of (window, user)
        key = (w // HOUR) * np.int64(1 << 32) + u2  # users < 2^32 (fixture)
        ku = np.unique(key)
        wv = (ku // np.int64(1 << 32)) * HOUR
        uv = ku % np.int64(1 << 32)
        sh = (int_hash64(ku) % np.uint64(64)).astype(np.int64)
        return pa.table(
            {
                "_s": pa.array(sh),
                "w": pa.array(wv),
                "u": pa.array(uv),
            }
        )

    def dedup_count(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "w": np.array([], np.int64),
                    "n": np.array([], np.int64),
                }
            )
        w = g["w"].to_numpy().astype(np.int64)
        u = g["u"].to_numpy().astype(np.int64)
        o = np.lexsort((u, w))
        w, u = w[o], u[o]
        first = np.r_[True, (w[1:] != w[:-1]) | (u[1:] != u[:-1])]
        w = w[first]
        bnd = np.r_[True, w[1:] != w[:-1]]
        starts = np.nonzero(bnd)[0]
        n = np.diff(np.r_[starts, len(w)]).astype(np.int64)
        return pd.DataFrame({"w": w[starts], "n": n})

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(dedup_count, batch_format="pandas")
    )
    # a (window, user) pair lives in ONE shard, but a window's users span
    # shards: final window-cardinality merge
    agg = zonal_aggregate(out, ["sum"], keys=["w"], value_col="n")
    return agg.map_batches(
        lambda b: pa.table(
            {
                "window_start": pa.array(
                    b["w"].to_numpy().astype("datetime64[us]")
                ),
                "n_users": pc.cast(b["sum"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("window_start")


def events_window_profile(sf_dir: str) -> rd.Dataset:
    """Per-type profile of ONE week of the event stream ([2024-01-08,
    2024-01-15)): count, sum of floored values (integer-valued — order-
    independent), first/last timestamp.  The week restriction is pushed
    INTO the parquet scan (sources/events.read_events: row-group
    statistics pruning + in-scan row filter), so only ~1/4 of the
    30-day table leaves storage — the predicate-pushdown twin of the
    reference's bbox ``sel`` crop (util.py:144-162).  Downstream is a
    per-batch partial collapse to type-cardinality rows and one tiny
    final merge."""
    import pandas as pd

    from geoglue_ray.sources.events import read_events

    LO = np.datetime64("2024-01-08T00:00:00", "us")
    HI = np.datetime64("2024-01-15T00:00:00", "us")
    ds = read_events(
        sf_dir, columns=["ts", "event_type", "value"], ts_lo=LO, ts_hi=HI
    )

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        ts = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        fv = np.floor(b["value"].to_numpy())
        codes, uniq = pd.factorize(et, use_na_sentinel=False)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        sv = np.bincount(codes, weights=fv, minlength=len(uniq))
        ti = ts.astype(np.int64)
        mn = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, np.int64)
        np.minimum.at(mn, codes, ti)
        np.maximum.at(mx, codes, ti)
        return pa.table(
            {
                "event_type": pa.array(uniq, pa.string()),
                "n": pa.array(n),
                "sum_floor": pa.array(sv),
                "mn": pa.array(mn),
                "mx": pa.array(mx),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype=object),
                    "n_events": pd.Series([], dtype=np.int64),
                    "sum_floor": pd.Series([], dtype=np.float64),
                    "first_ts": pd.Series([], dtype="datetime64[us]"),
                    "last_ts": pd.Series([], dtype="datetime64[us]"),
                }
            )
        s = g.groupby("event_type", sort=True, dropna=False).agg(
            n_events=("n", "sum"),
            sum_floor=("sum_floor", "sum"),
            mn=("mn", "min"),
            mx=("mx", "max"),
        )
        return pd.DataFrame(
            {
                "event_type": s.index.to_numpy(),
                "n_events": s["n_events"].to_numpy().astype(np.int64),
                "sum_floor": s["sum_floor"].to_numpy().astype(np.float64),
                "first_ts": s["mn"].to_numpy().astype("datetime64[us]"),
                "last_ts": s["mx"].to_numpy().astype("datetime64[us]"),
            }
        )

    # type cardinality is tiny: one final single-group merge
    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("_g", pa.array(np.zeros(b.num_rows, np.int64)))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(final, batch_format="pandas")
        .sort("event_type")
    )


def winsorized_admin1(sf_dir: str) -> rd.Dataset:
    """Two-pass winsorized aggregate: pass 1 computes exact per-key
    p25/p75 via the value-histogram quantile sketch (shuffle payload =
    key x distinct-value histogram rows); pass 2 broadcasts the tiny
    (key, lo, hi) threshold table and streams a clipped sum/count through
    the fixed-bucket partial merge.  The corpus measure is integer-valued
    so the clipped sum is order-independent (bit-exact vs SQL)."""
    from geoglue_ray.stages.sketch import exact_quantiles

    # Two passes consume src (quantile histogram, then clip+aggregate):
    # materialize so the expensive spatial-assign lineage runs ONCE
    # (CLAUDE.md round-3 rule; dedup_corpus measured 26 s -> 14 s).
    src = (
        corpus_with_admin(sf_dir).select_columns(["admin1_id", "value"]).materialize()
    )
    qt = (
        exact_quantiles(src, "admin1_id", "value", quantiles=(0.25, 0.75))
        .select_columns(["admin1_id", "p25", "p75"])
        .to_pandas()  # bounded: one row per admin-1 key
    )
    keys = np.sort(qt["admin1_id"].to_numpy())
    order = np.argsort(qt["admin1_id"].to_numpy())
    lo = qt["p25"].to_numpy()[order]
    hi = qt["p75"].to_numpy()[order]

    def clip(b: pa.Table) -> pa.Table:
        a1 = b["admin1_id"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, a1)
        v = np.clip(b["value"].to_numpy(), lo[idx], hi[idx])
        return pa.table({"admin1_id": b["admin1_id"], "value": pa.array(v)})

    clipped = src.map_batches(clip, batch_format="pyarrow")
    out = zonal_aggregate(clipped, ["count", "sum"], keys=["admin1_id"])
    return out.sort("admin1_id")


def order_priority_revenue(sf_dir: str) -> rd.Dataset:
    """Big-big distributed hash join: orders (dim-ish but unbounded)
    JOIN lineitem (fact) on orderkey — neither side is broadcast; both
    co-shuffle to a fixed shard count and each shard runs one vectorized
    hash join (stages/join.hash_equijoin).  Revenue is floored at the
    row level so the post-join aggregate is order-independent."""
    from geoglue_ray.stages.join import hash_equijoin

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def rev(b: pa.Table) -> pa.Table:
        r = np.floor(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
        )
        return pa.table({"l_orderkey": b["l_orderkey"], "revenue": pa.array(r)})

    joined = hash_equijoin(
        orders,
        li.map_batches(rev, batch_format="pyarrow"),
        left_on="o_orderkey",
        right_on="l_orderkey",
    )
    out = zonal_aggregate(
        joined, ["count", "sum"], keys=["o_orderpriority"], value_col="revenue"
    )
    return out.sort("o_orderpriority")


def value_rank_admin1(sf_dir: str) -> rd.Dataset:
    """Per-row window-function RANK() over (PARTITION BY admin1 ORDER BY
    value) computed WITHOUT shuffling rows: bounded value-histogram pass
    + broadcast exclusive-cumulative lookup (stages/sketch.value_rank)."""
    from geoglue_ray.stages.sketch import value_rank

    # value_rank streams src twice (histogram pass + rank pass):
    # materialize the spatial-assign lineage once (CLAUDE.md rule).
    src = (
        corpus_with_admin(sf_dir)
        .select_columns(["doc_id", "admin1_id", "value"])
        .materialize()
    )
    return value_rank(src, "admin1_id", "value").sort("doc_id")


def tfidf_top_token(sf_dir: str) -> rd.Dataset:
    """Per-doc top TF-IDF token (idf = N/df — exact arithmetic, no
    transcendental log): two-pass DF build + broadcast, streaming argmax
    with the (score desc, token asc) tie-break."""
    from geoglue_ray.stages.text import tfidf_top_token as tt

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    return tt(ds).sort("doc_id")


def skyline_orders(sf_dir: str) -> rd.Dataset:
    """Pareto-frontier (skyline) of orders — maximize o_totalprice,
    minimize o_orderdate ("highest value, earliest"): no order with an
    earlier-or-equal date and a higher-or-equal price (one strict)
    exists (stages/sample.skyline_2d: local block skylines union +
    one bounded final pass).  Pure comparisons — bit-exact vs the SQL
    window-dominance twin."""
    from geoglue_ray.stages.sample import skyline_2d

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )
    return skyline_2d(ds, max_col="o_totalprice", min_col="o_orderdate").sort(
        "o_orderkey"
    )


def dormant_customers(sf_dir: str) -> rd.Dataset:
    """Distributed ANTI join: customers with no order before the cutoff
    (both sides stream through the fixed-shard tagged-union co-shuffle of
    stages/join.hash_equijoin; the probe side is pre-filtered at the
    parquet read).  Counts per market segment."""
    from geoglue_ray.stages.join import hash_equijoin

    cut = np.datetime64("1995-03-01T00:00:00", "us")
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def early(b: pa.Table) -> pa.Table:
        keep = pc.less(b["o_orderdate"], pa.scalar(cut, pa.timestamp("us")))
        return b.filter(keep).select(["o_custkey"])

    probe = orders.map_batches(early, batch_format="pyarrow")
    dormant = hash_equijoin(cust, probe, "c_custkey", "o_custkey", how="anti")
    out = zonal_aggregate(
        dormant, ["count"], keys=["c_mktsegment"], value_col="c_custkey"
    )
    return out.sort("c_mktsegment")


def customer_order_balance(sf_dir: str) -> rd.Dataset:
    """Distributed FULL OUTER join: every third customer against 1996
    per-customer order counts — left-only rows (filtered customers with
    no 1996 orders) carry null n_orders, right-only rows (1996 buyers
    outside the customer filter) carry null c_mktsegment, and the key
    column is populated from whichever side exists (COALESCE in the SQL
    twin).  The order counts are pre-aggregated BEFORE the join (push
    aggregation below the shuffle: the join ships one row per buyer, not
    one per order)."""
    from geoglue_ray.stages.join import hash_equijoin

    lo = np.datetime64("1996-01-01T00:00:00", "us")
    hi = np.datetime64("1997-01-01T00:00:00", "us")
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def third(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(b["c_custkey"].to_numpy() % 3 == 0))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def in_1996(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].to_numpy()
        return b.filter(pa.array((d >= lo) & (d < hi))).select(["o_custkey"])

    counts = zonal_aggregate(
        orders.map_batches(in_1996, batch_format="pyarrow"),
        ["count"],
        keys=["o_custkey"],
        value_col="o_custkey",
    )

    def rename_counts(b: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": b["o_custkey"], "n_orders": b["count"]})

    out = hash_equijoin(
        cust.map_batches(third, batch_format="pyarrow"),
        counts.map_batches(rename_counts, batch_format="pyarrow"),
        "c_custkey",
        "o_custkey",
        how="outer",
    )
    return out.sort("c_custkey")


def event_funnel(sf_dir: str) -> rd.Dataset:
    """Ordered-sequence funnel over events: users whose FIRST view
    precedes their first click precedes their first purchase — the
    sequence-pattern aggregate (not expressible as sessionize or a plain
    groupby).  Per-user first-timestamps reduce via per-batch partial
    mins -> fixed-shard co-location -> one vectorized lexsort+reduceat
    pass per shard; only (user, 3 timestamps) rows ever shuffle."""
    from geoglue_ray.functions.texthash import int_hash64

    STAGES = ("view", "click", "purchase")
    n_shards = 64
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        stage = np.full(len(b), -1, dtype=np.int8)
        for i, s in enumerate(STAGES):
            stage[et == s] = i
        keep = stage >= 0
        uid = b["user_id"].to_numpy()[keep]
        st = stage[keep]
        ts = b["ts"].to_numpy()[keep].astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, st, uid))
        uid, st, ts = uid[order], st[order], ts[order]
        first = np.r_[True, (uid[1:] != uid[:-1]) | (st[1:] != st[:-1])] if len(uid) else np.zeros(0, bool)
        uid, st, ts = uid[first], st[first], ts[first]
        return pa.table(
            {
                "_fs": pa.array(
                    (int_hash64(uid) % np.uint64(n_shards)).astype(np.int64)
                ),
                "uid": pa.array(uid),
                "stage": pa.array(st),
                "ts": pa.array(ts),
            }
        )

    def shard_funnel(g: pa.Table) -> pa.Table:
        uid = g["uid"].to_numpy()
        st = g["stage"].to_numpy()
        ts = g["ts"].to_numpy()
        order = np.lexsort((ts, st, uid))
        uid, st, ts = uid[order], st[order], ts[order]
        first = np.r_[True, (uid[1:] != uid[:-1]) | (st[1:] != st[:-1])] if len(uid) else np.zeros(0, bool)
        uid, st, ts = uid[first], st[first], ts[first]
        # pivot each user's first-ts per stage into a (n_users, 3) matrix
        codes, uniq = _pd_factorize(uid)
        t = np.full((len(uniq), len(STAGES)), np.iinfo(np.int64).max, dtype=np.int64)
        t[codes, st] = ts
        M = np.iinfo(np.int64).max
        n_view = int((t[:, 0] < M).sum())
        n_click = int(((t[:, 0] < M) & (t[:, 1] < M) & (t[:, 1] > t[:, 0])).sum())
        n_purch = int(
            (
                (t[:, 0] < M)
                & (t[:, 1] < M)
                & (t[:, 2] < M)
                & (t[:, 1] > t[:, 0])
                & (t[:, 2] > t[:, 1])
            ).sum()
        )
        return pa.table(
            {
                "n_view": pa.array([n_view], pa.int64()),
                "n_click": pa.array([n_click], pa.int64()),
                "n_purchase": pa.array([n_purch], pa.int64()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_fs")
        .map_groups(shard_funnel, batch_format="pyarrow")
    )

    def total(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pa.array([float(b[c].to_numpy().sum())], pa.float64())
                for c in ("n_view", "n_click", "n_purchase")
            }
        )

    return parts.repartition(1).map_batches(total, batch_format="pyarrow")


def _pd_factorize(a: np.ndarray):
    import pandas as pd

    return pd.factorize(a, use_na_sentinel=False)


def inverted_index_docs(sf_dir: str) -> rd.Dataset:
    """Posting-list inverted index over the corpus: token -> document
    frequency + ascending doc-id posting string, for tokens in the
    df band [2, 450] — wide enough to keep the fixture's whole 31-token
    shared vocabulary non-degenerate (stages/text.inverted_index —
    distinct (token, doc) pairs collapse per batch, token-sharded
    slice-join; the df filter bounds every posting list)."""
    from geoglue_ray.stages.text import inverted_index

    docs = read_documents_cols(sf_dir, ["doc_id", "text"])
    return inverted_index(docs, "text", "doc_id", min_df=2, max_df=450).sort("token")


def bigram_stats(sf_dir: str, k: int = 100) -> rd.Dataset:
    """N-gram language-model statistics over the corpus: the top 100
    adjacent-token bigrams with exact counts and conditional probability
    P(tok2|tok1) (stages/text.bigram_topk — first-token-sharded exact
    sums, two-level top-k on the (count desc, pair) total order)."""
    from geoglue_ray.stages.text import bigram_topk

    docs = read_documents_cols(sf_dir, ["doc_id", "text"])
    return bigram_topk(docs, "text", k=k)


def doc_boilerplate(sf_dir: str) -> rd.Dataset:
    """Per-document boilerplate fraction: share of each doc's bigrams in
    the corpus's exact top-500 bigram list — templated-text detection,
    the inter-document repetition signal (stages/text.boilerplate_frac:
    deterministic total-order cutoff, k-row broadcast, one streamed
    membership pass, one division per doc)."""
    from geoglue_ray.stages.text import boilerplate_frac

    docs = read_documents_cols(sf_dir, ["doc_id", "text"])
    return boilerplate_frac(docs, "text", k=500).sort("doc_id")


def decontaminate_docs(sf_dir: str) -> rd.Dataset:
    """Benchmark decontamination over the documents table: every 97th doc
    plays the held-out eval set; each training doc gets its token-
    occurrence overlap fraction against the eval vocabulary and a
    threshold flag (stages/text.decontaminate — broadcast vocab, one
    streamed corpus pass, no shuffle)."""
    from geoglue_ray.stages.text import decontaminate

    docs = read_documents_cols(sf_dir, ["doc_id", "text"])

    def bench_filter(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(b["doc_id"].to_numpy() % 97 == 0))

    bench = read_documents_cols(sf_dir, ["doc_id", "text"]).map_batches(
        bench_filter, batch_format="pyarrow"
    )
    return decontaminate(docs, bench, threshold=0.5).sort("doc_id")


def copurchase_pairs(sf_dir: str, top_n: int = 50) -> rd.Dataset:
    """Market-basket analysis over orders: the top 50 part pairs most
    often bought together (stages/join.cooccur_topk — basket-sharded
    vectorized pair generation with per-shard collapse, pair-sharded
    exact sums, two-level top-k; the frequent-itemset k=2 primitive)."""
    from geoglue_ray.stages.join import cooccur_topk

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return cooccur_topk(li, "l_orderkey", "l_partkey", top_n=top_n)


def jaccard_orders(sf_dir: str) -> rd.Dataset:
    """Exact set-similarity self-join (SSJoin): order pairs whose basket
    Jaccard >= 1/2 — integer rational-threshold filter via the
    PREFIX-FILTERED path (items ranked by global df; only each set's
    rare-item prefix generates candidates, verified in place against the
    carried packed sets — stages/join.setsim_join).  Candidate volume at
    sf0.1: 9.0M (legacy all-shared-items) -> 4.5M; hub-skewed corpora
    measured 16x faster (BASELINE.md)."""
    from geoglue_ray.stages.join import setsim_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return setsim_join(
        li, "l_orderkey", "l_partkey", threshold_num=1, threshold_den=2
    ).sort(["doc_a", "doc_b"])


def pagerank_parts(sf_dir: str) -> pa.Table:
    """Fixed-point PageRank (3 iterations, damping 85/100, ranks scaled by
    2^32) over the symmetric part co-purchase graph — the engine's
    representative ITERATIVE algorithm, in pure int64 so the unrolled
    HUGEINT CTE oracle matches bit-for-bit (stages/graph.py: distinct
    edges stay distributed; only the node-cardinality rank vector is
    broadcast per round)."""
    from geoglue_ray.stages.graph import basket_edges, pagerank_fixedpoint

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    t = pagerank_fixedpoint(basket_edges(li, "l_orderkey", "l_partkey"), iters=3)
    return t.rename_columns(["part_key", "rank"])


def bfs_parts(sf_dir: str) -> pa.Table:
    """Multi-source BFS hop distances (capped at 4) over the symmetric
    part co-purchase graph, from the 4 smallest part ids — the graph
    TRAVERSAL operator alongside pagerank (value propagation) and
    triangle counting (pattern matching).  stages/graph.bfs_hops:
    bounded rounds, per-round broadcast of the node-cardinality hop
    matrix, edges streamed and never collected.  Bit-exact vs the
    depth-guarded recursive-CTE twin."""
    from geoglue_ray.stages.graph import basket_edges, bfs_hops

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    t = bfs_hops(basket_edges(li, "l_orderkey", "l_partkey"), n_sources=4, max_hops=4)
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        t, sort_keys=[("src_id", "ascending"), ("node", "ascending")]
    )
    return t.take(idx)


def sssp_parts(sf_dir: str) -> pa.Table:
    """Weighted single-source shortest paths over the part co-purchase
    graph — the WEIGHTED companion of bfs_parts: edge weight
    ``1 + 1000 // n_cobaskets`` (inverse tie strength), 4 Bellman-Ford
    relaxation rounds from the smallest part id
    (stages/graph.sssp_fixed_rounds: edges stream per round, the driver
    holds only the reached-node distance vector — the pagerank rule).
    All min/plus int64 — bit-exact vs the unrolled AS MATERIALIZED CTE
    twin."""
    from geoglue_ray.stages.graph import sssp_fixed_rounds, weighted_cooccur_edges

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    t = sssp_fixed_rounds(
        weighted_cooccur_edges(li, "l_orderkey", "l_partkey"), rounds=4
    )
    idx = pc.sort_indices(t, sort_keys=[("node", "ascending")])
    return t.take(idx).rename_columns(["part_key", "dist"])


def raster_focal_mean(sf_dir: str) -> rd.Dataset:
    """3x3 focal (moving-window) mean over two days of the hourly raster
    — the stencil operator: row-band x hour-chunk partitioning with a
    one-row halo exchange, nine shifted adds per dense block
    (stages/stencil.py).  sf_dir is unused: the raster is the
    deterministic generated lattice (sources/raster.py), as for
    raster_daily."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import focal_mean

    return focal_mean(read_raster(n_days=2), variable="t2m").sort(
        ["cell_row", "cell_col", "valid_time"]
    )


def raster_gradient(sf_dir: str) -> rd.Dataset:
    """Central-difference gradient components + squared magnitude over
    one day of the hourly raster — terrain-analysis slope on the lattice
    (stages/stencil.focal_gradient; same halo-exchange shuffle as the
    focal family).  grad2 avoids sqrt/atan2 so the SQL twin stays
    bit-exact (CLAUDE.md: never build an oracle through transcendental
    functions)."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import focal_gradient

    return focal_gradient(read_raster(n_days=1), variable="t2m").sort(
        ["cell_row", "cell_col", "valid_time"]
    )


def raster_focal_range(sf_dir: str) -> rd.Dataset:
    """3x3 focal min/max/range over one day — the multi-op stencil path
    (all ops in the same nine-shifts pass; stages/stencil.focal_stats)."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import focal_stats

    return focal_stats(
        read_raster(n_days=1), ops=("min", "max", "range"), variable="t2m"
    ).sort(["cell_row", "cell_col", "valid_time"])


def raster_focal_median(sf_dir: str) -> rd.Dataset:
    """3x3 focal median over one day — the rank-order smoothing filter
    (salt-and-pepper noise removal; stages/stencil.focal_stats op
    "median": NaN-padded (cells x 9) gather + nanmedian, whose
    even-count two-middle average is measured bit-identical to DuckDB
    median)."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import focal_stats

    return focal_stats(
        read_raster(n_days=1), ops=("median",), variable="t2m"
    ).sort(["cell_row", "cell_col", "valid_time"])


def raster_moran(sf_dir: str) -> rd.Dataset:
    """Local Moran's I (Anselin LISA, binary rook weights) per cell over
    two days of the hourly raster — spatial hot/cold-spot detection, the
    autocorrelation companion to the focal stencils.  One bounded
    per-slice moment pass + one halo-exchange stencil pass
    (stages/stencil.local_moran); the float chain is single IEEE ops on
    exact integer aggregates, mirrored term-for-term by the SQL twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import local_moran

    t2m = pa.scalar("t2m")

    def prune(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["variable"], t2m))

    # local_moran consumes ds TWICE (moments + stencil): materialize the
    # pruned slice so the generator lineage runs once (CLAUDE.md rule;
    # at scale, re-read the pruned columns from storage instead)
    ds = read_raster(n_days=2).map_batches(prune, batch_format="pyarrow").materialize()
    return local_moran(ds, variable="t2m").sort(
        ["cell_row", "cell_col", "valid_time"]
    )


def raster_geary(sf_dir: str) -> rd.Dataset:
    """Local Geary's c (squared-difference LISA, binary rook weights) per
    cell over two days of the hourly raster — the dissimilarity
    complement of raster_moran (stages/stencil.local_geary): the
    neighbour term expands to the pure-integer k*x^2 - 2*x*ns + nss, so
    the only float ops are the per-slice m2 chain and one division."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import local_geary

    t2m = pa.scalar("t2m")

    def prune(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["variable"], t2m))

    # local_geary consumes ds TWICE (moments + stencil): materialize the
    # pruned slice so the generator lineage runs once (CLAUDE.md rule)
    ds = read_raster(n_days=2).map_batches(prune, batch_format="pyarrow").materialize()
    return local_geary(ds, variable="t2m").sort(
        ["cell_row", "cell_col", "valid_time"]
    )


def raster_moran_bv(sf_dir: str) -> rd.Dataset:
    """Bivariate local Moran's I between t2m and tp per cell over two
    days — does high temperature sit amid high precipitation
    (stages/stencil.local_moran_bivariate).  Exact integer aggregates,
    single-op IEEE chains and two correctly-rounded sqrts, mirrored
    term-for-term by the SQL twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import local_moran_bivariate

    vars_ = pa.array(["t2m", "tp"])

    def prune(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["variable"], value_set=vars_))

    # consumed three times (two moment passes + stencil): materialize
    ds = read_raster(n_days=2).map_batches(prune, batch_format="pyarrow").materialize()
    return local_moran_bivariate(ds, var_x="t2m", var_y="tp").sort(
        ["cell_row", "cell_col", "valid_time"]
    )


def raster_anomaly(sf_dir: str) -> rd.Dataset:
    """Per-cell climatology anomaly over six days of the hourly raster —
    the deseasonalization move of climate pipelines: each (cell, hour)
    t2m value minus that CELL's period mean, plus the value/mean ratio.  The
    cell-mean table is a lattice-cardinality small side (one bounded
    sum/count pass, broadcast as a dict into a second streaming pass —
    at 100 TB the raster is re-read from storage, never materialized).
    mean = CAST(sum)/count, anom = x - mean, ratio = x / mean — each a
    single IEEE op mirrored by the SQL window twin."""
    import pandas as pd

    from geoglue_ray.sources.raster import RXSIZE, read_raster

    t2m = pa.scalar("t2m")

    def prune(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["variable"], t2m))
        # ocean holes are float NaN (not Arrow nulls) — drop by finiteness
        b = b.filter(pa.array(np.isfinite(b["value"].to_numpy(zero_copy_only=False))))
        return pa.table(
            {
                "valid_time": b["valid_time"],
                "cell_row": pc.cast(b["cell_row"], pa.int64()),
                "cell_col": pc.cast(b["cell_col"], pa.int64()),
                "value": b["value"],
            }
        )

    ds = read_raster(n_days=6).map_batches(prune, batch_format="pyarrow")
    mom = zonal_aggregate(
        ds, ["sum", "count"], keys=["cell_row", "cell_col"]
    ).to_pandas()  # lattice-cardinality, bounded
    key = mom["cell_row"].to_numpy().astype(np.int64) * RXSIZE + mom[
        "cell_col"
    ].to_numpy().astype(np.int64)
    means = dict(
        zip(key, mom["sum"].to_numpy() / mom["count"].to_numpy())
    )

    def anom(df: pd.DataFrame) -> pd.DataFrame:
        k = df["cell_row"].to_numpy() * RXSIZE + df["cell_col"].to_numpy()
        m = pd.Series(k).map(means).to_numpy()
        df["cell_mean"] = m
        df["anom"] = df["value"].to_numpy() - m
        df["ratio"] = df["value"].to_numpy() / m
        return df

    return (
        read_raster(n_days=6)
        .map_batches(prune, batch_format="pyarrow")
        .map_batches(anom, batch_format="pandas")
        .sort(["cell_row", "cell_col", "valid_time"])
    )


def raster_joincount(sf_dir: str) -> rd.Dataset:
    """Join-count statistics per time slice (Cliff & Ord binary-map
    autocorrelation): black/white classification at the value midpoint,
    rook-edge color counts bb/ww/bw — pure integers, one halo stencil
    pass + a slice-cardinality reduce (stages/stencil.join_counts)."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import join_counts

    return join_counts(read_raster(n_days=2), variable="t2m").sort("valid_time")


def raster_streaks(sf_dir: str) -> rd.Dataset:
    """Heatwave-duration statistics per raster cell over the full 30-day
    month: daily t2m maxima (skip-null partial/final collapse), then
    per-cell maximal runs of CONSECUTIVE days with dmax >= 970 —
    days_above / n_runs / longest_run, the gaps-and-islands operator
    (stages/timeagg.threshold_streaks).  All-integer outputs; the SQL
    twin is the day - row_number() island construction."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.timeagg import threshold_streaks
    from geoglue_ray.stages.zonal import zonal_aggregate

    from geoglue_ray import fixtures as fx

    T0 = np.datetime64(fx.T0, "us")
    t2m = pa.scalar("t2m")

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["variable"], t2m))
        day = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
            // 24
        )
        return pa.table(
            {
                "cell_row": b["cell_row"],
                "cell_col": b["cell_col"],
                "day": pa.array(day),
                "value": b["value"],
            }
        )

    daily = zonal_aggregate(
        read_raster().map_batches(prep, batch_format="pyarrow"),
        ["max"],
        keys=["cell_row", "cell_col", "day"],
        skip_nulls=True,
    )
    return threshold_streaks(
        daily, ["cell_row", "cell_col"], "day", "max", threshold=970
    ).sort(["cell_row", "cell_col"])


def raster_hotspots(sf_dir: str) -> rd.Dataset:
    """Getis-Ord Gi* hot-spot z-scores per cell over two days of the
    hourly raster (queen 3x3 incl. self) — the significance-scored
    companion of raster_moran (stages/stencil.getis_ord).  All-integer
    aggregates + single-op IEEE chains + correctly-rounded sqrt, so the
    SQL twin is bit-exact."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import getis_ord

    t2m = pa.scalar("t2m")

    def prune(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["variable"], t2m))

    ds = read_raster(n_days=2).map_batches(prune, batch_format="pyarrow").materialize()
    return getis_ord(ds, variable="t2m").sort(["cell_row", "cell_col", "valid_time"])


def raster_temporal_variogram(sf_dir: str) -> pa.Table:
    """Marginal temporal semivariogram (lags 1-6 hours, same-cell pairs)
    over two days of hourly t2m — the time-axis companion of
    raster_variogram (stages/stencil.temporal_variogram): cells
    fixed-shard co-shuffled, one lexsort + shifted comparison per lag,
    all-integer partials, single-division gamma."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import temporal_variogram

    return temporal_variogram(read_raster(n_days=2), variable="t2m", max_lag_hours=6)


def raster_decompose(sf_dir: str) -> rd.Dataset:
    """Classical seasonal-trend decomposition (x = trend + seasonal +
    residual) per cell over four days of hourly t2m — centered 25-hour
    moving-average trend, per-hour-of-day seasonal, all in cleared
    denominators so no float sum ever accumulates in engine-dependent
    order (stages/stencil.seasonal_decompose).  Bit-exact vs the SQL
    window twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import seasonal_decompose

    return seasonal_decompose(read_raster(n_days=4), variable="t2m").sort(
        ["cell_row", "cell_col", "valid_time"]
    )


def raster_spearman(sf_dir: str) -> rd.Dataset:
    """Spearman rank correlation between t2m and tp per hour slice over
    two days — monotone cross-variable association without linearity
    (stages/stencil.spearman_slices: doubled average ranks are exact
    integers, slices co-shuffled fixed-shard, one mirrored rho chain).
    Bit-exact vs the SQL window-rank twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import spearman_slices

    return spearman_slices(read_raster(n_days=2)).sort("valid_time")


def raster_mannkendall(sf_dir: str) -> rd.Dataset:
    """Mann-Kendall monotonic-trend test per raster cell over two days
    of hourly t2m — S statistic, tie-corrected variance and
    continuity-corrected z (stages/stencil.mann_kendall): cells
    fixed-shard co-shuffled, O(T^2) pair scan vectorized per cell,
    exact-integer statistics to one /18 division and a sqrt."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import mann_kendall

    return mann_kendall(read_raster(n_days=2), variable="t2m").sort(
        ["cell_row", "cell_col"]
    )


def raster_flowdir(sf_dir: str) -> rd.Dataset:
    """D8 steepest-descent flow direction per (cell, hour) over two days
    of the integer-valued field — the hydrology raster operator
    (stages/stencil.flow_direction: halo-exchange banding, vectorized
    8-neighbor drop argmax, ties to the smallest direction, pits = -1).
    Pure integer comparisons — bit-exact vs the SQL 8-neighbor
    self-join twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import flow_direction

    return flow_direction(read_raster(n_days=2), variable="t2m").sort(
        ["valid_time", "cell_row", "cell_col"]
    )


def raster_flow_acc(sf_dir: str) -> rd.Dataset:
    """D8 flow accumulation + basin label per (cell, hour) over two days
    — the global-dependency hydrology pair on top of raster_flowdir
    (stages/hydro.flow_hydrology: row-band contraction, vectorized token
    walks, perimeter-cardinality solve — the Barnes trillion-cell DEM
    shape).  Exact integer counts; bit-exact vs the recursive-CTE SQL
    walk twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.hydro import flow_hydrology
    from geoglue_ray.stages.stencil import flow_direction

    return flow_hydrology(
        flow_direction(read_raster(n_days=1), variable="t2m")
    ).sort(["valid_time", "cell_row", "cell_col"])


def raster_sen_slope(sf_dir: str) -> rd.Dataset:
    """Theil-Sen robust trend per raster cell over two days of hourly
    t2m — median of pairwise slopes + Conover intercept, the standard
    robust companion to raster_mannkendall (stages/stencil.theil_sen:
    the same fixed-shard cell co-shuffle, one vectorized triu slope
    block per cell).  Integer x/h make each slope ONE division, and
    DuckDB's even-count median averages the two middle elements exactly
    like np.median (measured on formula-divergent pairs), so the SQL
    self-join twin is bit-exact."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import theil_sen

    return theil_sen(read_raster(n_days=2), variable="t2m").sort(
        ["cell_row", "cell_col"]
    )


def emerging_hotspots(sf_dir: str, n_shards: int = 32) -> rd.Dataset:
    """Emerging hot-spot analysis (the ArcGIS space-time pattern tool):
    Getis-Ord Gi* per (cell, hour) over two days, then per cell the
    Mann-Kendall S trend of the z series, hot/cold slice counts at
    |z| >= 1.96, and a categorical verdict (intensifying / waning /
    persistent hot or cold) — a pure composition of two bit-exact
    operators plus integer CASE logic, so the composed SQL twin matches
    bit-for-bit (float sign/threshold comparisons act on z values that
    are themselves bit-identical across engines)."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import getis_ord

    gi = getis_ord(read_raster(n_days=2), variable="t2m")
    T0 = np.datetime64(fx.T0, "us")

    def prep(b: pa.Table) -> pa.Table:
        r = b["cell_row"].to_numpy().astype(np.int64)
        c = b["cell_col"].to_numpy().astype(np.int64)
        cell = r * np.int64(1 << 20) + c
        shard = (
            (cell.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        hour = (
            (b["valid_time"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        )
        return pa.table(
            {
                "_s": pa.array(shard),
                "cell": pa.array(cell),
                "hour": pa.array(hour),
                "z": b["g_star"],
            }
        )

    def classify(g) -> pa.Table:
        empty = pa.table(
            {
                "cell_row": pa.array([], pa.int64()),
                "cell_col": pa.array([], pa.int64()),
                "n_slices": pa.array([], pa.int64()),
                "hot_count": pa.array([], pa.int64()),
                "cold_count": pa.array([], pa.int64()),
                "s_stat": pa.array([], pa.int64()),
                "category": pa.array([], pa.string()),
            }
        )
        if len(g) == 0:
            return empty
        cell = g["cell"].to_numpy().astype(np.int64)
        hour = g["hour"].to_numpy().astype(np.int64)
        z = g["z"].to_numpy()
        o = np.lexsort((hour, cell))
        cell, z = cell[o], z[o]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        out = {k: [] for k in ("cell", "n", "hot", "cold", "s")}
        for s0, e0 in zip(starts, ends):
            zs = z[s0:e0]
            d = zs[None, :] - zs[:, None]
            iu = np.triu_indices(len(zs), k=1)
            out["cell"].append(cell[s0])
            out["n"].append(e0 - s0)
            out["hot"].append(int((zs >= 1.96).sum()))
            out["cold"].append(int((zs <= -1.96).sum()))
            out["s"].append(int(np.sign(d[iu]).sum()))
        cc = np.asarray(out["cell"], np.int64)
        hot = np.asarray(out["hot"], np.int64)
        cold = np.asarray(out["cold"], np.int64)
        s = np.asarray(out["s"], np.int64)
        cat = np.where(
            (hot == 0) & (cold == 0),
            "none",
            np.where(
                hot > cold,
                np.where(s > 0, "intensifying hot",
                         np.where(s < 0, "waning hot", "persistent hot")),
                np.where(
                    cold > hot,
                    np.where(s < 0, "intensifying cold",
                             np.where(s > 0, "waning cold", "persistent cold")),
                    "mixed",
                ),
            ),
        )
        return pa.table(
            {
                "cell_row": pa.array(cc >> np.int64(20)),
                "cell_col": pa.array(cc & np.int64((1 << 20) - 1)),
                "n_slices": pa.array(np.asarray(out["n"], np.int64)),
                "hot_count": pa.array(hot),
                "cold_count": pa.array(cold),
                "s_stat": pa.array(s),
                "category": pa.array(cat),
            }
        )

    return (
        gi.map_batches(prep, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(classify, batch_format="pandas")
        .sort(["cell_row", "cell_col"])
    )


def raster_cusum(sf_dir: str) -> rd.Dataset:
    """CUSUM max-drawup change-point statistic per raster cell over two
    days of hourly t2m — when did the series shift upward
    (stages/stencil.cusum_drawup): cleared-denominator prefix deviations
    D_k = n*S_k - k*Tot in pure int64, running-min-with-resets vectorized
    by ragged-to-dense padding + one np.minimum.accumulate per task,
    FIRST hour attaining the max.  Bit-exact vs the window-function SQL
    twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import cusum_drawup

    return cusum_drawup(read_raster(n_days=2), variable="t2m").sort(
        ["cell_row", "cell_col"]
    )


def raster_variogram(sf_dir: str) -> pa.Table:
    """Empirical semivariogram (lags 1-4, axis-aligned pairs) per hourly
    slice over two days — the kriging-precursor geostatistics operator
    (stages/stencil.variogram): banded halo-exchange pair generation,
    all-integer partials at (slice x lag) cardinality, single-division
    gamma mirrored by the SQL self-join twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import variogram

    return variogram(read_raster(n_days=2), variable="t2m", max_lag=4)


def raster_clumps(sf_dir: str) -> rd.Dataset:
    """Raster region labeling ("clump"): connected components of
    same-class 4-adjacent cells on the hour-0 slice, one row per region
    (region_id = lowest cell id, class, size).  Halo-exchange edge
    generation composed with the distributed min-label propagation of
    duplicate_clusters (stages/stencil.clump_regions)."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import clump_regions

    T0 = pa.scalar(np.datetime64(fx.T0, "us"), pa.timestamp("us"))

    def hour0(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["valid_time"], T0))

    # clump_regions consumes ds TWICE (edge gen + cell rows): materialize
    # the pruned hour-0 slice so the generator lineage runs once
    # (CLAUDE.md round-3 rule; at scale, re-read from storage instead)
    ds = (
        read_raster(n_days=1)
        .map_batches(hour0, batch_format="pyarrow")
        .materialize()
    )
    return clump_regions(ds, variable="t2m", class_div=16).sort("region_id")


def triangle_parts(sf_dir: str) -> pa.Table:
    """Per-part triangle counts over the part co-purchase graph — the
    wedge-enumeration graph aggregate (stages/graph.py: degree-ordered
    orientation, fixed-shard wedge generation, co-shuffled edge-set
    membership; never an edge-set broadcast)."""
    from geoglue_ray.stages.graph import basket_edges, triangle_counts

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    t = triangle_counts(basket_edges(li, "l_orderkey", "l_partkey"))
    return t.rename_columns(["part_key", "n_triangles"])


def weighted_sample_docs(sf_dir: str, k: int = 20) -> rd.Dataset:
    """Length-biased deterministic sample: k docs per language, inclusion
    probability ~proportional to n_chars (sequential Poisson sampling
    with priority ``kmv_hash64(doc_id) // n_chars`` — stages/sample.
    weighted_sample; the grouped-weighted counterpart of
    stratified_sample).  Two-level top-k, no corpus shuffle."""
    from geoglue_ray.stages.sample import weighted_sample

    ds = read_documents_cols(sf_dir, ["doc_id", "lang", "n_chars"])
    out = weighted_sample(ds, "lang", "doc_id", "n_chars", k)
    return out.sort(["lang", "rank"])


def pack_documents(sf_dir: str) -> rd.Dataset:
    """Greedy sequence packing per language: documents in doc_id order
    fill 2048-char context windows; a new pack opens when the running
    size would overflow (stages/sample.greedy_pack — sharded by stratum,
    sequential within, the inherent shape of order-dependent packing).
    The SQL twin replays the recurrence with a recursive CTE."""
    from geoglue_ray.stages.sample import greedy_pack

    ds = read_documents_cols(sf_dir, ["doc_id", "lang", "n_chars"])
    out = greedy_pack(ds, "lang", "n_chars", "doc_id", capacity=2048)
    return out.select_columns(
        ["doc_id", "lang", "n_chars", "pack_id", "pack_fill"]
    ).sort("doc_id")


def time_weighted_user_value(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Time-weighted mean per user — the sensor/reanalysis aggregation
    (each reading holds until the next one; CDO-style interval weighting)
    over the event log: ``sum(v_i * dt_i) / sum(dt_i)`` with dt in whole
    seconds and the measure integerized (floor), so both sums are exact
    int64 and the single division is bit-exact vs the lead() SQL twin.
    Total order (ts, event_id) breaks ties identically on both sides;
    a single-event user has no interval and yields NULL/NaN.

    Scale shape: users co-locate via ``hash(user) % n_shards``; one
    lexsort + edge-zeroed reduceat pass per shard — only (user, ts, id,
    value) rows shuffle, output is user-cardinality."""
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        shard = (int_hash64(uid) % np.uint64(n_shards)).astype(np.int64)
        return b.append_column("_us", pa.array(shard))

    def twm(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        v = np.floor(g["value"].to_numpy()).astype(np.int64)
        o = np.lexsort((eid, t, uid))
        uid, t, v = uid[o], t[o], v[o]
        same = uid[1:] == uid[:-1]  # edge i connects rows i, i+1
        dt = (t[1:] - t[:-1]) // 1_000_000
        num = np.r_[np.where(same, v[:-1] * dt, 0), 0]
        den = np.r_[np.where(same, dt, 0), 0]
        starts = np.flatnonzero(np.r_[True, ~same])
        nsum = np.add.reduceat(num, starts)
        dsum = np.add.reduceat(den, starts)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = nsum.astype(np.float64) / dsum.astype(np.float64)
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "n_events": np.diff(np.r_[starts, len(uid)]).astype(np.int64),
                "tw_mean": mean,
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_us")
        .map_groups(twm, batch_format="pandas")
        .sort("user_id")
    )


def user_event_paths(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Ordered collect-list per key — the sequence-building shape a
    training-data pipeline uses to turn an event log into per-user
    behavior strings.  Co-locate by user (fixed-shard), one lexsort per
    shard with a TOTAL order (ts, event_id — ties must break identically
    to the SQL twin's ``ORDER BY``), then slice-join each user's ordered
    event types into one path string.  Per-user state is bounded by path
    length; only (user, type, ts, id) rows shuffle."""
    from geoglue_ray.functions.texthash import int_hash64

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts", "event_id"]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        return pa.table(
            {
                "_ps": pa.array((int_hash64(uid) % np.uint64(n_shards)).astype(np.int64)),
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "ts": b["ts"],
                "event_id": b["event_id"],
            }
        )

    def paths(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        brk = np.r_[True, uid[1:] != uid[:-1]] if len(uid) else np.zeros(0, bool)
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(uid)]
        users = uid[starts]
        joined = [">".join(et[s:e]) for s, e in zip(starts, ends)]
        return pa.table(
            {
                "user_id": pa.array(users),
                "path": pa.array(joined, pa.string()),
                "n_events": pa.array((ends - starts).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_ps")
        .map_groups(paths, batch_format="pyarrow")
        .sort("user_id")
    )


def media_resize(sf_dir: str) -> rd.Dataset:
    """Image-span resize path: explode -> decode (stub, SQL-replicable
    bytes) -> block-mean resize in a bounded-batch actor pool; projected
    to the integer checksum the oracle recomputes byte-for-byte."""
    from geoglue_ray.stages.media import DecodeMedia, ResizeMedia, explode_media_spans

    ds = read_corpus(sf_dir, with_spans=True)
    media = ds.map_batches(explode_media_spans, batch_format="pyarrow")
    images = media.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], "image")), batch_format="pyarrow"
    )
    resized = images.map_batches(
        DecodeMedia, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4)
    ).map_batches(
        ResizeMedia, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4)
    )

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "span_index": b["span_index"],
                "resized_len": pa.array(
                    np.full(len(b), len(b["resized"][0].as_py()) if len(b) else 0, np.int64)
                ),
                "resized_sum": b["resized_sum"],
            }
        )

    return resized.map_batches(project, batch_format="pyarrow").sort(
        ["doc_id", "span_index"]
    )


def media_frames(sf_dir: str) -> rd.Dataset:
    """Audio/video frame sampling: explode -> decode -> every-2nd-frame
    explode (one row per sampled frame) with the SQL-replicable per-frame
    byte sum."""
    from geoglue_ray.stages.media import DecodeMedia, FrameSampler, explode_media_spans

    ds = read_corpus(sf_dir, with_spans=True)
    media = ds.map_batches(explode_media_spans, batch_format="pyarrow")
    audio = media.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], "audio")), batch_format="pyarrow"
    )
    frames = audio.map_batches(
        DecodeMedia, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4)
    ).map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4)
    )
    out = frames.select_columns(["doc_id", "span_index", "frame_index", "frame_sum"])
    return out.sort(["doc_id", "span_index", "frame_index"])


def running_user_total(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Per-row running total — ``SUM(floor(value)) OVER (PARTITION BY
    user ORDER BY ts, event_id)`` — the ordered-window shape: co-partition
    by ``hash(user) % n_shards`` (FIXED group count), one lexsort +
    segment-reset cumsum per shard for ALL of its users; ties broken by
    event_id so the frame order is deterministic on both sides."""
    import pandas as pd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return pa.table(
            {
                "_us": pa.array(shard),
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts": b["ts"],
                "v": pa.array(np.floor(b["value"].to_numpy())),
            }
        )

    def running(g: pd.DataFrame) -> pd.DataFrame:
        eid = g["event_id"].to_numpy()
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        v = g["v"].to_numpy()
        o = np.lexsort((eid, ts, uid))
        eid, uid, ts, v = eid[o], uid[o], ts[o], v[o]
        cum = np.cumsum(v)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        base = np.r_[0.0, cum[starts[1:] - 1]] if len(starts) else np.array([])
        run = cum - np.repeat(base, np.diff(np.r_[starts, len(uid)]))
        return pd.DataFrame(
            {"event_id": eid, "user_id": uid, "ts": ts, "running_sum": run}
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_us")
        .map_groups(running, batch_format="pandas")
    )
    return out.sort("event_id")


def pivot_daily_events(sf_dir: str) -> rd.Dataset:
    """Long -> wide pivot over the fixed event-type vocabulary: one row
    per day, one count column per type (stages/reshape.pivot_counts:
    per-batch wide partials, fixed-bucket vectorized merge)."""
    from geoglue_ray.stages.reshape import pivot_counts

    cats = ["click", "error", "purchase", "signup", "view"]
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        day = b["ts"].to_numpy().astype("datetime64[D]").astype("datetime64[us]")
        return pa.table({"day": pa.array(day), "event_type": b["event_type"]})

    out = pivot_counts(ds.map_batches(prep, batch_format="pyarrow"), "day", "event_type", cats)
    return out.sort("day")


def heavy_hitters_check(sf_dir: str) -> rd.Dataset:
    """Driver-visible count-min accuracy gate (the approx_distinct_check
    pattern): exact top-10 users by event count (fixed-shard top-k) plus
    a boolean asserting the CMS point estimate respects est >= exact
    (the DETERMINISTIC one-sided CMS guarantee) and a depth-slackened
    overestimate bound est - exact <= depth * ceil(e/width * N).  The
    tight single-slack bound only holds w.p. ~1-e^-depth per key, so a
    width/SF/hash change could flip a CORRECT sketch red at the driver
    (ADVICE r3) — the tight bound is asserted at pytest level instead
    (tests/test_sketch.py).  The oracle recomputes the exact counts and
    asserts TRUE, so a real sketch regression still fails the driver's
    hash compare."""
    import math

    from geoglue_ray.stages.sketch import count_min_counts, topk_counts

    WIDTH = 4096
    DEPTH = 4
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    top = topk_counts(ds, "user_id", 10).to_pandas()  # bounded: 10 rows
    n_total = ds.count()
    est = count_min_counts(
        ds, "user_id", top["user_id"].to_numpy(), width=WIDTH, depth=DEPTH
    )
    exact = top["n"].to_numpy()
    slack = math.ceil(math.e / WIDTH * n_total)
    ok = (est >= exact) & (est - exact <= DEPTH * slack)
    out = pa.table(
        {
            "user_id": pa.array(top["user_id"].to_numpy()),
            "n_events": pa.array(exact.astype(np.float64)),
            "within_bounds": pa.array(ok),
        }
    )
    return rd.from_arrow(out).sort("user_id")


def melt_daily_events(sf_dir: str) -> rd.Dataset:
    """Pivot -> melt roundtrip: the wide per-day count matrix unpivoted
    back to long (day, metric, n) — both reshape directions driven in
    one oracle-checked pipeline."""
    from geoglue_ray.stages.reshape import melt, pivot_counts

    cats = ["click", "error", "purchase", "signup", "view"]
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        day = b["ts"].to_numpy().astype("datetime64[D]").astype("datetime64[us]")
        return pa.table({"day": pa.array(day), "event_type": b["event_type"]})

    wide = pivot_counts(ds.map_batches(prep, batch_format="pyarrow"), "day", "event_type", cats)
    long = melt(wide, ["day"], [f"n_{c}" for c in cats], var_name="metric", value_name="n")
    return long.sort(["day", "metric"])


def zorder_events(sf_dir: str) -> rd.Dataset:
    """Morton / Z-order locality key per event at tile level 10 — the
    key a spatial layout sorts or range-partitions output by so near
    cells co-locate in blocks (100-TB range-read pruning).  The SQL twin
    replays the magic-number bit spreading with BIGINT bit ops."""
    from geoglue_ray.cells import zorder_key

    LEVEL = 10
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def keyed(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        lon, lat = fx.derive_lonlat(ids)
        n = 1 << LEVEL
        x = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
        y = np.clip(((lat + 90.0) / 180.0 * (n >> 1)).astype(np.int64), 0, (n >> 1) - 1)
        return pa.table(
            {
                "event_id": b["event_id"],
                "cell_x": pa.array(x),
                "cell_y": pa.array(y),
                "zkey": pa.array(zorder_key(x, y)),
            }
        )

    return ds.map_batches(keyed, batch_format="pyarrow").sort("event_id")


def hilbert_events(sf_dir: str) -> rd.Dataset:
    """Hilbert-curve locality key per event at tile level 10 — the
    stronger spatial layout key next to zorder_events (a Hilbert walk
    never jumps, so range reads over hkey-sorted output touch fewer
    blocks at the same selectivity; cells.hilbert_key).  Exact integer
    reflect/rotate arithmetic per bit level — bit-exact vs the
    recursive-CTE SQL twin replaying the same xy2d levels."""
    from geoglue_ray.cells import hilbert_key

    LEVEL = 10
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def keyed(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        lon, lat = fx.derive_lonlat(ids)
        n = 1 << LEVEL
        x = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
        y = np.clip(((lat + 90.0) / 180.0 * (n >> 1)).astype(np.int64), 0, (n >> 1) - 1)
        return pa.table(
            {
                "event_id": b["event_id"],
                "cell_x": pa.array(x),
                "cell_y": pa.array(y),
                "hkey": pa.array(hilbert_key(x, y, order=LEVEL)),
            }
        )

    return ds.map_batches(keyed, batch_format="pyarrow").sort("event_id")


def media_ref_parse(sf_dir: str) -> rd.Dataset:
    """Compiled-regex actor-pool extraction: parse the media_ref URI into
    typed id columns (pattern compiles once per actor in __init__, the
    per-batch work is Arrow's vectorized extract_regex kernel)."""
    from geoglue_ray.stages.media import explode_media_spans
    from geoglue_ray.stages.text import RegexExtractor

    ds = read_corpus(sf_dir, with_spans=True)
    media = ds.map_batches(explode_media_spans, batch_format="pyarrow")
    parsed = media.map_batches(
        RegexExtractor,
        fn_constructor_kwargs={
            "pattern": r"media/(?P<ref_doc>\d+)/(?P<ref_span>\d+)",
            "group_types": {"ref_doc": pa.int64(), "ref_span": pa.int32()},
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    out = parsed.select_columns(["doc_id", "span_index", "ref_doc", "ref_span"])
    return out.sort(["doc_id", "span_index"])


def events_in_windows(sf_dir: str, key_mod: int = 1) -> rd.Dataset:
    """Point-in-interval join across two DISTINCT tables (the big-big
    range-join shape session_overlaps only exercised as a self-join):
    events (points) against 15k order-derived promo windows — each order
    opens a window of 1..48 hours at a deterministic offset inside the
    events month (orders' own dates are 1995-2001, disjoint from the
    events epoch, so the window table is derived arithmetically from
    o_orderkey; the mapping is mirrored in SQL).  ~520 windows cover any
    instant, so the join yields ~5M pairs, aggregated per priority with
    exact integer sums."""
    from geoglue_ray.stages.join import interval_join
    from geoglue_ray.stages.zonal import zonal_aggregate

    HOUR = 3_600_000_000
    EPOCH = int(np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64))

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def pts(b: pa.Table) -> pa.Table:
        t = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {"e_ts": pa.array(t), "v": pa.array(np.floor(b["value"].to_numpy()))}
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def wins(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy()
        if key_mod > 1:  # bench-scale bound: output pairs scale with |windows|
            keep = k % key_mod == 0
            b, k = b.filter(pa.array(keep)), k[keep]
        ws = EPOCH + (k % 720) * HOUR
        we = ws + (1 + k % 48) * HOUR
        return pa.table(
            {"pri": b["o_orderpriority"], "w_start": pa.array(ws), "w_end": pa.array(we)}
        )

    joined = interval_join(
        ev.map_batches(pts, batch_format="pyarrow"),
        orders.map_batches(wins, batch_format="pyarrow"),
        on=("e_ts", "e_ts", "w_start", "w_end"),
        bucket_width=HOUR,  # <=49 buckets per window, 1 per event point
    )
    agg = zonal_aggregate(joined, ["count", "sum"], keys=["pri"], value_col="v")

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {"pri": b["pri"], "n_events": b["count"], "sum_val": b["sum"]}
        )

    return agg.map_batches(rename, batch_format="pyarrow").sort("pri")


def session_overlaps(sf_dir: str, gap_minutes: int = 30, n_shards: int = 64) -> rd.Dataset:
    """Interval self-overlap join: pairs of OVERLAPPING sessions from
    different users, counted per day of the overlap start — the general
    big-big interval-join shape: explode each interval to its covering
    hour buckets (fan-out bounded by interval length), co-shuffle on
    ``hash(bucket) % n_shards``, generate candidate pairs per bucket run
    (one lexsort + triu per task), and count each pair EXACTLY ONCE by
    keeping it only in the bucket containing ``max(start_a, start_b)``
    (the overlap start lies inside both intervals, so exactly one bucket
    qualifies).  Same-user sessions never overlap by construction (gap
    rule), so distinct-user filtering loses nothing."""
    import pandas as pd

    from geoglue_ray.stages.dedup import _run_pairs

    HOUR = 3_600_000_000  # microseconds
    DAY = 24 * HOUR
    gap = np.timedelta64(gap_minutes * 60, "s")

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return pa.table({"_us": pa.array(shard), "user_id": b["user_id"], "ts": b["ts"]})

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        o = np.lexsort((ts, uid))
        uid, ts = uid[o], ts[o]
        brk = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            brk[1:] = (uid[1:] != uid[:-1]) | (np.diff(ts) > gap)
        starts = np.nonzero(brk)[0]
        ends = np.concatenate([starts[1:], [len(uid)]]) - 1
        t64 = ts.astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {"user_id": uid[starts], "s_start": t64[starts], "s_end": t64[ends]}
        )

    sess = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_us")
        .map_groups(sessions, batch_format="pandas")
    )

    def explode(b: pa.Table) -> pa.Table:
        s = b["s_start"].to_numpy()
        e = b["s_end"].to_numpy()
        b0 = s // HOUR
        k = (e // HOUR - b0 + 1).astype(np.int64)
        row = np.repeat(np.arange(len(b)), k)
        within = np.arange(int(k.sum())) - np.repeat(np.cumsum(k) - k, k)
        bucket = b0[row] + within
        shard = (
            (bucket.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_bs": pa.array(shard),
                "bucket": pa.array(bucket),
                "user_id": pa.array(b["user_id"].to_numpy()[row]),
                "s_start": pa.array(s[row]),
                "s_end": pa.array(e[row]),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        bk = g["bucket"].to_numpy()
        uid = g["user_id"].to_numpy()
        s = g["s_start"].to_numpy()
        e = g["s_end"].to_numpy()
        o = np.lexsort((s, uid, bk))
        bk, uid, s, e = bk[o], uid[o], s[o], e[o]
        ia, ib = _run_pairs(bk)
        if len(ia) == 0:
            return pd.DataFrame({"day": pd.array([], dtype="datetime64[us]")})
        o_start = np.maximum(s[ia], s[ib])
        keep = (
            (uid[ia] != uid[ib])
            & (s[ia] <= e[ib])
            & (s[ib] <= e[ia])
            & (o_start // HOUR == bk[ia])
        )
        day = ((o_start[keep] // DAY) * DAY).astype("datetime64[us]")
        return pd.DataFrame({"day": day})

    pair_days = (
        sess.map_batches(explode, batch_format="pyarrow")
        .groupby("_bs")
        .map_groups(pairs, batch_format="pandas")
    )

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("one", pa.array(np.ones(len(b))))

    out = zonal_aggregate(
        pair_days.map_batches(tag, batch_format="pyarrow"),
        ["count"],
        keys=["day"],
        value_col="one",
    )

    def rename(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("count")
        return b.set_column(i, "n_overlaps", b["count"])

    return out.map_batches(rename, batch_format="pyarrow").sort("day")


def value_share_by_type(sf_dir: str) -> rd.Dataset:
    """Ratio-to-report window — ``v / SUM(v) OVER (PARTITION BY type)``
    — without a row shuffle: the per-type totals (key-cardinality rows)
    aggregate first, broadcast, and the share is one exact division per
    row in a second streaming pass."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "v": pa.array(np.floor(b["value"].to_numpy())),
            }
        )

    pv = ds.map_batches(prep, batch_format="pyarrow")
    totals = (
        zonal_aggregate(pv, ["sum"], keys=["event_type"], value_col="v")
        .to_pandas()  # bounded: one row per event type
    )
    keys = np.sort(totals["event_type"].to_numpy())
    tot = totals.set_index("event_type").loc[keys, "sum"].to_numpy()

    def share(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy()
        t = tot[np.searchsorted(keys, et)]
        return pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "v": b["v"],
                "share": pa.array(v / t),
            }
        )

    return pv.map_batches(share, batch_format="pyarrow").sort("event_id")


def user_growth(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Cumulative-distinct growth curve — new users per day + running
    total — the scale-right way: COUNT(DISTINCT) over time collapses to
    a per-user MIN (each user's first event), computed per shard over
    ``hash(user) % n_shards`` (all of a user's rows co-locate; one
    lexsort+reduceat per shard), then a tiny day-cardinality aggregate
    and one in-task cumulative sum over the bounded day rows."""
    import pandas as pd

    DAY = 24 * 3_600_000_000

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return pa.table({"_us": pa.array(shard), "user_id": b["user_id"], "ts": b["ts"]})

    def first_seen(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        o = np.lexsort((t, uid))
        uid, t = uid[o], t[o]
        first = np.r_[True, uid[1:] != uid[:-1]]
        day = (t[first] // DAY) * DAY
        return pd.DataFrame({"day": day.astype("datetime64[us]"), "one": 1.0})

    firsts = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_us")
        .map_groups(first_seen, batch_format="pandas")
    )
    daily = zonal_aggregate(firsts, ["count"], keys=["day"], value_col="one")

    def cumulate(g: pd.DataFrame) -> pd.DataFrame:
        # one task over the bounded day-cardinality rows
        g = g.sort_values("day", kind="mergesort").reset_index(drop=True)
        return pd.DataFrame(
            {
                "day": g["day"],
                "new_users": g["count"],
                "cum_users": g["count"].cumsum(),
            }
        )

    out = daily.map_batches(
        lambda b: b.append_column("_all", pa.array(np.zeros(len(b), np.int64))),
        batch_format="pyarrow",
    ).groupby("_all").map_groups(cumulate, batch_format="pandas")
    return out.sort("day")


_EV_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")  # events-table epoch
_DAY_US = 86_400_000_000


def retention_matrix(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Cohort retention matrix — the product-analytics staple: users
    cohorted by their FIRST activity day, then for every (cohort day,
    activity day) the distinct returning users, the cohort size and the
    retention rate (one division of exact integer counts; day grain —
    week grain is degenerate on this corpus, every user starts in week
    0 and stays active).

    Scale shape: users co-locate on ``hash(user) % n_shards``, so each
    shard computes its users' first weeks and distinct (user, week)
    pairs exactly in one lexsort pass and emits (cohort, week)-
    cardinality integer partials — VALID to sum globally because each
    user lives in exactly one shard (the od_matrix rule).  The matrix
    itself is weeks^2 tiny; the corpus is never shuffled by raw key."""
    import pandas as pd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        day = (
            (b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
             - _EV_EPOCH.astype(np.int64))
            // _DAY_US
        )
        return pa.table(
            {
                "_us": pa.array(shard),
                "user_id": b["user_id"],
                "day": pa.array(day),
            }
        )

    def partial(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "cohort_day": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        uid = g["user_id"].to_numpy().astype(np.int64)
        wk = g["day"].to_numpy().astype(np.int64)
        o = np.lexsort((wk, uid))
        uid, wk = uid[o], wk[o]
        ufirst = np.r_[True, uid[1:] != uid[:-1]]
        ustarts = np.flatnonzero(ufirst)
        cohort_of = wk[ustarts][np.cumsum(ufirst) - 1]  # per row: user's min day
        # distinct (user, week) rows
        dk = np.r_[True, (uid[1:] != uid[:-1]) | (wk[1:] != wk[:-1])]
        key = cohort_of[dk] * np.int64(1 << 20) + wk[dk]
        ks, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "cohort_day": pa.array(ks >> np.int64(20)),
                "day": pa.array(ks & np.int64((1 << 20) - 1)),
                "n_users": pa.array(cnt.astype(np.int64)),
            }
        )

    rows = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_us")
        .map_groups(partial, batch_format="pandas")
        .to_pandas()
    )
    agg = rows.groupby(["cohort_day", "day"], as_index=False)["n_users"].sum()
    sizes = agg[agg["day"] == agg["cohort_day"]].set_index("cohort_day")[
        "n_users"
    ]  # day 0 of a cohort contains every member by construction
    cs = sizes.loc[agg["cohort_day"]].to_numpy().astype(np.int64)
    out = pa.table(
        {
            "cohort_day": pa.array(agg["cohort_day"].to_numpy().astype(np.int64)),
            "day": pa.array(agg["day"].to_numpy().astype(np.int64)),
            "n_users": pa.array(agg["n_users"].to_numpy().astype(np.int64)),
            "cohort_size": pa.array(cs),
            "retention_rate": pa.array(
                agg["n_users"].to_numpy().astype(np.float64) / cs.astype(np.float64)
            ),
        }
    )
    idx = pc.sort_indices(
        out, sort_keys=[("cohort_day", "ascending"), ("day", "ascending")]
    )
    return rd.from_arrow(out.take(idx))


def event_transitions(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """First-order Markov transition matrix over event types: for every
    consecutive event pair of a user (the (ts, event_id) total order),
    count (from_type -> to_type) and the row-conditional probability
    P(to|from) — one division of exact integer counts.  Same user-hash
    co-location as user_trajectories; partials collapse to the bounded
    |types|^2 matrix per shard before the driver-side exact sum."""
    import pandas as pd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return b.append_column("_us", pa.array(shard))

    def partial(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "from_type": pa.array([], pa.string()),
                "to_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        uid = g["user_id"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et, codes = np.unique(g["event_type"].to_numpy(), return_inverse=True)
        o = np.lexsort((eid, t, uid))
        uid, codes = uid[o], codes[o]
        same = uid[1:] == uid[:-1]
        pair = codes[:-1][same] * np.int64(1 << 20) + codes[1:][same]
        ks, cnt = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "from_type": pa.array(et[(ks >> np.int64(20)).astype(np.int64)]),
                "to_type": pa.array(et[(ks & np.int64((1 << 20) - 1)).astype(np.int64)]),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    rows = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_us")
        .map_groups(partial, batch_format="pandas")
        .to_pandas()
    )
    agg = rows.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
    tot = agg.groupby("from_type")["n"].transform("sum").to_numpy().astype(np.int64)
    out = pa.table(
        {
            "from_type": pa.array(agg["from_type"]),
            "to_type": pa.array(agg["to_type"]),
            "n_transitions": pa.array(agg["n"].to_numpy().astype(np.int64)),
            "row_total": pa.array(tot),
            "p": pa.array(agg["n"].to_numpy().astype(np.float64) / tot.astype(np.float64)),
        }
    )
    idx = pc.sort_indices(
        out, sort_keys=[("from_type", "ascending"), ("to_type", "ascending")]
    )
    return rd.from_arrow(out.take(idx))


def user_od_matrix(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Origin -> destination flow matrix across admin units: each user's
    FIRST and LAST event (by the (ts, event_id) total order) are
    assigned to admin-2 units through the broadcast PIP + kNN pool, and
    user counts aggregate per (origin, destination) pair — the
    commuting-matrix / migration-flow analysis, composing the spatial
    join with the user-hash co-location skeleton (all of a user's rows
    in one shard; one lexsort + run-detection pass per shard).  Partials
    collapse to the bounded |admin|^2 matrix per shard (integer-index
    packed) before the driver-side exact sum; names attach from the
    driver-resident admin pool after aggregation (narrow-shuffle
    principle)."""
    import pandas as pd
    import ray

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def derive(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts": b["ts"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    index = AdminIndex.build(build_admin_table())
    ds = ds.map_batches(derive, batch_format="pyarrow").map_batches(
        encode_cells, batch_format="pyarrow"
    )
    ds = spatial_join(ds, index_ref=ray.put(index), emit_names=False)

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
                "admin_idx": b["admin_idx"],
                "_us": pa.array(shard),
            }
        )

    K = np.int64(1 << 20)

    def od_partial(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"od": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        if len(g) == 0:
            return empty
        uid = g["user_id"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        adm = g["admin_idx"].to_numpy().astype(np.int64)
        o = np.lexsort((eid, t, uid))
        uid, adm = uid[o], adm[o]
        first = np.r_[True, uid[1:] != uid[:-1]]
        last = np.r_[first[1:], True]
        od = adm[first] * K + adm[last]
        ks, cnt = np.unique(od, return_counts=True)
        return pa.table({"od": pa.array(ks), "n": pa.array(cnt.astype(np.int64))})

    rows = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_us")
        .map_groups(od_partial, batch_format="pandas")
        .to_pandas()  # bounded: <= n_shards x |admin|^2 partial rows
    )
    agg = rows.groupby("od", as_index=False)["n"].sum()
    od = agg["od"].to_numpy().astype(np.int64)
    names = np.asarray(index.admin_id)
    out = pa.table(
        {
            "origin_id": pa.array(names[(od // K).astype(np.int64)]),
            "dest_id": pa.array(names[(od % K).astype(np.int64)]),
            "n_users": pa.array(agg["n"].to_numpy().astype(np.int64)),
        }
    )
    idx = pc.sort_indices(
        out, sort_keys=[("origin_id", "ascending"), ("dest_id", "ascending")]
    )
    return rd.from_arrow(out.take(idx))


def cohort_growth(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Per-event-type cohort growth curves — the non-degenerate variant of
    :func:`user_growth` (whose fixture collapses to 2 days because every
    user's overall first event lands on day 1-2): a user's first event of
    EACH TYPE is spread across the whole month, so the five curves have
    real shape.  Same scale skeleton: per-user-shard first-seen reduction
    (all of a user's rows co-locate; one lexsort + run-detection pass per
    shard), a (type x day)-cardinality aggregate, then one in-task
    partitioned cumulative sum over the bounded curve rows."""
    import pandas as pd

    DAY = 24 * 3_600_000_000

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return b.append_column("_us", pa.array(shard))

    def first_seen(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        et_codes, et_uniq = pd.factorize(g["event_type"].to_numpy(), use_na_sentinel=False)
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        o = np.lexsort((t, et_codes, uid))
        uid, etc, t = uid[o], et_codes[o], t[o]
        first = np.r_[True, (uid[1:] != uid[:-1]) | (etc[1:] != etc[:-1])]
        day = (t[first] // DAY) * DAY
        return pd.DataFrame(
            {
                "event_type": et_uniq[etc[first]],
                "day": day.astype("datetime64[us]"),
                "one": 1.0,
            }
        )

    firsts = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_us")
        .map_groups(first_seen, batch_format="pandas")
    )
    daily = zonal_aggregate(firsts, ["count"], keys=["event_type", "day"], value_col="one")

    def cumulate(g: pd.DataFrame) -> pd.DataFrame:
        # one task over the bounded (type x day) curve rows
        g = g.sort_values(["event_type", "day"], kind="mergesort").reset_index(drop=True)
        n = g["count"].to_numpy()
        cum = np.cumsum(n)
        etc, _ = pd.factorize(g["event_type"].to_numpy(), use_na_sentinel=False)
        seg_start = np.r_[True, etc[1:] != etc[:-1]]
        base = np.repeat(np.r_[0.0, cum[:-1]][seg_start], np.diff(np.r_[np.flatnonzero(seg_start), len(etc)]))
        return pd.DataFrame(
            {
                "event_type": g["event_type"],
                "day": g["day"],
                "new_users": n,
                "cum_users": cum - base,
            }
        )

    out = daily.map_batches(
        lambda b: b.append_column("_all", pa.array(np.zeros(len(b), np.int64))),
        batch_format="pyarrow",
    ).groupby("_all").map_groups(cumulate, batch_format="pandas")
    return out.sort(["event_type", "day"])


def raster_tri(sf_dir: str) -> rd.Dataset:
    """Terrain Ruggedness Index per (cell, hour) over two days — sum and
    mean absolute difference to the up-to-8 existing neighbors
    (stages/terrain.ruggedness: halo-exchange banding, vectorized
    8-neighbor abs-diff accumulation, one final division).  The <=8-term
    integer sum is exact, so the SQL 8-neighbor join twin is
    bit-exact."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.terrain import ruggedness

    return ruggedness(read_raster(n_days=2), variable="t2m").sort(
        ["valid_time", "cell_row", "cell_col"]
    )


def raster_aspect(sf_dir: str) -> rd.Dataset:
    """Aspect octant per (cell, hour) over two days — the 45-degree
    sector of the central-difference gradient, boundaries only on axes
    and diagonals so classification is pure sign / magnitude
    comparisons (stages/terrain.aspect_octant over focal_gradient's
    halo stencil).  Bit-exact vs the SQL CASE twin on raw
    differences."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.terrain import aspect_octant

    return aspect_octant(read_raster(n_days=2), variable="t2m").sort(
        ["valid_time", "cell_row", "cell_col"]
    )


def raster_viewshed(sf_dir: str) -> rd.Dataset:
    """West-edge line-of-sight visibility per (cell, hour) over one day
    — per raster row, which cells the row's west-most cell can see over
    the intervening terrain (stages/terrain.los_visibility: row-band
    scanline groups, one vectorized column sweep carrying the running
    best sight slope as an exact rational).  Cross-multiplied integer
    slope comparisons — bit-exact vs the SQL NOT-EXISTS blocking
    twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.terrain import los_visibility

    return los_visibility(read_raster(n_days=1), variable="t2m").sort(
        ["valid_time", "cell_row", "cell_col"]
    )


def events_hull(sf_dir: str) -> rd.Dataset:
    """Convex hull per event type over a deterministic 1/13 observation
    subsample — strict hull vertices only (stages/geometry.convex_hull:
    per-batch Akl-Toussaint discard + monotone chain partials, exact
    chain merge per key; cross products over dyadic coordinates are
    exact in doubles).  The subsample keeps the O(n^3) SQL edge-witness
    twin tractable; the engine path itself is corpus-scale (partial
    hulls are mergeable summaries)."""
    from geoglue_ray.stages.geometry import convex_hull

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    )

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pa.array(b["event_id"].to_numpy() % 13 == 0))
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "event_type": b["event_type"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    return convex_hull(
        ds.map_batches(prep, batch_format="pyarrow"), "event_type"
    ).sort(["event_type", "lon", "lat"])


def traj_simplify(sf_dir: str) -> rd.Dataset:
    """Douglas-Peucker trajectory simplification per user (exact
    triangle-area criterion |cross| > 2^41 on integer-scaled dyadic
    coordinates — area, not distance, so no squared cross product
    leaves int64 exactness; stages/geometry.simplify_trajectories:
    fixed-shard user co-shuffle, every frontier segment advanced per
    round by one lexsort + run-argmax pass).  Returns the retained
    vertices; bit-exact vs the recursive-CTE split twin."""
    from geoglue_ray.stages.geometry import simplify_trajectories

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def prep(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    return simplify_trajectories(
        ds.map_batches(prep, batch_format="pyarrow"), eps_area=1 << 41
    ).sort(["user_id", "seq"])


def raster_focal_mode(sf_dir: str) -> rd.Dataset:
    """3x3 focal mode (majority filter) over one day — the categorical
    smoothing filter (stages/stencil.focal_stats op "mode": 81
    vectorized equality counts over the 9-gather stack, ties to the
    SMALLEST value).  Exact integer comparisons — bit-exact vs the SQL
    count-desc/value-asc row_number twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import focal_stats

    return focal_stats(
        read_raster(n_days=1), ops=("mode",), variable="t2m"
    ).sort(["cell_row", "cell_col", "valid_time"])


def traj_crossings(sf_dir: str) -> rd.Dataset:
    """Trajectory crossing counts between users over the city cluster —
    proper segment x segment intersections, the line-geometry spatial
    join (stages/geometry.segment_crossings: per-user segment build,
    bbox grid-cell replication, reference-point pair dedup, four exact
    integer orientation tests per candidate pair).  Bit-exact vs the
    SQL segment pair-join twin."""
    from geoglue_ray.stages.geometry import segment_crossings

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def prep(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        city = (ids % 128 != 0) & (ids % 10 < 3)
        b = b.filter(pa.array(city))
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    return segment_crossings(
        ds.map_batches(prep, batch_format="pyarrow"), cell=1.0 / 64.0
    ).sort(["user_a", "user_b"])


def raster_gapfill(sf_dir: str) -> rd.Dataset:
    """Linear nodata infill along raster rows over two days — every
    interior null cell interpolated between its nearest existing
    west/east row neighbors (stages/terrain.gap_fill_rows: scanline
    bands, forward/backward accumulate for nearest columns, exact
    integer numerator + one division).  Bit-exact vs the SQL window
    twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.terrain import gap_fill_rows

    return gap_fill_rows(read_raster(n_days=2), variable="t2m").sort(
        ["valid_time", "cell_row", "cell_col"]
    )


def raster_ewma(sf_dir: str) -> rd.Dataset:
    """Per-cell exponential moving average (alpha = 1/2) over two days
    of hourly values — e_t = (x_t + e_{t-1}) / 2, a fixed sequential
    chain of correctly-rounded halvings (stages/terrain.ewma_cells:
    cells fixed-shard co-shuffled, the recurrence advanced for all
    cells per time step).  Bit-exact vs the recursive-CTE twin
    replaying the identical chain."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.terrain import ewma_cells

    return ewma_cells(read_raster(n_days=2), variable="t2m").sort(
        ["cell_row", "cell_col", "valid_time"]
    )


def raster_isotonic(sf_dir: str) -> rd.Dataset:
    """Isotonic (monotone) regression per cell over one day — the
    max-min formula fit_i = max_{j<=i} min_{k>=i} mean(x_j..x_k) with
    every interval mean ONE division of exact integer prefix-sum
    differences (stages/terrain.isotonic_cells: (cells x T x T)
    vectorized blocks per shard).  Bit-exact vs the SQL
    window-cummin/group-max twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.terrain import isotonic_cells

    return isotonic_cells(read_raster(n_days=1), variable="t2m").sort(
        ["cell_row", "cell_col", "valid_time"]
    )


def raster_rolling_median(sf_dir: str) -> rd.Dataset:
    """Centered 5-hour rolling median per cell over two days — temporal
    rank-order smoothing with shrinking edge frames
    (stages/terrain.rolling_median_cells: one (cells x T x 5) gather +
    nanmedian per shard).  DuckDB's window median matches nanmedian's
    two-middle average bit-for-bit (measured)."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.terrain import rolling_median_cells

    return rolling_median_cells(read_raster(n_days=2), window=5).sort(
        ["cell_row", "cell_col", "valid_time"]
    )


def user_colocation(sf_dir: str) -> rd.Dataset:
    """Pairwise Jaccard similarity between users' visited-cell sets
    (1/64-degree grid) — co-location similarity via an inverted index:
    only pairs sharing a cell are generated, shared counts and set
    sizes reduce fixed-shard, one exact division per pair
    (stages/similarity.pairwise_set_jaccard).  Bit-exact vs the SQL
    join twin."""
    from geoglue_ray.stages.similarity import pairwise_set_jaccard

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id"]
    )

    def prep(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        cx = np.floor(lon * 64.0).astype(np.int64)
        cy = np.floor(lat * 64.0).astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "cell": pa.array((cx << np.int64(16)) | cy),
            }
        )

    return pairwise_set_jaccard(
        ds.map_batches(prep, batch_format="pyarrow"), "user_id", "cell"
    ).sort(["key_a", "key_b"])


def events_funnel_chained(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """CHAINED three-stage funnel (view -> click -> purchase): a user
    reaches stage k when a stage-k event exists STRICTLY after their
    earliest stage-(k-1) REACH time (any later click counts, unlike
    queries.event_funnel's first-touch rule, which compares first
    timestamps only — the two classic funnel semantics) — the product-analytics ordered-
    sequence operator.  Users co-shuffle fixed-shard; each shard
    resolves every stage for all its users in vectorized min-reductions
    (exact timestamp comparisons); per-shard stage counts sum in one
    bounded final pass.  Bit-exact vs the chained min-join SQL twin."""
    import pandas as pd

    STAGES = ("view", "click", "purchase")
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.is_in(b["event_type"], value_set=pa.array(STAGES)))
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return pa.table(
            {
                "_fu": pa.array(shard),
                "user_id": b["user_id"],
                "ts": b["ts"],
                "event_type": b["event_type"],
            }
        )

    def stages_counts(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "funnel_stage": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        uid = g["user_id"].to_numpy().astype(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        codes, uniq = pd.factorize(uid, use_na_sentinel=False)
        nu = len(uniq)
        reach = np.full(nu, -(2**62), np.int64)  # stage-0 sentinel
        alive = np.ones(nu, bool)
        counts = []
        for stage in STAGES:
            m = et == stage
            nxt = np.full(nu, np.iinfo(np.int64).max, np.int64)
            sel = m & alive[codes] & (ts > reach[codes])
            np.minimum.at(nxt, codes[sel], ts[sel])
            alive &= nxt != np.iinfo(np.int64).max
            reach = nxt
            counts.append(int(alive.sum()))
        return pa.table(
            {
                "funnel_stage": pa.array(np.arange(1, 4, dtype=np.int64)),
                "n": pa.array(np.array(counts, np.int64)),
            }
        )

    partial = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_fu")
        .map_groups(stages_counts, batch_format="pandas")
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("funnel_stage", as_index=False)["n"].sum()
        return out.rename(columns={"n": "n_users"})

    return (
        partial.repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
        .sort("funnel_stage")
    )


def events_ntile(sf_dir: str, n_tiles: int = 4, n_shards: int = 64) -> rd.Dataset:
    """NTILE(4) bucket per event within each user's (ts, id)-ordered
    history — the window-function quartile assignment: the first
    ``n mod k`` buckets take ``ceil(n/k)`` rows (SQL NTILE semantics,
    replayed exactly).  Fixed-shard user co-shuffle, one lexsort + run
    pass per shard."""
    import pandas as pd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return pa.table(
            {
                "_nt": pa.array(shard),
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
            }
        )

    def tiles(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "tile": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        uid = g["user_id"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        o = np.lexsort((eid, ts, uid))
        uid, eid = uid[o], eid[o]
        first = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(first)
        run = np.cumsum(first) - 1
        n = np.diff(np.r_[starts, len(uid)])[run]  # user row count
        i = np.arange(len(uid), dtype=np.int64) - starts[run]  # 0-based pos
        q, r = n // n_tiles, n % n_tiles
        big = (q + 1) * r
        tile = np.where(i < big, i // np.maximum(q + 1, 1), r + (i - big) // np.maximum(q, 1)) + 1
        return pa.table(
            {
                "user_id": pa.array(uid),
                "event_id": pa.array(eid),
                "tile": pa.array(tile.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_nt")
        .map_groups(tiles, batch_format="pandas")
        .sort(["user_id", "event_id"])
    )


def events_dod(sf_dir: str) -> rd.Dataset:
    """Day-over-day change per event type: daily counts (streamed
    partial/final), then delta and percent change vs the previous
    PRESENT day in one bounded final pass — delta is an exact integer,
    pct_change ONE division.  Bit-exact vs the SQL lag-window twin."""
    import pandas as pd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        day = b["ts"].to_numpy().astype("datetime64[D]").astype("datetime64[us]")
        return pa.table(
            {
                "day": pa.array(day),
                "event_type": b["event_type"],
                # zonal_aggregate's partial pass reads value_col even
                # for a count-only op list
                "value": pa.array(np.zeros(len(b), np.float64)),
            }
        )

    from geoglue_ray.stages.zonal import zonal_aggregate

    daily = zonal_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["count"],
        keys=["event_type", "day"],
    )

    def lagit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "day"], kind="mergesort").reset_index(
            drop=True
        )
        n = df["count"].to_numpy().astype(np.float64)
        et, _ = pd.factorize(df["event_type"].to_numpy(), use_na_sentinel=False)
        prev = np.r_[np.nan, n[:-1]]
        prev[np.r_[True, et[1:] != et[:-1]]] = np.nan
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "day": df["day"],
                "n_events": n,
                "delta": n - prev,
                "pct_change": (n - prev) / prev,
            }
        )

    return (
        daily.repartition(1)
        .map_batches(lagit, batch_format="pandas", batch_size=None)
        .sort(["event_type", "day"])
    )


def events_debounce(
    sf_dir: str, window_s: int = 300, n_shards: int = 64
) -> rd.Dataset:
    """Debounce / throttle dedup: drop an event when ANOTHER event of
    the same (user, type) exists within the preceding ``window_s``
    seconds (ties on ts break by event_id) — the streaming noise-
    suppression operator.  (user, type) series co-shuffle fixed-shard;
    one lexsort pass computes the gap to the tuple-order predecessor,
    which is exactly the EXISTS-in-window witness.  Bit-exact vs the
    SQL NOT-EXISTS twin."""
    import pandas as pd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return pa.table(
            {
                "_db": pa.array(shard),
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
                "event_type": b["event_type"],
            }
        )

    win = np.int64(window_s) * 1_000_000  # us

    def keep(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "event_type": pa.array([], pa.string()),
            }
        )
        if len(g) == 0:
            return empty
        uid = g["user_id"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et, uniq = pd.factorize(g["event_type"].to_numpy(), use_na_sentinel=False)
        o = np.lexsort((eid, ts, et, uid))
        uid, eid, ts, et = uid[o], eid[o], ts[o], et[o]
        same = np.r_[False, (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])]
        gap = np.r_[np.int64(0), ts[1:] - ts[:-1]]
        kept = ~(same & (gap <= win))
        return pa.table(
            {
                "user_id": pa.array(uid[kept]),
                "event_id": pa.array(eid[kept]),
                "ts": pa.array(
                    ts[kept].astype("datetime64[us]"), type=pa.timestamp("us")
                ),
                "event_type": pa.array(uniq[et[kept]]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_db")
        .map_groups(keep, batch_format="pandas")
        .sort("event_id")
    )


def orders_cube(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE(o_orderstatus, o_orderpriority) — all four grouping
    sets of count + floored-revenue sum.  Batches partial-collapse to
    the tiny (status x priority) detail grid; every CUBE level is then a
    bounded re-sum of exact integer detail cells (order-free), with the
    'ALL' sentinel for rolled keys (typed block schemas, never NULL —
    the revenue_rollup convention)."""
    import pandas as pd

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "s": b["o_orderstatus"].to_numpy(zero_copy_only=False),
                "p": b["o_orderpriority"].to_numpy(zero_copy_only=False),
                "v": np.floor(b["o_totalprice"].to_numpy()),
            }
        )
        g = df.groupby(["s", "p"], as_index=False, dropna=False).agg(
            n=("v", "size"), t=("v", "sum")
        )
        g["_all"] = np.zeros(len(g), np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def cube(g: pd.DataFrame) -> pd.DataFrame:
        detail = g.groupby(["s", "p"], as_index=False, dropna=False).agg(
            n=("n", "sum"), t=("t", "sum")
        )
        levels = [detail]
        by_s = detail.groupby("s", as_index=False).agg(n=("n", "sum"), t=("t", "sum"))
        by_s["p"] = "ALL"
        by_p = detail.groupby("p", as_index=False).agg(n=("n", "sum"), t=("t", "sum"))
        by_p["s"] = "ALL"
        grand = pd.DataFrame(
            {"s": ["ALL"], "p": ["ALL"], "n": [detail["n"].sum()], "t": [detail["t"].sum()]}
        )
        levels += [by_s, by_p, grand]
        out = pd.concat(levels, ignore_index=True)[["s", "p", "n", "t"]]
        return pd.DataFrame(
            {
                "o_orderstatus": out["s"],
                "o_orderpriority": out["p"],
                "n_orders": out["n"].to_numpy().astype(np.float64),
                "total": out["t"].to_numpy().astype(np.float64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_all")
        .map_groups(
            lambda g: cube(g.drop(columns=["_all"])), batch_format="pandas"
        )
        .sort(["o_orderstatus", "o_orderpriority"])
    )


def raster_histeq(sf_dir: str) -> rd.Dataset:
    """Histogram equalization of the raster field over two days: each
    cell's value maps to its empirical CDF (count of values <= v over
    the total, ONE division per distinct value) — the contrast-
    normalization remap.  Value cardinality is tiny (< 997), so batches
    partial-collapse to bincounts, the CDF is derived once in a bounded
    task, broadcast, and gathered per cell."""
    import ray

    from geoglue_ray.sources.raster import read_raster

    ds = read_raster(n_days=2)

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b["variable"], "t2m"))
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "valid_time": b["valid_time"],
                "cell_row": pa.array(b["cell_row"].to_numpy().astype(np.int64)),
                "cell_col": pa.array(b["cell_col"].to_numpy().astype(np.int64)),
                "value": pa.array(v),
            }
        )

    src = ds.map_batches(prep, batch_format="pyarrow").materialize()

    def counts(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        v = v[np.isfinite(v)].astype(np.int64)
        cnt = np.bincount(v, minlength=997)
        return pa.table(
            {
                "val": pa.array(np.arange(997, dtype=np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    hist = (
        src.map_batches(counts, batch_format="pyarrow")
        .groupby("val")
        .sum("cnt")
        .to_pandas()
        .sort_values("val")
    )
    cnt = np.zeros(997, np.int64)
    cnt[hist["val"].to_numpy()] = hist["sum(cnt)"].to_numpy()
    total = int(cnt.sum())
    cdf = np.cumsum(cnt).astype(np.float64) / np.float64(total)
    import ray as _ray

    cdf_ref = _ray.put(cdf)

    def remap(b: pa.Table) -> pa.Table:
        import ray as _r

        c = _r.get(cdf_ref)
        v = b["value"].to_numpy(zero_copy_only=False)
        fin = np.isfinite(v)
        b = b.filter(pa.array(fin))
        return pa.table(
            {
                "valid_time": b["valid_time"],
                "cell_row": b["cell_row"],
                "cell_col": b["cell_col"],
                "cdf": pa.array(c[v[fin].astype(np.int64)]),
            }
        )

    return src.map_batches(remap, batch_format="pyarrow").sort(
        ["valid_time", "cell_row", "cell_col"]
    )


def traj_density(sf_dir: str) -> rd.Dataset:
    """Trajectory line-density raster over the city cluster: each
    user's consecutive (ts, event_id)-ordered city events form
    segments, walked cell-by-cell with the exact integer DDA
    (stages/geometry.traj_cell_counts) on a 16x16 grid of 1/64-degree
    cells — transit counts per cell, events_density's path-based
    sibling.  Dyadic floor binning + non-negative integer steps keep
    the SQL generate_series twin bit-exact."""
    from geoglue_ray.stages.geometry import traj_cell_counts

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def prep(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        city = (ids % 128 != 0) & (ids % 10 < 3)
        b = b.filter(pa.array(city))
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    return traj_cell_counts(
        ds.map_batches(prep, batch_format="pyarrow"),
        x0=105.0,
        y0=10.0,
        inv_cell=64.0,
        nx=16,
        ny=16,
    )


def cost_distance(sf_dir: str) -> rd.Dataset:
    """Accumulated-cost surface on the ERA5 lattice (hour 0, t2m as the
    integer cost field): 6 min-plus relaxation rounds from the
    ``value % 89 == 0`` source cells, null holes impassable
    (stages/terrain.cost_distance — k halo rows shipped once, all k
    rounds local).  Bit-exact vs the chained 3x3 min-join CTE twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.terrain import cost_distance as cd

    return cd(read_raster(n_days=1), variable="t2m", rounds=6).sort(
        ["cell_row", "cell_col"]
    )


def bpe_merges(sf_dir: str) -> rd.Dataset:
    """First 4 BPE merge operations over the corpus (word-level pair
    fusion — the tokenizer-training iteration; stages/text.bpe_merges:
    one exact-pair-count scan per round with the merges-so-far applied
    per batch).  Bit-exact vs the chained replace/argmax CTE twin."""
    from geoglue_ray.stages.text import bpe_merges as bm

    return bm(read_documents_cols(sf_dir, ["text"]), rounds=4)


def returned_revenue(sf_dir: str) -> rd.Dataset:
    """Returned-item customer report (TPC-H Q10 shape): revenue from
    'R'-flag lineitems rolled up per customer through the three-way
    join chain lineitem -> orders -> customer -> nation, top 20 on the
    (revenue desc, custkey) total order.  Revenue floors per row, the
    per-customer collapse runs BEFORE the customer join (shuffle payload
    = customer cardinality, never lineitems), and every join is the
    fixed-shard hash_equijoin."""
    from geoglue_ray.stages.join import hash_equijoin

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def rev(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        r = np.floor(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
        )
        return pa.table({"l_orderkey": b["l_orderkey"], "revenue": pa.array(r)})

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    j1 = hash_equijoin(
        orders,
        li.map_batches(rev, batch_format="pyarrow"),
        left_on="o_orderkey",
        right_on="l_orderkey",
    )
    per_cust = zonal_aggregate(
        j1.select_columns(["o_custkey", "revenue"]),
        ["sum"],
        keys=["o_custkey"],
        value_col="revenue",
    ).map_batches(
        lambda b: b.rename_columns(["o_custkey", "revenue"]),
        batch_format="pyarrow",
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    j2 = hash_equijoin(cust, per_cust, left_on="c_custkey", right_on="o_custkey")
    nation = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    j3 = hash_equijoin(j2, nation, left_on="c_nationkey", right_on="n_nationkey")
    return (
        j3.select_columns(["c_custkey", "c_name", "n_name", "revenue"])
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(20)
    )


def bulk_orders(sf_dir: str) -> rd.Dataset:
    """Large-volume orders (TPC-H Q18 shape): per-order quantity totals
    via the partial/final collapse (zonal_aggregate keyed on orderkey —
    never a native high-cardinality groupby), HAVING-filtered to
    sum >= 250, then joined back to orders.  The filter runs on the
    collapsed per-order rows, so the join's right side is the few
    surviving orders."""
    from geoglue_ray.stages.join import hash_equijoin

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )
    per_order = zonal_aggregate(
        li, ["sum"], keys=["l_orderkey"], value_col="l_quantity"
    ).map_batches(
        lambda b: b.rename_columns(["l_orderkey", "sum_qty"]).filter(
            pc.greater_equal(b.column(1), 250.0)
        ),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    j = hash_equijoin(
        orders, per_order, left_on="o_orderkey", right_on="l_orderkey"
    )

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_custkey": b["o_custkey"],
                "totalprice": pa.array(np.floor(b["o_totalprice"].to_numpy())),
                "sum_qty": b["sum_qty"],
            }
        )

    return j.map_batches(proj, batch_format="pyarrow").sort("o_orderkey")


# Huff gravity-model hubs over the city cluster: (hub_id, lon, lat,
# attractiveness).  Coordinates are multiples of 1/32 so their scaled
# integers are exact; event coordinates are odd dyadics strictly finer,
# so an event NEVER coincides with a hub (d^2 >= 1 in scaled units).
_HUFF_HUBS = (
    (0, 105.03125, 10.03125, 5),
    (1, 105.09375, 10.15625, 8),
    (2, 105.15625, 10.0625, 3),
    (3, 105.21875, 10.21875, 6),
)
_HUFF_XS = float(1 << 20)
_HUFF_YS = float(1 << 18)
_HUFF_NUM = 1 << 50  # attractiveness scale: scores stay < 2^53


def huff_market_share(sf_dir: str) -> rd.Dataset:
    """Huff gravity-model market allocation (spatial-interaction /
    trade-area analysis): every city event patronizes the hub
    maximizing attractiveness / distance^2, computed EXACTLY as the
    integer score ``(A << 50) // d2`` on scaled integer coordinates —
    identical truncating division on both sides (non-negative domain),
    ties to the smallest hub id.  Output: winner counts per
    (hub, event_type) plus each cell's share of all allocated events
    (one division of exact int64 counts).  The allocation is one
    vectorized streaming pass (4 score columns, np.argmax row-wise —
    first-max == smallest-id tie rule); counts collapse per task via
    zonal_aggregate, so nothing row-scale ever shuffles."""
    hubs = np.array([[h[1], h[2], h[3]] for h in _HUFF_HUBS])
    hx = np.rint(hubs[:, 0] * _HUFF_XS).astype(np.int64)
    hy = np.rint(hubs[:, 1] * _HUFF_YS).astype(np.int64)
    ha = hubs[:, 2].astype(np.int64)

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    )

    def assign(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        city = (ids % 128 != 0) & (ids % 10 < 3)
        b = b.filter(pa.array(city))
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        x = np.rint(lon * _HUFF_XS).astype(np.int64)
        y = np.rint(lat * _HUFF_YS).astype(np.int64)
        scores = np.empty((len(ha), len(x)), dtype=np.int64)
        for j in range(len(ha)):
            d2 = (x - hx[j]) ** 2 + (y - hy[j]) ** 2
            scores[j] = (ha[j] * _HUFF_NUM) // d2
        win = np.argmax(scores, axis=0).astype(np.int64)  # first max = low id
        return pa.table({"hub_id": pa.array(win), "event_type": b["event_type"]})

    counts = zonal_aggregate(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["count"],
        keys=["hub_id", "event_type"],
        value_col="hub_id",
    ).take_all()  # bounded: hubs x event types
    hub = np.array([int(r["hub_id"]) for r in counts], dtype=np.int64)
    et = np.array([r["event_type"] for r in counts], dtype=object)
    n = np.array([int(r["count"]) for r in counts], dtype=np.int64)
    total = int(n.sum())
    out = pa.table(
        {
            "hub_id": pa.array(hub),
            "event_type": pa.array(et.astype(str)),
            "n_events": pa.array(n),
            "share": pa.array(n.astype(np.float64) / np.float64(total)),
        }
    )
    return rd.from_arrow(out).sort(["hub_id", "event_type"])


def admin_contiguity(sf_dir: str) -> rd.Dataset:
    """Rook-contiguity spatial weights over the admin-2 tessellation
    (the pysal W builder): shared-edge detection by canonical
    scaled-integer edge keys (stages/geometry.contiguity_pairs), one
    (admin_a < admin_b) pair per interior edge.  The triangle mesh's
    adjacency has a closed form, so the SQL twin derives the identical
    pair set arithmetically."""
    from geoglue_ray.sources.admin import build_admin_table
    from geoglue_ray.stages.geometry import contiguity_pairs

    ds = rd.from_arrow(build_admin_table()).repartition(8)

    def prep(b: pa.Table) -> pa.Table:
        # 'ADM2-0421' -> 421 (the tessellation index the SQL twin uses)
        fid = pc.cast(pc.utf8_slice_codeunits(b["admin_id"], 5, 99), pa.int64())
        return pa.table({"fid": fid, "geometry_wkb": b["geometry_wkb"]})

    return contiguity_pairs(
        ds.map_batches(prep, batch_format="pyarrow"), id_col="fid"
    )


def admin_spatial_lag(sf_dir: str) -> rd.Dataset:
    """AREAL spatial lag over the admin-2 tessellation — the spatial
    econometrics Wy step composed from this repo's own operators: event
    counts per admin unit (real PIP spatial join), the rook W from WKB
    shared-edge detection (stages/geometry.contiguity_pairs), and
    lag_mean = (sum of neighbor counts) / n_neighbors, one exact
    division per unit.  Units without events enter as zeros via a LEFT
    join against the full range(N_ADMIN2) universe, so the lag is
    defined everywhere.  Outside points are excluded by id arithmetic
    on both sides (no kNN fallback in the twin)."""
    import ray

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table
    from geoglue_ray.stages.geometry import contiguity_pairs
    from geoglue_ray.stages.join import hash_equijoin

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def prep(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        b = b.filter(pa.array(ids % fx.OUT_MOD != 0))
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "event_id": b["event_id"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "value": pa.array(np.zeros(len(b))),
            }
        )

    admin = build_admin_table()
    index = AdminIndex.build(admin)
    assigned = spatial_join(
        ds.map_batches(prep, batch_format="pyarrow").map_batches(
            encode_cells, batch_format="pyarrow"
        ),
        index_ref=ray.put(index),
    )

    def to_fid(b: pa.Table) -> pa.Table:
        fid = pc.cast(pc.utf8_slice_codeunits(b["admin_id"], 5, 99), pa.int64())
        return pa.table({"fid": fid})

    counts = zonal_aggregate(
        assigned.map_batches(to_fid, batch_format="pyarrow"),
        ["count"],
        keys=["fid"],
        value_col="fid",
    )
    universe = rd.range(fx.N_ADMIN2).map_batches(
        lambda b: pa.table({"fid": b["id"]}), batch_format="pyarrow"
    )
    cnt_full = hash_equijoin(
        universe, counts, left_on="fid", right_on="fid", how="left"
    ).map_batches(
        lambda b: pa.table(
            {"fid": b["fid"], "n": pc.fill_null(b["count"], 0.0)}
        ),
        batch_format="pyarrow",
    )

    def adm_prep(b: pa.Table) -> pa.Table:
        fid = pc.cast(pc.utf8_slice_codeunits(b["admin_id"], 5, 99), pa.int64())
        return pa.table({"fid": fid, "geometry_wkb": b["geometry_wkb"]})

    pairs = contiguity_pairs(
        rd.from_arrow(admin)
        .repartition(8)
        .map_batches(adm_prep, batch_format="pyarrow"),
        id_col="fid",
    )

    def both_dirs(b: pa.Table) -> pa.Table:
        a = b["admin_a"].to_numpy()
        bb = b["admin_b"].to_numpy()
        return pa.table(
            {
                "focal": pa.array(np.concatenate([a, bb])),
                "nb": pa.array(np.concatenate([bb, a])),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow")
    lagged = zonal_aggregate(
        hash_equijoin(edges, cnt_full, left_on="nb", right_on="fid").select_columns(
            ["focal", "n"]
        ),
        ["sum", "count"],
        keys=["focal"],
        value_col="n",
    )
    out = hash_equijoin(cnt_full, lagged, left_on="fid", right_on="focal")

    def final(b: pa.Table) -> pa.Table:
        s = b["sum"].to_numpy()
        k = b["count"].to_numpy()
        return pa.table(
            {
                "admin_fid": b["fid"],
                "n_events": b["n"],
                "n_neighbors": b["count"],
                "lag_mean": pa.array(s / k),
            }
        )

    return out.map_batches(final, batch_format="pyarrow").sort("admin_fid")


def embed_kmeans(sf_dir: str) -> rd.Dataset:
    """Two full Lloyd k-means rounds over the embedding corpus (k=4,
    seeds = vec_id < 4): exact quantized integer distances, smallest-id
    tie rule, round-half-up integer M-step
    (stages/similarity.kmeans_lloyd).  Bit-exact vs the chained
    assign/M-step CTE twin."""
    from geoglue_ray.stages.similarity import kmeans_lloyd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans_lloyd(ds, k=4, rounds=2)


def corpus_budget(sf_dir: str, budget: int = 20_000) -> rd.Dataset:
    """Token-budget greedy corpus selection (the data-mixing step that
    fills a training budget with the best documents first): documents
    order by (distinct-token richness DESC, doc_id) and are taken while
    the cumulative token count stays under ``budget``.  The running
    total is the distributed global prefix scan (stages/scan) over a
    packed (quality, id) sort key whose RANGE buckets are the quality
    values themselves — the driver-resident offsets table is bounded by
    the distinct quality levels, never the corpus.  Exact int64
    arithmetic; the SQL twin is one window sum over the same order."""
    from geoglue_ray.stages.scan import global_prefix_sum

    QBITS = 34  # doc_id < 2^34; key = (2^20 - n_dist) << 34 | doc_id
    BIG = 1 << 20

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])

    def feats(b: pa.Table) -> pa.Table:
        import pandas as pd

        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(b["text"]), pattern=r"\s+"
        )
        n_tok = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(b), dtype=np.int64), n_tok)
        codes, _ = pd.factorize(flat, use_na_sentinel=False)
        o = np.lexsort((codes, doc_of))
        dd, cc = doc_of[o], codes[o]
        new = np.r_[True, (dd[1:] != dd[:-1]) | (cc[1:] != cc[:-1])]
        n_dist = np.bincount(dd[new], minlength=len(b)).astype(np.int64)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        key = ((np.int64(BIG) - n_dist) << np.int64(QBITS)) | ids
        return pa.table(
            {
                "key": pa.array(key),
                "doc_id": b["doc_id"],
                "n_dist": pa.array(n_dist),
                "n_tok": pa.array(n_tok),
            }
        )

    scanned = global_prefix_sum(
        ds.map_batches(feats, batch_format="pyarrow"),
        id_col="key",
        val_col="n_tok",
        range_size=1 << QBITS,  # one range per quality level: bounded offsets
    )

    def keep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b["start_offset"], budget))
        return b.select(["doc_id", "n_dist", "n_tok", "start_offset"])

    return scanned.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def user_home(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Per-user HOME-LOCATION inference (the mobility-analytics
    majority rule): each user's home is the admin-2 unit holding the
    most of their events, ties to the smallest unit id.  Events assign
    by the real PIP spatial join; all of a user's rows co-locate on
    ``hash(user) % n_shards`` and one lexsort + run pass per shard
    computes (user, unit) counts, per-user totals, and the
    (count desc, fid) argmax.  ``home_frac`` is one division of exact
    int64 counts.  Outside points are excluded by id arithmetic on
    both sides."""
    import ray

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id"]
    )

    def prep(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        b = b.filter(pa.array(ids % fx.OUT_MOD != 0))
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "value": pa.array(np.zeros(len(b))),
            }
        )

    index = AdminIndex.build(build_admin_table())
    assigned = spatial_join(
        ds.map_batches(prep, batch_format="pyarrow").map_batches(
            encode_cells, batch_format="pyarrow"
        ),
        index_ref=ray.put(index),
    )

    def shard(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        sh = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        fid = pc.cast(pc.utf8_slice_codeunits(b["admin_id"], 5, 99), pa.int64())
        return pa.table({"_uh": pa.array(sh), "user_id": b["user_id"], "fid": fid})

    import pandas as pd

    def homes(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "home_fid": pa.array([], pa.int64()),
                    "n_home": pa.array([], pa.int64()),
                    "n_total": pa.array([], pa.int64()),
                    "home_frac": pa.array([], pa.float64()),
                }
            )
        uid = g["user_id"].to_numpy().astype(np.int64)
        fid = g["fid"].to_numpy().astype(np.int64)
        o = np.lexsort((fid, uid))
        u, f = uid[o], fid[o]
        new = np.r_[True, (u[1:] != u[:-1]) | (f[1:] != f[:-1])]
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, len(u)])
        ru, rf = u[starts], f[starts]
        # per-user argmax on (count desc, fid asc)
        o2 = np.lexsort((rf, -n, ru))
        ru2, rf2, n2 = ru[o2], rf[o2], n[o2]
        first = np.r_[True, ru2[1:] != ru2[:-1]]
        uu = np.unique(ru)
        totals = np.bincount(np.searchsorted(uu, ru), weights=n).astype(np.int64)
        hu, hf, hn = ru2[first], rf2[first], n2[first]
        ht = totals[np.searchsorted(uu, hu)]
        return pa.table(
            {
                "user_id": pa.array(hu),
                "home_fid": pa.array(hf),
                "n_home": pa.array(hn),
                "n_total": pa.array(ht),
                "home_frac": pa.array(hn.astype(np.float64) / ht.astype(np.float64)),
            }
        )

    return (
        assigned.map_batches(shard, batch_format="pyarrow")
        .groupby("_uh")
        .map_groups(homes, batch_format="pandas")
        .sort("user_id")
    )


def media_content_dupes(sf_dir: str) -> rd.Dataset:
    """Decoded-content duplicate groups over media payloads — the
    multimodal content-digest dedup (explode -> actor-pool decode ->
    exact payload grouping; stages/media.content_dupe_groups).  The
    stub codec makes colliding-ASCII-sum refs decode byte-identically,
    so real duplicate groups exist; the HUGEINT byte-replay twin groups
    by the identical payload list."""
    from geoglue_ray.stages.media import (
        DecodeMedia,
        content_dupe_groups,
        explode_media_spans,
    )

    ds = read_corpus(sf_dir, with_spans=True)
    media = ds.map_batches(explode_media_spans, batch_format="pyarrow")
    decoded = media.map_batches(
        DecodeMedia, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4)
    )
    return content_dupe_groups(decoded).sort(
        ["kind", "byte_sum", "n_items", "first_doc_id"]
    )


def raster_contours(sf_dir: str) -> rd.Dataset:
    """Marching-squares contour topology census of the hour-0 t2m slice
    at threshold 500 (stages/stencil.marching_squares_cases): per-case
    block counts + contour-segment counts, saddles counting twice —
    the vectorized cell-classification pass of isoline extraction.
    Bit-exact vs the four-corner self-join twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.stencil import marching_squares_cases

    return marching_squares_cases(read_raster(n_days=1), threshold=500.0)


def bpe_encode(sf_dir: str) -> rd.Dataset:
    """Train-then-apply BPE round trip: learn the first 4 merges on the
    corpus (stages/text.bpe_merges), then ENCODE the corpus with them
    (stages/text.bpe_encode) — per-doc token counts before/after and
    the compression ratio, one exact division.  The learned merge list
    is driver-bounded (4 rows) and broadcast into the encode pass."""
    from geoglue_ray.stages.text import bpe_encode as be
    from geoglue_ray.stages.text import bpe_merges as bm

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    learned = sorted(bm(ds, rounds=4).take_all(), key=lambda r: r["round"])
    merges = [(r["tok1"], r["tok2"]) for r in learned]
    return be(ds, merges).sort("doc_id")


def events_rhythm(sf_dir: str) -> rd.Dataset:
    """Weekly-rhythm (chronotype) profile: event counts per (day-of-week,
    hour-of-day) cell — the 168-bucket temporal heatmap behind activity
    seasonality.  Day-of-week is pure integer arithmetic on whole hours
    since the Monday epoch (never a locale-dependent dayofweek()); each
    batch collapses to <= 168 partial rows, the aggregate is
    bucket-cardinality, and share is one division of exact counts."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    T0 = np.datetime64(fx.T0, "us")

    def partial(b: pa.Table) -> pa.Table:
        h = (b["ts"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        dow = (h // 24) % 7
        hod = h % 24
        cnt = np.bincount(dow * 24 + hod, minlength=168)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "dow": pa.array(nz // 24),
                "hod": pa.array(nz % 24),
                "n": pa.array(cnt[nz].astype(np.float64)),
            }
        )

    rows = zonal_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["sum"],
        keys=["dow", "hod"],
        value_col="n",
    ).take_all()  # bounded: 168 buckets
    dow = np.array([int(r["dow"]) for r in rows], dtype=np.int64)
    hod = np.array([int(r["hod"]) for r in rows], dtype=np.int64)
    n = np.array([int(r["sum"]) for r in rows], dtype=np.int64)
    total = int(n.sum())
    out = pa.table(
        {
            "dow": pa.array(dow),
            "hod": pa.array(hod),
            "n_events": pa.array(n),
            "share": pa.array(n.astype(np.float64) / np.float64(total)),
        }
    )
    return rd.from_arrow(out).sort(["dow", "hod"])


def user_heading_mix(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Per-user heading-octant mix — movement anisotropy (is a user's
    motion directional or isotropic?): every consecutive (ts, event_id)
    step classifies into the aspect_octant 45-degree sector grammar
    (sector k = [45k, 45k+45) CCW from east; membership is pure
    sign / |dx| vs |dy| comparisons on exact dyadic coordinate deltas —
    no atan2), zero-length steps bucket as -1.  One lexsort + run pass
    per user shard yields (user, octant) counts and per-user fractions
    (one exact division)."""
    import pandas as pd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        sh = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "_hm": pa.array(sh),
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    def mix(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "octant": pa.array([], pa.int64()),
                "n_steps": pa.array([], pa.int64()),
                "frac": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        uid = g["user_id"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        lon = g["lon"].to_numpy()
        lat = g["lat"].to_numpy()
        o = np.lexsort((eid, t, uid))
        uid, lon, lat = uid[o], lon[o], lat[o]
        same = uid[1:] == uid[:-1]
        if not same.any():
            return empty
        dx = (lon[1:] - lon[:-1])[same]
        dy = (lat[1:] - lat[:-1])[same]
        su = uid[1:][same]
        conds = [  # the aspect_octant sector grammar, same order as SQL CASE
            (dx > 0) & (dy >= 0) & (dx > dy),
            (dx > 0) & (dy >= dx),
            (dx <= 0) & (dy > 0) & (dy > -dx),
            (dy > 0) & (-dx >= dy),
            (dx < 0) & (dy <= 0) & (-dx > -dy),
            (dx < 0) & (-dy >= -dx),
            (dx >= 0) & (dy < 0) & (-dy > dx),
            (dx > 0) & (dy < 0),
        ]
        oct_ = np.select(conds, np.arange(8, dtype=np.int64), np.int64(-1))
        o2 = np.lexsort((oct_, su))
        su, oct_ = su[o2], oct_[o2]
        new = np.r_[True, (su[1:] != su[:-1]) | (oct_[1:] != oct_[:-1])]
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, len(su)]).astype(np.int64)
        ru, ro = su[starts], oct_[starts]
        uu = np.unique(ru)
        tot = np.bincount(np.searchsorted(uu, ru), weights=n).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(ru),
                "octant": pa.array(ro),
                "n_steps": pa.array(n),
                "frac": pa.array(
                    n.astype(np.float64)
                    / tot[np.searchsorted(uu, ru)].astype(np.float64)
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_hm")
        .map_groups(mix, batch_format="pandas")
        .sort(["user_id", "octant"])
    )


def user_communities(sf_dir: str, tau: float = 0.04) -> rd.Dataset:
    """Co-location COMMUNITIES — the social-inference composition over
    movement data: the user x user co-location Jaccard graph
    (pairwise_set_jaccard, only pairs sharing a cell are generated)
    thresholded at ``tau``, then connected components via the
    distributed min-label propagation (duplicate_clusters), with
    community sizes attached by a keyed join.  The threshold compares
    the identical single-division double on both sides, so membership
    is bit-deterministic."""
    from geoglue_ray.stages.dedup import duplicate_clusters
    from geoglue_ray.stages.join import hash_equijoin
    from geoglue_ray.stages.similarity import pairwise_set_jaccard

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id"]
    )

    def prep(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        cx = np.floor(lon * 64.0).astype(np.int64)
        cy = np.floor(lat * 64.0).astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "cell": pa.array((cx << np.int64(16)) | cy),
            }
        )

    pairs = pairwise_set_jaccard(
        ds.map_batches(prep, batch_format="pyarrow"), "user_id", "cell"
    )

    def edges(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["jaccard"], tau))
        return pa.table({"doc_a": b["key_a"], "doc_b": b["key_b"]})

    labels = duplicate_clusters(
        pairs.map_batches(edges, batch_format="pyarrow"), sort=False
    ).map_batches(
        lambda b: b.rename_columns(["user_id", "community_id"]),
        batch_format="pyarrow",
    )
    sizes = zonal_aggregate(
        labels, ["count"], keys=["community_id"], value_col="user_id"
    ).map_batches(
        lambda b: b.rename_columns(["community_id", "community_size"]),
        batch_format="pyarrow",
    )
    out = hash_equijoin(
        labels,
        sizes,
        left_on="community_id",
        right_on="community_id",
        left_schema=pa.schema(
            [("user_id", pa.int64()), ("community_id", pa.int64())]
        ),
        right_schema=pa.schema(
            [("community_id", pa.int64()), ("community_size", pa.float64())]
        ),
    )
    return out.select_columns(
        ["user_id", "community_id", "community_size"]
    ).sort("user_id")


def embed_pq(sf_dir: str) -> rd.Dataset:
    """Product-quantization codebook training over the embedding corpus
    (4 blocks x 4 codewords, 2 Lloyd rounds — the FAISS PQ memory path
    next to the LSH/IVF recall paths; stages/similarity.pq_train trains
    every block in the SAME streaming pass per round).  Bit-exact vs
    the per-block chained assign/M-step CTE twin."""
    from geoglue_ray.stages.similarity import pq_train

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return pq_train(ds, n_blocks=4, k=4, rounds=2)


def embed_pq_recall(sf_dir: str) -> rd.Dataset:
    """Driver-visible PQ-ADC recall gate (the embed_ivf_recall pattern):
    corpus vectors encode to their per-block codewords (exact integer
    argmin), queries score candidates ASYMMETRICALLY through the
    (query x block x codeword) lookup table, and mean top-10 recall vs
    the exact quantized-L2 ranking must clear the bound.  BOTH rankings
    stream in one pass (per-batch local top-k candidates, bounded
    driver merge); all distances are int64-exact, ties to the smaller
    id."""
    from geoglue_ray.stages.similarity import pq_train

    B, K, DIM, TOPK = 8, 8, 64, 10
    bd = DIM // B
    OFF = 1 << 20
    QS = float(OFF)

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cb = pq_train(ds, n_blocks=B, k=K, rounds=2).to_pandas()  # bounded: B*K*bd
    cents = np.zeros((B, K, bd), dtype=np.int64)
    cents[
        cb["block"].to_numpy(), cb["cluster_id"].to_numpy(), cb["dim"].to_numpy()
    ] = cb["centroid_q"].to_numpy()

    qrows = ds.map_batches(
        lambda b: b.filter(pc.less(b["vec_id"], 4)), batch_format="pyarrow"
    ).take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.stack(
        [
            np.floor(np.asarray(r["embedding"], dtype=np.float64) * QS + 0.5).astype(
                np.int64
            )
            for r in qrows
        ]
    )
    nq = len(qids)
    lut = np.zeros((nq, B, K), dtype=np.int64)
    for b in range(B):
        qb = qmat[:, b * bd : (b + 1) * bd]
        d = qb[:, None, :] - cents[b][None, :, :]
        lut[:, b, :] = (d * d).sum(axis=2)

    def cands(batch: pa.Table) -> pa.Table:
        la = batch["embedding"].combine_chunks()
        x = np.floor(
            np.asarray(la.flatten()).reshape(len(batch), -1).astype(np.float64) * QS
            + 0.5
        ).astype(np.int64)
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        n = len(ids)
        adc = np.zeros((nq, n), dtype=np.int64)
        exact = np.zeros((nq, n), dtype=np.int64)
        for b in range(B):
            xb = x[:, b * bd : (b + 1) * bd]
            cc = (cents[b] * cents[b]).sum(axis=1)
            codes = np.argmin(cc[None, :] - 2 * (xb @ cents[b].T), axis=1)
            adc += lut[:, b, :][:, codes]
            for qi in range(nq):
                d = xb - qmat[qi, b * bd : (b + 1) * bd][None, :]
                exact[qi] += (d * d).sum(axis=1)
        outs = {"query_id": [], "method": [], "neighbor_id": [], "score": []}
        for mth, S in (("adc", adc), ("exact", exact)):
            for qi in range(nq):
                s = S[qi].copy()
                s[ids == qids[qi]] = np.iinfo(np.int64).max  # self-exclusion
                kk = min(TOPK, n)
                o = np.lexsort((ids, s))[:kk]
                outs["query_id"].append(np.full(kk, qids[qi]))
                outs["method"].append(np.repeat(mth, kk))
                outs["neighbor_id"].append(ids[o])
                outs["score"].append(s[o])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(outs["query_id"])),
                "method": pa.array(np.concatenate(outs["method"]).astype(str)),
                "neighbor_id": pa.array(np.concatenate(outs["neighbor_id"])),
                "score": pa.array(np.concatenate(outs["score"])),
            }
        )

    # bounded: 2 methods x nq x TOPK per block
    cand = ds.map_batches(cands, batch_format="pyarrow").to_pandas()
    recalls = []
    for qid in qids:
        tops = {}
        for mth in ("adc", "exact"):
            sub = cand[(cand["query_id"] == qid) & (cand["method"] == mth)]
            sub = sub.sort_values(["score", "neighbor_id"], kind="mergesort")
            tops[mth] = set(sub.head(TOPK)["neighbor_id"])
        recalls.append(len(tops["adc"] & tops["exact"]) / TOPK)
    out = pa.table(
        {
            "query_id": pa.array(qids),
            "recall_ok": pa.array([bool(np.mean(recalls) >= 0.3)] * len(qids)),
        }
    )
    return rd.from_arrow(out).sort("query_id")


def events_scan_stat(sf_dir: str) -> rd.Dataset:
    """Space-time SCAN statistic (the Kulldorff permutation-scan shape
    epidemiology runs over case streams): events bin to (ERA5 cell,
    3-day window) cylinders and each cylinder scores its INTEGER excess
    ``obs*N - n_cell*n_win`` — positive exactly when observed exceeds
    the space-time-independence expectation n_cell*n_win/N, with no
    division anywhere (the ratio ordering is cross-multiplied away, so
    int64 arithmetic ranks cylinders deterministically).  Top 20 by
    (excess desc, cell_row, cell_col, win).  Shape: per-batch partial
    collapse to cylinder counts; the cylinder table is lattice x
    windows bounded, so marginals and scores compute in one final
    vectorized pass (events_density pattern).  The study period
    [T0, T0+30d) is enforced AT THE SCAN (predicate pushdown,
    sources/events.read_events) — the downstream window guard stays as
    a second line of defence."""
    from geoglue_ray.sources.events import read_events
    from geoglue_ray.sources.raster import RXSIZE, RYSIZE

    # the events stream's own epoch (driver fixture: 2024-01-01..01-30),
    # NOT the raster's fx.T0
    T0 = np.datetime64("2024-01-01T00:00:00", "us")
    N_WIN = 10  # 30 days / 3-day windows
    ds = read_events(
        sf_dir,
        columns=["event_id", "ts"],
        ts_lo=T0,
        ts_hi=T0 + np.timedelta64(N_WIN * 72, "h"),
    )

    def bin_counts(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        r = np.floor((24.0625 - lat) / 0.25).astype(np.int64)
        c = np.floor((lon - 102.0) / 0.25).astype(np.int64)
        h = (b["ts"].to_numpy() - T0).astype("timedelta64[h]").astype(np.int64)
        w = h // 72
        ok = (r >= 0) & (r < RYSIZE) & (c >= 0) & (c < RXSIZE) & (w >= 0) & (w < N_WIN)
        packed = (r[ok] * RXSIZE + c[ok]) * N_WIN + w[ok]
        cnt = np.bincount(packed, minlength=RYSIZE * RXSIZE * N_WIN)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "cell": pa.array(nz // N_WIN),
                "win": pa.array(nz % N_WIN),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    # bounded: <= lattice x windows rows per block partial
    parts = ds.map_batches(bin_counts, batch_format="pyarrow").take_all()
    grid = np.zeros(RYSIZE * RXSIZE * N_WIN, dtype=np.int64)
    for row in parts:
        grid[int(row["cell"]) * N_WIN + int(row["win"])] += int(row["n"])
    obs = grid.reshape(RYSIZE * RXSIZE, N_WIN)
    n_cell = obs.sum(axis=1)
    n_win = obs.sum(axis=0)
    N = int(obs.sum())
    excess = obs * np.int64(N) - n_cell[:, None] * n_win[None, :]
    cell_idx, win_idx = np.nonzero(obs)  # score only non-empty cylinders
    ex = excess[cell_idx, win_idx]
    rr, cc = cell_idx // RXSIZE, cell_idx % RXSIZE
    o = np.lexsort((win_idx, cc, rr, -ex))[:20]
    out = pa.table(
        {
            "cell_row": pa.array(rr[o]),
            "cell_col": pa.array(cc[o]),
            "win": pa.array(win_idx[o]),
            "n_obs": pa.array(obs[cell_idx, win_idx][o]),
            "excess": pa.array(ex[o]),
        }
    )
    return rd.from_arrow(out).sort(
        ["excess", "cell_row", "cell_col", "win"],
        descending=[True, False, False, False],
    )


def trade_pairs(sf_dir: str) -> rd.Dataset:
    """Bilateral nation-pair revenue matrix (TPC-H Q7 shape): the fact
    table joins a dimension on EACH side — lineitem -> supplier nation
    and lineitem -> orders -> customer nation — then collapses to the
    |nations|^2 pair matrix.  Three fixed-shard hash joins; the tiny
    nation-name table attaches via one driver-bounded lookup map in the
    final pass (never a shuffle)."""
    from geoglue_ray.stages.join import hash_equijoin

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def rev(b: pa.Table) -> pa.Table:
        r = np.floor(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "revenue": pa.array(r),
            }
        )

    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    j1 = hash_equijoin(
        li.map_batches(rev, batch_format="pyarrow"),
        supp,
        left_on="l_suppkey",
        right_on="s_suppkey",
    )
    j2 = hash_equijoin(
        j1.select_columns(["l_orderkey", "revenue", "s_nationkey"]),
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    j3 = hash_equijoin(
        j2.select_columns(["revenue", "s_nationkey", "o_custkey"]),
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
    )
    agg = zonal_aggregate(
        j3.select_columns(["s_nationkey", "c_nationkey", "revenue"]),
        ["count", "sum"],
        keys=["s_nationkey", "c_nationkey"],
        value_col="revenue",
    )
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()  # bounded: |nations|
    names = {int(r["n_nationkey"]): r["n_name"] for r in nat}

    def final(b: pa.Table) -> pa.Table:
        sk = b["s_nationkey"].to_numpy()
        ck = b["c_nationkey"].to_numpy()
        return pa.table(
            {
                "supp_nation": pa.array([names[int(k)] for k in sk]),
                "cust_nation": pa.array([names[int(k)] for k in ck]),
                "n_items": b["count"],
                "revenue": b["sum"],
            }
        )

    return agg.map_batches(final, batch_format="pyarrow").sort(
        ["supp_nation", "cust_nation"]
    )


def consensus_neardup(sf_dir: str) -> rd.Dataset:
    """ENSEMBLE near-dup detection — the precision move real curation
    stacks use: a candidate pair survives only when BOTH the
    MinHash/LSH (est_jaccard >= 0.4) and the SimHash (hamming <= 4)
    detectors flag it.  The two pair tables co-shuffle on a packed
    (doc_a << 32 | doc_b) key through one fixed-shard hash join, so the
    consensus is never an all-pairs pass over either set."""
    from geoglue_ray.stages.dedup import minhash_neardup as mh
    from geoglue_ray.stages.dedup import simhash_neardup as sh
    from geoglue_ray.stages.join import hash_equijoin

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])

    def pack(b: pa.Table, keep: str) -> pa.Table:
        k = (b["doc_a"].to_numpy().astype(np.int64) << np.int64(32)) | b[
            "doc_b"
        ].to_numpy().astype(np.int64)
        return pa.table({"pair": pa.array(k), keep: b[keep]})

    mhp = mh(ds, threshold=0.4).map_batches(
        lambda b: pack(b, "est_jaccard"), batch_format="pyarrow"
    )
    shp = sh(ds, max_hamming=4).map_batches(
        lambda b: pack(b, "hamming"), batch_format="pyarrow"
    )
    j = hash_equijoin(
        mhp,
        shp,
        left_on="pair",
        right_on="pair",
        left_schema=pa.schema([("pair", pa.int64()), ("est_jaccard", pa.float64())]),
        right_schema=pa.schema([("pair", pa.int64()), ("hamming", pa.int64())]),
    )

    def unpack(b: pa.Table) -> pa.Table:
        k = b["pair"].to_numpy()
        return pa.table(
            {
                "doc_a": pa.array(k >> np.int64(32)),
                "doc_b": pa.array(k & np.int64(0xFFFFFFFF)),
                "est_jaccard": b["est_jaccard"],
                "hamming": b["hamming"],
            }
        )

    return j.map_batches(unpack, batch_format="pyarrow").sort(["doc_a", "doc_b"])


def source_profile(sf_dir: str) -> rd.Dataset:
    """Per-source dataset DATASHEET (the governance/data-card profile a
    curation pipeline publishes per provenance bucket): document count,
    exact token and char totals, distinct-language count, and mean
    chars per doc (one division of exact int64 sums).  Every batch
    collapses to source-cardinality partial rows, so the final merge is
    provenance-cardinality bounded; the distinct-language count rides
    count_distinct's partial-deduped shuffle."""
    from geoglue_ray.stages.text import token_count
    from geoglue_ray.stages.validate import count_distinct

    ds = read_documents_cols(sf_dir, ["doc_id", "text", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        b = token_count(b)
        codes, uniq = pd.factorize(b["source"], use_na_sentinel=False)
        n = np.bincount(codes)
        toks = np.bincount(codes, weights=b["n_tokens"].to_numpy()).astype(np.int64)
        chars = np.bincount(codes, weights=b["n_chars"].to_numpy()).astype(np.int64)
        return pa.table(
            {
                "source": pa.array(uniq.astype(str)),
                "n_docs": pa.array(n.astype(np.int64)),
                "n_tokens": pa.array(toks),
                "n_chars": pa.array(chars),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc: dict = {}
    for r in parts:  # bounded: sources x blocks
        a = acc.setdefault(r["source"], [0, 0, 0])
        a[0] += int(r["n_docs"])
        a[1] += int(r["n_tokens"])
        a[2] += int(r["n_chars"])
    langs = {
        r["source"]: int(r["n_langs"])
        for r in count_distinct(
            read_documents_cols(sf_dir, ["source", "lang"]),
            ["source"],
            ["lang"],
            "n_langs",
        ).take_all()
    }
    srcs = sorted(acc)
    nd = np.array([acc[s0][0] for s0 in srcs], dtype=np.int64)
    nt = np.array([acc[s0][1] for s0 in srcs], dtype=np.int64)
    nc = np.array([acc[s0][2] for s0 in srcs], dtype=np.int64)
    out = pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "n_docs": pa.array(nd),
            "n_tokens": pa.array(nt),
            "n_chars": pa.array(nc),
            "n_langs": pa.array([langs[s0] for s0 in srcs], pa.int64()),
            "mean_chars": pa.array(nc.astype(np.float64) / nd.astype(np.float64)),
        }
    )
    return rd.from_arrow(out).sort("source")


def user_pingpong(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """A-B-A "ping-pong" movement detection (the telecom tower-hopping
    QA signal): for each user's (ts, event_id)-ordered admin-2 sequence,
    count positions where the unit two steps back recurs with a
    DIFFERENT unit in between.  Events assign by the real PIP join;
    one lexsort + shifted-compare pass per user shard; users need >= 3
    events (both sides filter identically); rate is one exact
    division."""
    import ray
    import pandas as pd

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def prep(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        b = b.filter(pa.array(ids % fx.OUT_MOD != 0))
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "value": pa.array(np.zeros(len(b))),
            }
        )

    index = AdminIndex.build(build_admin_table())
    assigned = spatial_join(
        ds.map_batches(prep, batch_format="pyarrow").map_batches(
            encode_cells, batch_format="pyarrow"
        ),
        index_ref=ray.put(index),
    )

    def shard(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        sh = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        fid = pc.cast(pc.utf8_slice_codeunits(b["admin_id"], 5, 99), pa.int64())
        return pa.table(
            {
                "_pp": pa.array(sh),
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
                "fid": fid,
            }
        )

    def pingpong(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_pingpong": pa.array([], pa.int64()),
                "n_triples": pa.array([], pa.int64()),
                "pingpong_rate": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        uid = g["user_id"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        fid = g["fid"].to_numpy().astype(np.int64)
        o = np.lexsort((eid, t, uid))
        uid, fid = uid[o], fid[o]
        same2 = (uid[2:] == uid[:-2])
        hit = same2 & (fid[2:] == fid[:-2]) & (fid[1:-1] != fid[2:])
        hu = uid[2:][same2]
        uu, tri = np.unique(hu, return_counts=True)
        pp = np.bincount(np.searchsorted(uu, uid[2:][same2 & hit]), minlength=len(uu))
        return pa.table(
            {
                "user_id": pa.array(uu),
                "n_pingpong": pa.array(pp.astype(np.int64)),
                "n_triples": pa.array(tri.astype(np.int64)),
                "pingpong_rate": pa.array(
                    pp.astype(np.float64) / tri.astype(np.float64)
                ),
            }
        )

    return (
        assigned.map_batches(shard, batch_format="pyarrow")
        .groupby("_pp")
        .map_groups(pingpong, batch_format="pandas")
        .sort("user_id")
    )


def user_burstiness(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Inter-event BURSTINESS per user (the Goh-Barabasi temporal
    signature, reported as the dispersion ratio CV^2 =
    n * sum(g^2) / sum(g)^2 of whole-second gaps — denominators cleared
    so both factors are exact int64 and the statistic is ONE division;
    int64 -> double casts round-to-nearest identically to DuckDB's
    HUGEINT -> DOUBLE for the same value).  One lexsort + diff pass per
    user shard; users need >= 2 events."""
    import pandas as pd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        sh = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return b.append_column("_ub", pa.array(sh))

    def burst(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_gaps": pa.array([], pa.int64()),
                "gap_sum": pa.array([], pa.int64()),
                "gap_cv2": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        uid = g["user_id"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        o = np.lexsort((eid, t, uid))
        uid, t = uid[o], t[o]
        same = uid[1:] == uid[:-1]
        if not same.any():
            return empty
        # DuckDB date_diff('second') counts BOUNDARY crossings: truncate
        # each timestamp to seconds FIRST, then diff (not floor(dt))
        tsec = t // 1_000_000
        gap = (tsec[1:] - tsec[:-1])[same]
        su = uid[1:][same]
        uu = np.unique(su)
        pos = np.searchsorted(uu, su)
        n = np.bincount(pos).astype(np.int64)
        s1 = np.bincount(pos, weights=gap).astype(np.int64)
        s2 = np.bincount(pos, weights=gap * gap).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uu),
                "n_gaps": pa.array(n),
                "gap_sum": pa.array(s1),
                "gap_cv2": pa.array(
                    (n * s2).astype(np.float64) / (s1 * s1).astype(np.float64)
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_ub")
        .map_groups(burst, batch_format="pandas")
        .sort("user_id")
    )


def incremental_dedup(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """INCREMENTAL ingestion dedup — the streaming-corpus shape: a new
    document batch (doc_id % 5 == 0 as the arriving shard) checks
    itself against the EXISTING base corpus on TWO signals: exact
    content identity (the SQL-replicable rolling FNV fingerprint — one
    tagged co-shuffle on hash(fingerprint), per-shard searchsorted
    lookups, no base-side table materialized) and NEAR-duplication (the
    MinHash/LSH pair set restricted to cross-split pairs, counted per
    new doc).  Emits (doc_id, n_exact_matches, n_near_neighbors,
    is_duplicate) for the new batch — the gate the ingest step runs
    before admitting documents."""
    import pandas as pd

    from geoglue_ray.stages.dedup import minhash_neardup as mh
    from geoglue_ray.stages.join import hash_equijoin
    from geoglue_ray.stages.text import fingerprint

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    fp_ds = ds.map_batches(fingerprint, batch_format="pyarrow")

    def tag(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        fp = b["fingerprint"].to_numpy().astype(np.int64)
        sh = (
            (fp.view(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_id": pa.array(ids),
                "fp": pa.array(fp),
                "_new": pa.array((ids % 5 == 0)),
                "_s": pa.array(sh),
            }
        )

    def resolve(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_exact_matches": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        ids = g["_id"].to_numpy().astype(np.int64)
        fp = g["fp"].to_numpy().astype(np.int64)
        newm = g["_new"].to_numpy().astype(bool)
        if not newm.any():
            return empty
        bfp = np.sort(fp[~newm])
        nfp = fp[newm]
        n = (
            np.searchsorted(bfp, nfp, side="right")
            - np.searchsorted(bfp, nfp, side="left")
        ).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(ids[newm]), "n_exact_matches": pa.array(n)}
        )

    exact = (
        fp_ds.select_columns(["doc_id", "fingerprint"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(resolve, batch_format="pandas")
    )

    def cross_pairs(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy().astype(np.int64)
        d = b["doc_b"].to_numpy().astype(np.int64)
        an, dn = a % 5 == 0, d % 5 == 0
        new_doc = np.concatenate([a[an & ~dn], d[dn & ~an]])
        return pa.table({"doc_id": pa.array(new_doc)})

    near = zonal_aggregate(
        mh(ds, threshold=0.4).map_batches(cross_pairs, batch_format="pyarrow"),
        ["count"],
        keys=["doc_id"],
        value_col="doc_id",
    ).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "n_near": pc.cast(b["count"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    j = hash_equijoin(
        exact,
        near,
        left_on="doc_id",
        right_on="doc_id",
        how="left",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("n_exact_matches", pa.int64())]
        ),
        right_schema=pa.schema([("doc_id", pa.int64()), ("n_near", pa.int64())]),
    )

    def final(b: pa.Table) -> pa.Table:
        ne = b["n_exact_matches"].to_numpy()
        nn = pc.fill_null(b["n_near"], 0).to_numpy()
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_exact_matches": pa.array(ne),
                "n_near_neighbors": pa.array(nn.astype(np.int64)),
                "is_duplicate": pa.array((ne > 0) | (nn > 0)),
            }
        )

    return j.map_batches(final, batch_format="pyarrow").sort("doc_id")


def split_leakage_audit(sf_dir: str) -> rd.Dataset:
    """Train/test NEAR-DUP LEAKAGE audit — the curation check that a
    random document split silently fails: every MinHash+LSH near-dup
    pair (same 0.4 threshold as minhash_neardup) is labeled with its two
    members' split assignments (the split_assign hash rule,
    int_hash64 % 10 -> 8/1/1) and counted per canonical (split, split)
    combination.  Any pair off the diagonal IS eval-set contamination —
    the measurement that motivates dedup-before-split.  Composition of
    two existing oracle-backed operators; the pair set is bounded (LSH
    collisions), so the count table is split²-bounded."""
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64
    from geoglue_ray.stages.dedup import minhash_neardup as mh

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    pairs = mh(ds, threshold=0.4)

    LABELS = np.array(["train", "val", "test"], dtype=object)

    def lab(ids: np.ndarray) -> np.ndarray:
        b = (int_hash64(ids) % np.uint64(10)).astype(np.int64)
        return LABELS[np.where(b < 8, 0, np.where(b == 8, 1, 2))]

    def tag(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy().astype(np.int64)
        d = b["doc_b"].to_numpy().astype(np.int64)
        sa, sb = lab(a), lab(d)
        lo = np.where(sa <= sb, sa, sb)
        hi = np.where(sa <= sb, sb, sa)
        codes, uniq = pd.factorize(
            np.char.add(np.char.add(lo.astype(str), "|"), hi.astype(str)),
            use_na_sentinel=False,
        )
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        parts = np.char.partition(uniq.astype(str), "|")
        return pa.table(
            {
                "split_a": pa.array(parts[:, 0], pa.string()),
                "split_b": pa.array(parts[:, 2], pa.string()),
                "n": pa.array(n),
            }
        )

    agg = (
        pairs.map_batches(tag, batch_format="pyarrow")
        .to_pandas()  # bounded: blocks x <= 6 split combinations
        .groupby(["split_a", "split_b"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    return rd.from_arrow(
        pa.table(
            {
                "split_a": pa.array(agg["split_a"], pa.string()),
                "split_b": pa.array(agg["split_b"], pa.string()),
                "n_pairs": pa.array(agg["n"].to_numpy().astype(np.int64)),
                "is_leakage": pa.array(
                    (agg["split_a"] != agg["split_b"]).to_numpy()
                ),
            }
        )
    )


def perm_test_events(sf_dir: str, B: int = 128, group: str = "purchase") -> rd.Dataset:
    """Distributed RANDOMIZATION test (the permutation-inference shape):
    is the mean event value of the ``purchase`` group different from the
    rest?  Test statistic with CLEARED denominators — T = |sA*nB - sB*nA|
    (zero iff the two group means are equal; all exact int64) — and B
    deterministic pseudo-reallocations: replicate b reassigns every
    event to A' by ``kmv_hash64(event_id*B + b) % 2`` (the random-
    reallocation variant of the permutation test: group sizes are
    binomial rather than fixed, standard for large n).  One-sided
    p = (1 + #{T_b >= T_obs}) / (B + 1) — an integer count and one
    division.  Scale shape: each batch emits 2*(B+1) partial-sum rows
    (observed + every replicate, vectorized n x B hash matrix), one
    (B+1)-bounded merge, driver holds 2*(B+1) integers."""
    import pandas as pd

    from geoglue_ray.functions.texthash import kmv_hash64

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    Bn = np.int64(B)

    def part(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy().astype(np.int64)
        fv = np.floor(b["value"].to_numpy()).astype(np.int64)
        obs_a = pc.equal(b["event_type"], group).to_numpy(zero_copy_only=False)
        n = len(ids)
        # replicate 0 = OBSERVED assignment; replicates 1..B = hashed
        h = kmv_hash64(
            (ids[:, None] * Bn + np.arange(B, dtype=np.int64)[None, :]).ravel()
        ).reshape(n, B)
        side = (h % np.uint64(2)).astype(np.int64)  # n x B
        rep = np.repeat(np.arange(1, B + 1, dtype=np.int64), n)
        key = np.concatenate(
            [
                np.where(obs_a, 0, 1),  # replicate 0 keys 0/1
                (rep * 2 + side.T.ravel()),
            ]
        )
        w = np.concatenate([fv, np.tile(fv, B)])
        s = np.bincount(key, weights=w, minlength=2 * (B + 1)).astype(np.int64)
        c = np.bincount(key, minlength=2 * (B + 1)).astype(np.int64)
        k = np.arange(2 * (B + 1), dtype=np.int64)
        return pa.table(
            {"k": pa.array(k), "n": pa.array(c), "s": pa.array(s)}
        )

    agg = (
        ds.map_batches(part, batch_format="pyarrow")
        .to_pandas()  # bounded: blocks x 2*(B+1) rows
        .groupby("k", sort=True)
        .sum()
    )
    n = np.zeros(2 * (B + 1), np.int64)
    s = np.zeros(2 * (B + 1), np.int64)
    n[agg.index.to_numpy()] = agg["n"].to_numpy()
    s[agg.index.to_numpy()] = agg["s"].to_numpy()
    nA, nBc = n[0::2], n[1::2]
    sA, sBc = s[0::2], s[1::2]
    T = np.abs(sA * nBc - sBc * nA)  # bounded: s ~ 5e7, n ~ 1e5 at sf0.1
    t_obs = T[0]
    n_ge = int(np.sum(T[1:] >= t_obs))
    p = np.float64(1 + n_ge) / np.float64(B + 1)
    return rd.from_arrow(
        pa.table(
            {
                "n_a": pa.array([n[0]]),
                "n_b": pa.array([n[1]]),
                "t_obs": pa.array([t_obs]),
                "n_perm_ge": pa.array([np.int64(n_ge)]),
                "p_value": pa.array([p]),
            }
        )
    )


def mean_subsample_ci(sf_dir: str, B: int = 64) -> rd.Dataset:
    """Distributed subsampling confidence interval for the mean event
    value — the bag-of-little-bootstraps / disjoint-block shape (each of
    B deterministic hash blocks is an iid subsample; the spread of block
    means estimates the sampling distribution without any resampling
    pass): kmv_hash64 block assignment, exact int64 block sums, one
    division per block mean, quantile_disc-selected p05/p50/p95 of the
    B means (ceil(q*n)-1 element selection — the engine's established
    quantile_disc twin rule).  Per-batch partials -> one B-bounded
    merge; the driver holds B rows."""
    import pandas as pd

    from geoglue_ray.functions.texthash import kmv_hash64

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])

    def part(b: pa.Table) -> pa.Table:
        blk = (kmv_hash64(b["event_id"].to_numpy()) % np.uint64(B)).astype(
            np.int64
        )
        fv = np.floor(b["value"].to_numpy()).astype(np.int64)
        n = np.bincount(blk, minlength=B).astype(np.int64)
        s = np.bincount(blk, weights=fv, minlength=B).astype(np.int64)
        k = np.arange(B, dtype=np.int64)
        return pa.table(
            {"blk": pa.array(k), "n": pa.array(n), "s": pa.array(s)}
        )

    agg = (
        ds.map_batches(part, batch_format="pyarrow")
        .to_pandas()  # bounded: blocks x B rows
        .groupby("blk", sort=True)
        .sum()
    )
    n = agg["n"].to_numpy().astype(np.int64)
    s = agg["s"].to_numpy().astype(np.int64)
    keep = n > 0
    n, s = n[keep], s[keep]
    nb = len(n)
    m = np.sort(s.astype(np.float64) / n.astype(np.float64))

    def qd(q: float) -> float:
        return float(m[int(np.ceil(q * nb)) - 1])

    N, S = np.int64(n.sum()), np.int64(s.sum())
    return rd.from_arrow(
        pa.table(
            {
                "n_events": pa.array([N]),
                "n_blocks": pa.array([np.int64(nb)]),
                "mean_all": pa.array([np.float64(S) / np.float64(N)]),
                "p05": pa.array([qd(0.05)]),
                "p50": pa.array([qd(0.5)]),
                "p95": pa.array([qd(0.95)]),
            }
        )
    )


def keyword_textrank(sf_dir: str, k: int = 25) -> rd.Dataset:
    """TextRank keyword extraction (Mihalcea & Tarau 2004) — PageRank
    over the adjacent-token co-occurrence graph, composed from this
    repo's own operators: stages/text.adjacency_edges (distinct
    symmetric window-2 word graph on token_hash64 node ids) into
    stages/graph.pagerank_fixedpoint (3 exact-integer damped rounds,
    the pagerank rule: edges stream, only the vocab-cardinality rank
    vector is driver state — the graph family's stated bound), token
    names re-attached by a hash join against the distinct (node, token)
    table.  Top-k by (rank desc, token) — bit-exact vs the unrolled
    HUGEINT CTE twin."""
    from geoglue_ray.functions.texthash import token_hash64
    from geoglue_ray.stages.graph import pagerank_fixedpoint
    from geoglue_ray.stages.join import hash_equijoin
    from geoglue_ray.stages.text import adjacency_edges

    import pandas as pd

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    ranks = pagerank_fixedpoint(adjacency_edges(ds, "text"), iters=3)
    ranks = ranks.rename_columns(["node", "rank"])

    def names(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(b["text"], pattern=" "))
        toks = toks.filter(pc.not_equal(toks, ""))
        u = np.unique(toks.to_numpy(zero_copy_only=False))
        h = token_hash64(u.astype(str)).view(np.int64)
        sh = (h.view(np.uint64) % np.uint64(16)).astype(np.int64)
        return pa.table(
            {
                "_n": pa.array(sh),
                "node": pa.array(h),
                "token": pa.array(u, pa.string()),
            }
        )

    def ndedup(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "node": np.array([], np.int64),
                    "token": pd.array([], dtype="string"),
                }
            )
        return (
            g[["node", "token"]]
            .drop_duplicates("node")
            .reset_index(drop=True)
        )

    name_ds = (
        ds.map_batches(names, batch_format="pyarrow")
        .groupby("_n")
        .map_groups(ndedup, batch_format="pandas")
        # pandas map_groups reports Python-typed block schemas; the join
        # builds its output schema from Arrow types — re-type explicitly
        .map_batches(
            lambda b: pa.table(
                {
                    "node": pc.cast(b["node"], pa.int64()),
                    "token": pc.cast(b["token"], pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    j = hash_equijoin(
        rd.from_arrow(ranks),
        name_ds,
        left_on="node",
        right_on="node",
        left_schema=pa.schema([("node", pa.int64()), ("rank", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("token", pa.string())]),
    )
    return (
        j.map_batches(
            lambda b: pa.table({"token": b["token"], "rank": b["rank"]}),
            batch_format="pyarrow",
        )
        .sort(["rank", "token"], descending=[True, False])
        .limit(k)
    )


def source_lang_purity(sf_dir: str) -> rd.Dataset:
    """Per-source language PURITY report — the mixture audit run before
    trusting a source's language tag: per source, the Gini impurity of
    its language distribution ``1 - sum p_l^2 = (n^2 - sum c_l^2)/n^2``
    (log-free — entropy never mirrors; Gini ranks the same), the
    majority language and its share.  Every float is ONE division of
    exact int64 counts.  Shape: per-batch (source, lang) partials ->
    one tiny merge (source x lang cardinality)."""
    import pandas as pd

    ds = read_documents_cols(sf_dir, ["source", "lang"])

    def part(b: pa.Table) -> pa.Table:
        src = b["source"].to_numpy(zero_copy_only=False)
        lg = b["lang"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(
            np.char.add(np.char.add(src.astype(str), "|"), lg.astype(str)),
            use_na_sentinel=False,
        )
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        parts = np.char.partition(uniq.astype(str), "|")
        return pa.table(
            {
                "source": pa.array(parts[:, 0], pa.string()),
                "lang": pa.array(parts[:, 2], pa.string()),
                "n": pa.array(n),
            }
        )

    lc = (
        ds.map_batches(part, batch_format="pyarrow")
        .to_pandas()  # bounded: blocks x (source x lang) cardinality
        .groupby(["source", "lang"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    rows = []
    for src, g in lc.groupby("source", sort=True):
        c = g["n"].to_numpy().astype(np.int64)
        n = np.int64(c.sum())
        gini = np.float64(n * n - (c * c).sum()) / np.float64(n * n)
        # majority: count desc, lang asc (strict total order)
        o = np.lexsort((g["lang"].to_numpy(), -c))
        maj = g["lang"].to_numpy()[o[0]]
        maj_n = np.int64(c[o[0]])
        rows.append(
            (src, int(n), gini, maj, int(maj_n),
             np.float64(maj_n) / np.float64(n))
        )
    import pyarrow as _pa

    return rd.from_arrow(
        _pa.table(
            {
                "source": _pa.array([r[0] for r in rows], _pa.string()),
                "n_docs": _pa.array([r[1] for r in rows], _pa.int64()),
                "gini_impurity": _pa.array([r[2] for r in rows], _pa.float64()),
                "majority_lang": _pa.array([r[3] for r in rows], _pa.string()),
                "majority_n": _pa.array([r[4] for r in rows], _pa.int64()),
                "majority_share": _pa.array([r[5] for r in rows], _pa.float64()),
            }
        )
    )


def source_ablation(sf_dir: str) -> rd.Dataset:
    """Leave-one-source-out ablation report — the data-valuation shape a
    curation pipeline runs before dropping a source: for each source,
    the corpus mean document length WITHOUT that source and its delta
    vs the full-corpus mean.  All inputs are exact int64 partial sums
    (n_chars is integer), each mean is ONE division and the delta one
    subtraction — the whole float chain mirrors the SQL twin.  Shape:
    per-batch per-source partials -> one tiny merge (source cardinality
    bounded); no shuffle of document rows."""
    import pandas as pd

    ds = read_documents_cols(sf_dir, ["source", "n_chars"])

    def part(b: pa.Table) -> pa.Table:
        codes, uniq = pd.factorize(
            b["source"].to_numpy(zero_copy_only=False), use_na_sentinel=False
        )
        nc = b["n_chars"].to_numpy().astype(np.int64)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        s = np.bincount(codes, weights=nc, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "source": pa.array(uniq, pa.string()),
                "n": pa.array(n),
                "s": pa.array(s),
            }
        )

    lc = (
        ds.map_batches(part, batch_format="pyarrow")
        .to_pandas()  # bounded: blocks x source cardinality
        .groupby("source", sort=True, dropna=False)
        .sum()
    )
    src = np.array(lc.index, dtype=object)
    n = lc["n"].to_numpy().astype(np.int64)
    s = lc["s"].to_numpy().astype(np.int64)
    N, S = np.int64(n.sum()), np.int64(s.sum())
    mean_all = np.float64(S) / np.float64(N)
    mean_wo = (S - s).astype(np.float64) / (N - n).astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array(src, pa.string()),
                "n_docs": pa.array(n),
                "sum_chars": pa.array(s),
                "mean_without": pa.array(mean_wo),
                "delta_vs_all": pa.array(mean_wo - mean_all),
            }
        )
    )


def cdc_chunks(sf_dir: str) -> rd.Dataset:
    """Content-defined chunking duplicate census over the corpus — the
    Rabin/FastCDC boundary rule (rolling 4-token hash, H % 8 == 0) that
    survives insertions where fixed windows re-align every downstream
    chunk (stages/dedup.cdc_chunk_stats).  Top 20 duplicated chunks by
    (occurrences desc, content hash, token count); the content hash is
    the rotate-XOR of SQL-replicable token hashes, so the twin matches
    bit-for-bit via HUGEINT arithmetic + bit_xor."""
    from geoglue_ray.stages.dedup import cdc_chunk_stats

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    return cdc_chunk_stats(ds)


def corpus_mix(sf_dir: str) -> rd.Dataset:
    """Temperature-weighted multilingual corpus mixing — the mC4/ROOTS
    alpha-sampling shape at alpha = 1/2: the rarest language keeps every
    document (q = 1) and a language with n docs downsamples with
    probability q_l = sqrt(n_min / n_l), flattening the language
    distribution toward the temperature target.  Deterministic admission:
    the top 52 bits of kmv_hash64(doc_id) compare against
    floor(q_l * 2^52) — 52 bits so the threshold is an exactly-
    representable integral double on both engines (the 2^53 lesson), and
    the whole float chain (one divide, one correctly-rounded sqrt, one
    multiply, floor) mirrors the SQL twin bit-for-bit.

    Scale shape: pass 1 collapses per-batch language counts (partials ->
    one tiny merge); the driver holds only the LANGUAGE-cardinality
    threshold table (the corpus_budget rule — bounded by key structure,
    never corpus size).  Pass 2 streams doc ids through the broadcast
    thresholds and partial-collapses admitted counts per batch."""
    import pandas as pd

    from geoglue_ray.functions.texthash import kmv_hash64

    ds = read_documents_cols(sf_dir, ["doc_id", "lang"])

    def cpart(b: pa.Table) -> pa.Table:
        codes, uniq = pd.factorize(
            b["lang"].to_numpy(zero_copy_only=False), use_na_sentinel=False
        )
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"lang": pa.array(uniq, pa.string()), "n": pa.array(n)})

    lc = (
        ds.map_batches(cpart, batch_format="pyarrow")
        .to_pandas()  # bounded: blocks x language cardinality
        .groupby("lang", sort=True, dropna=False)["n"]
        .sum()
    )
    langs = np.array(lc.index, dtype=object)
    counts = lc.to_numpy().astype(np.int64)
    n_min = np.int64(counts.min())
    q = np.sqrt(np.float64(n_min) / counts.astype(np.float64))
    thr = np.floor(q * np.float64(1 << 52)).astype(np.int64)
    lang_sorted = langs.astype(str)  # sorted by the groupby(sort=True)

    def admit(b: pa.Table) -> pa.Table:
        lg = b["lang"].to_numpy(zero_copy_only=False).astype(str)
        li = np.searchsorted(lang_sorted, lg)
        h52 = (kmv_hash64(b["doc_id"].to_numpy()) >> np.uint64(12)).astype(
            np.int64
        )
        adm = h52 < thr[li]
        cnt = np.bincount(li, weights=adm, minlength=len(lang_sorted)).astype(
            np.int64
        )
        return pa.table(
            {
                "lang": pa.array(lang_sorted, pa.string()),
                "adm": pa.array(cnt),
            }
        )

    am = (
        ds.map_batches(admit, batch_format="pyarrow")
        .to_pandas()  # bounded: blocks x language cardinality
        .groupby("lang", sort=True, dropna=False)["adm"]
        .sum()
        .to_numpy()
        .astype(np.int64)
    )
    return rd.from_arrow(
        pa.table(
            {
                "lang": pa.array(lang_sorted, pa.string()),
                "n_docs": pa.array(counts),
                "n_admitted": pa.array(am),
                "q": pa.array(q),
            }
        )
    )


def incremental_dedup_embed(sf_dir: str) -> rd.Dataset:
    """Embedding-aware INCREMENTAL admit gate — the third dedup family
    (after incremental_dedup's exact-fingerprint and MinHash signals)
    consulted at ingest time, so the streaming gate matches the batch
    curation pipeline's precision: an arriving vector (vec_id % 5 == 0)
    is flagged when its cosine against any BASE-corpus vector reaches
    the near-dup threshold.  Pairs come from the LSH-bucketed
    embedding_neardup stage (same pinned nbits=4 / 0.3 threshold as
    embed_neardup, so the SQL twin reuses its bit-exact chain
    expressions); only cross-split pairs count.  Per new vector: base
    neighbor count, best cosine (max — order-independent), verdict.
    Scale: pair generation is bucketed (never all-pairs), counts
    partial-collapse per batch, the gate output is one row per arriving
    vector."""
    from geoglue_ray.stages.join import hash_equijoin
    from geoglue_ray.stages.similarity import embedding_neardup

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    pairs = embedding_neardup(ds, threshold=0.3, nbits=4)

    def cross(b: pa.Table) -> pa.Table:
        a = b["vec_a"].to_numpy().astype(np.int64)
        d = b["vec_b"].to_numpy().astype(np.int64)
        cs = b["cosine"].to_numpy().astype(np.float64)
        an, dn = a % 5 == 0, d % 5 == 0
        s1, s2 = an & ~dn, dn & ~an
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate([a[s1], d[s2]])),
                "cosine": pa.array(np.concatenate([cs[s1], cs[s2]])),
            }
        )

    near = zonal_aggregate(
        pairs.map_batches(cross, batch_format="pyarrow"),
        ["count", "max"],
        keys=["vec_id"],
        value_col="cosine",
    ).map_batches(
        lambda b: pa.table(
            {
                "vec_id": b["vec_id"],
                "n_embed_near": pc.cast(b["count"], pa.int64()),
                "max_cosine": pc.cast(b["max"], pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )

    def new_only(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy().astype(np.int64)
        return pa.table({"vec_id": pa.array(ids[ids % 5 == 0])})

    newv = ds.map_batches(new_only, batch_format="pyarrow")
    j = hash_equijoin(
        newv,
        near,
        left_on="vec_id",
        right_on="vec_id",
        how="left",
        left_schema=pa.schema([("vec_id", pa.int64())]),
        right_schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("n_embed_near", pa.int64()),
                ("max_cosine", pa.float64()),
            ]
        ),
    )

    def final(b: pa.Table) -> pa.Table:
        nn = pc.fill_null(b["n_embed_near"], 0).to_numpy().astype(np.int64)
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "n_embed_near": pa.array(nn),
                "max_cosine": pc.cast(b["max_cosine"], pa.float64()),
                "is_duplicate": pa.array(nn > 0),
            }
        )

    return j.map_batches(final, batch_format="pyarrow").sort("vec_id")


def exposure_bands(sf_dir: str) -> rd.Dataset:
    """EXPOSURE ATTRIBUTION — the climate-epidemiology workhorse this
    engine exists for: every event joins the full space-TIME raster at
    its (cell, hour) and the events roll up by temperature band
    (value // 100).  A true big-big hash equijoin on the packed
    (row, col, hour) key — the raster side is 1.5M hourly cells, the
    event side the whole stream; neither broadcasts.  Hole cells carry
    no raster row, so exposure there is undefined and those events drop
    (inner semantics, mirrored by the twin's NULL filter).  Event hours
    map 1:1 onto the raster's 720-hour span (both fixtures cover the
    same 30 days from their own epochs).  Band mean is one division of
    exact integer sums."""
    from geoglue_ray.sources.raster import RXSIZE, RYSIZE, read_raster
    from geoglue_ray.stages.join import hash_equijoin

    T0E = np.datetime64("2024-01-01T00:00:00", "us")  # events epoch
    T0R = np.datetime64(fx.T0, "us")  # raster epoch

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def ev_prep(b: pa.Table) -> pa.Table:
        # PARTIAL COLLAPSE before the join: events >> distinct (cell, hour)
        # keys at scale, so the join's probe side ships per-key counts,
        # never event rows (the zonal partial/final rule applied to a join)
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        r = np.floor((24.0625 - lat) / 0.25).astype(np.int64)
        c = np.floor((lon - 102.0) / 0.25).astype(np.int64)
        h = (b["ts"].to_numpy() - T0E).astype("timedelta64[h]").astype(np.int64)
        ok = (r >= 0) & (r < RYSIZE) & (c >= 0) & (c < RXSIZE) & (h >= 0) & (h < 720)
        key = ((r * RXSIZE + c) * np.int64(720) + h)[ok]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"key": pa.array(uk), "n": pa.array(cnt.astype(np.int64))}
        )

    ra = read_raster(n_days=30)

    def ra_prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["variable"], "t2m"))
        v = b["value"].to_numpy(zero_copy_only=False)
        fin = np.isfinite(v)
        r = b["cell_row"].to_numpy().astype(np.int64)[fin]
        c = b["cell_col"].to_numpy().astype(np.int64)[fin]
        h = (
            (b["valid_time"].to_numpy() - T0R)
            .astype("timedelta64[h]")
            .astype(np.int64)[fin]
        )
        return pa.table(
            {
                "key": pa.array((r * RXSIZE + c) * np.int64(720) + h),
                "value": pa.array(v[fin]),
            }
        )

    j = hash_equijoin(
        ev.map_batches(ev_prep, batch_format="pyarrow"),
        ra.map_batches(ra_prep, batch_format="pyarrow"),
        left_on="key",
        right_on="key",
    )
    def banded(b: pa.Table) -> pa.Table:
        # long form (band, metric, v) so ONE aggregate carries both the
        # event count (metric 0) and the exact value*n sum (metric 1) —
        # a second aggregate would re-execute the join lineage
        v = b["value"].to_numpy()
        n = b["n"].to_numpy().astype(np.float64)
        band = v.astype(np.int64) // 100
        return pa.table(
            {
                "band": pa.array(np.concatenate([band, band])),
                "metric": pa.array(
                    np.r_[np.zeros(len(v), np.int64), np.ones(len(v), np.int64)]
                ),
                "v": pa.array(np.concatenate([n, v * n])),
            }
        )

    agg = zonal_aggregate(
        j.map_batches(banded, batch_format="pyarrow"),
        ["sum"],
        keys=["band", "metric"],
        value_col="v",
    ).take_all()  # bounded: bands x 2
    nmap = {int(r["band"]): float(r["sum"]) for r in agg if int(r["metric"]) == 0}
    smap = {int(r["band"]): float(r["sum"]) for r in agg if int(r["metric"]) == 1}
    bands = sorted(nmap)
    n_arr = np.array([nmap[x] for x in bands])
    s_arr = np.array([smap[x] for x in bands])
    out = pa.table(
        {
            "band": pa.array(np.asarray(bands, dtype=np.int64)),
            "n_events": pa.array(n_arr),
            "mean_value": pa.array(s_arr / n_arr),
        }
    )
    return rd.from_arrow(out).sort("band")


def exposure_lags(sf_dir: str, n_lags: int = 4) -> rd.Dataset:
    """DISTRIBUTED-LAG exposure (the DLNM shape of environmental epi):
    each event samples the raster at its cell for lag hours 0, 24, 48,
    72 before the event, and counts roll up per (lag, band) — does
    yesterday's exposure predict today's cases.  The event side expands
    n_lags-fold BEFORE the per-key collapse (lagged keys dedupe just
    like base keys), then ONE big-big join against the hourly raster
    serves every lag simultaneously — never one join per lag."""
    from geoglue_ray.sources.raster import RXSIZE, RYSIZE, read_raster
    from geoglue_ray.stages.join import hash_equijoin

    T0E = np.datetime64("2024-01-01T00:00:00", "us")
    T0R = np.datetime64(fx.T0, "us")
    LAG_H = 24

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def ev_prep(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        r = np.floor((24.0625 - lat) / 0.25).astype(np.int64)
        c = np.floor((lon - 102.0) / 0.25).astype(np.int64)
        h0 = (b["ts"].to_numpy() - T0E).astype("timedelta64[h]").astype(np.int64)
        keys, lags = [], []
        for lg in range(n_lags):
            h = h0 - lg * LAG_H
            ok = (
                (r >= 0) & (r < RYSIZE) & (c >= 0) & (c < RXSIZE)
                & (h >= 0) & (h < 720)
            )
            keys.append(((r * RXSIZE + c) * np.int64(720) + h)[ok])
            lags.append(np.full(int(ok.sum()), lg, dtype=np.int64))
        key = np.concatenate(keys)
        lag = np.concatenate(lags)
        packed = key * np.int64(n_lags) + lag  # collapse per (key, lag)
        up, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "key": pa.array(up // n_lags),
                "lag": pa.array(up % n_lags),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    ra = read_raster(n_days=30)

    def ra_prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["variable"], "t2m"))
        v = b["value"].to_numpy(zero_copy_only=False)
        fin = np.isfinite(v)
        r = b["cell_row"].to_numpy().astype(np.int64)[fin]
        c = b["cell_col"].to_numpy().astype(np.int64)[fin]
        h = (
            (b["valid_time"].to_numpy() - T0R)
            .astype("timedelta64[h]")
            .astype(np.int64)[fin]
        )
        return pa.table(
            {
                "key": pa.array((r * RXSIZE + c) * np.int64(720) + h),
                "value": pa.array(v[fin]),
            }
        )

    j = hash_equijoin(
        ev.map_batches(ev_prep, batch_format="pyarrow"),
        ra.map_batches(ra_prep, batch_format="pyarrow"),
        left_on="key",
        right_on="key",
    )

    def banded(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy()
        n = b["n"].to_numpy().astype(np.float64)
        lag = b["lag"].to_numpy().astype(np.int64)
        band = v.astype(np.int64) // 100
        return pa.table(
            {
                "lag": pa.array(np.concatenate([lag, lag])),
                "band": pa.array(np.concatenate([band, band])),
                "metric": pa.array(
                    np.r_[np.zeros(len(v), np.int64), np.ones(len(v), np.int64)]
                ),
                "v": pa.array(np.concatenate([n, v * n])),
            }
        )

    agg = zonal_aggregate(
        j.map_batches(banded, batch_format="pyarrow"),
        ["sum"],
        keys=["lag", "band", "metric"],
        value_col="v",
    ).take_all()  # bounded: lags x bands x 2
    nmap = {
        (int(r["lag"]), int(r["band"])): float(r["sum"])
        for r in agg
        if int(r["metric"]) == 0
    }
    smap = {
        (int(r["lag"]), int(r["band"])): float(r["sum"])
        for r in agg
        if int(r["metric"]) == 1
    }
    ks = sorted(nmap)
    n_arr = np.array([nmap[k] for k in ks])
    s_arr = np.array([smap[k] for k in ks])
    out = pa.table(
        {
            "lag": pa.array(np.asarray([k[0] for k in ks], dtype=np.int64)),
            "band": pa.array(np.asarray([k[1] for k in ks], dtype=np.int64)),
            "n_events": pa.array(n_arr),
            "mean_value": pa.array(s_arr / n_arr),
        }
    )
    return rd.from_arrow(out).sort(["lag", "band"])


def raster_gdd(sf_dir: str, base: float = 500.0) -> rd.Dataset:
    """Growing-degree accumulation per cell (the agronomy GDD /
    cooling-degree-day family): month total of ``max(0, t2m - base)``
    plus the count of above-base hours, per lattice cell.
    Integer-valued exceedances sum exactly in any order; each batch
    collapses to lattice-cardinality long-form partials (metric 0 =
    degree sum, metric 1 = hour count) so ONE aggregate carries both."""
    from geoglue_ray.sources.raster import RXSIZE, read_raster

    ds = read_raster(n_days=30)

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["variable"], "t2m"))
        v = b["value"].to_numpy(zero_copy_only=False)
        fin = np.isfinite(v)
        r = b["cell_row"].to_numpy().astype(np.int64)[fin]
        c = b["cell_col"].to_numpy().astype(np.int64)[fin]
        exc = np.maximum(v[fin] - base, 0.0)
        cell = r * RXSIZE + c
        uc, pos = np.unique(cell, return_inverse=True)
        gdd = np.bincount(pos, weights=exc)
        hrs = np.bincount(pos, weights=(exc > 0).astype(np.float64))
        return pa.table(
            {
                "cell": pa.array(np.concatenate([uc, uc])),
                "metric": pa.array(
                    np.r_[np.zeros(len(uc), np.int64), np.ones(len(uc), np.int64)]
                ),
                "v": pa.array(np.concatenate([gdd, hrs])),
            }
        )

    agg = zonal_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["sum"],
        keys=["cell", "metric"],
        value_col="v",
    )

    rows = agg.take_all()  # bounded: lattice x 2
    gmap = {int(r["cell"]): float(r["sum"]) for r in rows if int(r["metric"]) == 0}
    hmap = {int(r["cell"]): float(r["sum"]) for r in rows if int(r["metric"]) == 1}
    cells = sorted(gmap)
    out = pa.table(
        {
            "cell_row": pa.array(
                np.asarray([x // RXSIZE for x in cells], dtype=np.int64)
            ),
            "cell_col": pa.array(
                np.asarray([x % RXSIZE for x in cells], dtype=np.int64)
            ),
            "gdd": pa.array(np.asarray([gmap[x] for x in cells])),
            "hours_above": pa.array(np.asarray([hmap[x] for x in cells])),
        }
    )
    return rd.from_arrow(out).sort(["cell_row", "cell_col"])


def case_crossover(sf_dir: str, ref_lag_h: int = 168, n_shards: int = 64) -> rd.Dataset:
    """CASE-CROSSOVER design (each event is its own control — the
    confounding-proof workhorse of environmental epidemiology): every
    event's exposure at its (cell, hour) is compared against the SAME
    cell one week earlier, and the corpus reduces to the discordant-pair
    census (case-higher / control-higher / tied) plus the case-excess
    fraction among discordant pairs (one exact division).  Both samples
    ride ONE big-big raster join (each event ships a tagged case row and
    a tagged referent row); pairs re-unite on a fixed event-hash shard
    with one lexsort pass.  Events whose referent hour precedes the
    raster span, or whose cell is a hole, drop as unpaired — mirrored by
    the twin's NULL filters."""
    import pandas as pd

    from geoglue_ray.sources.raster import RXSIZE, RYSIZE, read_raster
    from geoglue_ray.stages.join import hash_equijoin

    T0E = np.datetime64("2024-01-01T00:00:00", "us")
    T0R = np.datetime64(fx.T0, "us")

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def ev_prep(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy().astype(np.int64)
        lon, lat = fx.derive_lonlat(ids)
        r = np.floor((24.0625 - lat) / 0.25).astype(np.int64)
        c = np.floor((lon - 102.0) / 0.25).astype(np.int64)
        h0 = (b["ts"].to_numpy() - T0E).astype("timedelta64[h]").astype(np.int64)
        keys, tags, eids = [], [], []
        for tag, h in ((0, h0), (1, h0 - ref_lag_h)):
            ok = (
                (r >= 0) & (r < RYSIZE) & (c >= 0) & (c < RXSIZE)
                & (h >= 0) & (h < 720)
            )
            keys.append(((r * RXSIZE + c) * np.int64(720) + h)[ok])
            tags.append(np.full(int(ok.sum()), tag, dtype=np.int64))
            eids.append(ids[ok])
        return pa.table(
            {
                "key": pa.array(np.concatenate(keys)),
                "event_id": pa.array(np.concatenate(eids)),
                "tag": pa.array(np.concatenate(tags)),
            }
        )

    ra = read_raster(n_days=30)

    def ra_prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["variable"], "t2m"))
        v = b["value"].to_numpy(zero_copy_only=False)
        fin = np.isfinite(v)
        r = b["cell_row"].to_numpy().astype(np.int64)[fin]
        c = b["cell_col"].to_numpy().astype(np.int64)[fin]
        h = (
            (b["valid_time"].to_numpy() - T0R)
            .astype("timedelta64[h]")
            .astype(np.int64)[fin]
        )
        return pa.table(
            {
                "key": pa.array((r * RXSIZE + c) * np.int64(720) + h),
                "value": pa.array(v[fin]),
            }
        )

    j = hash_equijoin(
        ev.map_batches(ev_prep, batch_format="pyarrow"),
        ra.map_batches(ra_prep, batch_format="pyarrow"),
        left_on="key",
        right_on="key",
    )

    def shard(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy().astype(np.uint64)
        sh = ((eid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        return pa.table(
            {
                "_cc": pa.array(sh),
                "event_id": b["event_id"],
                "tag": b["tag"],
                "value": b["value"],
            }
        )

    def census(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "n_higher": pa.array([], pa.int64()),
                "n_lower": pa.array([], pa.int64()),
                "n_tie": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        eid = g["event_id"].to_numpy().astype(np.int64)
        tag = g["tag"].to_numpy().astype(np.int64)
        v = g["value"].to_numpy()
        o = np.lexsort((tag, eid))
        eid, tag, v = eid[o], tag[o], v[o]
        # paired = consecutive (case tag 0, control tag 1) rows of one event
        first = np.r_[True, eid[1:] != eid[:-1]]
        starts = np.flatnonzero(first)
        lens = np.diff(np.r_[starts, len(eid)])
        s = starts[lens == 2]
        cv, rv = v[s], v[s + 1]  # tag-sorted: case then control
        return pa.table(
            {
                "n_higher": pa.array([int((cv > rv).sum())]),
                "n_lower": pa.array([int((cv < rv).sum())]),
                "n_tie": pa.array([int((cv == rv).sum())]),
            }
        )

    parts = (
        j.map_batches(shard, batch_format="pyarrow")
        .groupby("_cc")
        .map_groups(census, batch_format="pandas")
        .take_all()  # bounded: one row per shard
    )
    hi = sum(int(r["n_higher"]) for r in parts)
    lo = sum(int(r["n_lower"]) for r in parts)
    tie = sum(int(r["n_tie"]) for r in parts)
    out = pa.table(
        {
            "n_pairs": pa.array([hi + lo + tie], pa.int64()),
            "n_case_higher": pa.array([hi], pa.int64()),
            "n_control_higher": pa.array([lo], pa.int64()),
            "n_tie": pa.array([tie], pa.int64()),
            "case_excess_frac": pa.array([hi / (hi + lo)], pa.float64()),
        }
    )
    return rd.from_arrow(out)


def late_sole_supplier(sf_dir: str, late_days: int = 60, n_shards: int = 64) -> rd.Dataset:
    """Suppliers-who-kept-orders-waiting (TPC-H Q21 shape, reference has
    no receipt/commit dates so "late" = shipped > 60 days after the
    order date): for every finished ('F') multi-supplier order whose
    late shipments all came from ONE supplier, that sole late supplier
    is charged its late line count; totals per supplier, top 20 on the
    (numwait desc, suppkey) total order.  The EXISTS/NOT-EXISTS pair of
    the classic query collapses to one per-order census — late-supplier
    count == 1 AND supplier count >= 2 — computed in a single
    lexsort+run pass per fixed orderkey-hash shard, so the shuffle
    payload is per-(order, supplier) partials, never lineitems."""
    import pandas as pd

    from geoglue_ray.stages.join import hash_equijoin

    LATE_US = np.int64(late_days) * np.int64(86_400_000_000)

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
    )

    def ofilt(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["o_orderstatus"], "F"))
        return b.select(["o_orderkey", "o_orderdate"])

    j = hash_equijoin(
        li,
        orders.map_batches(ofilt, batch_format="pyarrow"),
        left_on="l_orderkey",
        right_on="o_orderkey",
    )

    def partial(b: pa.Table) -> pa.Table:
        """Per-batch (order, supplier) late-line partials + fixed shard."""
        ok = b["l_orderkey"].to_numpy().astype(np.int64)
        sk = b["l_suppkey"].to_numpy().astype(np.int64)
        ship = b["l_shipdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        od = b["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        late = (ship > od + LATE_US).astype(np.int64)
        o = np.lexsort((sk, ok))
        ok, sk, late = ok[o], sk[o], late[o]
        first = np.r_[True, (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])]
        grp = np.cumsum(first) - 1
        lates = np.bincount(grp, weights=late).astype(np.int64)
        oks, sks = ok[first], sk[first]
        sh = (
            (oks.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_sh": pa.array(sh),
                "ok": pa.array(oks),
                "sk": pa.array(sks),
                "late_lines": pa.array(lates),
            }
        )

    def census(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {"sk": pa.array([], pa.int64()), "credit": pa.array([], pa.int64())}
        )
        if len(g) == 0:
            return empty
        ok = g["ok"].to_numpy().astype(np.int64)
        sk = g["sk"].to_numpy().astype(np.int64)
        ll = g["late_lines"].to_numpy().astype(np.int64)
        o = np.lexsort((sk, ok))
        ok, sk, ll = ok[o], sk[o], ll[o]
        first = np.r_[True, (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])]
        grp = np.cumsum(first) - 1
        ll2 = np.bincount(grp, weights=ll).astype(np.int64)
        oks, sks = ok[first], sk[first]
        ofirst = np.r_[True, oks[1:] != oks[:-1]]
        ogrp = np.cumsum(ofirst) - 1
        n_supp = np.bincount(ogrp)
        is_late = ll2 > 0
        n_late = np.bincount(ogrp, weights=is_late).astype(np.int64)
        sel = is_late & (n_supp[ogrp] >= 2) & (n_late[ogrp] == 1)
        return pa.table(
            {"sk": pa.array(sks[sel]), "credit": pa.array(ll2[sel])}
        )

    credits = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(census, batch_format="pandas")
    )
    per_supp = zonal_aggregate(
        credits, ["sum"], keys=["sk"], value_col="credit"
    ).map_batches(
        lambda b: pa.table(
            {
                "s_suppkey_j": b.column(0),
                "numwait": pc.cast(pc.round(b.column(1)), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    )
    j2 = hash_equijoin(supp, per_supp, left_on="s_suppkey", right_on="s_suppkey_j")
    nation = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    j3 = hash_equijoin(j2, nation, left_on="s_nationkey", right_on="n_nationkey")
    return (
        j3.select_columns(["s_suppkey", "s_name", "n_name", "numwait"])
        .sort(["numwait", "s_suppkey"], descending=[True, False])
        .limit(20)
    )


def nation_market_share(
    sf_dir: str, region_name: str = "ASIA", nation_name: str = "NATION_19"
) -> rd.Dataset:
    """National market share (TPC-H Q8 shape): among all revenue billed
    to customers in one region, the fraction supplied by one nation's
    suppliers, per order year — one exact division of two floored
    integer revenue sums.  The bounded dimensions (region x nation,
    <= dozens of rows) resolve driver-side into a nationkey set; the
    customer restriction is a SEMI hash_equijoin (orders keep only
    their own columns, never duplicated); supplier nationality rides a
    second equijoin; the per-year collapse is a map_batches partial
    (bincount on year offsets) so the final shuffle carries
    year-cardinality rows."""
    import pandas as pd
    import pyarrow.parquet as pq

    from geoglue_ray.stages.join import hash_equijoin

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region_name, "r_regionkey"])
    region_nations = set(
        int(k) for k in nat.loc[nat["n_regionkey"].isin(rkeys), "n_nationkey"]
    )
    target = int(nat.loc[nat["n_name"] == nation_name, "n_nationkey"].iloc[0])

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: b.filter(
            pc.is_in(b["c_nationkey"], pa.array(sorted(region_nations), pa.int32()))
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    in_region = hash_equijoin(
        orders, cust, left_on="o_custkey", right_on="c_custkey", how="semi"
    )

    def oyear(b: pa.Table) -> pa.Table:
        y = (
            b["o_orderdate"].to_numpy().astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        return pa.table({"o_orderkey": b["o_orderkey"], "o_year": pa.array(y)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def rev(b: pa.Table) -> pa.Table:
        r = np.floor(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "rev": pa.array(r),
            }
        )

    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    j1 = hash_equijoin(
        li.map_batches(rev, batch_format="pyarrow"),
        supp,
        left_on="l_suppkey",
        right_on="s_suppkey",
    )
    j2 = hash_equijoin(
        j1.select_columns(["l_orderkey", "rev", "s_nationkey"]),
        in_region.map_batches(oyear, batch_format="pyarrow"),
        left_on="l_orderkey",
        right_on="o_orderkey",
    )

    def partial(b: pa.Table) -> pa.Table:
        y = b["o_year"].to_numpy().astype(np.int64)
        r = b["rev"].to_numpy().astype(np.int64)
        tgt = (b["s_nationkey"].to_numpy().astype(np.int64) == target).astype(
            np.int64
        )
        if len(y) == 0:
            return pa.table(
                {
                    "o_year": pa.array([], pa.int64()),
                    "num": pa.array([], pa.int64()),
                    "den": pa.array([], pa.int64()),
                }
            )
        y0 = y.min()
        idx = y - y0
        den = np.bincount(idx, weights=r).astype(np.int64)
        num = np.bincount(idx, weights=r * tgt).astype(np.int64)
        keep = den > 0
        yrs = (np.arange(len(den)) + y0)[keep]
        return pa.table(
            {
                "o_year": pa.array(yrs),
                "num": pa.array(num[keep]),
                "den": pa.array(den[keep]),
            }
        )

    def final(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "o_year": pa.array([], pa.int64()),
                    "nation_revenue": pa.array([], pa.float64()),
                    "total_revenue": pa.array([], pa.float64()),
                    "mkt_share": pa.array([], pa.float64()),
                }
            )
        num = int(g["num"].sum())
        den = int(g["den"].sum())
        return pa.table(
            {
                "o_year": pa.array([int(g["o_year"].iloc[0])]),
                "nation_revenue": pa.array([float(num)]),
                "total_revenue": pa.array([float(den)]),
                "mkt_share": pa.array([num / den]),
            }
        )

    return (
        j2.map_batches(partial, batch_format="pyarrow")
        .groupby("o_year")
        .map_groups(final, batch_format="pandas")
        .sort("o_year")
    )


def small_qty_revenue(
    sf_dir: str, brand: str = "Brand#1", n_shards: int = 64
) -> rd.Dataset:
    """Small-quantity revenue loss (TPC-H Q17 shape): total revenue of
    lineitems whose quantity falls below 20% of their part's average,
    for one brand, divided by 7 years.  The correlated AVG subquery is
    the broadcast-free two-pass pattern: the brand lineitems are
    MATERIALIZED once (multiply-consumed expensive lineage rule), pass
    one collapses per-part (sum_qty, cnt) on a fixed shard, pass two
    re-joins the stats and filters with the CLEARED-DENOMINATOR test
    ``5*q*cnt < sum_qty`` — exact int64, no float threshold — so the
    twin mirrors bit-for-bit; the final scalar is one division."""
    import pandas as pd

    from geoglue_ray.stages.join import hash_equijoin

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).map_batches(
        lambda b: b.filter(pc.equal(b["p_brand"], brand)).select(["p_partkey"]),
        batch_format="pyarrow",
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "q": pa.array(b["l_quantity"].to_numpy().astype(np.int64)),
                "ep": pa.array(
                    np.floor(b["l_extendedprice"].to_numpy()).astype(np.int64)
                ),
            }
        )

    li_b = hash_equijoin(
        li.map_batches(proj, batch_format="pyarrow"),
        parts,
        left_on="l_partkey",
        right_on="p_partkey",
        how="semi",
    ).materialize()

    def partial(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy().astype(np.int64)
        q = b["q"].to_numpy()
        o = np.argsort(pk, kind="stable")
        pk, q = pk[o], q[o]
        first = np.r_[True, pk[1:] != pk[:-1]]
        grp = np.cumsum(first) - 1
        sq = np.bincount(grp, weights=q).astype(np.int64)
        cnt = np.bincount(grp)
        pks = pk[first]
        sh = (
            (pks.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "_sh": pa.array(sh),
                "pk": pa.array(pks),
                "sq": pa.array(sq),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "pk": pa.array([], pa.int64()),
                "sq": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        pk = g["pk"].to_numpy().astype(np.int64)
        o = np.argsort(pk, kind="stable")
        pk = pk[o]
        sq = g["sq"].to_numpy().astype(np.int64)[o]
        cnt = g["cnt"].to_numpy().astype(np.int64)[o]
        first = np.r_[True, pk[1:] != pk[:-1]]
        grp = np.cumsum(first) - 1
        return pa.table(
            {
                "pk": pa.array(pk[first]),
                "sq": pa.array(np.bincount(grp, weights=sq).astype(np.int64)),
                "cnt": pa.array(np.bincount(grp, weights=cnt).astype(np.int64)),
            }
        )

    stats = (
        li_b.map_batches(partial, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(merge, batch_format="pandas")
    )
    j = hash_equijoin(li_b, stats, left_on="l_partkey", right_on="pk")

    def small_partial(b: pa.Table) -> pa.Table:
        q = b["q"].to_numpy()
        sel = 5 * q * b["cnt"].to_numpy() < b["sq"].to_numpy()
        return pa.table(
            {
                "ep_sum": pa.array([int(b["ep"].to_numpy()[sel].sum())], pa.int64()),
                "n": pa.array([int(sel.sum())], pa.int64()),
            }
        )

    rows = j.map_batches(small_partial, batch_format="pyarrow").take_all()
    ep = sum(int(r["ep_sum"]) for r in rows)
    n = sum(int(r["n"]) for r in rows)
    return rd.from_arrow(
        pa.table(
            {
                "avg_yearly": pa.array([ep / 7.0], pa.float64()),
                "n_small": pa.array([n], pa.int64()),
            }
        )
    )


def collocation_lift(sf_dir: str, k: int = 50, min_count: int = 5) -> rd.Dataset:
    """Collocation mining over the corpus: top-50 adjacent bigrams by
    LIFT (the log-free monotone transform of PMI — N*c12/(c1*c2), one
    exact division), min support 5.  Complements bigram_stats (raw
    frequency) with ASSOCIATION strength — the phrase-detection pass of
    a tokenizer/phrase pipeline (stages/text.collocation_lift: bounded
    vocabulary broadcast, tok1-sharded exact pair merge, two-level
    top-k)."""
    from geoglue_ray.stages.text import collocation_lift as _lift

    docs = read_documents_cols(sf_dir, ["doc_id", "text"])
    return _lift(docs, "text", k=k, min_count=min_count)


_DTW_REF = [2000, 5000, 9000, 5000, 2000, 9000, 14000, 5000]
_DTW_SEQ_N = 16


def traj_dtw(sf_dir: str) -> rd.Dataset:
    """Sequence alignment against a canonical pattern: the asymmetric
    dynamic-time-warping distance from every user's first 16 event
    values (cents-quantized, (ts, event_id)-ordered) to one broadcast
    8-step reference profile (stages/geometry.dtw_to_reference — the DP
    vectorized across all users per shard, 16 unrolled rounds, pure
    int64).  The anomaly-detection / profile-matching operator over the
    movement-event stream."""
    from geoglue_ray.stages.geometry import dtw_to_reference

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "value"]
    )
    return dtw_to_reference(
        ev, np.array(_DTW_REF, dtype=np.int64), seq_n=_DTW_SEQ_N
    ).sort("user_id")


def corpus_drift(sf_dir: str) -> rd.Dataset:
    """Train-vs-test distribution drift over the corpus: total-variation
    distance between the two deterministic splits' document-length
    histograms (stages/sample.histogram_drift — cleared-denominator TV,
    one exact division).  The split-bias / ingest-drift gate of a
    training-data pipeline."""
    from geoglue_ray.stages.sample import histogram_drift

    docs = read_documents_cols(sf_dir, ["doc_id", "n_chars"])
    return histogram_drift(docs, "doc_id", "n_chars")


def embed_top_eigen(sf_dir: str) -> pa.Table:
    """Dominant spectral direction of the embedding corpus: fixed-point
    power iteration (4 rounds) on the distributed int64 Gram matrix
    (stages/similarity.top_eigen) — one streaming pass over the vectors,
    driver-side iteration on the d x d result, bit-exact vs the chained
    w/max/renormalize CTE twin."""
    from geoglue_ray.stages.similarity import top_eigen

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return top_eigen(ds, rounds=4)


def kcore_parts(sf_dir: str) -> pa.Table:
    """k-core decomposition of the part co-purchase graph (k = the
    initial-degree value at ascending rank ceil(0.05*n), 8 fixed peel
    rounds): the graph-robustness operator — stages/graph.kcore_peel
    streams the edge set once per round against a broadcast alive
    vector.  Bit-exact vs the unrolled peel-round CTE twin."""
    from geoglue_ray.stages.graph import basket_edges, kcore_peel

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return kcore_peel(basket_edges(li, "l_orderkey", "l_partkey"), q=0.05, rounds=8)


def events_autocorr(sf_dir: str, max_lag: int = 24, n_hours: int = 720) -> rd.Dataset:
    """Autocorrelation function of the hourly event-count series (lags
    1..24) — the temporal-signature operator (daily rhythm shows as a
    lag-24 peak).  One streamed bincount pass reduces the corpus to the
    720-hour series (bounded partials, merged driver-side); each lag's
    Pearson r uses CLEARED-DENOMINATOR integer moments with exact Python
    ints, and the only non-rational step is one IEEE-correctly-rounded
    sqrt of a double product — mirrored operation-for-operation by the
    twin (sqrt is exact-rounded in both numpy/libm and DuckDB; only
    transcendentals like ln diverge)."""
    import math

    T0E = np.datetime64("2024-01-01T00:00:00", "us")

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        h = (b["ts"].to_numpy() - T0E).astype("timedelta64[h]").astype(np.int64)
        h = h[(h >= 0) & (h < n_hours)]
        c = np.bincount(h, minlength=n_hours).astype(np.int64)
        return pa.table(
            {
                "h": pa.array(np.arange(n_hours, dtype=np.int64)),
                "x": pa.array(c),
            }
        )

    rows = ev.map_batches(partial, batch_format="pyarrow").take_all()
    x = np.zeros(n_hours, dtype=object)  # Python ints: overflow-proof moments
    for r in rows:
        x[int(r["h"])] += int(r["x"])

    lags, ns, accs = [], [], []
    for lag in range(1, max_lag + 1):
        a, b_ = x[: n_hours - lag], x[lag:]
        n = len(a)
        sx, sy = sum(a), sum(b_)
        sxy = sum(int(p) * int(q) for p, q in zip(a, b_))
        sxx = sum(int(p) * int(p) for p in a)
        syy = sum(int(q) * int(q) for q in b_)
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        lags.append(lag)
        ns.append(n)
        accs.append(float(num) / math.sqrt(float(dx) * float(dy)))
    return rd.from_arrow(
        pa.table(
            {
                "lag": pa.array(lags, pa.int64()),
                "n_pairs": pa.array(ns, pa.int64()),
                "acf": pa.array(accs, pa.float64()),
            }
        )
    )


def basket_rules(sf_dir: str) -> rd.Dataset:
    """Association-rule mining over order baskets: directed part rules
    A -> B with exact support, confidence and lift, min support 3, top
    50 on the (confidence desc, antecedent, consequent) total order
    (stages/join.basket_rules) — the recommender-pipeline operator atop
    the copurchase pair counts."""
    from geoglue_ray.stages.join import basket_rules as _rules

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return _rules(li, "l_orderkey", "l_partkey", min_support=3, top_n=50)


def events_contagion(
    sf_dir: str, cell_scale: int = 8, rounds: int = 6, n_shards: int = 64
) -> pa.Table:
    """Contact-tracing / influence spread: SI infection times over the
    TIME-RESPECTING contact graph (users sharing a 1/8-degree cell on
    the same day), seeds = users with id < 3 at day 0, 6 propagation
    rounds (stages/graph.temporal_reachability — static reachability
    overcounts by ignoring edge order).  Contacts build distributed
    ((cell, day)-sharded pair generation, distinct-edge collapse); the
    unrolled min-join CTE twin mirrors every round."""
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64
    from geoglue_ray.stages.graph import temporal_reachability

    T0E = np.datetime64("2024-01-01T00:00:00", "us")

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def prep(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        cx = np.floor(lon * float(cell_scale)).astype(np.int64)
        cy = np.floor(lat * float(cell_scale)).astype(np.int64)
        d = (b["ts"].to_numpy() - T0E).astype("timedelta64[D]").astype(np.int64)
        key = (cx * np.int64(65536) + cy) * np.int64(64) + d
        return pa.table(
            {
                "_sh": pa.array(
                    (int_hash64(key) % np.uint64(n_shards)).astype(np.int64)
                ),
                "key": pa.array(key),
                "user_id": pa.array(b["user_id"].to_numpy().astype(np.int64)),
                "d": pa.array(d),
            }
        )

    def gen_contacts(g: pd.DataFrame) -> pd.DataFrame:
        from geoglue_ray.stages.dedup import _run_pairs

        empty = pd.DataFrame(
            {
                "u": pd.Series([], dtype=np.int64),
                "v": pd.Series([], dtype=np.int64),
                "t": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        k = g["key"].to_numpy().astype(np.int64)
        uid = g["user_id"].to_numpy().astype(np.int64)
        d = g["d"].to_numpy().astype(np.int64)
        o = np.lexsort((uid, k))
        k, uid, d = k[o], uid[o], d[o]
        uniq = np.r_[True, (k[1:] != k[:-1]) | (uid[1:] != uid[:-1])]
        k, uid, d = k[uniq], uid[uniq], d[uniq]
        ia, ib = _run_pairs(k)
        if len(ia) == 0:
            return empty
        # both directions; dedupe (u, v, day) within the shard — a
        # (cell, day) key lives wholly in one shard, but a (u, v, day)
        # pair can recur across cells, deduped in the edge shard below
        u = np.concatenate([uid[ia], uid[ib]])
        v = np.concatenate([uid[ib], uid[ia]])
        t = np.concatenate([d[ia], d[ib]])
        packed = (u * np.int64(1 << 20) + v) * np.int64(64) + t
        pu = np.unique(packed)
        return pd.DataFrame(
            {
                "u": (pu // np.int64(64 << 20)).astype(np.int64),
                "v": ((pu // np.int64(64)) % np.int64(1 << 20)).astype(np.int64),
                "t": (pu % np.int64(64)).astype(np.int64),
            }
        )

    def edge_shard(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy().astype(np.int64)
        v = b["v"].to_numpy().astype(np.int64)
        packed = (u * np.int64(1 << 20) + v) * np.int64(64) + b["t"].to_numpy()
        return pa.table(
            {
                "_e": pa.array(
                    (int_hash64(packed) % np.uint64(n_shards)).astype(np.int64)
                ),
                "u": b["u"],
                "v": b["v"],
                "t": b["t"],
            }
        )

    def edge_dedup(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "u": pd.Series([], dtype=np.int64),
                    "v": pd.Series([], dtype=np.int64),
                    "t": pd.Series([], dtype=np.int64),
                }
            )
        packed = (
            g["u"].to_numpy().astype(np.int64) * np.int64(1 << 20)
            + g["v"].to_numpy().astype(np.int64)
        ) * np.int64(64) + g["t"].to_numpy().astype(np.int64)
        pu = np.unique(packed)
        return pd.DataFrame(
            {
                "u": (pu // np.int64(64 << 20)).astype(np.int64),
                "v": ((pu // np.int64(64)) % np.int64(1 << 20)).astype(np.int64),
                "t": (pu % np.int64(64)).astype(np.int64),
            }
        )

    contacts = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(gen_contacts, batch_format="pandas")
        .map_batches(edge_shard, batch_format="pyarrow")
        .groupby("_e")
        .map_groups(edge_dedup, batch_format="pandas")
    )

    seed_rows = (
        ev.map_batches(
            lambda b: pa.table(
                {
                    "user_id": pa.array(
                        np.unique(
                            b["user_id"].to_numpy().astype(np.int64)[
                                b["user_id"].to_numpy() < 3
                            ]
                        )
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )  # bounded: <= 3 ids per batch
    seeds = np.unique(np.array([int(r["user_id"]) for r in seed_rows], dtype=np.int64))

    t = temporal_reachability(contacts, seeds, rounds=rounds)
    idx = pc.sort_indices(t, sort_keys=[("user_id", "ascending")])
    return t.take(idx)


def raster_curvature(sf_dir: str) -> rd.Dataset:
    """Plan (contour) curvature per (cell, hour) over two days — the
    second-order terrain derivative completing the stencil family
    (gradient -> aspect -> TRI -> curvature), exact int64 numerator /
    denominator with one division (stages/terrain.plan_curvature).
    Flat cells drop; bit-exact vs the 8-neighbor pivot twin."""
    from geoglue_ray.sources.raster import read_raster
    from geoglue_ray.stages.terrain import plan_curvature

    return plan_curvature(read_raster(n_days=2), variable="t2m").sort(
        ["valid_time", "cell_row", "cell_col"]
    )


def kanon_audit(
    sf_dir: str, k: int = 5, cell_scale: int = 8, n_shards: int = 64
) -> rd.Dataset:
    """k-ANONYMITY audit over the event stream — the privacy gate a
    data release runs: rows grouped by quasi-identifier tuple
    (event_type, day, 1/8-degree cell); classes smaller than k are
    re-identification risks.  Emits the class census: classes, violating
    classes, rows at risk, the minimum class size and the risk fraction
    (one exact division).  Per-batch tuple-collapse partials, a fixed
    tuple-hash shard merge (a class lives wholly in one shard, so
    per-shard minima and counts combine exactly), one bounded driver
    pass."""
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64

    T0E = np.datetime64("2024-01-01T00:00:00", "us")

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        cx = np.floor(lon * float(cell_scale)).astype(np.int64)
        cy = np.floor(lat * float(cell_scale)).astype(np.int64)
        d = (b["ts"].to_numpy() - T0E).astype("timedelta64[D]").astype(np.int64)
        et, codes = np.unique(
            b["event_type"].to_numpy(zero_copy_only=False), return_inverse=True
        )
        key = ((cx * np.int64(65536) + cy) * np.int64(64) + d) * np.int64(64) + codes
        ku, cnt = np.unique(key, return_counts=True)
        tc = (ku % np.int64(64)).astype(np.int64)
        return pa.table(
            {
                "_sh": pa.array(
                    (int_hash64(ku) % np.uint64(n_shards)).astype(np.int64)
                ),
                "cellday": pa.array(ku // np.int64(64)),
                "event_type": pa.array(et[tc], pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def census(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_classes": pd.Series([], dtype=np.int64),
                "n_violating": pd.Series([], dtype=np.int64),
                "rows_at_risk": pd.Series([], dtype=np.int64),
                "n_rows": pd.Series([], dtype=np.int64),
                "min_class": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        s = g.groupby(["cellday", "event_type"], sort=False)["n"].sum()
        v = s.to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "n_classes": [len(v)],
                "n_violating": [int((v < k).sum())],
                "rows_at_risk": [int(v[v < k].sum())],
                "n_rows": [int(v.sum())],
                "min_class": [int(v.min())],
            }
        )

    parts = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(census, batch_format="pandas")
        .take_all()
    )  # bounded: one row per shard
    n_classes = sum(int(r["n_classes"]) for r in parts)
    n_viol = sum(int(r["n_violating"]) for r in parts)
    at_risk = sum(int(r["rows_at_risk"]) for r in parts)
    n_rows = sum(int(r["n_rows"]) for r in parts)
    min_class = min(int(r["min_class"]) for r in parts)
    return rd.from_arrow(
        pa.table(
            {
                "n_classes": pa.array([n_classes], pa.int64()),
                "n_violating": pa.array([n_viol], pa.int64()),
                "rows_at_risk": pa.array([at_risk], pa.int64()),
                "n_rows": pa.array([n_rows], pa.int64()),
                "min_class": pa.array([min_class], pa.int64()),
                "risk_frac": pa.array([at_risk / n_rows], pa.float64()),
            }
        )
    )


def raster_jacobi(
    sf_dir: str, rounds: int = 6, qshift: int = 20, n_hours: int = 24
) -> rd.Dataset:
    """Jacobi relaxation (discrete Laplace smoothing) over one day of
    the hourly raster — the iterative PDE-solver operator: six rounds of
    ``x' = (N + S + E + W) // 4`` on 2^20-scaled integers for interior
    cells whose four rook neighbors all exist; boundary, hole-adjacent
    and hole cells stay fixed (the Dirichlet condition).  Floor division
    on non-negative ints matches DuckDB ``//`` exactly, so the unrolled
    6-CTE twin is bit-exact; the final value is one division by 2^20.
    Each hour's grid is independent, so the partition key IS the hour
    (at planet scale a grid outgrows one task and rounds become the
    halo-exchange stencil of stages/stencil.py instead)."""
    import pandas as pd

    from geoglue_ray.sources.raster import RXSIZE, RYSIZE, read_raster

    T0R = np.datetime64(fx.T0, "us")

    ra = read_raster(n_days=1)

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["variable"], "t2m"))
        v = b["value"].to_numpy(zero_copy_only=False)
        fin = np.isfinite(v)
        h = (
            (b["valid_time"].to_numpy() - T0R)
            .astype("timedelta64[h]")
            .astype(np.int64)[fin]
        )
        return pa.table(
            {
                "h": pa.array(h),
                "r": pa.array(b["cell_row"].to_numpy().astype(np.int64)[fin]),
                "c": pa.array(b["cell_col"].to_numpy().astype(np.int64)[fin]),
                "x": pa.array(v[fin].astype(np.int64) << np.int64(qshift)),
            }
        )

    def relax(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "valid_time": pa.array([], pa.timestamp("us")),
                "cell_row": pa.array([], pa.int64()),
                "cell_col": pa.array([], pa.int64()),
                "jacobi_q": pa.array([], pa.int64()),
                "relaxed": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        h = int(g["h"].iloc[0])
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        x = g["x"].to_numpy().astype(np.int64)
        X = np.zeros((RYSIZE + 2, RXSIZE + 2), dtype=np.int64)
        M = np.zeros((RYSIZE + 2, RXSIZE + 2), dtype=bool)
        X[r + 1, c + 1] = x
        M[r + 1, c + 1] = True
        interior = (
            M[r, c + 1] & M[r + 2, c + 1] & M[r + 1, c] & M[r + 1, c + 2]
        )
        for _ in range(rounds):
            nb = (
                X[r, c + 1] + X[r + 2, c + 1] + X[r + 1, c] + X[r + 1, c + 2]
            )
            newx = np.where(interior, nb // 4, x)
            x = newx
            X[r + 1, c + 1] = x
        return pa.table(
            {
                "valid_time": pa.array(
                    np.full(len(r), T0R + np.timedelta64(h, "h")).astype(
                        "datetime64[us]"
                    ),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(r),
                "cell_col": pa.array(c),
                "jacobi_q": pa.array(x),
                "relaxed": pa.array(
                    x.astype(np.float64) / float(1 << qshift)
                ),
            }
        )

    return (
        ra.map_batches(prep, batch_format="pyarrow")
        .groupby("h")
        .map_groups(relax, batch_format="pandas")
        .sort(["valid_time", "cell_row", "cell_col"])
    )


def embed_pca_project(sf_dir: str) -> rd.Dataset:
    """Dimensionality-reduction projection: every embedding's exact
    integer dot product with the power-iteration eigenvector (the
    1-component PCA score, composition of embed_top_eigen + one
    streamed matvec pass — the eigenvector broadcasts, vectors never
    materialize)."""
    import ray

    from geoglue_ray.stages.similarity import top_eigen

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    v = top_eigen(
        ds.select_columns(["embedding"]), rounds=4
    )["v_q"].to_numpy().astype(np.int64)
    vref = ray.put(v)

    def proj(b: pa.Table) -> pa.Table:
        vv = ray.get(vref)
        la = b["embedding"].combine_chunks()
        mat = np.asarray(la.flatten()).reshape(len(b), -1)
        q = np.floor(mat.astype(np.float64) * 1024.0 + 0.5).astype(np.int64)
        return pa.table(
            {"vec_id": b["vec_id"], "proj": pa.array(q @ vv)}
        )

    return ds.map_batches(proj, batch_format="pyarrow").sort("vec_id")


def q15_top_supplier(
    sf_dir: str,
    date_from: str = "1996-01-01",
    date_to: str = "1996-07-01",
) -> "pd.DataFrame":
    """TPC-H Q15 shape: the supplier(s) achieving maximum revenue over a
    ship-date window.  Per-batch partial collapse to supplier cardinality
    (shuffle payload is key-sized, never row-sized), a small merge, a
    streamed ``max`` aggregate, then a pruned supplier-name read filtered
    to the (tiny) winner set — the corpus never materializes."""
    import pandas as pd

    lo = np.datetime64(date_from, "us")
    hi = np.datetime64(date_to, "us")

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(b: pa.Table) -> pa.Table:
        ts = b["l_shipdate"].to_numpy(zero_copy_only=False)
        m = (ts >= lo) & (ts < hi)
        sk = b["l_suppkey"].to_numpy()[m]
        rev = np.floor(
            b["l_extendedprice"].to_numpy()[m]
            * (1.0 - b["l_discount"].to_numpy()[m])
        )
        if len(sk) == 0:
            return pa.table(
                {
                    "l_suppkey": pa.array([], pa.int64()),
                    "total_revenue": pa.array([], pa.float64()),
                }
            )
        order = np.argsort(sk, kind="stable")
        sks = sk[order]
        starts = np.flatnonzero(np.r_[True, sks[1:] != sks[:-1]])
        return pa.table(
            {
                "l_suppkey": pa.array(sks[starts]),
                "total_revenue": pa.array(np.add.reduceat(rev[order], starts)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_suppkey": [g["l_suppkey"].iloc[0]],
                "total_revenue": [g["total_revenue"].sum()],
            }
        )

    rev = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .map_groups(merge, batch_format="pandas")
        .materialize()  # multiply consumed (max + filter); supplier-cardinality
    )
    mx = rev.max("total_revenue")

    def only_max(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["total_revenue"], mx))

    wdf = rev.map_batches(only_max, batch_format="pyarrow").to_pandas()  # ties only
    keys = pa.array(sorted(int(k) for k in wdf["l_suppkey"]), pa.int64())

    def pick(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["s_suppkey"], value_set=keys))

    names = (
        rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()  # bounded: winner set
    )
    out = names.merge(wdf, left_on="s_suppkey", right_on="l_suppkey")
    return (
        out[["s_suppkey", "s_name", "total_revenue"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


def ldiv_audit(
    sf_dir: str, l_min: int = 3, cell_scale: int = 8, n_shards: int = 64
) -> rd.Dataset:
    """l-DIVERSITY audit — the second privacy gate after k-anonymity
    (kanon_audit): rows grouped by quasi-identifier tuple (day,
    1/8-degree cell); a class whose SENSITIVE attribute (event_type)
    takes fewer than l distinct values leaks it even when the class is
    large.  Per-batch (class, type)-pair collapse, a fixed class-hash
    shard merge (a class lives wholly in one shard, so per-shard
    distinct counts are exact), one bounded driver pass; one exact
    division for the risk fraction."""
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64

    T0E = np.datetime64("2024-01-01T00:00:00", "us")

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        cx = np.floor(lon * float(cell_scale)).astype(np.int64)
        cy = np.floor(lat * float(cell_scale)).astype(np.int64)
        d = (b["ts"].to_numpy() - T0E).astype("timedelta64[D]").astype(np.int64)
        et, codes = np.unique(
            b["event_type"].to_numpy(zero_copy_only=False), return_inverse=True
        )
        cellday = (cx * np.int64(65536) + cy) * np.int64(64) + d
        key = cellday * np.int64(64) + codes
        ku, cnt = np.unique(key, return_counts=True)
        cd = ku // np.int64(64)
        tc = (ku % np.int64(64)).astype(np.int64)
        return pa.table(
            {
                "_sh": pa.array(
                    (int_hash64(cd) % np.uint64(n_shards)).astype(np.int64)
                ),
                "cellday": pa.array(cd),
                "event_type": pa.array(et[tc], pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def census(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_classes": pd.Series([], dtype=np.int64),
                "n_below": pd.Series([], dtype=np.int64),
                "rows_at_risk": pd.Series([], dtype=np.int64),
                "n_rows": pd.Series([], dtype=np.int64),
                "min_l": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        agg = g.groupby("cellday", sort=False).agg(
            n=("n", "sum"), l=("event_type", "nunique")
        )
        n_v = agg["n"].to_numpy().astype(np.int64)
        l_v = agg["l"].to_numpy().astype(np.int64)
        low = l_v < l_min
        return pd.DataFrame(
            {
                "n_classes": [len(agg)],
                "n_below": [int(low.sum())],
                "rows_at_risk": [int(n_v[low].sum())],
                "n_rows": [int(n_v.sum())],
                "min_l": [int(l_v.min())],
            }
        )

    parts = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(census, batch_format="pandas")
        .take_all()
    )  # bounded: one row per shard
    n_classes = sum(int(r["n_classes"]) for r in parts)
    n_below = sum(int(r["n_below"]) for r in parts)
    at_risk = sum(int(r["rows_at_risk"]) for r in parts)
    n_rows = sum(int(r["n_rows"]) for r in parts)
    min_l = min(int(r["min_l"]) for r in parts)
    return rd.from_arrow(
        pa.table(
            {
                "n_classes": pa.array([n_classes], pa.int64()),
                "n_below": pa.array([n_below], pa.int64()),
                "rows_at_risk": pa.array([at_risk], pa.int64()),
                "n_rows": pa.array([n_rows], pa.int64()),
                "min_l": pa.array([min_l], pa.int64()),
                "risk_frac": pa.array([at_risk / n_rows], pa.float64()),
            }
        )
    )


def fd_profile(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Functional-dependency PROFILING over lineitem — the data-quality
    pass a schema-inference / constraint-mining pipeline runs: for each
    candidate FD ``lhs -> rhs``, the census of LHS groups whose RHS is
    not single-valued.  Per-batch (lhs, rhs)-pair collapse (payload is
    pair-cardinality, never row-cardinality), fixed lhs-hash shards so a
    group's distinct count is exact within one shard, bounded driver
    merge; one exact division per candidate."""
    import zlib

    import pandas as pd

    candidates = [
        ("l_partkey", "l_suppkey"),
        ("l_orderkey", "l_linestatus"),
        ("l_suppkey", "l_returnflag"),
    ]
    cols = sorted({c for pair in candidates for c in pair})
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols).materialize()

    def make_partial(lhs: str, rhs: str):
        def partial(b: pa.Table) -> pa.Table:
            lv = b[lhs].to_numpy(zero_copy_only=False).astype(str)
            rv = b[rhs].to_numpy(zero_copy_only=False).astype(str)
            lu, lc = np.unique(lv, return_inverse=True)
            ru, rc = np.unique(rv, return_inverse=True)
            key = lc.astype(np.int64) * np.int64(len(ru)) + rc
            ku, cnt = np.unique(key, return_counts=True)
            li = (ku // np.int64(len(ru))).astype(np.int64)
            ri = (ku % np.int64(len(ru))).astype(np.int64)
            sh = np.array(
                [zlib.crc32(s.encode()) % n_shards for s in lu], dtype=np.int64
            )
            return pa.table(
                {
                    "_sh": pa.array(sh[li]),
                    "lhs": pa.array(lu[li], pa.string()),
                    "rhs": pa.array(ru[ri], pa.string()),
                    "n": pa.array(cnt.astype(np.int64)),
                }
            )

        return partial

    def census(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_groups": pd.Series([], dtype=np.int64),
                "n_violating": pd.Series([], dtype=np.int64),
                "rows_in_violating": pd.Series([], dtype=np.int64),
                "n_rows": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        agg = g.groupby("lhs", sort=False).agg(
            n=("n", "sum"), d=("rhs", "nunique")
        )
        n_v = agg["n"].to_numpy().astype(np.int64)
        bad = agg["d"].to_numpy() > 1
        return pd.DataFrame(
            {
                "n_groups": [len(agg)],
                "n_violating": [int(bad.sum())],
                "rows_in_violating": [int(n_v[bad].sum())],
                "n_rows": [int(n_v.sum())],
            }
        )

    rows = []
    for lhs, rhs in candidates:
        parts = (
            ds.map_batches(make_partial(lhs, rhs), batch_format="pyarrow")
            .groupby("_sh")
            .map_groups(census, batch_format="pandas")
            .take_all()
        )  # bounded: one row per shard
        n_groups = sum(int(r["n_groups"]) for r in parts)
        n_viol = sum(int(r["n_violating"]) for r in parts)
        in_viol = sum(int(r["rows_in_violating"]) for r in parts)
        n_rows = sum(int(r["n_rows"]) for r in parts)
        rows.append(
            (f"{lhs}->{rhs}", n_groups, n_viol, in_viol, n_rows, in_viol / n_rows)
        )
    rows.sort()
    return rd.from_arrow(
        pa.table(
            {
                "fd": pa.array([r[0] for r in rows], pa.string()),
                "n_groups": pa.array([r[1] for r in rows], pa.int64()),
                "n_violating": pa.array([r[2] for r in rows], pa.int64()),
                "rows_in_violating": pa.array([r[3] for r in rows], pa.int64()),
                "n_rows": pa.array([r[4] for r in rows], pa.int64()),
                "violation_frac": pa.array([r[5] for r in rows], pa.float64()),
            }
        )
    )


def events_segregation(
    sf_dir: str, type_a: str = "click", type_b: str = "purchase"
) -> rd.Dataset:
    """Index of DISSIMILARITY between two event types across admin-2
    units, reported per admin-1 — the spatial-segregation statistic
    (D = 0: identical spatial distributions; D = 1: fully separated).
    Cleared-denominator form: ``sum |a_i*B - b_i*A|`` is an exact int64
    sum (order-independent), divided once by ``2*A*B`` — the CLAUDE.md
    pattern for bit-exact ratio statistics.  Type filter pushes before
    the spatial join; counts partial-collapse per batch to admin-2
    cardinality."""
    import pandas as pd
    import ray

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    )

    def derive(b: pa.Table) -> pa.Table:
        m = pc.or_(
            pc.equal(b["event_type"], type_a), pc.equal(b["event_type"], type_b)
        )
        b = b.filter(m)
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow")
    ds = ds.map_batches(encode_cells, batch_format="pyarrow")
    index = AdminIndex.build(build_admin_table())
    ds = spatial_join(ds, index_ref=ray.put(index))

    def partial(b: pa.Table) -> pa.Table:
        a2 = b["admin_id"].to_numpy(zero_copy_only=False)
        a1 = b["admin1_id"].to_numpy(zero_copy_only=False)
        is_a = b["event_type"].to_numpy(zero_copy_only=False) == type_a
        if len(a2) == 0:
            return pa.table(
                {
                    "admin_id": pa.array([], pa.string()),
                    "admin1_id": pa.array([], pa.string()),
                    "na": pa.array([], pa.int64()),
                    "nb": pa.array([], pa.int64()),
                }
            )
        codes, uniq = pd.factorize(a2)
        na = np.bincount(codes, weights=is_a, minlength=len(uniq)).astype(np.int64)
        nb = np.bincount(codes, weights=~is_a, minlength=len(uniq)).astype(np.int64)
        first = np.zeros(len(uniq), dtype=np.int64)
        first[codes[::-1]] = np.arange(len(codes) - 1, -1, -1)
        return pa.table(
            {
                "admin_id": pa.array(uniq.astype(object)),
                "admin1_id": pa.array(a1[first].astype(object)),
                "na": pa.array(na),
                "nb": pa.array(nb),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # bounded: admin-2 cardinality x batch count partials
    g = parts.groupby(["admin1_id", "admin_id"], as_index=False, sort=True)[
        ["na", "nb"]
    ].sum()
    rows = []
    for a1_id, sub in g.groupby("admin1_id", sort=True):
        na = sub["na"].to_numpy().astype(np.int64)
        nb = sub["nb"].to_numpy().astype(np.int64)
        A = int(na.sum())
        B = int(nb.sum())
        numer = int(np.abs(na * B - nb * A).sum())
        d = float(numer) / (2.0 * float(A) * float(B)) if A > 0 and B > 0 else np.nan
        rows.append((a1_id, A, B, len(sub), d))
    return rd.from_arrow(
        pa.table(
            {
                "admin1_id": pa.array([r[0] for r in rows], pa.string()),
                "n_a": pa.array([r[1] for r in rows], pa.int64()),
                "n_b": pa.array([r[2] for r in rows], pa.int64()),
                "n_units": pa.array([r[3] for r in rows], pa.int64()),
                "dissimilarity": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
    )


def graph_assortativity(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Degree ASSORTATIVITY of the part co-purchase graph — the
    network-mixing statistic (r > 0: hubs link to hubs).  Pearson r over
    the directed edge list's endpoint degrees: the edge set streams
    twice (degree census, then moment pass against the broadcast degree
    vector — the pagerank rule: driver holds node-cardinality state,
    edges never materialize); moments combine as exact Python ints so
    the only float ops are the final casts, one sqrt of a double product
    and one division — the events_autocorr mirror chain."""
    import math

    import pandas as pd
    import ray

    from geoglue_ray.functions.texthash import int_hash64
    from geoglue_ray.stages.graph import basket_edges

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    edges = basket_edges(li, "l_orderkey", "l_partkey").materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy()
        u, c = np.unique(s, return_counts=True)
        return pa.table(
            {
                "_sh": pa.array(
                    (int_hash64(u) % np.uint64(n_shards)).astype(np.int64)
                ),
                "node": pa.array(u.astype(np.int64)),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    def deg_merge(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("node", sort=False, as_index=False)["n"].sum()
        return a[["node", "n"]]

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(deg_merge, batch_format="pandas")
        .to_pandas()  # bounded: node cardinality
    )
    nodes = deg["node"].to_numpy().astype(np.int64)
    order = np.argsort(nodes)
    nodes_s = nodes[order]
    degs_s = deg["n"].to_numpy().astype(np.int64)[order]
    ref = ray.put((nodes_s, degs_s))

    def moments(b: pa.Table) -> pa.Table:
        ns, dv = ray.get(ref)
        x = dv[np.searchsorted(ns, b["src"].to_numpy())]
        y = dv[np.searchsorted(ns, b["dst"].to_numpy())]
        return pa.table(
            {
                "m": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
            }
        )

    parts = edges.map_batches(moments, batch_format="pyarrow").take_all()
    # exact Python-int combination: overflow-proof at any scale
    m = sum(int(r["m"]) for r in parts)
    sx = sum(int(r["sx"]) for r in parts)
    sy = sum(int(r["sy"]) for r in parts)
    sxy = sum(int(r["sxy"]) for r in parts)
    sxx = sum(int(r["sxx"]) for r in parts)
    syy = sum(int(r["syy"]) for r in parts)
    num = m * sxy - sx * sy
    dx = m * sxx - sx * sx
    dy = m * syy - sy * sy
    r_val = float(num) / math.sqrt(float(dx) * float(dy))
    return rd.from_arrow(
        pa.table(
            {
                "n_edges": pa.array([m], pa.int64()),
                "n_nodes": pa.array([len(nodes_s)], pa.int64()),
                "assortativity": pa.array([r_val], pa.float64()),
            }
        )
    )


def embed_knn_purity(sf_dir: str, stride: int = 8, dim: int = 64) -> rd.Dataset:
    """Label-noise audit by sampled leave-one-out 1-NN: for every
    stride-sampled query vector, the exact nearest other vector under
    quantized integer L2 (2^-20 quantization of float32 is lossless, so
    distances/argmin are int64-exact — the kmeans/PQ trick) and whether
    its label agrees.  Broadcast query matrix, per-batch int64 matmul
    partial argmin, bounded driver merge on the (d2, neighbor) total
    order — corpus streams once, scales in corpus size."""
    import ray

    OFF = 1 << 20
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    ).materialize()  # consumed twice: query extract + scan

    def quant(b: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        ids = b["vec_id"].to_numpy()
        la = b["embedding"].combine_chunks()
        mat = np.asarray(la.flatten()).reshape(len(b), -1)
        q = np.floor(mat.astype(np.float64) * float(OFF) + 0.5).astype(np.int64)
        return ids, q, b["label"].to_numpy().astype(np.int64)

    def _sample(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy()
        return b.filter(pa.array(ids % stride == 0))

    qtab = ds.map_batches(_sample, batch_format="pyarrow").take_all()
    qids = np.array([r["vec_id"] for r in qtab], dtype=np.int64)
    qmat = np.floor(
        np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qtab])
        * float(OFF)
        + 0.5
    ).astype(np.int64)
    qlab = np.array([r["label"] for r in qtab], dtype=np.int64)
    o = np.argsort(qids)
    qids, qmat, qlab = qids[o], qmat[o], qlab[o]
    qnorm = (qmat * qmat).sum(axis=1)
    ref = ray.put((qids, qmat, qnorm))

    def best(b: pa.Table) -> pa.Table:
        ids, mat, labs = quant(b)
        qi, qm, qn = ray.get(ref)
        dots = qm @ mat.T  # (Q, B) int64-exact
        vn = (mat * mat).sum(axis=1)
        d2 = qn[:, None] + vn[None, :] - 2 * dots
        # self-exclusion + deterministic (d2, neighbor_id) argmin
        pos = np.searchsorted(qi, ids)
        pos = np.clip(pos, 0, len(qi) - 1)
        hit = qi[pos] == ids
        big = np.int64(2**62)
        if hit.any():
            d2[pos[hit], np.nonzero(hit)[0]] = big
        # vectorized (d2, neighbor_id) lexicographic argmin: among the
        # columns attaining each row's min d2, take the smallest id
        mn = d2.min(axis=1, keepdims=True)
        id_masked = np.where(d2 == mn, ids[None, :], np.int64(2**62))
        best_j = np.argmin(id_masked, axis=1)
        return pa.table(
            {
                "query_id": pa.array(qi),
                "nn_id": pa.array(ids[best_j].astype(np.int64)),
                "nn_label": pa.array(labs[best_j]),
                "d2": pa.array(d2[np.arange(len(qi)), best_j]),
            }
        )

    parts = ds.map_batches(best, batch_format="pyarrow").take_all()
    # bounded: one row per query per block
    bests: dict[int, tuple[int, int, int]] = {}
    for r in parts:
        key = int(r["query_id"])
        cand = (int(r["d2"]), int(r["nn_id"]), int(r["nn_label"]))
        if key not in bests or cand < bests[key]:
            bests[key] = cand
    rows = sorted(bests.items())
    lab_of = dict(zip(qids.tolist(), qlab.tolist()))
    return rd.from_arrow(
        pa.table(
            {
                "query_id": pa.array([k for k, _ in rows], pa.int64()),
                "label": pa.array([lab_of[k] for k, _ in rows], pa.int64()),
                "nn_id": pa.array([v[1] for _, v in rows], pa.int64()),
                "nn_label": pa.array([v[2] for _, v in rows], pa.int64()),
                "agree": pa.array(
                    [lab_of[k] == v[2] for k, v in rows], pa.bool_()
                ),
            }
        )
    )


def score_auc(
    sf_dir: str, pos_type: str = "purchase", n_shards: int = 64
) -> rd.Dataset:
    """Exact ROC-AUC of the event value as a classifier score for the
    positive class — the model/data evaluation metric, computed as the
    Mann-Whitney U with midrank tie handling: value maps to its exact
    cents integer (np.round(v*100) == DuckDB CAST(v*100 AS BIGINT) on
    2-decimal measures, the benford trick), a streamed per-score
    histogram (payload = distinct-score cardinality, never rows), and
    the DOUBLED-midrank identity 2k + c + 1 keeps every moment integer
    until the single final division (CLAUDE.md rank-chain pattern)."""
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        c = np.round(b["value"].to_numpy() * 100.0).astype(np.int64)
        pos = (
            b["event_type"].to_numpy(zero_copy_only=False) == pos_type
        ).astype(np.int64)
        u, inv = np.unique(c, return_inverse=True)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        p = np.bincount(inv, weights=pos, minlength=len(u)).astype(np.int64)
        return pa.table(
            {
                "_sh": pa.array(
                    (int_hash64(u) % np.uint64(n_shards)).astype(np.int64)
                ),
                "c": pa.array(u),
                "n": pa.array(n),
                "p": pa.array(p),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("c", sort=False, as_index=False)[["n", "p"]].sum()
        return a[["c", "n", "p"]]

    hist = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: distinct-score cardinality
        .sort_values("c", kind="mergesort")
    )
    n_v = hist["n"].to_numpy().astype(np.int64)
    p_v = hist["p"].to_numpy().astype(np.int64)
    k = np.concatenate([[0], np.cumsum(n_v)[:-1]])
    sd = int((p_v * (2 * k + n_v + 1)).sum())  # sum of doubled midranks, positives
    n_pos = int(p_v.sum())
    n_neg = int(n_v.sum()) - n_pos
    auc = float(sd - n_pos * (n_pos + 1)) / (2.0 * float(n_pos) * float(n_neg))
    return rd.from_arrow(
        pa.table(
            {
                "n_pos": pa.array([n_pos], pa.int64()),
                "n_neg": pa.array([n_neg], pa.int64()),
                "auc": pa.array([auc], pa.float64()),
            }
        )
    )


def hits_scores(sf_dir: str, rounds: int = 3, qscale: int = 1024) -> rd.Dataset:
    """HITS hubs & authorities over the customer–part bipartite purchase
    graph — the link-analysis twin of pagerank_parts: customers are hubs,
    parts authorities; each half-round streams the (materialized)
    distinct edge set against the broadcast opposite-side vector
    (pagerank rule: driver holds node-cardinality state only) and
    renormalizes with the exact offset trick ((w+m)*Q)//m - Q, floor ==
    DuckDB // on non-negatives.  All-integer throughout; bit-exact vs
    the unrolled per-round join twin."""
    import pandas as pd
    import ray

    from geoglue_ray.functions.texthash import int_hash64
    from geoglue_ray.stages.join import hash_equijoin

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    j = hash_equijoin(orders, li, left_on="o_orderkey", right_on="l_orderkey")

    def pack(b: pa.Table) -> pa.Table:
        packed = (
            b["o_custkey"].to_numpy().astype(np.int64) << np.int64(32)
        ) | b["l_partkey"].to_numpy().astype(np.int64)
        pu = np.unique(packed)
        return pa.table(
            {
                "_ps": pa.array(
                    (int_hash64(pu) % np.uint64(64)).astype(np.int64)
                ),
                "packed": pa.array(pu),
            }
        )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        pu = np.unique(g["packed"].to_numpy())
        return pd.DataFrame(
            {
                "cust": (pu >> np.int64(32)).astype(np.int64),
                "part": (pu & np.int64(0xFFFFFFFF)).astype(np.int64),
            }
        )

    edges = (
        j.map_batches(pack, batch_format="pyarrow")
        .groupby("_ps")
        .map_groups(dedup, batch_format="pandas")
        .materialize()  # streamed once per half-round
    )

    def half_round(src_col: str, dst_col: str, vec: dict[int, int]) -> dict[int, int]:
        keys = np.array(sorted(vec), dtype=np.int64)
        vals = np.array([vec[k] for k in keys], dtype=np.int64)
        ref = ray.put((keys, vals))

        def partial(b: pa.Table) -> pa.Table:
            ks, vs = ray.get(ref)
            s = b[src_col].to_numpy()
            d = b[dst_col].to_numpy()
            w = vs[np.searchsorted(ks, s)]
            u, inv = np.unique(d, return_inverse=True)
            acc = np.bincount(inv, weights=w, minlength=len(u)).astype(np.int64)
            return pa.table(
                {
                    "_sh": pa.array(
                        (int_hash64(u) % np.uint64(64)).astype(np.int64)
                    ),
                    "node": pa.array(u.astype(np.int64)),
                    "w": pa.array(acc),
                }
            )

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            a = g.groupby("node", sort=False, as_index=False)["w"].sum()
            return a[["node", "w"]]

        out = (
            edges.map_batches(partial, batch_format="pyarrow")
            .groupby("_sh")
            .map_groups(merge, batch_format="pandas")
            .to_pandas()  # bounded: node cardinality
        )
        w = out["w"].to_numpy().astype(np.int64)
        m = int(w.max())
        norm = ((w + m) * np.int64(qscale)) // np.int64(m) - np.int64(qscale)
        return dict(zip(out["node"].astype(np.int64).tolist(), norm.tolist()))

    # init: every hub at qscale (customers appearing in the edge set)
    cust_nodes = (
        edges.map_batches(
            lambda b: pa.table({"node": pa.array(np.unique(b["cust"].to_numpy()))}),
            batch_format="pyarrow",
        )
        .to_pandas()["node"]
        .unique()
    )
    h = {int(c): qscale for c in cust_nodes}
    a: dict[int, int] = {}
    for _ in range(rounds):
        a = half_round("cust", "part", h)
        h = half_round("part", "cust", a)
    rows = sorted([("cust", k, v) for k, v in h.items()]) + sorted(
        [("part", k, v) for k, v in a.items()]
    )
    return rd.from_arrow(
        pa.table(
            {
                "kind": pa.array([r[0] for r in rows], pa.string()),
                "node_id": pa.array([r[1] for r in rows], pa.int64()),
                "score_q": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )


def admin_lisa(sf_dir: str) -> rd.Dataset:
    """AREAL local Moran (LISA) cluster map over the admin-2
    tessellation — the pysal Local_Moran / epidemiology cluster-map
    companion of admin_spatial_lag, ALL-INTEGER by clearing the mean:
    with x_i = event count and S = sum(x), the centered score is
    z'_i = N*x_i - S (= N*(x_i - mean)), the unnormalized-binary-W lag
    is lag'_i = sum of neighbor z', and the local Moran numerator is
    z'_i * lag'_i — signs and the HH/HL/LH/LL quadrant are exactly the
    classical ones, with zero float arithmetic anywhere (max |z'*lag'|
    ~ 3e15 at sf0.1, comfortably int64).  Composition: PIP spatial join
    -> per-admin partial counts -> range() universe left join -> scalar
    total -> rook edges from WKB shared-edge detection -> one
    key-cardinality lag co-shuffle."""
    import ray

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table
    from geoglue_ray.stages.geometry import contiguity_pairs
    from geoglue_ray.stages.join import hash_equijoin

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def prep(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        b = b.filter(pa.array(ids % fx.OUT_MOD != 0))
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "event_id": b["event_id"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "value": pa.array(np.zeros(len(b))),
            }
        )

    admin = build_admin_table()
    index = AdminIndex.build(admin)
    assigned = spatial_join(
        ds.map_batches(prep, batch_format="pyarrow").map_batches(
            encode_cells, batch_format="pyarrow"
        ),
        index_ref=ray.put(index),
    )

    def to_fid(b: pa.Table) -> pa.Table:
        fid = pc.cast(pc.utf8_slice_codeunits(b["admin_id"], 5, 99), pa.int64())
        return pa.table({"fid": fid})

    counts = zonal_aggregate(
        assigned.map_batches(to_fid, batch_format="pyarrow"),
        ["count"],
        keys=["fid"],
        value_col="fid",
    )
    universe = rd.range(fx.N_ADMIN2).map_batches(
        lambda b: pa.table({"fid": b["id"]}), batch_format="pyarrow"
    )
    cnt_full = hash_equijoin(
        universe, counts, left_on="fid", right_on="fid", how="left"
    ).map_batches(
        lambda b: pa.table(
            {
                "fid": b["fid"],
                "n": pc.cast(pc.fill_null(b["count"], 0.0), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed three times: total, z, final join
    total = int(cnt_full.sum("n") or 0)
    N = np.int64(fx.N_ADMIN2)

    def zscore(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy().astype(np.int64)
        return pa.table(
            {"fid": b["fid"], "z": pa.array(N * n - np.int64(total))}
        )

    zd = cnt_full.map_batches(zscore, batch_format="pyarrow").materialize()

    def adm_prep(b: pa.Table) -> pa.Table:
        fid = pc.cast(pc.utf8_slice_codeunits(b["admin_id"], 5, 99), pa.int64())
        return pa.table({"fid": fid, "geometry_wkb": b["geometry_wkb"]})

    pairs = contiguity_pairs(
        rd.from_arrow(admin)
        .repartition(8)
        .map_batches(adm_prep, batch_format="pyarrow"),
        id_col="fid",
    )

    def both_dirs(b: pa.Table) -> pa.Table:
        a = b["admin_a"].to_numpy()
        bb = b["admin_b"].to_numpy()
        return pa.table(
            {
                "focal": pa.array(np.concatenate([a, bb])),
                "nb": pa.array(np.concatenate([bb, a])),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow")
    lag = zonal_aggregate(
        hash_equijoin(edges, zd, left_on="nb", right_on="fid").select_columns(
            ["focal", "z"]
        ),
        ["sum"],
        keys=["focal"],
        value_col="z",
    ).map_batches(
        lambda b: pa.table(
            {
                "fid": b["focal"],
                "lag_n": pc.cast(b["sum"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    j = hash_equijoin(
        hash_equijoin(zd, cnt_full, left_on="fid", right_on="fid"),
        lag,
        left_on="fid",
        right_on="fid",
    )

    def final(b: pa.Table) -> pa.Table:
        z = b["z"].to_numpy().astype(np.int64)
        lg = b["lag_n"].to_numpy().astype(np.int64)
        quad = np.where(
            (z > 0) & (lg > 0),
            "HH",
            np.where(z > 0, "HL", np.where(lg > 0, "LH", "LL")),
        )
        return pa.table(
            {
                "admin_fid": b["fid"],
                "n_events": pc.cast(b["n"], pa.int64()),
                "z_n": pa.array(z),
                "lag_n": pa.array(lg),
                "local_i_num": pa.array(z * lg),
                "quadrant": pa.array(quad.astype(object), pa.string()),
            }
        )

    return j.map_batches(final, batch_format="pyarrow").sort("admin_fid")


def admin_geary(sf_dir: str) -> rd.Dataset:
    """GLOBAL Geary's C over the admin-2 tessellation — the pair
    statistic completing admin_lisa (local Moran): C compares
    neighboring-unit DIFFERENCES to total variance,
    ``C = (n-1) * sum_w (x_i - x_j)^2 * n^2 / (2W * sum z'^2)`` with
    z' = n*x - S (cleared mean).  The two sums are exact int64
    (differences need no centering; max ~1.3e12 and ~9e17 at sf0.1) and
    C is ONE fixed left-associated float chain — the only rounding is
    in the final >2^53 products, identical on both engines.  Shape:
    per-admin counts (partial/final), one rook-pair co-shuffle join for
    the difference sum, scalar outputs."""
    import ray

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table
    from geoglue_ray.stages.geometry import contiguity_pairs
    from geoglue_ray.stages.join import hash_equijoin

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def prep(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        b = b.filter(pa.array(ids % fx.OUT_MOD != 0))
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {
                "event_id": b["event_id"],
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "value": pa.array(np.zeros(len(b))),
            }
        )

    admin = build_admin_table()
    index = AdminIndex.build(admin)
    assigned = spatial_join(
        ds.map_batches(prep, batch_format="pyarrow").map_batches(
            encode_cells, batch_format="pyarrow"
        ),
        index_ref=ray.put(index),
    )

    def to_fid(b: pa.Table) -> pa.Table:
        fid = pc.cast(pc.utf8_slice_codeunits(b["admin_id"], 5, 99), pa.int64())
        return pa.table({"fid": fid})

    counts = zonal_aggregate(
        assigned.map_batches(to_fid, batch_format="pyarrow"),
        ["count"],
        keys=["fid"],
        value_col="fid",
    )
    universe = rd.range(fx.N_ADMIN2).map_batches(
        lambda b: pa.table({"fid": b["id"]}), batch_format="pyarrow"
    )
    cnt_full = hash_equijoin(
        universe, counts, left_on="fid", right_on="fid", how="left"
    ).map_batches(
        lambda b: pa.table(
            {
                "fid": b["fid"],
                "n": pc.cast(pc.fill_null(b["count"], 0.0), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed: total, ssz, two pair joins
    N = np.int64(fx.N_ADMIN2)
    S = np.int64(int(cnt_full.sum("n") or 0))

    def ssz_part(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy().astype(np.int64)
        z = N * n - S
        return pa.table({"v": pa.array([int((z * z).sum())], pa.int64())})

    ssz = np.int64(
        int(cnt_full.map_batches(ssz_part, batch_format="pyarrow").sum("v") or 0)
    )

    def adm_prep(b: pa.Table) -> pa.Table:
        fid = pc.cast(pc.utf8_slice_codeunits(b["admin_id"], 5, 99), pa.int64())
        return pa.table({"fid": fid, "geometry_wkb": b["geometry_wkb"]})

    pairs = contiguity_pairs(
        rd.from_arrow(admin)
        .repartition(8)
        .map_batches(adm_prep, batch_format="pyarrow"),
        id_col="fid",
    ).map_batches(
        lambda b: pa.table(
            {"admin_a": b["admin_a"], "admin_b": b["admin_b"]}
        ),
        batch_format="pyarrow",
    )
    ja = hash_equijoin(
        pairs, cnt_full, left_on="admin_a", right_on="fid"
    ).map_batches(
        lambda b: pa.table(
            {
                "admin_b": b["admin_b"],
                "xa": pc.cast(b["n"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    jb = hash_equijoin(ja, cnt_full, left_on="admin_b", right_on="fid")

    def diff_part(b: pa.Table) -> pa.Table:
        xa = b["xa"].to_numpy().astype(np.int64)
        xb = b["n"].to_numpy().astype(np.int64)
        d = xa - xb
        return pa.table(
            {
                "ssd": pa.array([int((d * d).sum())], pa.int64()),
                "w": pa.array([len(d)], pa.int64()),
            }
        )

    dp = jb.map_batches(diff_part, batch_format="pyarrow").to_pandas()
    ssd = np.int64(int(dp["ssd"].sum()))
    W = np.int64(int(dp["w"].sum()))  # undirected pair count
    c = (
        np.float64(N - 1) * np.float64(ssd) * np.float64(N * N)
    ) / (np.float64(2 * W) * np.float64(ssz))
    return rd.from_arrow(
        pa.table(
            {
                "n_units": pa.array([N]),
                "n_pairs": pa.array([W]),
                "ssd": pa.array([ssd]),
                "ssz": pa.array([ssz]),
                "geary_c": pa.array([c]),
            }
        )
    )


def q13_custdist(sf_dir: str, excl_priority: str = "1-URGENT") -> rd.Dataset:
    """TPC-H Q13 shape: distribution of customers by order count, counting
    the zero-order bucket.  Orders collapse to per-customer partial counts
    inside map_batches (shuffle payload = customer cardinality, never row
    count); the zero bucket is ``|customer| - |buyers|`` — two scalar
    aggregates, no customer-side shuffle at all (reference has no Q13
    analogue; decision-support shape for the engine's join grammar)."""
    import pandas as pd

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def partial(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy()[
            pc.not_equal(b["o_orderpriority"], excl_priority).to_numpy(
                zero_copy_only=False
            )
        ]
        if len(ck) == 0:
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "c_count": pa.array([], pa.int64()),
                }
            )
        ks, cnt = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "c_custkey": pa.array(ks),
                "c_count": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": [g["c_custkey"].iloc[0]],
                "c_count": [int(g["c_count"].sum())],
            }
        )

    per_cust = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .map_groups(merge, batch_format="pandas")
        .materialize()  # consumed twice: histogram + buyer count
    )
    n_cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()
    n_buyers = per_cust.count()

    hist = zonal_aggregate(per_cust, ["count"], keys=["c_count"], value_col="c_custkey")

    def finish(b: pa.Table) -> pa.Table:
        counts = b["c_count"].to_numpy()
        dist = b["count"].to_numpy().astype(np.int64)
        if n_cust > n_buyers:
            counts = np.r_[counts, 0]
            dist = np.r_[dist, np.int64(n_cust - n_buyers)]
        return pa.table(
            {"c_count": pa.array(counts), "custdist": pa.array(dist)}
        )

    # key-cardinality table (distinct order counts); single-block finish
    tbl = pa.Table.from_pandas(hist.to_pandas(), preserve_index=False)
    return rd.from_arrow(finish(tbl)).sort("c_count")


def q22_idle_rich(
    sf_dir: str,
    nations: tuple = (2, 7, 12, 17, 22),
    cutoff: str = "2000-09-01",
) -> rd.Dataset:
    """TPC-H Q22 shape: per-nation count + total balance of customers
    whose balance beats the positive-balance average of the candidate
    nations and who placed no order since ``cutoff`` (every fixture
    customer has SOME order, so the classic never-ordered predicate is
    degenerate at all SFs — the recency recast keeps the anti join
    non-trivial).  The average enters as ONE scalar division (exact int64
    cents on both sides); the no-recent-order test is the fixed-shard
    ANTI join with the date filter pushed below the shuffle; the nation
    rollup is key-cardinality.  Balance cents via round-to-nearest
    (mirrors CAST(x*100 AS BIGINT))."""
    from geoglue_ray.stages.join import hash_equijoin

    nset = set(int(n) for n in nations)
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def slice_cents(b: pa.Table) -> pa.Table:
        nk = b["c_nationkey"].to_numpy().astype(np.int64)
        m = np.isin(nk, list(nset))
        cents = np.round(b["c_acctbal"].to_numpy()[m] * 100.0).astype(np.int64)
        return pa.table(
            {
                "c_custkey": pa.array(b["c_custkey"].to_numpy()[m]),
                "c_nationkey": pa.array(nk[m]),
                "bal_cents": pa.array(cents),
            }
        )

    cand = cust.map_batches(slice_cents, batch_format="pyarrow").materialize()

    # scalar average of the POSITIVE balances (single division, both sides)
    def pos_partial(b: pa.Table) -> pa.Table:
        c = b["bal_cents"].to_numpy()
        c = c[c > 0]
        return pa.table(
            {
                "s": pa.array([int(c.sum())], pa.int64()),
                "n": pa.array([len(c)], pa.int64()),
            }
        )

    tot = pa.Table.from_pandas(
        cand.map_batches(pos_partial, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )
    avg = np.float64(int(tot["s"].to_numpy().sum())) / np.float64(
        int(tot["n"].to_numpy().sum())
    )

    rich = cand.map_batches(
        lambda b: b.filter(
            pa.array(b["bal_cents"].to_numpy().astype(np.float64) > avg)
        ),
        batch_format="pyarrow",
    )
    cut = np.datetime64(cutoff, "us")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.greater_equal(b["o_orderdate"], pa.scalar(cut, pa.timestamp("us")))
        ).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    idle = hash_equijoin(rich, orders, "c_custkey", "o_custkey", how="anti")
    out = zonal_aggregate(
        idle, ["count", "sum"], keys=["c_nationkey"], value_col="bal_cents"
    )

    def cast_sum(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_nationkey": b["c_nationkey"],
                "numcust": pc.cast(b["count"], pa.int64()),
                "totacctbal_cents": pa.array(
                    np.round(
                        b["sum"].to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
            }
        )

    return out.map_batches(cast_sum, batch_format="pyarrow").sort("c_nationkey")


def q2_min_cost_supplier(
    sf_dir: str, p_type: str = "ECONOMY", min_size: int = 20
) -> rd.Dataset:
    """TPC-H Q2 shape: for each part in a type/size slice, the supplier
    offering the minimum observed unit cost (extendedprice / quantity —
    ONE IEEE division per row, identical on both engines), suppkey
    tie-break.  The part slice and the supplier->nation dimensions are
    broadcast lookups (ray.put once, read per task); the per-part argmin
    collapses per batch before one key-cardinality merge."""
    import pandas as pd
    import ray

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_type", "p_size"],
    ).to_pandas()
    sl = part[(part["p_type"] == p_type) & (part["p_size"] >= min_size)]
    slice_names = dict(zip(sl["p_partkey"].astype(np.int64), sl["p_name"]))
    slice_ref = ray.put(frozenset(slice_names))

    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    ).to_pandas()
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    sn = supp.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    s_name = dict(zip(sn["s_suppkey"].astype(np.int64), sn["s_name"]))
    n_name = dict(zip(sn["s_suppkey"].astype(np.int64), sn["n_name"]))

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )

    def partial(b: pa.Table, keys) -> pa.Table:
        pk = b["l_partkey"].to_numpy()
        m = np.isin(pk, np.fromiter(keys, dtype=np.int64))
        pk = pk[m]
        sk = b["l_suppkey"].to_numpy()[m]
        cost = (
            b["l_extendedprice"].to_numpy()[m] / b["l_quantity"].to_numpy()[m]
        )
        if len(pk) == 0:
            return pa.table(
                {
                    "p_partkey": pa.array([], pa.int64()),
                    "unit_cost": pa.array([], pa.float64()),
                    "s_suppkey": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((sk, cost, pk))
        pks = pk[order]
        first = np.flatnonzero(np.r_[True, pks[1:] != pks[:-1]])
        return pa.table(
            {
                "p_partkey": pa.array(pks[first]),
                "unit_cost": pa.array(cost[order][first]),
                "s_suppkey": pa.array(sk[order][first]),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["unit_cost", "s_suppkey"], kind="mergesort"
        ).iloc[:1]
        return g.reset_index(drop=True)

    best = (
        li.map_batches(
            lambda b: partial(b, ray.get(slice_ref)), batch_format="pyarrow"
        )
        .groupby("p_partkey")
        .map_groups(merge, batch_format="pandas")
    )

    def attach(b: pa.Table) -> pa.Table:
        pk = b["p_partkey"].to_numpy().astype(np.int64)
        sk = b["s_suppkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "p_partkey": pa.array(pk),
                "p_name": pa.array([slice_names[int(k)] for k in pk], pa.string()),
                "unit_cost": b["unit_cost"],
                "s_suppkey": pa.array(sk),
                "s_name": pa.array([s_name[int(k)] for k in sk], pa.string()),
                "n_name": pa.array([n_name[int(k)] for k in sk], pa.string()),
            }
        )

    return best.map_batches(attach, batch_format="pyarrow").sort("p_partkey")


def q16_supplier_variety(sf_dir: str, excl_brand: str = "Brand#13") -> rd.Dataset:
    """TPC-H Q16 shape: distinct-supplier variety per (brand, type, size)
    observed in lineitem, excluding one brand and a deterministic supplier
    blacklist (suppkey % 7 == 0 — the no-partsupp-table recast of the
    complaints filter).  Distinct (part, supp) pairs dedup per batch, the
    part attributes attach via the fixed-shard hash join (part is a big
    dimension at scale — never broadcast), and the exact distinct count
    runs through stages/validate.count_distinct."""
    from geoglue_ray.stages.join import hash_equijoin
    from geoglue_ray.stages.validate import _unique_rows, count_distinct

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def pairs(b: pa.Table) -> pa.Table:
        keep = b["l_suppkey"].to_numpy() % 7 != 0
        return _unique_rows(b.filter(pa.array(keep)), ["l_partkey", "l_suppkey"])

    pair_ds = li.map_batches(pairs, batch_format="pyarrow")

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    ).map_batches(
        lambda b: b.filter(pc.not_equal(b["p_brand"], excl_brand)),
        batch_format="pyarrow",
    )
    joined = hash_equijoin(pair_ds, part, "l_partkey", "p_partkey", how="inner")
    out = count_distinct(
        joined, ["p_brand", "p_type", "p_size"], ["l_suppkey"], "supplier_cnt"
    )

    def cast_size(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": b["p_brand"],
                "p_type": b["p_type"],
                "p_size": pc.cast(b["p_size"], pa.int32()),
                "supplier_cnt": pc.cast(b["supplier_cnt"], pa.int64()),
            }
        )

    return out.map_batches(cast_size, batch_format="pyarrow").sort(
        ["p_brand", "p_type", "p_size"]
    )


def q11_important_parts(sf_dir: str) -> rd.Dataset:
    """TPC-H Q11 shape: parts whose lineitem revenue exceeds 5/4 of the
    MEAN per-part share — the global-scalar-gate pattern with a
    data-relative threshold (an absolute 1/den fraction empties at higher
    SFs as part cardinality grows; round-4 lesson).  Revenue in exact
    int64 cents (round-to-nearest mirrors CAST(x*100 AS BIGINT)); the gate
    is the pure integer comparison ``value*n_parts*4 > total*5`` on both
    sides.  The per-part partial/merge table is materialized once and
    feeds the two scalars and the filter."""
    import pandas as pd

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"]
    )

    def partial(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy()
        cents = np.round(b["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
        order = np.argsort(pk, kind="stable")
        pks = pk[order]
        first = np.flatnonzero(np.r_[True, pks[1:] != pks[:-1]])
        return pa.table(
            {
                "l_partkey": pa.array(pks[first]),
                "value_cents": pa.array(np.add.reduceat(cents[order], first)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_partkey": [g["l_partkey"].iloc[0]],
                "value_cents": [int(g["value_cents"].sum())],
            }
        )

    per_part = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .map_groups(merge, batch_format="pandas")
        .materialize()  # consumed thrice: two scalars + the filter
    )
    total = int(per_part.sum("value_cents"))
    n_parts = per_part.count()

    return per_part.map_batches(
        lambda b: b.filter(
            pa.array(
                b["value_cents"].to_numpy() * np.int64(n_parts) * np.int64(4)
                > np.int64(total) * np.int64(5)
            )
        ),
        batch_format="pyarrow",
    ).sort("l_partkey")


def _events_admin_day(
    sf_dir: str, types: tuple | None = None
) -> rd.Dataset:
    """Events -> (admin1_id, admin_id, day index, event_type) via the
    broadcast spatial join; day = floor microseconds since the events
    epoch (2024-01-01, the ts column's OWN epoch — mirrors DuckDB
    date_diff('day', midnight epoch, ts))."""
    import ray

    from geoglue_ray.sources.admin import AdminIndex, build_admin_table

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type"]
    )
    epoch = np.datetime64("2024-01-01T00:00:00", "us")

    def derive(b: pa.Table) -> pa.Table:
        if types is not None:
            mask = np.isin(
                b["event_type"].to_numpy(zero_copy_only=False), list(types)
            )
            b = b.filter(pa.array(mask))
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        d = (
            b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
            - epoch
        ).astype(np.int64) // 86_400_000_000
        return pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "d": pa.array(d),
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    ds = ds.map_batches(derive, batch_format="pyarrow")
    ds = ds.map_batches(encode_cells, batch_format="pyarrow")
    index = AdminIndex.build(build_admin_table())
    return spatial_join(ds, index_ref=ray.put(index))


def kendall_admin1(
    sf_dir: str, type_a: str = "click", type_b: str = "purchase"
) -> rd.Dataset:
    """Kendall tau-b rank correlation per admin-1 between the DAILY count
    series of two event types (days where either type occurred).  Exact
    integer concordant/discordant/tie counts (all-pairs over a <=31-day
    series is trivial once the stream has partial-collapsed to
    (admin1, day) cardinality); tau-b's one division and sqrt mirror the
    SQL twin bit-exactly (sqrt is correctly rounded on both engines)."""
    import pandas as pd

    ds = _events_admin_day(sf_dir, types=(type_a, type_b))

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "admin1_id": pa.array([], pa.string()),
                    "d": pa.array([], pa.int64()),
                    "na": pa.array([], pa.int64()),
                    "nb": pa.array([], pa.int64()),
                }
            )
        a1 = b["admin1_id"].to_numpy(zero_copy_only=False)
        d = b["d"].to_numpy()
        is_a = b["event_type"].to_numpy(zero_copy_only=False) == type_a
        a1c, a1u = pd.factorize(a1, use_na_sentinel=False)
        key = a1c.astype(np.int64) * 64 + d  # d < 31 days
        codes, uniq = pd.factorize(key, use_na_sentinel=False)
        na = np.bincount(codes, weights=is_a, minlength=len(uniq)).astype(np.int64)
        nb = np.bincount(codes, weights=~is_a, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "admin1_id": pa.array(a1u[uniq // 64].astype(object), pa.string()),
                "d": pa.array((uniq % 64).astype(np.int64)),
                "na": pa.array(na),
                "nb": pa.array(nb),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # bounded: admin1 x <=31 days x batch count
    g = parts.groupby(["admin1_id", "d"], as_index=False, sort=True)[
        ["na", "nb"]
    ].sum()
    rows = []
    for a1_id, sub in g.groupby("admin1_id", sort=True):
        x = sub["na"].to_numpy().astype(np.int64)
        y = sub["nb"].to_numpy().astype(np.int64)
        n = len(x)
        iu, ju = np.triu_indices(n, k=1)
        dx = np.sign(x[iu] - x[ju])
        dy = np.sign(y[iu] - y[ju])
        nc = int(np.sum((dx * dy) > 0))
        nd = int(np.sum((dx * dy) < 0))
        n0 = n * (n - 1) // 2
        _, cx = np.unique(x, return_counts=True)
        _, cy = np.unique(y, return_counts=True)
        n1 = int((cx * (cx - 1) // 2).sum())
        n2 = int((cy * (cy - 1) // 2).sum())
        denom = np.sqrt(np.float64(n0 - n1) * np.float64(n0 - n2))
        tau = np.float64(nc - nd) / denom if denom > 0 else np.nan
        rows.append((a1_id, n, nc, nd, float(tau)))
    return rd.from_arrow(
        pa.table(
            {
                "admin1_id": pa.array([r[0] for r in rows], pa.string()),
                "n_days": pa.array([r[1] for r in rows], pa.int64()),
                "concordant": pa.array([r[2] for r in rows], pa.int64()),
                "discordant": pa.array([r[3] for r in rows], pa.int64()),
                "tau_b": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
    )


def changepoint_admin1(sf_dir: str, kmin: int = 3) -> rd.Dataset:
    """Exact single-changepoint detection (binary-segmentation step) per
    admin-1 over the daily event-count series: the split minimizing
    SSE_left + SSE_right, where each SSE = S2 - S*S/n enters as ONE
    division of exact int64 prefix sums (the cleared-denominator pattern)
    and the two terms add in the same order on both engines.  Tie-break:
    smallest split position (np.argmin == ORDER BY cost, k)."""
    import pandas as pd

    ds = _events_admin_day(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "admin1_id": pa.array([], pa.string()),
                    "d": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        a1 = b["admin1_id"].to_numpy(zero_copy_only=False)
        d = b["d"].to_numpy()
        a1c, a1u = pd.factorize(a1, use_na_sentinel=False)
        key = a1c.astype(np.int64) * 64 + d  # d < 31 days
        codes, uniq = pd.factorize(key, use_na_sentinel=False)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "admin1_id": pa.array(a1u[uniq // 64].astype(object), pa.string()),
                "d": pa.array((uniq % 64).astype(np.int64)),
                "n": pa.array(n),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby(["admin1_id", "d"], as_index=False, sort=True)["n"].sum()
    rows = []
    for a1_id, sub in g.groupby("admin1_id", sort=True):
        sub = sub.sort_values("d", kind="mergesort")
        n = sub["n"].to_numpy().astype(np.int64)
        days = sub["d"].to_numpy().astype(np.int64)
        nt = len(n)
        if nt < 2 * kmin:
            continue
        sl = np.cumsum(n)
        s2l = np.cumsum(n * n)
        st, s2t = int(sl[-1]), int(s2l[-1])
        k = np.arange(1, nt + 1, dtype=np.int64)
        lo, hi = kmin, nt - kmin
        sel = (k >= lo) & (k <= hi)
        kk = k[sel].astype(np.float64)
        slf = sl[sel].astype(np.float64)
        s2f = s2l[sel].astype(np.float64)
        srf = (np.int64(st) - sl[sel]).astype(np.float64)
        s2r = (np.int64(s2t) - s2l[sel]).astype(np.float64)
        nr = (np.int64(nt) - k[sel]).astype(np.float64)
        cost = (s2f - slf * slf / kk) + (s2r - srf * srf / nr)
        best = int(np.argmin(cost))
        rows.append(
            (a1_id, nt, int(k[sel][best]), int(days[k[sel][best] - 1]),
             float(cost[best]))
        )
    return rd.from_arrow(
        pa.table(
            {
                "admin1_id": pa.array([r[0] for r in rows], pa.string()),
                "n_days": pa.array([r[1] for r in rows], pa.int64()),
                "split_k": pa.array([r[2] for r in rows], pa.int64()),
                "split_day": pa.array([r[3] for r in rows], pa.int64()),
                "cost": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
    )


def classifier_kappa(
    sf_dir: str, t1: int = 300, t2: int = 240
) -> rd.Dataset:
    """Cohen's kappa inter-rater agreement between two document quality
    raters (raw length >= t1 vs whitespace-stripped length >= t2) — the
    annotation-QC operator.  The 2x2 confusion matrix accumulates as
    per-batch int partials; kappa enters as the ONE exact-integer
    division (N*diag - sum(row*col)) / (N*N - sum(row*col))."""

    ds = read_documents_cols(sf_dir, ["text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        nc = b["n_chars"].to_numpy()
        stripped = pc.replace_substring(b["text"], " ", "")
        ns = pc.utf8_length(stripped).to_numpy(zero_copy_only=False)
        r1 = nc >= t1
        r2 = ns >= t2
        return pa.table(
            {
                "n11": pa.array([int(np.sum(r1 & r2))], pa.int64()),
                "n10": pa.array([int(np.sum(r1 & ~r2))], pa.int64()),
                "n01": pa.array([int(np.sum(~r1 & r2))], pa.int64()),
                "n00": pa.array([int(np.sum(~r1 & ~r2))], pa.int64()),
            }
        )

    t = pa.Table.from_pandas(
        ds.map_batches(partial, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )
    n11 = int(t["n11"].to_numpy().sum())
    n10 = int(t["n10"].to_numpy().sum())
    n01 = int(t["n01"].to_numpy().sum())
    n00 = int(t["n00"].to_numpy().sum())
    N = n11 + n10 + n01 + n00
    pe_num = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    kappa = np.float64(N * (n11 + n00) - pe_num) / np.float64(N * N - pe_num)
    return rd.from_arrow(
        pa.table(
            {
                "n_docs": pa.array([N], pa.int64()),
                "n11": pa.array([n11], pa.int64()),
                "n10": pa.array([n10], pa.int64()),
                "n01": pa.array([n01], pa.int64()),
                "n00": pa.array([n00], pa.int64()),
                "kappa": pa.array([float(kappa)], pa.float64()),
            }
        )
    )


def bm25_term_top(
    sf_dir: str,
    terms: tuple = ("scan", "column", "window"),
    k: int = 10,
) -> rd.Dataset:
    """BM25-lite retrieval: top-``k`` documents per query term.  With
    b = 1 and k1 = 1 the score clears to ``2*tf*L / (tf*L + dl*N)`` — a
    SINGLE division of exact int64 quantities (L = corpus token count,
    N = doc count enter as broadcast scalars), so ranking doubles are
    identical on both engines; (score DESC, doc_id) makes top-k total.
    Whitespace tokens, matching the corpus-wide vocab grammar."""
    import pandas as pd

    ds = read_documents_cols(sf_dir, ["doc_id", "text"]).materialize()

    def tok_stats(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        flat = pc.list_flatten(toks)
        nonempty = pc.not_equal(flat, "")
        offs = np.asarray(toks.combine_chunks().offsets)
        seg = np.repeat(
            np.arange(len(offs) - 1), np.diff(offs)
        )
        ne = nonempty.to_numpy(zero_copy_only=False)
        dl = np.bincount(seg, weights=ne, minlength=b.num_rows).astype(np.int64)
        cols = {"doc_id": b["doc_id"], "dl": pa.array(dl)}
        flat_np = flat.to_numpy(zero_copy_only=False)
        for i, term in enumerate(terms):
            hit = (flat_np == term) & ne
            cols[f"tf{i}"] = pa.array(
                np.bincount(seg, weights=hit, minlength=b.num_rows).astype(
                    np.int64
                )
            )
        return pa.table(cols)

    stats = ds.map_batches(tok_stats, batch_format="pyarrow").materialize()
    L = int(stats.sum("dl"))
    N = stats.count()

    def score(b: pa.Table) -> pa.Table:
        out = {
            "term": [], "doc_id": [], "tf": [], "dl": [], "score": [],
        }
        did = b["doc_id"].to_numpy()
        dl = b["dl"].to_numpy()
        for i, term in enumerate(terms):
            tf = b[f"tf{i}"].to_numpy()
            m = tf > 0
            sc = (2 * tf[m] * np.int64(L)).astype(np.float64) / (
                tf[m] * np.int64(L) + dl[m] * np.int64(N)
            ).astype(np.float64)
            out["term"].append(np.full(int(m.sum()), term, dtype=object))
            out["doc_id"].append(did[m])
            out["tf"].append(tf[m])
            out["dl"].append(dl[m])
            out["score"].append(sc)
        return pa.table(
            {
                "term": pa.array(np.concatenate(out["term"]), pa.string()),
                "doc_id": pa.array(np.concatenate(out["doc_id"])),
                "tf": pa.array(np.concatenate(out["tf"])),
                "dl": pa.array(np.concatenate(out["dl"])),
                "score": pa.array(np.concatenate(out["score"])),
            }
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).iloc[:k]
        return g.reset_index(drop=True)

    return (
        stats.map_batches(score, batch_format="pyarrow")
        .groupby("term")
        .map_groups(topk, batch_format="pandas")
        .sort(["term", "doc_id"])
    )


def sorted_neighborhood_dupes(
    sf_dir: str, window: int = 3, prefix_len: int = 24, bucket: int = 64
) -> rd.Dataset:
    """Sorted-neighborhood duplicate candidates — the classic entity-
    resolution blocking strategy the LSH/simhash family doesn't cover:
    sort by (lang, n_chars, doc_id), compare each row to its ``window``
    successors within the same lang.  Distributed shape: the global rank
    comes from the two-pass prefix scan over a composite sort key
    (stages/scan.global_prefix_sum — never a whole-corpus sort-and-walk
    on the driver); pair generation buckets ranks ``rk // bucket`` with a
    ``window``-row halo duplicated into the previous bucket, one
    vectorized searchsorted pass per fixed shard.  Emits rank distance,
    |n_chars| gap and 24-char prefix equality per candidate pair."""
    import pandas as pd

    from geoglue_ray.stages.scan import global_prefix_sum

    ds = read_documents_cols(sf_dir, ["doc_id", "lang", "n_chars", "text"])
    LANGS = ("de", "en", "es", "fr", "zh")  # fixture lang codes, sorted
    lmap = {l: i for i, l in enumerate(LANGS)}

    def key(b: pa.Table) -> pa.Table:
        lang = b["lang"].to_numpy(zero_copy_only=False)
        li = np.array([lmap[x] for x in lang], dtype=np.int64)
        nc = b["n_chars"].to_numpy().astype(np.int64)
        did = b["doc_id"].to_numpy().astype(np.int64)
        comp = (li << 44) + (nc << 34) + did  # doc_id < 2^34, n_chars < 2^10
        pref = pc.utf8_slice_codeunits(b["text"], 0, prefix_len)
        return pa.table(
            {
                "comp": pa.array(comp),
                "one": pa.array(np.ones(len(li), dtype=np.int64)),
                "lang": b["lang"],
                "doc_id": b["doc_id"],
                "n_chars": pa.array(nc),
                "pref": pref,
            }
        )

    ranked = global_prefix_sum(
        ds.map_batches(key, batch_format="pyarrow"), "comp", "one"
    )

    w = int(window)
    B = int(bucket)

    def to_buckets(b: pa.Table) -> pa.Table:
        rk = b["start_offset"].to_numpy().astype(np.int64)
        bk = rk // B
        halo = rk % B < w
        t = pa.table(
            {
                "bk": pa.array(bk),
                "rk": pa.array(rk),
                "lang": b["lang"],
                "doc_id": b["doc_id"],
                "n_chars": b["n_chars"],
                "pref": b["pref"],
            }
        )
        if halo.any():
            h = t.filter(pa.array(halo & (bk > 0)))
            h = h.set_column(0, "bk", pa.array(h["bk"].to_numpy() - 1))
            t = pa.concat_tables([t, h])
        return t

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("rk", kind="mergesort")
        bk0 = int(g["bk"].iloc[0])
        rk = g["rk"].to_numpy().astype(np.int64)
        lang = g["lang"].to_numpy()
        did = g["doc_id"].to_numpy().astype(np.int64)
        nc = g["n_chars"].to_numpy().astype(np.int64)
        pref = g["pref"].to_numpy()
        own = (rk // B) == bk0  # pairs are OWNED by the left row's bucket
        ai, bi, dist = [], [], []
        for delta in range(1, w + 1):
            pos = np.searchsorted(rk, rk + delta)
            ok = (pos < len(rk)) & own
            pos_c = np.clip(pos, 0, len(rk) - 1)
            ok &= rk[pos_c] == rk + delta
            ok &= lang[pos_c] == lang
            ai.append(np.flatnonzero(ok))
            bi.append(pos_c[ok])
            dist.append(np.full(int(ok.sum()), delta, dtype=np.int64))
        a = np.concatenate(ai)
        b_ = np.concatenate(bi)
        d = np.concatenate(dist)
        return pd.DataFrame(
            {
                "lang": lang[a],
                "doc_a": did[a],
                "doc_b": did[b_],
                "rank_dist": d,
                "char_diff": np.abs(nc[a] - nc[b_]),
                "prefix_match": pref[a] == pref[b_],
            }
        )

    out = (
        ranked.map_batches(to_buckets, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(pairs, batch_format="pandas")
    )

    def cast_out(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": pc.cast(b["lang"], pa.string()),
                "doc_a": pc.cast(b["doc_a"], pa.int64()),
                "doc_b": pc.cast(b["doc_b"], pa.int64()),
                "rank_dist": pc.cast(b["rank_dist"], pa.int64()),
                "char_diff": pc.cast(b["char_diff"], pa.int64()),
                "prefix_match": pc.cast(b["prefix_match"], pa.bool_()),
            }
        )

    return out.map_batches(cast_out, batch_format="pyarrow").sort(
        ["lang", "doc_a", "doc_b"]
    )


def target_encode(sf_dir: str, m: int = 20) -> rd.Dataset:
    """Smoothed target encoding of the event-type category against the
    value target — the feature-engineering operator.  The usual
    (sum + m*prior) / (n + m) with prior = T/Ntot clears denominators to
    ONE exact division: (S*Ntot + m*T) / (Ntot*(n + m)), everything else
    int64 cents.  Per-batch partial collapse to category cardinality."""
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        t = b["event_type"].to_numpy(zero_copy_only=False)
        cents = np.round(b["value"].to_numpy() * 100.0).astype(np.int64)
        codes, uniq = pd.factorize(t, use_na_sentinel=False)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        s = np.bincount(codes, weights=cents, minlength=len(uniq)).astype(
            np.int64
        )
        return pa.table(
            {
                "event_type": pa.array(uniq.astype(object), pa.string()),
                "n": pa.array(n),
                "s": pa.array(s),
            }
        )

    t = (
        ev.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("event_type", as_index=False, sort=True)[["n", "s"]]
        .sum()
    )  # bounded: category cardinality x batches
    N = int(t["n"].sum())
    T = int(t["s"].sum())
    n = t["n"].to_numpy().astype(np.int64)
    s = t["s"].to_numpy().astype(np.int64)
    enc = (s * np.int64(N) + np.int64(m) * np.int64(T)).astype(
        np.float64
    ) / (np.int64(N) * (n + np.int64(m))).astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(t["event_type"], pa.string()),
                "n": pa.array(n),
                "sum_cents": pa.array(s),
                "enc_cents": pa.array(enc),
            }
        )
    )


def pr_curve(
    sf_dir: str,
    pos_type: str = "purchase",
    thresholds: tuple = tuple(range(0, 40000, 5000)),
) -> rd.Dataset:
    """Precision / recall / F1 at fixed score thresholds (value cents as
    the classifier score, one event type as the positive class) — the
    model-eval companion to score_auc.  Streams ONE per-score histogram
    (payload = distinct-cents cardinality, the score_auc shape), then
    every threshold's confusion entries are exact integer tail sums with
    single-division metrics."""

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        c = np.round(b["value"].to_numpy() * 100.0).astype(np.int64)
        pos = (
            b["event_type"].to_numpy(zero_copy_only=False) == pos_type
        ).astype(np.int64)
        u, inv = np.unique(c, return_inverse=True)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        p = np.bincount(inv, weights=pos, minlength=len(u)).astype(np.int64)
        return pa.table(
            {"c": pa.array(u), "n": pa.array(n), "p": pa.array(p)}
        )

    hist = (
        ev.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("c", as_index=False, sort=True)[["n", "p"]]
        .sum()
    )  # bounded: distinct-cents cardinality
    c = hist["c"].to_numpy().astype(np.int64)
    n = hist["n"].to_numpy().astype(np.int64)
    p = hist["p"].to_numpy().astype(np.int64)
    P = int(p.sum())
    rows = []
    for t in thresholds:
        sel = c >= t
        tp = int(p[sel].sum())
        fp = int((n[sel] - p[sel]).sum())
        fn = P - tp
        prec = (
            np.float64(tp) / np.float64(tp + fp) if tp + fp > 0 else np.nan
        )
        rec = np.float64(tp) / np.float64(P) if P > 0 else np.nan
        f1 = (
            np.float64(2 * tp) / np.float64(2 * tp + fp + fn)
            if 2 * tp + fp + fn > 0
            else np.nan
        )
        rows.append((int(t), tp, fp, fn, float(prec), float(rec), float(f1)))
    return rd.from_arrow(
        pa.table(
            {
                "threshold_cents": pa.array([r[0] for r in rows], pa.int64()),
                "tp": pa.array([r[1] for r in rows], pa.int64()),
                "fp": pa.array([r[2] for r in rows], pa.int64()),
                "fn": pa.array([r[3] for r in rows], pa.int64()),
                "precision": pa.array([r[4] for r in rows], pa.float64()),
                "recall": pa.array([r[5] for r in rows], pa.float64()),
                "f1": pa.array([r[6] for r in rows], pa.float64()),
            }
        )
    )


def feature_hashing(sf_dir: str, n_buckets: int = 16) -> rd.Dataset:
    """Hashing-trick featurization: each document's whitespace tokens
    hash into ``n_buckets`` counts (the fixed-width sparse feature map
    fed to linear models) — one vectorized flatten + bincount per batch,
    emitted as (doc_id, bucket, cnt) sparse rows.  The token hash is the
    shared functions/texthash.token_hash64 chain, so the SQL twin replays
    it exactly in HUGEINT."""
    from geoglue_ray.functions.texthash import token_hash64

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])
    NB = np.uint64(n_buckets)

    def hash_batch(b: pa.Table) -> pa.Table:
        toks = b["text"].combine_chunks() if isinstance(
            b["text"], pa.ChunkedArray
        ) else b["text"]
        lst = pc.split_pattern(toks, " ")
        flat = pc.list_flatten(lst)
        offs = np.asarray(lst.offsets)
        seg = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        vals = flat.to_numpy(zero_copy_only=False)
        ne = vals != ""
        if not ne.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        h = token_hash64(vals[ne]) % NB
        key = seg[ne].astype(np.int64) * int(n_buckets) + h.astype(np.int64)
        cnt = np.bincount(key, minlength=b.num_rows * int(n_buckets))
        nz = np.flatnonzero(cnt)
        did = b["doc_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did[nz // int(n_buckets)]),
                "bucket": pa.array((nz % int(n_buckets)).astype(np.int64)),
                "cnt": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    return ds.map_batches(hash_batch, batch_format="pyarrow").sort(
        ["doc_id", "bucket"]
    )


def hub_closeness(
    sf_dir: str, n_hubs: int = 8, max_hops: int = 3
) -> rd.Dataset:
    """Harmonic closeness census of the co-purchase graph's top-degree
    hubs: newly-reached node counts at hops 1..3 from each hub and the
    harmonic centrality n1 + n2/2 + n3/3 (the float chain is three exact
    casts and two exact dyadic/ternary divisions added left-to-right —
    identical on both engines).  Hubs = top-``n_hubs`` by distinct-
    neighbor degree (ties to the smaller part id) selected by a
    key-cardinality sort; BFS is stages/graph.bfs_hops (bounded rounds,
    broadcast hop matrix, edges streamed per round)."""
    import pandas as pd

    from geoglue_ray.stages.graph import basket_edges, bfs_hops

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    edges = basket_edges(li, "l_orderkey", "l_partkey").materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy().astype(np.int64)
        u, cnt = np.unique(src, return_counts=True)
        return pa.table(
            {"src": pa.array(u), "deg": pa.array(cnt.astype(np.int64))}
        )

    def deg_merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": [g["src"].iloc[0]],
                "deg": [int(g["deg"].sum())],
            }
        )

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("src")
        .map_groups(deg_merge, batch_format="pandas")
        .sort(["deg", "src"], descending=[True, False])
        .limit(n_hubs)
        .to_pandas()
    )
    hubs = deg["src"].to_numpy().astype(np.int64)
    hub_deg = dict(zip(hubs.tolist(), deg["deg"].astype(np.int64).tolist()))

    t = bfs_hops(edges, max_hops=max_hops, sources=np.sort(hubs))
    df = t.to_pandas()
    rows = []
    for hub, sub in df.groupby("src_id", sort=True):
        h = sub["hops"].to_numpy()
        n1 = int(np.sum(h == 1))
        n2 = int(np.sum(h == 2))
        n3 = int(np.sum(h == 3))
        harm = np.float64(n1) + np.float64(n2) / 2.0 + np.float64(n3) / 3.0
        rows.append((int(hub), hub_deg[int(hub)], n1, n2, n3, float(harm)))
    return rd.from_arrow(
        pa.table(
            {
                "hub": pa.array([r[0] for r in rows], pa.int64()),
                "degree": pa.array([r[1] for r in rows], pa.int64()),
                "n1": pa.array([r[2] for r in rows], pa.int64()),
                "n2": pa.array([r[3] for r in rows], pa.int64()),
                "n3": pa.array([r[4] for r in rows], pa.int64()),
                "harmonic": pa.array([r[5] for r in rows], pa.float64()),
            }
        )
    )


def raster_voronoi(
    sf_dir: str, n_seeds: int = 32, seed_type: str = "purchase"
) -> rd.Dataset:
    """Discrete Voronoi allocation of the raster grid to the nearest
    seed event (nearest-facility assignment): the first hour's cells,
    seeds = the ``n_seeds`` smallest purchase event ids, per-cell exact
    argmin of the mirrored squared-distance chain
    (lon-sx)*(lon-sx) + (lat-sy)*(lat-sy) with event-id tie-break.
    Seeds broadcast once; each raster batch scores cells x seeds in one
    vectorized block."""
    import ray

    from geoglue_ray.sources.raster import read_raster

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    )
    seeds_df = (
        ev.map_batches(
            lambda b: b.filter(pc.equal(b["event_type"], seed_type)).select(
                ["event_id"]
            ),
            batch_format="pyarrow",
        )
        .sort("event_id")
        .limit(n_seeds)
        .to_pandas()
    )
    sid = seeds_df["event_id"].to_numpy().astype(np.int64)
    sx, sy = fx.derive_lonlat(sid)
    seeds_ref = ray.put((sid, sx, sy))

    def assign(b: pa.Table, *, ref=seeds_ref) -> pa.Table:
        sid_, sx_, sy_ = ray.get(ref) if not isinstance(ref, tuple) else ref
        b2 = b
        if b2.num_rows == 0:
            return pa.table(
                {
                    "lon": pa.array([], pa.float64()),
                    "lat": pa.array([], pa.float64()),
                    "seed_event": pa.array([], pa.int64()),
                    "d2": pa.array([], pa.float64()),
                }
            )
        lon = b2["longitude"].to_numpy()
        lat = b2["latitude"].to_numpy()
        dx = lon[:, None] - sx_[None, :]
        dy = lat[:, None] - sy_[None, :]
        d2 = dx * dx + dy * dy
        best = np.argmin(d2, axis=1)  # first occurrence = smallest seed idx
        return pa.table(
            {
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "seed_event": pa.array(sid_[best]),
                "d2": pa.array(d2[np.arange(len(best)), best]),
            }
        )

    rast = read_raster(n_days=1)

    def hour0(b: pa.Table) -> pa.Table:
        m = pc.equal(b["variable"], "t2m").to_numpy(zero_copy_only=False)
        vt = b["valid_time"].to_numpy(zero_copy_only=False)
        m &= vt == fx.T0
        return b.filter(pa.array(m))

    out = rast.map_batches(hour0, batch_format="pyarrow").map_batches(
        assign, batch_format="pyarrow"
    )
    return out.sort(["lat", "lon"])


def calibration_bins(
    sf_dir: str, pos_type: str = "purchase", n_bins: int = 10
) -> rd.Dataset:
    """Reliability-diagram bins for a pseudo-probability score
    (p = (cents % 1000)/1000) against the positive class — the model-
    calibration audit.  Per-bin mean prediction clears to the single
    division sum(cents%1000)/(1000*n); observed rate is pos/n.  One
    per-batch partial collapse to bin cardinality."""

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value", "event_type"]
    )
    NB = int(n_bins)

    def partial(b: pa.Table) -> pa.Table:
        cents = np.round(b["value"].to_numpy() * 100.0).astype(np.int64)
        frac = cents % 1000
        bins = frac * NB // 1000
        pos = (
            b["event_type"].to_numpy(zero_copy_only=False) == pos_type
        ).astype(np.int64)
        n = np.bincount(bins, minlength=NB).astype(np.int64)
        p = np.bincount(bins, weights=pos, minlength=NB).astype(np.int64)
        s = np.bincount(bins, weights=frac, minlength=NB).astype(np.int64)
        return pa.table(
            {
                "bin": pa.array(np.arange(NB, dtype=np.int64)),
                "n": pa.array(n),
                "n_pos": pa.array(p),
                "s_frac": pa.array(s),
            }
        )

    hist = (
        ev.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("bin", as_index=False, sort=True)[["n", "n_pos", "s_frac"]]
        .sum()
    )
    n = hist["n"].to_numpy().astype(np.int64)
    npos = hist["n_pos"].to_numpy().astype(np.int64)
    s = hist["s_frac"].to_numpy().astype(np.int64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_pred = s.astype(np.float64) / (1000.0 * n.astype(np.float64))
        frac_pos = npos.astype(np.float64) / n.astype(np.float64)
    keep = n > 0
    return rd.from_arrow(
        pa.table(
            {
                "bin": pa.array(hist["bin"].to_numpy().astype(np.int64)[keep]),
                "n": pa.array(n[keep]),
                "n_pos": pa.array(npos[keep]),
                "mean_pred": pa.array(mean_pred[keep]),
                "frac_pos": pa.array(frac_pos[keep]),
            }
        )
    )


def od_ipf(sf_dir: str, rounds: int = 4) -> rd.Dataset:
    """Doubly-constrained trip balancing (integer IPF / Furness rounds)
    over the OD matrix: rebalance flows so every zone's OUTflow matches
    its observed INflow, alternating exact integer row/column scalings
    ``x * target // margin`` (floor == truncate on non-negatives, so
    numpy // and DuckDB // agree).  The OD matrix comes from the
    distributed od_matrix pipeline; the IPF rounds run on the bounded
    |admin|^2 table (driver-held key-cardinality state, the pagerank
    rule).  The SQL twin unrolls rounds as MATERIALIZED window CTEs."""
    import pandas as pd

    od = od_matrix(sf_dir).to_pandas()  # bounded: |admin|^2
    zones = np.unique(
        np.concatenate([od["o_admin"].to_numpy(), od["d_admin"].to_numpy()])
    )
    oi = np.searchsorted(zones, od["o_admin"].to_numpy())
    di = np.searchsorted(zones, od["d_admin"].to_numpy())
    x0 = od["n_trips"].to_numpy().astype(np.int64)
    # target margin per zone = observed INflow
    tgt = np.bincount(di, weights=x0, minlength=len(zones)).astype(np.int64)
    x = x0.copy()
    for _ in range(int(rounds)):
        rs = np.bincount(oi, weights=x, minlength=len(zones)).astype(np.int64)
        x = np.where(rs[oi] > 0, x * tgt[oi] // np.maximum(rs[oi], 1), 0)
        cs = np.bincount(di, weights=x, minlength=len(zones)).astype(np.int64)
        x = np.where(cs[di] > 0, x * tgt[di] // np.maximum(cs[di], 1), 0)
    return rd.from_arrow(
        pa.table(
            {
                "o_admin": pa.array(od["o_admin"], pa.string()),
                "d_admin": pa.array(od["d_admin"], pa.string()),
                "n_trips": pa.array(x0),
                "balanced": pa.array(x),
            }
        )
    ).sort(["o_admin", "d_admin"])


def late_events(sf_dir: str, n_shards: int = 64, ts_lo=None, ts_hi=None) -> rd.Dataset:
    """Watermark / late-data accounting — the streaming-semantics audit:
    event_id is the ARRIVAL order, ts the event time; an event is late
    when its timestamp precedes the running max of earlier-arriving
    events of the same user.  Per user: event count, late count, max
    lateness (µs).  Users co-locate in fixed hash shards; each shard
    runs one lexsort + grouped cummax-shift pass (exact integer
    timestamp arithmetic).  Optional ``[ts_lo, ts_hi)`` audits only a
    time slice, pushed into the scan (sources/events.read_events)."""
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64
    from geoglue_ray.sources.events import read_events

    ds = read_events(
        sf_dir, columns=["user_id", "event_id", "ts"], ts_lo=ts_lo, ts_hi=ts_hi
    )

    def shard(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy()
        return b.append_column(
            "_sh",
            pa.array((int_hash64(u) % np.uint64(n_shards)).astype(np.int64)),
        )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": np.array([], np.int64),
                    "n_events": np.array([], np.int64),
                    "n_late": np.array([], np.int64),
                    "max_late_us": np.array([], np.int64),
                }
            )
        g = g.sort_values(["user_id", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy().astype(np.int64)
        new = np.r_[True, uid[1:] != uid[:-1]]
        seg = np.cumsum(new) - 1
        # running max per user segment: cummax on (ts + seg*BIG) never
        # leaks across segments because BIG exceeds the ts span; the
        # shift cancels when subtracted back
        BIG = np.int64(1) << 42  # ts SPAN (30 days ~ 2.6e12 us) < 2^42
        cm = np.maximum.accumulate(ts + seg * BIG) - seg * BIG
        wm = np.empty_like(cm)
        wm[1:] = cm[:-1]
        late = ~new & (ts < wm)
        lateness = np.where(late, wm - ts, 0)
        n = np.bincount(seg).astype(np.int64)
        nl = np.bincount(seg, weights=late).astype(np.int64)
        ml = np.zeros(len(n), dtype=np.int64)
        np.maximum.at(ml, seg, lateness)
        uids = uid[np.r_[np.flatnonzero(new)]]
        return pd.DataFrame(
            {
                "user_id": uids,
                "n_events": n,
                "n_late": nl,
                "max_late_us": ml,
            }
        )

    out = (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(per_shard, batch_format="pandas")
    )

    def cast_out(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "n_events": pc.cast(b["n_events"], pa.int64()),
                "n_late": pc.cast(b["n_late"], pa.int64()),
                "max_late_us": pc.cast(b["max_late_us"], pa.int64()),
            }
        )

    return out.map_batches(cast_out, batch_format="pyarrow").sort("user_id")


def langid_confusion(sf_dir: str) -> rd.Dataset:
    """Confusion matrix of the n-gram lang-id heuristic against the
    declared lang label — the classifier-eval companion to lang_id
    itself: exact counts per (lang, pred_lang) cell.  One partial
    collapse to the <= |langs|^2 matrix per batch."""
    import pandas as pd

    from geoglue_ray.stages.text import LangId

    ds = read_documents_cols(sf_dir, ["doc_id", "text", "lang"])
    pred = ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))

    def partial(b: pa.Table) -> pa.Table:
        lang = b["lang"].to_numpy(zero_copy_only=False)
        p = b["pred_lang"].to_numpy(zero_copy_only=False)
        key = np.char.add(np.char.add(lang.astype("U8"), "|"), p.astype("U8"))
        u, cnt = np.unique(key, return_counts=True)
        sp = np.char.partition(u, "|")
        return pa.table(
            {
                "lang": pa.array(sp[:, 0], pa.string()),
                "pred_lang": pa.array(sp[:, 2], pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    t = (
        pred.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["lang", "pred_lang"], as_index=False, sort=True)["n"]
        .sum()
    )
    return rd.from_arrow(
        pa.table(
            {
                "lang": pa.array(t["lang"], pa.string()),
                "pred_lang": pa.array(t["pred_lang"], pa.string()),
                "n": pa.array(t["n"].to_numpy().astype(np.int64)),
            }
        )
    )


def audience_segments(sf_dir: str, seg_type: str = "purchase") -> rd.Dataset:
    """Audience set-algebra: each user's weekly PURCHASE-presence bitmask
    over the event month (bit w set iff the user purchased in week w),
    then exact user counts per bitmask — the cohort segmentation operator
    (buyers-in-W1-and-W3-but-not-W2 is one output row; the unfiltered
    mask is degenerate — every user has SOME event every week).
    Per-batch partial ORs collapse to user cardinality; the histogram is
    <= 32 buckets."""
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    epoch = np.datetime64("2024-01-01T00:00:00", "us")

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], seg_type))
        uid = b["user_id"].to_numpy().astype(np.int64)
        d = (
            b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
            - epoch
        ).astype(np.int64) // 86_400_000_000
        w = np.minimum(d // 7, 4)  # days 28-30 fold into bit 4
        codes, uniq = pd.factorize(uid, use_na_sentinel=False)
        mask = np.zeros(len(uniq), dtype=np.int64)
        np.bitwise_or.at(mask, codes, np.int64(1) << w)
        return pa.table(
            {"user_id": pa.array(uniq.astype(np.int64)), "m": pa.array(mask)}
        )

    def shard(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy()
        return b.append_column(
            "_sh", pa.array((int_hash64(u) % np.uint64(64)).astype(np.int64))
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # all partials of a user live in this shard: one OR-reduce pass
        uid = g["user_id"].to_numpy().astype(np.int64)
        m = g["m"].to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(uid, use_na_sentinel=False)
        out = np.zeros(len(uniq), dtype=np.int64)
        np.bitwise_or.at(out, codes, m)
        return pd.DataFrame({"user_id": uniq, "m": out})

    masks = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(shard, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(merge, batch_format="pandas")
    )
    hist = (
        masks.to_pandas().groupby("m", as_index=False, sort=True)["user_id"].count()
    )
    return rd.from_arrow(
        pa.table(
            {
                "segment_mask": pa.array(hist["m"].to_numpy().astype(np.int64)),
                "n_users": pa.array(hist["user_id"].to_numpy().astype(np.int64)),
            }
        )
    )


def item_cosine_top(sf_dir: str, top_n: int = 20, n_shards: int = 64) -> rd.Dataset:
    """Item-item cosine similarity over the order-part incidence (the
    classic co-occurrence recommender): cos(a,b) = n_ab /
    sqrt(n_a * n_b) with n_ab = orders containing both, n_x = orders
    containing x — numerator/denominator all exact ints, ONE division
    against a correctly-rounded sqrt (mirrorable; events_autocorr
    pattern).  Pipeline: basket-sharded vectorized pair counting,
    pair-sharded exact merges, per-part order counts broadcast (part is
    a bounded dimension), per-shard top-k by (cos DESC, a, b) then one
    tiny global cut."""
    import pandas as pd
    import ray

    from geoglue_ray.functions.texthash import int_hash64
    from geoglue_ray.stages.validate import _unique_rows

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def pairs_shard(b: pa.Table) -> pa.Table:
        t = _unique_rows(b, ["l_orderkey", "l_partkey"])
        k = t["l_orderkey"].to_numpy()
        return pa.table(
            {
                "_sh": pa.array(
                    (int_hash64(k) % np.uint64(n_shards)).astype(np.int64)
                ),
                "o": t["l_orderkey"],
                "p": t["l_partkey"],
            }
        )

    def gen(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "_ps": np.array([], np.int64),
                    "packed": np.array([], np.int64),
                    "cnt": np.array([], np.int64),
                }
            )
        o = g["o"].to_numpy().astype(np.int64)
        p = g["p"].to_numpy().astype(np.int64)
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        uniq = np.r_[True, (o[1:] != o[:-1]) | (p[1:] != p[:-1])]
        o, p = o[uniq], p[uniq]
        from geoglue_ray.stages.dedup import _run_pairs

        ia, ib = _run_pairs(o)
        if len(ia) == 0:
            return pd.DataFrame(
                {
                    "_ps": np.array([], np.int64),
                    "packed": np.array([], np.int64),
                    "cnt": np.array([], np.int64),
                }
            )
        a = p[ia]
        b_ = p[ib]
        lo = np.minimum(a, b_)
        hi = np.maximum(a, b_)
        packed = (lo << np.int64(32)) | hi
        pu, cnt = np.unique(packed, return_counts=True)
        return pd.DataFrame(
            {
                "_ps": (int_hash64(pu) % np.uint64(n_shards)).astype(np.int64),
                "packed": pu,
                "cnt": cnt.astype(np.int64),
            }
        )

    # per-part distinct-order counts (GLOBAL distinct — a per-batch
    # dedup alone double-counts pairs straddling batches): the A10
    # count_distinct stage; bounded dimension, broadcast once
    from geoglue_ray.stages.validate import count_distinct

    deg = (
        count_distinct(li, ["l_partkey"], ["l_orderkey"], "c")
        .to_pandas()
        .sort_values("l_partkey", kind="mergesort")
    )
    deg_keys = deg["l_partkey"].to_numpy().astype(np.int64)
    deg_vals = deg["c"].to_numpy().astype(np.int64)
    deg_ref = ray.put((deg_keys, deg_vals))

    def score_topk(g: pd.DataFrame, *, ref=deg_ref) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "part_a": np.array([], np.int64),
                    "part_b": np.array([], np.int64),
                    "n_ab": np.array([], np.int64),
                    "n_a": np.array([], np.int64),
                    "n_b": np.array([], np.int64),
                    "cosine": np.array([], np.float64),
                }
            )
        dk, dv = ray.get(ref) if not isinstance(ref, tuple) else ref
        agg = g.groupby("packed", as_index=False)["cnt"].sum()
        pu = agg["packed"].to_numpy().astype(np.int64)
        cnt = agg["cnt"].to_numpy().astype(np.int64)
        a = (pu >> np.int64(32)).astype(np.int64)
        b_ = (pu & np.int64(0xFFFFFFFF)).astype(np.int64)
        na = dv[np.searchsorted(dk, a)]
        nb = dv[np.searchsorted(dk, b_)]
        cos = cnt.astype(np.float64) / np.sqrt(
            na.astype(np.float64) * nb.astype(np.float64)
        )
        df = pd.DataFrame(
            {
                "part_a": a,
                "part_b": b_,
                "n_ab": cnt,
                "n_a": na,
                "n_b": nb,
                "cosine": cos,
            }
        )
        df = df.sort_values(
            ["cosine", "part_a", "part_b"],
            ascending=[False, True, True],
            kind="mergesort",
        ).iloc[:top_n]
        return df.reset_index(drop=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["cosine", "part_a", "part_b"],
            ascending=[False, True, True],
            kind="mergesort",
        ).iloc[:top_n]
        return df.reset_index(drop=True)

    shards = (
        li.map_batches(pairs_shard, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(gen, batch_format="pandas")
        .groupby("_ps")
        .map_groups(score_topk, batch_format="pandas")
        .to_pandas()
    )  # bounded: n_shards x top_n rows
    out = final(shards)
    return rd.from_arrow(
        pa.table(
            {
                "part_a": pa.array(out["part_a"].to_numpy().astype(np.int64)),
                "part_b": pa.array(out["part_b"].to_numpy().astype(np.int64)),
                "n_ab": pa.array(out["n_ab"].to_numpy().astype(np.int64)),
                "n_a": pa.array(out["n_a"].to_numpy().astype(np.int64)),
                "n_b": pa.array(out["n_b"].to_numpy().astype(np.int64)),
                "cosine": pa.array(out["cosine"].to_numpy()),
            }
        )
    ).sort(["part_a", "part_b"])


def kmeans_silhouette(sf_dir: str, k: int = 4, dim: int = 64) -> rd.Dataset:
    """Simplified (centroid-based) silhouette audit of the Lloyd
    clustering: per cluster, how many members sit strictly closer to
    their own centroid than to ANY other (b > a), tied, or worse —
    entirely integer comparisons on the same 2^-20 quantized distances
    as embed_kmeans (|q|^2 cancels, so scores are |c|^2 - 2 q.c int64).
    One broadcast of the k x dim centroid ints; one streaming pass."""
    import ray

    cent = embed_kmeans(sf_dir).to_pandas()  # k x dim rows, bounded
    cent = cent.sort_values(["cluster_id", "dim"], kind="mergesort")
    C = (
        cent["centroid_q"].to_numpy().astype(np.int64).reshape(int(k), int(dim))
    )
    cref = ray.put(C)
    OFF = 1 << 20
    QS = float(OFF)

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def partial(b: pa.Table, *, ref=cref) -> pa.Table:
        c = ray.get(ref) if not isinstance(ref, np.ndarray) else ref
        la = b["embedding"].combine_chunks()
        q = np.floor(
            np.asarray(la.flatten()).reshape(len(b), -1).astype(np.float64)
            * QS
            + 0.5
        ).astype(np.int64)
        cc = np.einsum("kd,kd->k", c, c)
        score = cc[None, :] - 2 * (q @ c.T)  # (n, k) int64
        own = np.argmin(score, axis=1)  # first min == smallest cluster id
        rows = np.arange(len(own))
        own_s = score[rows, own]
        masked = score.copy()
        masked[rows, own] = np.iinfo(np.int64).max
        other = masked.min(axis=1)
        better = other > own_s
        tied = other == own_s
        n = np.bincount(own, minlength=int(k)).astype(np.int64)
        nb = np.bincount(own, weights=better, minlength=int(k)).astype(np.int64)
        nt = np.bincount(own, weights=tied, minlength=int(k)).astype(np.int64)
        return pa.table(
            {
                "cluster_id": pa.array(np.arange(int(k), dtype=np.int64)),
                "n": pa.array(n),
                "n_better": pa.array(nb),
                "n_tied": pa.array(nt),
            }
        )

    t = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("cluster_id", as_index=False, sort=True)[
            ["n", "n_better", "n_tied"]
        ]
        .sum()
    )
    t = t[t["n"] > 0]  # SQL's GROUP BY only emits non-empty clusters
    return rd.from_arrow(
        pa.table(
            {
                "cluster_id": pa.array(t["cluster_id"].to_numpy().astype(np.int64)),
                "n": pa.array(t["n"].to_numpy().astype(np.int64)),
                "n_better": pa.array(t["n_better"].to_numpy().astype(np.int64)),
                "n_tied": pa.array(t["n_tied"].to_numpy().astype(np.int64)),
            }
        )
    )


def ab_cuped(sf_dir: str) -> rd.Dataset:
    """CUPED variance-reduced A/B readout: users split into arms by
    ``user_id % 2``; pre-period (weeks 0-1) spend is the covariate, post
    (weeks 2+) the metric, both exact int64 cents per user.  theta is the
    pooled OLS slope (N*Sxy - Sx*Sy) / (N*Sxx - Sx*Sx) — ONE division of
    exact integer moments — and each arm's adjusted mean replays the
    identical float chain (Sy - theta*(Sx - n*xbar)) / n on both
    engines."""
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    epoch = np.datetime64("2024-01-01T00:00:00", "us")

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.int64)
        cents = np.round(b["value"].to_numpy() * 100.0).astype(np.int64)
        d = (
            b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
            - epoch
        ).astype(np.int64) // 86_400_000_000
        pre = d // 7 < 2
        codes, uniq = pd.factorize(uid, use_na_sentinel=False)
        x = np.bincount(codes, weights=np.where(pre, cents, 0), minlength=len(uniq)).astype(np.int64)
        y = np.bincount(codes, weights=np.where(pre, 0, cents), minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uniq.astype(np.int64)),
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )

    def shard(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy()
        return b.append_column(
            "_sh", pa.array((int_hash64(u) % np.uint64(64)).astype(np.int64))
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(uid, use_na_sentinel=False)
        x = np.bincount(codes, weights=g["x"].to_numpy(), minlength=len(uniq)).astype(np.int64)
        y = np.bincount(codes, weights=g["y"].to_numpy(), minlength=len(uniq)).astype(np.int64)
        return pd.DataFrame({"user_id": uniq, "x": x, "y": y})

    per_user = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(shard, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )  # bounded: user cardinality (the per-user A/B frame)
    uid = per_user["user_id"].to_numpy().astype(np.int64)
    x = per_user["x"].to_numpy().astype(np.int64)
    y = per_user["y"].to_numpy().astype(np.int64)
    N = len(uid)
    Sx, Sy = int(x.sum()), int(y.sum())
    Sxy = int((x * y).sum())
    Sxx = int((x * x).sum())
    theta = np.float64(N * Sxy - Sx * Sy) / np.float64(N * Sxx - Sx * Sx)
    xbar = np.float64(Sx) / np.float64(N)
    rows = []
    for arm in (0, 1):
        sel = uid % 2 == arm
        n_a = int(sel.sum())
        sx_a, sy_a = int(x[sel].sum()), int(y[sel].sum())
        mean_post = np.float64(sy_a) / np.float64(n_a)
        mean_adj = (
            np.float64(sy_a) - theta * (np.float64(sx_a) - np.float64(n_a) * xbar)
        ) / np.float64(n_a)
        rows.append((arm, n_a, sx_a, sy_a, float(mean_post), float(mean_adj)))
    return rd.from_arrow(
        pa.table(
            {
                "arm": pa.array([r[0] for r in rows], pa.int64()),
                "n_users": pa.array([r[1] for r in rows], pa.int64()),
                "sum_pre": pa.array([r[2] for r in rows], pa.int64()),
                "sum_post": pa.array([r[3] for r in rows], pa.int64()),
                "mean_post": pa.array([r[4] for r in rows], pa.float64()),
                "mean_adj": pa.array([r[5] for r in rows], pa.float64()),
                "theta": pa.array([float(theta)] * 2, pa.float64()),
            }
        )
    )


def text_readability(sf_dir: str) -> rd.Dataset:
    """Flesch-style readability per document — the log-free linear
    readability screen a corpus-quality pipeline runs next to
    text_quality: sentences = runs of [.!?] (floored at 1), words =
    ``\\S+`` runs, syllables approximated by vowel-group runs, and
    ``flesch = 206.835 - 1.015*(W/S) - 84.6*(Y/W)`` — two single
    divisions and exact IEEE multiply/subtract, so the SQL twin spelling
    the identical chain matches bit-for-bit (both regex engines are
    RE2: pc.count_substring_regex == len(regexp_extract_all)).  Docs
    with zero words emit NULL.  Vectorized Arrow kernels per batch; no
    shuffle (reference parity: the quality-scoring grammar around
    zonalstats.py ops, extended corpus-ward)."""
    ds = read_documents_cols(sf_dir, ["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        txt = b["text"]
        n_end = pc.count_substring_regex(txt, "[.!?]+").to_numpy().astype(np.int64)
        n_w = pc.count_substring_regex(txt, r"\S+").to_numpy().astype(np.int64)
        n_y = (
            pc.count_substring_regex(txt, "[aeiouyAEIOUY]+")
            .to_numpy()
            .astype(np.int64)
        )
        n_sent = np.maximum(n_end, np.int64(1))
        w = n_w.astype(np.float64)
        s = n_sent.astype(np.float64)
        y = n_y.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            f = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        f = np.where(n_w > 0, f, np.nan)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_sent": pa.array(n_sent),
                "n_words": pa.array(n_w),
                "n_syll": pa.array(n_y),
                "flesch": pa.array(f, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


def ks_drift(sf_dir: str) -> rd.Dataset:
    """Exact two-sample Kolmogorov-Smirnov drift gate over the event
    value distribution — the order-statistic companion of corpus_drift's
    total-variation histogram: sample A = even user_ids, B = odd, D =
    max over the merged support of |F_A - F_B|.  Distribution: per-batch
    (cents, side) count partials -> fixed-shard merge -> the driver
    holds only the DISTINCT-CENTS histogram (value-range bounded, the
    pagerank rule) and computes the cumulative chain there.  Every
    arithmetic step (single divisions of exact int64 counts, IEEE
    subtract/abs/max, one correctly-rounded sqrt) is mirrored verbatim
    by the SQL window twin, so the result is bit-exact."""
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.round(b["value"].to_numpy() * 100.0).astype(np.int64)
        side = (b["user_id"].to_numpy().astype(np.int64) % 2).astype(np.int64)
        codes, uniq = pd.factorize(cents, use_na_sentinel=False)
        a = np.bincount(codes, weights=(side == 0), minlength=len(uniq)).astype(np.int64)
        bb = np.bincount(codes, weights=(side == 1), minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {"c": pa.array(uniq.astype(np.int64)), "a": pa.array(a), "b": pa.array(bb)}
        )

    def shard(b: pa.Table) -> pa.Table:
        c = b["c"].to_numpy()
        return b.append_column(
            "_sh", pa.array((int_hash64(c) % np.uint64(64)).astype(np.int64))
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        codes, uniq = pd.factorize(g["c"].to_numpy(), use_na_sentinel=False)
        a = np.bincount(codes, weights=g["a"].to_numpy(), minlength=len(uniq)).astype(np.int64)
        bb = np.bincount(codes, weights=g["b"].to_numpy(), minlength=len(uniq)).astype(np.int64)
        return pd.DataFrame({"c": uniq.astype(np.int64), "a": a, "b": bb})

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(shard, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )  # bounded: distinct cents (value-range cardinality)
    h = h.sort_values("c", kind="mergesort")
    c = h["c"].to_numpy()
    ca = np.cumsum(h["a"].to_numpy())
    cb = np.cumsum(h["b"].to_numpy())
    na, nb = int(ca[-1]), int(cb[-1])
    dd = np.abs(
        ca.astype(np.float64) / np.float64(na) - cb.astype(np.float64) / np.float64(nb)
    )
    d_stat = float(dd.max())
    at_cents = int(c[dd == dd.max()].min())
    ks = d_stat * np.sqrt(np.float64(na) * np.float64(nb) / np.float64(na + nb))
    return rd.from_arrow(
        pa.table(
            {
                "na": pa.array([na], pa.int64()),
                "nb": pa.array([nb], pa.int64()),
                "d_stat": pa.array([d_stat], pa.float64()),
                "at_cents": pa.array([at_cents], pa.int64()),
                "ks_stat": pa.array([float(ks)], pa.float64()),
            }
        )
    )


def mad_admin1(sf_dir: str) -> rd.Dataset:
    """Robust per-admin-1 outlier screen via median/MAD — the
    order-statistic companion of outliers_admin1's two-sigma moment
    screen: med = median(value), mad = median(|value - med|), outlier
    iff |value - med| > 3*MAD.  All order statistics run on QUADRUPLED
    integers (med2 = doubled median and mad4 = 8*MAD are exact int64s;
    the outlier test is the all-integer 2*dev4 > 3*mad4), so the two
    reported ratios are single exact divisions by powers of two.
    Distribution: per-batch (admin1, value) histogram partials packed
    into one int64 key -> groupby(admin1).map_groups with a vectorized
    cumsum order-stat pass per group (admin-1 cardinality groups, each
    value-range bounded) — raw rows never shuffle."""
    import pandas as pd

    ds = corpus_with_admin(sf_dir).select_columns(["admin1_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        adm_codes, adm_uniq = pd.factorize(
            b["admin1_id"].to_pandas(), use_na_sentinel=False
        )
        v = b["value"].to_numpy().astype(np.int64)
        key = adm_codes.astype(np.int64) * np.int64(1 << 32) + v
        kcodes, kuniq = pd.factorize(key, use_na_sentinel=False)
        cnt = np.bincount(kcodes, minlength=len(kuniq)).astype(np.int64)
        return pa.table(
            {
                "admin1_id": pa.array(adm_uniq.take(kuniq >> np.int64(32))),
                "v": pa.array(kuniq & np.int64(0xFFFFFFFF)),
                "cnt": pa.array(cnt),
            }
        )

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        adm = g["admin1_id"].iloc[0]
        codes, uniq = pd.factorize(g["v"].to_numpy(), use_na_sentinel=False)
        cnt = np.bincount(codes, weights=g["cnt"].to_numpy(), minlength=len(uniq)).astype(
            np.int64
        )
        o = np.argsort(uniq, kind="stable")
        v, cnt = uniq[o].astype(np.int64), cnt[o]
        n = int(cnt.sum())
        cum = np.cumsum(cnt)
        k1, k2 = (n + 1) // 2, (n + 2) // 2
        med2 = int(v[np.searchsorted(cum, k1)]) + int(v[np.searchsorted(cum, k2)])
        dev4 = np.abs(4 * v - 2 * med2)
        od = np.argsort(dev4, kind="stable")
        d_s, c_s = dev4[od], cnt[od]
        cum2 = np.cumsum(c_s)
        mad4 = int(d_s[np.searchsorted(cum2, k1)]) + int(d_s[np.searchsorted(cum2, k2)])
        n_out = int(cnt[2 * dev4 > 3 * mad4].sum())
        return pd.DataFrame(
            {
                "admin1_id": [adm],
                "n_obs": np.array([n], dtype=np.int64),
                "med_val": np.array([np.float64(med2) / 2.0]),
                "mad_val": np.array([np.float64(mad4) / 8.0]),
                "n_outliers": np.array([n_out], dtype=np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("admin1_id")
        .map_groups(stats, batch_format="pandas")
        .sort("admin1_id")
    )


def user_survival(
    sf_dir: str,
    gap_minutes: int = 30,
    tmax: int = 30,
    censor_us: int = 7_200_000_000,
    n_shards: int = 64,
) -> rd.Dataset:
    """Kaplan-Meier survival curve of SESSION durations (minutes) — how
    long does an engagement session last before it ends:  sessions from
    the events_sessionize break rule (gap > 30 min), duration floored to
    whole minutes on raw int64 microseconds (never date_diff — boundary
    crossings, CLAUDE.md), administratively censored at ``tmax`` AND
    end-of-data censored (sessions ending in the final 2 h of the
    horizon are still running -> censored at their observed duration, so
    the at-risk set genuinely shrinks without deaths).  Distribution:
    one tiny max-ts pass for the horizon, then the fixed-shard
    sessionize co-shuffle emitting per-shard (t, n, d) count partials
    (<= tmax+1 rows each); the driver holds only the 31-row life table
    and replays the ordered product  S_t = S_{t-1} * (n_t - d_t)/n_t  —
    one division + one multiply per step, mirrored verbatim by the
    recursive-CTE twin."""
    import pandas as pd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def maxpart(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64())})
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table({"h": pa.array([int(us.max())], pa.int64())})

    horizon = int(
        ds.map_batches(maxpart, batch_format="pyarrow").to_pandas()["h"].max()
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {"_us": pa.array(shard), "user_id": b["user_id"], "t_us": pa.array(us)}
        )

    gap_us = np.int64(gap_minutes * 60_000_000)

    def life_partial(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "t": np.array([], dtype=np.int64),
                    "m": np.array([], dtype=np.int64),
                    "d": np.array([], dtype=np.int64),
                }
            )
        uid = g["user_id"].to_numpy()
        ts = g["t_us"].to_numpy().astype(np.int64)
        o = np.lexsort((ts, uid))
        uid, ts = uid[o], ts[o]
        brk = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            brk[1:] = (uid[1:] != uid[:-1]) | (np.diff(ts) > gap_us)
        starts = np.nonzero(brk)[0]
        ends = np.concatenate([starts[1:], [len(uid)]])
        a = ts[starts]
        b_ = ts[ends - 1]
        dur = (b_ - a) // np.int64(60_000_000)
        ev = (dur <= tmax - 1) & (b_ <= horizon - censor_us)
        t_obs = np.minimum(dur, np.int64(tmax))
        m = np.bincount(t_obs, minlength=tmax + 1).astype(np.int64)
        d = np.bincount(t_obs[ev], minlength=tmax + 1).astype(np.int64)
        t_axis = np.arange(len(m), dtype=np.int64)
        return pd.DataFrame({"t": t_axis, "m": m, "d": d})

    lt = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_us")
        .map_groups(life_partial, batch_format="pandas")
        .to_pandas()
    )  # bounded: <= (tmax+1) * n_shards count rows
    lt = lt.groupby("t", as_index=False, dropna=False).sum()
    t_all = lt["t"].to_numpy().astype(np.int64)
    m_all = lt["m"].to_numpy().astype(np.int64)
    d_all = lt["d"].to_numpy().astype(np.int64)
    rows_t, rows_n, rows_d, rows_s = [], [], [], []
    s = np.float64(1.0)
    for t in range(tmax):
        n_t = int(m_all[t_all >= t].sum())
        d_t = int(d_all[t_all == t].sum())
        if n_t > 0:
            step = np.float64(n_t - d_t) / np.float64(n_t)
            s = step if t == 0 else s * step
        rows_t.append(t)
        rows_n.append(n_t)
        rows_d.append(d_t)
        rows_s.append(float(s))
    return rd.from_arrow(
        pa.table(
            {
                "t": pa.array(rows_t, pa.int64()),
                "n_risk": pa.array(rows_n, pa.int64()),
                "deaths": pa.array(rows_d, pa.int64()),
                "survival": pa.array(rows_s, pa.float64()),
            }
        )
    )


def events_jacquez(sf_dir: str) -> rd.Dataset:
    """Jacquez k-NN space-time interaction test — the nearest-neighbour
    companion of events_knox/events_mantel: J = # ordered pairs (i, j)
    where j is BOTH among i's k=5 nearest in space (within 1/16 deg,
    (d2, id) order — stages/spatial.radius_knn_join) and among its k=5
    nearest in time (within 2 h, (|dt|, id) order —
    stages/spatial.time_knn_join, the 1-D bucket co-shuffle analog).
    The analysis time is a planted LOCAL-SOLAR-TIME schedule —
    observation hour = floor((lon-100)*16) with a kmv_hash64 jitter
    inside the hour — because the raw ts axis is linear in event_id
    while the position map is a linear Lehmer lattice, which makes the
    true ts-based J structurally ZERO at every SF (the CSR degenerate-
    envelope lesson; kmv is the nonlinear fix with an exact HUGEINT
    twin).  Spatially close points share a solar hour, so the test must
    detect J >> expected.  The two bounded pair sets (<= k*n rows each)
    meet in a tagged-union co-shuffle on the packed (i << 32 | j) key
    (ids < 2^32 — the fixture invariant other packed keys rely on);
    each shard emits one (ns, nt, j) count partial via a sorted
    intersection.  Expected J under independence = ns*nt/(n*(n-1)) and
    the Jacquez ratio are the only float steps — single IEEE ops
    mirrored by the SQL twin."""
    import pandas as pd

    from geoglue_ray.functions.texthash import kmv_hash64
    from geoglue_ray.stages.spatial import radius_knn_join, time_knn_join

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    n_points = ds.count()

    def derive_sp(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        return pa.table(
            {"event_id": b["event_id"], "lon": pa.array(lon), "lat": pa.array(lat)}
        )

    HOUR_US = np.int64(3_600_000_000)

    def derive_tm(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        lon, _ = fx.derive_lonlat(ids)
        hour = np.floor((lon - 100.0) * 16.0).astype(np.int64)
        jit = (kmv_hash64(ids) % np.uint64(3_600_000_000)).astype(np.int64)
        t = hour * HOUR_US + jit
        return pa.table({"event_id": b["event_id"], "ts_us": pa.array(t)})

    sp = radius_knn_join(
        ds.map_batches(derive_sp, batch_format="pyarrow"),
        radius=0.0625,
        k=5,
        id_col="event_id",
    )
    tm = time_knn_join(
        ds.map_batches(derive_tm, batch_format="pyarrow"),
        tau_us=2 * 3_600_000_000,
        k=5,
        id_col="event_id",
        # time-DENSE axis (~160 h of data, tau = 2 h): sub-tau buckets
        # shrink the quadratic per-bucket blocks and rebalance shards
        # (measured sf0.1: 40.5 s -> 9.4 s, results identical)
        bucket_us=2 * 3_600_000_000 // 8,
    )

    def tag(which: int, nb_col: str):
        def f(b: pa.Table) -> pa.Table:
            i = b["event_id"].to_numpy().astype(np.int64)
            j = b[nb_col].to_numpy().astype(np.int64)
            key = (i << np.int64(32)) | j
            sh = (
                (key.astype(np.uint64) * np.uint64(0x9E3779B185EBCA87))
                % np.uint64(64)
            ).astype(np.int64)
            return pa.table(
                {
                    "_k": pa.array(key),
                    "_t": pa.array(np.full(len(key), which, dtype=np.int64)),
                    "_sh": pa.array(sh),
                }
            )

        return f

    both = sp.map_batches(tag(0, "nn_id"), batch_format="pyarrow").union(
        tm.map_batches(tag(1, "t_nn_id"), batch_format="pyarrow")
    )

    def inter(g: pd.DataFrame) -> pd.DataFrame:
        key = g["_k"].to_numpy().astype(np.int64)
        t = g["_t"].to_numpy().astype(np.int64)
        a = key[t == 0]
        b_ = key[t == 1]
        j = int(np.intersect1d(a, b_, assume_unique=True).size)
        return pd.DataFrame(
            {
                "ns": np.array([len(a)], dtype=np.int64),
                "nt": np.array([len(b_)], dtype=np.int64),
                "j": np.array([j], dtype=np.int64),
            }
        )

    parts = both.groupby("_sh").map_groups(inter, batch_format="pandas").to_pandas()
    ns = int(parts["ns"].sum())
    nt = int(parts["nt"].sum())
    j = int(parts["j"].sum())
    expected = (
        np.float64(ns) * np.float64(nt) / np.float64(n_points * (n_points - 1))
    )
    ratio = np.float64(j) / expected
    return rd.from_arrow(
        pa.table(
            {
                "n_points": pa.array([n_points], pa.int64()),
                "n_space_pairs": pa.array([ns], pa.int64()),
                "n_time_pairs": pa.array([nt], pa.int64()),
                "j_stat": pa.array([j], pa.int64()),
                "expected": pa.array([float(expected)], pa.float64()),
                "jacquez_ratio": pa.array([float(ratio)], pa.float64()),
            }
        )
    )


def welch_ab(sf_dir: str) -> rd.Dataset:
    """Welch unequal-variance t readout for the user_id%2 A/B split —
    the significance companion of ab_cuped: per-user total spend (exact
    int64 cents via the fixed-shard user merge), per-arm moments (n, S,
    SS) reduced INSIDE the merge shards (2 rows per shard — the driver
    never holds the user frame), then the classic chain  v = (SS -
    S*S/n)/(n-1),  t = (m0-m1)/sqrt(v0/n0 + v1/n1)  and the
    Welch-Satterthwaite df — every step a single IEEE op mirrored
    verbatim by the SQL twin (sqrt is correctly rounded both sides;
    only transcendentals diverge)."""
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.int64)
        cents = np.round(b["value"].to_numpy() * 100.0).astype(np.int64)
        codes, uniq = pd.factorize(uid, use_na_sentinel=False)
        y = np.bincount(codes, weights=cents, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {"user_id": pa.array(uniq.astype(np.int64)), "y": pa.array(y)}
        )

    def shard(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy()
        return b.append_column(
            "_sh", pa.array((int_hash64(u) % np.uint64(64)).astype(np.int64))
        )

    def merge_arms(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(uid, use_na_sentinel=False)
        y = np.bincount(codes, weights=g["y"].to_numpy(), minlength=len(uniq)).astype(
            np.int64
        )
        arm = (uniq % 2).astype(np.int64)
        rows = []
        for a in (0, 1):
            sel = arm == a
            rows.append(
                (a, int(sel.sum()), int(y[sel].sum()), int((y[sel] * y[sel]).sum()))
            )
        return pd.DataFrame(
            {
                "arm": np.array([r[0] for r in rows], dtype=np.int64),
                "n": np.array([r[1] for r in rows], dtype=np.int64),
                "s": np.array([r[2] for r in rows], dtype=np.int64),
                "ss": np.array([r[3] for r in rows], dtype=np.int64),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(shard, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(merge_arms, batch_format="pandas")
        .to_pandas()
    )  # bounded: 2 rows per shard
    agg = parts.groupby("arm", as_index=False).sum()
    mo = {}
    for _, r in agg.iterrows():
        a = int(r["arm"])
        n, s, ss = int(r["n"]), int(r["s"]), int(r["ss"])
        m = np.float64(s) / np.float64(n)
        v = (
            np.float64(ss) - np.float64(s) * np.float64(s) / np.float64(n)
        ) / np.float64(n - 1)
        mo[a] = (n, s, m, v)
    n0, _, m0, v0 = mo[0]
    n1, _, m1, v1 = mo[1]
    se2_0 = v0 / np.float64(n0)
    se2_1 = v1 / np.float64(n1)
    t = (m0 - m1) / np.sqrt(se2_0 + se2_1)
    df = (se2_0 + se2_1) * (se2_0 + se2_1) / (
        se2_0 * se2_0 / np.float64(n0 - 1) + se2_1 * se2_1 / np.float64(n1 - 1)
    )
    return rd.from_arrow(
        pa.table(
            {
                "n0": pa.array([n0], pa.int64()),
                "n1": pa.array([n1], pa.int64()),
                "mean0": pa.array([float(m0)], pa.float64()),
                "mean1": pa.array([float(m1)], pa.float64()),
                "t_stat": pa.array([float(t)], pa.float64()),
                "df": pa.array([float(df)], pa.float64()),
            }
        )
    )


def hoover_admin1(sf_dir: str) -> rd.Dataset:
    """Hoover (Robin Hood) concentration index per admin-1 — the share
    of total value that would have to move between observations to
    equalize them: H = sum|x_i - mean| / (2 * sum x), the log-free
    inequality measure next to gini_admin1.  Cleared denominators keep
    it exact: num = sum cnt_v * |n*v - S| over the per-admin DISTINCT-
    VALUE histogram (the mad_admin1 partial shape — raw rows never
    shuffle), then ONE float chain num / (2.0 * n * S) mirrored by the
    twin."""
    import pandas as pd

    ds = corpus_with_admin(sf_dir).select_columns(["admin1_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        adm_codes, adm_uniq = pd.factorize(
            b["admin1_id"].to_pandas(), use_na_sentinel=False
        )
        v = b["value"].to_numpy().astype(np.int64)
        key = adm_codes.astype(np.int64) * np.int64(1 << 32) + v
        kcodes, kuniq = pd.factorize(key, use_na_sentinel=False)
        cnt = np.bincount(kcodes, minlength=len(kuniq)).astype(np.int64)
        return pa.table(
            {
                "admin1_id": pa.array(adm_uniq.take(kuniq >> np.int64(32))),
                "v": pa.array(kuniq & np.int64(0xFFFFFFFF)),
                "cnt": pa.array(cnt),
            }
        )

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        adm = g["admin1_id"].iloc[0]
        codes, uniq = pd.factorize(g["v"].to_numpy(), use_na_sentinel=False)
        cnt = np.bincount(codes, weights=g["cnt"].to_numpy(), minlength=len(uniq)).astype(
            np.int64
        )
        v = uniq.astype(np.int64)
        n = int(cnt.sum())
        s = int((v * cnt).sum())
        num = int((cnt * np.abs(n * v - s)).sum())
        h = np.float64(num) / (2.0 * np.float64(n) * np.float64(s))
        return pd.DataFrame(
            {
                "admin1_id": [adm],
                "n_obs": np.array([n], dtype=np.int64),
                "sum_val": np.array([s], dtype=np.int64),
                "hoover": np.array([float(h)]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("admin1_id")
        .map_groups(stats, batch_format="pandas")
        .sort("admin1_id")
    )


def scd2_user_segments(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """SCD-type-2 dimension build from the event stream — collapse each
    user's history into validity intervals of constant event_type
    (ordered by (ts, event_id)): one row per run with valid_from /
    valid_to in raw int64 microseconds (valid_to = next run's start,
    -1 for the open run — never a nullable timestamp, which would hit
    the NaT-compare hole in distributed equality checks).  The
    events_sessionize fixed-shard co-shuffle: hash(user)%64 shards,
    one lexsort + run-detection pass per shard covering ALL its users;
    run counts are exact ints."""
    import pandas as pd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "_us": pa.array(shard),
                "user_id": b["user_id"],
                "t_us": pa.array(us),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
            }
        )

    def segs(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy().astype(np.int64)
        ts = g["t_us"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        et = g["event_type"].to_numpy()
        o = np.lexsort((eid, ts, uid))
        uid, ts, et = uid[o], ts[o], et[o]
        n = len(uid)
        if n == 0:
            return pd.DataFrame(
                {
                    "user_id": np.array([], dtype=np.int64),
                    "event_type": pd.array([], dtype="string"),
                    "valid_from_us": np.array([], dtype=np.int64),
                    "valid_to_us": np.array([], dtype=np.int64),
                    "n_events": np.array([], dtype=np.int64),
                }
            )
        tc = pd.factorize(et, use_na_sentinel=False)[0]
        brk = np.ones(n, dtype=bool)
        brk[1:] = (uid[1:] != uid[:-1]) | (tc[1:] != tc[:-1])
        starts = np.nonzero(brk)[0]
        ends = np.concatenate([starts[1:], [n]])
        vf = ts[starts]
        run_uid = uid[starts]
        nxt = np.full(len(starts), -1, dtype=np.int64)
        if len(starts) > 1:
            same = run_uid[1:] == run_uid[:-1]
            tmp = nxt[:-1]
            tmp[same] = vf[1:][same]
            nxt[:-1] = tmp
        return pd.DataFrame(
            {
                "user_id": run_uid,
                "event_type": et[starts],
                "valid_from_us": vf,
                "valid_to_us": nxt,
                "n_events": (ends - starts).astype(np.int64),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_us")
        .map_groups(segs, batch_format="pandas")
    )
    return out.sort(["user_id", "valid_from_us"])


def raster_fill_sinks(
    sf_dir: str, rounds: int = 28, n_hours: int = 6
) -> rd.Dataset:
    """Depression (sink) filling over the raster — the Planchon-Darboux
    hydrology operator next to raster_flowdir/raster_flow_acc: start
    every interior cell at a high sentinel and iterate  W' = max(z,
    min(4-neighbour W))  with boundary/hole-adjacent cells pinned at the
    DEM (Dirichlet drains); after ``rounds`` sweeps W is the filled
    surface and  raised = W - z  the fill depth.  The DEM is a
    kmv_hash64 noise field over (hour, cell) — the t2m measure is a
    LINEAR plane (7r+13c never wraps 997), which has no sinks at all
    (the CSR degenerate-envelope lesson: fixture maps are linear mod
    the lattice; kmv is the nonlinear fix with an exact HUGEINT twin).
    Measured convergence <= 25 rounds per hour grid; 28 unrolled.
    All-integer and floor-free, so the unrolled window-stencil twin
    (the raster_jacobi construction) is bit-exact.  Each hour's grid is
    an independent group; at planet scale the rounds become
    halo-exchange sweeps (stages/stencil.py)."""
    import pandas as pd

    from geoglue_ray.functions.texthash import kmv_hash64
    from geoglue_ray.sources.raster import RXSIZE, RYSIZE, read_raster

    T0R = np.datetime64(fx.T0, "us")
    BIG = np.int64(1) << np.int64(40)

    ra = read_raster(n_days=1)

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["variable"], "t2m"))
        v = b["value"].to_numpy(zero_copy_only=False)
        fin = np.isfinite(v)
        h = (
            (b["valid_time"].to_numpy() - T0R)
            .astype("timedelta64[h]")
            .astype(np.int64)[fin]
        )
        keep = h < n_hours
        h = h[keep]
        r = b["cell_row"].to_numpy().astype(np.int64)[fin][keep]
        c = b["cell_col"].to_numpy().astype(np.int64)[fin][keep]
        z = (kmv_hash64(h * 4096 + r * RXSIZE + c) % np.uint64(1024)).astype(np.int64)
        return pa.table(
            {
                "h": pa.array(h),
                "r": pa.array(r),
                "c": pa.array(c),
                "z": pa.array(z),
            }
        )

    def fill(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "valid_time": pa.array([], pa.timestamp("us")),
                "cell_row": pa.array([], pa.int64()),
                "cell_col": pa.array([], pa.int64()),
                "dem": pa.array([], pa.int64()),
                "filled": pa.array([], pa.int64()),
                "raised": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        hh = int(g["h"].iloc[0])
        r = g["r"].to_numpy().astype(np.int64)
        c = g["c"].to_numpy().astype(np.int64)
        z = g["z"].to_numpy().astype(np.int64)
        M = np.zeros((RYSIZE + 2, RXSIZE + 2), dtype=bool)
        M[r + 1, c + 1] = True
        interior = M[r, c + 1] & M[r + 2, c + 1] & M[r + 1, c] & M[r + 1, c + 2]
        w = np.where(interior, BIG, z)
        W = np.full((RYSIZE + 2, RXSIZE + 2), BIG, dtype=np.int64)
        W[r + 1, c + 1] = w
        for _ in range(rounds):
            mn = np.minimum(
                np.minimum(W[r, c + 1], W[r + 2, c + 1]),
                np.minimum(W[r + 1, c], W[r + 1, c + 2]),
            )
            w = np.where(interior, np.maximum(z, mn), w)
            W[r + 1, c + 1] = w
        return pa.table(
            {
                "valid_time": pa.array(
                    np.full(len(r), T0R + np.timedelta64(hh, "h")).astype(
                        "datetime64[us]"
                    ),
                    type=pa.timestamp("us"),
                ),
                "cell_row": pa.array(r),
                "cell_col": pa.array(c),
                "dem": pa.array(z),
                "filled": pa.array(w),
                "raised": pa.array(w - z),
            }
        )

    return (
        ra.map_batches(prep, batch_format="pyarrow")
        .groupby("h")
        .map_groups(fill, batch_format="pandas")
        .sort(["valid_time", "cell_row", "cell_col"])
    )


def cdc_snapshot(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Change-data-capture snapshot: collapse the event log to the
    latest state per user (last-write-wins by (ts, event_id) — the
    upsert-log -> table materialization every CDC sink runs).  The
    fixed-shard user co-shuffle; each shard resolves ALL its users in
    one lexsort + run-end pass; totals are exact int64 cents."""
    import pandas as pd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "event_type", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        shard = ((uid * np.uint64(0x9E3779B185EBCA87)) % np.uint64(n_shards)).astype(
            np.int64
        )
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        cents = np.round(b["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table(
            {
                "_us": pa.array(shard),
                "user_id": b["user_id"],
                "t_us": pa.array(us),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "cents": pa.array(cents),
            }
        )

    def snap(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": np.array([], dtype=np.int64),
                    "last_type": pd.array([], dtype="string"),
                    "last_ts_us": np.array([], dtype=np.int64),
                    "last_event_id": np.array([], dtype=np.int64),
                    "total_cents": np.array([], dtype=np.int64),
                    "n_events": np.array([], dtype=np.int64),
                }
            )
        uid = g["user_id"].to_numpy().astype(np.int64)
        ts = g["t_us"].to_numpy().astype(np.int64)
        eid = g["event_id"].to_numpy().astype(np.int64)
        et = g["event_type"].to_numpy()
        cents = g["cents"].to_numpy().astype(np.int64)
        o = np.lexsort((eid, ts, uid))
        uid, ts, eid, et, cents = uid[o], ts[o], eid[o], et[o], cents[o]
        n = len(uid)
        last = np.nonzero(np.r_[uid[1:] != uid[:-1], True])[0]
        starts = np.r_[0, last[:-1] + 1]
        return pd.DataFrame(
            {
                "user_id": uid[last],
                "last_type": et[last],
                "last_ts_us": ts[last],
                "last_event_id": eid[last],
                "total_cents": np.add.reduceat(cents, starts).astype(np.int64),
                "n_events": (last - starts + 1).astype(np.int64),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_us")
        .map_groups(snap, batch_format="pandas")
        .sort("user_id")
    )


def doc_rarity(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Lexical-rarity quality signal per document — the log-free
    perplexity proxy: rank every vocabulary token by global frequency
    (count DESC, token — a strict total order), then score each doc by
    the MEDIAN rank of its tokens (doubled to stay integer) plus its
    max rank.  Two passes, the tfidf_top_token shape: exact token
    counts (Arrow split/flatten partials -> fixed-shard merge -> the
    driver holds only the VOCAB-cardinality rank table) broadcast via
    ray.put, then one vectorized searchsorted + segment-order-stat pass
    per batch.  Docs with zero tokens emit no row (inner semantics,
    matching the SQL explode)."""
    import ray
    import pandas as pd

    from geoglue_ray.functions.texthash import token_hash64

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])

    def cpart(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(b["text"], " "))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {
                "token": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    def cshard(b: pa.Table) -> pa.Table:
        # deterministic token hash — a per-process hash() would split one
        # token's partials across shards and duplicate vocab rows
        h = token_hash64(b["token"].to_pylist())
        return b.append_column("_sh", pa.array((h % np.uint64(n_shards)).astype(np.int64)))

    def cmerge(g: pd.DataFrame) -> pd.DataFrame:
        codes, uniq = pd.factorize(g["token"].to_numpy(), use_na_sentinel=False)
        n = np.bincount(codes, weights=g["n"].to_numpy(), minlength=len(uniq)).astype(
            np.int64
        )
        return pd.DataFrame({"token": uniq, "n": n})

    vocab = (
        ds.map_batches(cpart, batch_format="pyarrow")
        .map_batches(cshard, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(cmerge, batch_format="pandas")
        .to_pandas()
    )  # bounded: vocabulary cardinality
    vocab = vocab.sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
    vocab["rnk"] = np.arange(1, len(vocab) + 1, dtype=np.int64)
    vocab = vocab.sort_values("token", kind="mergesort")
    ref = ray.put((vocab["token"].to_numpy(), vocab["rnk"].to_numpy()))

    def score(b: pa.Table) -> pa.Table:
        toks_sorted, rnks = ray.get(ref)
        la = pc.split_pattern(b["text"], " ")
        lens = pc.list_value_length(la).to_numpy().astype(np.int64)
        flat = pc.list_flatten(la)
        docidx = np.repeat(np.arange(len(b), dtype=np.int64), lens)
        flat_np = np.asarray(flat.to_pylist(), dtype=object)
        keep = flat_np != ""
        flat_np, docidx = flat_np[keep], docidx[keep]
        r = rnks[np.searchsorted(toks_sorted, flat_np)]
        o = np.lexsort((r, docidx))
        docidx, r = docidx[o], r[o]
        starts = np.flatnonzero(np.r_[True, docidx[1:] != docidx[:-1]])
        cnt = np.diff(np.r_[starts, len(docidx)])
        k1 = (cnt + 1) // 2
        k2 = (cnt + 2) // 2
        med2 = r[starts + k1 - 1] + r[starts + k2 - 1]
        mx = np.maximum.reduceat(r, starts)
        ids = b["doc_id"].to_numpy()[docidx[starts]]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(cnt),
                "med2_rank": pa.array(med2),
                "rarity": pa.array(med2.astype(np.float64) / 2.0),
                "max_rank": pa.array(mx),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


def events_2sfca(sf_dir: str, radius: float = 2.0) -> rd.Dataset:
    """Two-step floating-catchment-area accessibility (2SFCA — the
    standard healthcare-access measure): 16 fixed facility sites on a
    dyadic 4x4 anchor grid, capacity 2^30 each.  Step 1: each facility's
    supply ratio = (capacity << 0) // demand, demand = # events within
    ``radius`` deg (box-free exact d2 <= r2 — dyadic coords, integer
    counts, floor division).  Step 2: each event's accessibility = SUM
    of the in-range facilities' integer ratios — int64-exact, so
    order-independent.  Facilities are a broadcast-scale constant (the
    small side never shuffles); demand counts reduce via per-batch
    16-long partials; step 2 is one vectorized distance pass per
    batch."""
    import pandas as pd

    CAP = np.int64(1) << np.int64(30)
    k = np.arange(16, dtype=np.int64)
    f_lon = 102.5 + (k % 4).astype(np.float64) * 2.0
    f_lat = 9.0 + (k // 4).astype(np.float64) * 3.5
    r2 = radius * radius

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def demand_part(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        dx = lon[:, None] - f_lon[None, :]
        dy = lat[:, None] - f_lat[None, :]
        inr = (dx * dx + dy * dy) <= r2
        return pa.table(
            {
                "fac": pa.array(k),
                "demand": pa.array(inr.sum(axis=0).astype(np.int64)),
            }
        )

    dem = (
        ds.map_batches(demand_part, batch_format="pyarrow")
        .to_pandas()
        .groupby("fac", as_index=False)["demand"]
        .sum()
        .sort_values("fac")
    )  # bounded: 16 facility rows
    demand = dem["demand"].to_numpy().astype(np.int64)
    ratio = np.where(demand > 0, CAP // np.maximum(demand, 1), np.int64(0))

    def access(b: pa.Table) -> pa.Table:
        lon, lat = fx.derive_lonlat(b["event_id"].to_numpy())
        dx = lon[:, None] - f_lon[None, :]
        dy = lat[:, None] - f_lat[None, :]
        inr = (dx * dx + dy * dy) <= r2
        acc = (inr * ratio[None, :]).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "event_id": b["event_id"],
                "n_fac": pa.array(inr.sum(axis=1).astype(np.int64)),
                "access_q": pa.array(acc),
            }
        )

    return ds.map_batches(access, batch_format="pyarrow").sort("event_id")


def gdpr_erasure_audit(sf_dir: str) -> rd.Dataset:
    """Right-to-erasure impact audit — the pre-deletion census a GDPR
    workflow runs: the erase set is customers with c_custkey % 97 == 0
    (and the matching user-space predicate on events); the cascade is
    orders of erased customers (predicate pushdown — the key itself
    carries the set membership, no join needed) and their lineitems
    (a REAL distributed semi join on l_orderkey — the one table whose
    erase membership is only reachable through a parent).  One summary
    row of exact counts with single-division affected fractions."""
    from geoglue_ray.stages.join import hash_equijoin

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    n_cust = cust.count()
    n_orders = orders.count()
    n_li = li.count()
    n_ev = ev.count()

    def erased(col: str):
        def f(b: pa.Table) -> pa.Table:
            keep = b[col].to_numpy() % 97 == 0
            return b.filter(pa.array(keep))

        return f

    cust_e = cust.map_batches(erased("c_custkey"), batch_format="pyarrow")
    orders_e = orders.map_batches(
        erased("o_custkey"), batch_format="pyarrow"
    ).materialize()  # consumed twice: count + join build side
    li_e = hash_equijoin(
        li,
        orders_e.select_columns(["o_orderkey"]),
        "l_orderkey",
        "o_orderkey",
        how="semi",
        left_schema=pa.schema([("l_orderkey", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64())]),
    )
    ev_e = ev.map_batches(erased("user_id"), batch_format="pyarrow")

    nc, no, nl, ne = cust_e.count(), orders_e.count(), li_e.count(), ev_e.count()
    return rd.from_arrow(
        pa.table(
            {
                "customers_erased": pa.array([nc], pa.int64()),
                "orders_erased": pa.array([no], pa.int64()),
                "lineitems_erased": pa.array([nl], pa.int64()),
                "events_erased": pa.array([ne], pa.int64()),
                "frac_customers": pa.array(
                    [float(np.float64(nc) / np.float64(n_cust))], pa.float64()
                ),
                "frac_orders": pa.array(
                    [float(np.float64(no) / np.float64(n_orders))], pa.float64()
                ),
                "frac_lineitems": pa.array(
                    [float(np.float64(nl) / np.float64(n_li))], pa.float64()
                ),
                "frac_events": pa.array(
                    [float(np.float64(ne) / np.float64(n_ev))], pa.float64()
                ),
            }
        )
    )


def quantile_normalize(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """Cross-source quantile normalization of the document length
    distribution — the ML-preprocessing step that maps every source's
    n_chars onto the POOLED distribution so no source's length profile
    dominates a mixed corpus: doc with strict rank r of n_s in its
    source (ordered by (n_chars, doc_id)) receives the pooled order
    statistic at position ceil(r * N / n_s).  All-integer: ranks,
    ceil-division position, and the pooled value lookup.  Distribution:
    one (source, n_chars) histogram pass (driver holds only the
    source x distinct-length table -> per-source exclusive-cumsum base
    offsets + the pooled cum profile, broadcast via ray.put), then a
    fixed-shard co-shuffle on hash(source, n_chars) so every tie run is
    resolved in one lexsort pass — doc rows never pass through the
    driver."""
    import ray
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64

    ds = read_documents_cols(sf_dir, ["doc_id", "source", "n_chars"])

    def hpart(b: pa.Table) -> pa.Table:
        src_codes, src_uniq = pd.factorize(
            b["source"].to_pandas(), use_na_sentinel=False
        )
        v = b["n_chars"].to_numpy().astype(np.int64)
        key = src_codes.astype(np.int64) * np.int64(1 << 32) + v
        kcodes, kuniq = pd.factorize(key, use_na_sentinel=False)
        cnt = np.bincount(kcodes, minlength=len(kuniq)).astype(np.int64)
        return pa.table(
            {
                "source": pa.array(src_uniq.take(kuniq >> np.int64(32))),
                "v": pa.array(kuniq & np.int64(0xFFFFFFFF)),
                "cnt": pa.array(cnt),
            }
        )

    hist = (
        ds.map_batches(hpart, batch_format="pyarrow")
        .to_pandas()
        .groupby(["source", "v"], as_index=False)["cnt"]
        .sum()
    )  # bounded: sources x distinct lengths
    hist = hist.sort_values(["source", "v"], kind="mergesort").reset_index(drop=True)
    src_names = np.sort(hist["source"].unique())
    src_code = np.searchsorted(src_names, hist["source"].to_numpy())
    cnt = hist["cnt"].to_numpy().astype(np.int64)
    # per-source exclusive cumsum (base = # strictly-below rows in source)
    cum = np.cumsum(cnt)
    starts = np.flatnonzero(np.r_[True, src_code[1:] != src_code[:-1]])
    base = cum - cnt - np.repeat(np.r_[0, cum[starts[1:] - 1]], np.diff(np.r_[starts, len(cnt)]))
    n_s = np.bincount(src_code, weights=cnt, minlength=len(src_names)).astype(np.int64)
    key_sorted = src_code.astype(np.int64) * np.int64(1 << 32) + hist["v"].to_numpy().astype(np.int64)
    # pooled profile
    pooled = hist.groupby("v", as_index=False)["cnt"].sum().sort_values("v")
    p_v = pooled["v"].to_numpy().astype(np.int64)
    p_cum = np.cumsum(pooled["cnt"].to_numpy().astype(np.int64))
    N = int(p_cum[-1])
    ref = ray.put((src_names, key_sorted, base, n_s, p_v, p_cum, N))

    def shard(b: pa.Table) -> pa.Table:
        sc = np.searchsorted(
            ray.get(ref)[0], np.asarray(b["source"].to_pylist(), dtype=object)
        ).astype(np.int64)
        v = b["n_chars"].to_numpy().astype(np.int64)
        key = sc * np.int64(1 << 32) + v
        sh = (int_hash64(key) % np.uint64(n_shards)).astype(np.int64)
        return pa.table(
            {
                "_sh": pa.array(sh),
                "_key": pa.array(key),
                "doc_id": b["doc_id"],
                "source": b["source"],
                "n_chars": b["n_chars"],
            }
        )

    def resolve_factory():
        state = {}

        def resolve(g: pd.DataFrame) -> pd.DataFrame:
            if "ref" not in state:
                state["ref"] = ray.get(ref)
            src_names_, key_sorted_, base_, n_s_, p_v_, p_cum_, N_ = state["ref"]
            key = g["_key"].to_numpy().astype(np.int64)
            did = g["doc_id"].to_numpy().astype(np.int64)
            o = np.lexsort((did, key))
            key, did = key[o], did[o]
            rstarts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
            pos_in_run = np.arange(len(key)) - np.repeat(
                rstarts, np.diff(np.r_[rstarts, len(key)])
            )
            b_ = base_[np.searchsorted(key_sorted_, key)]
            rnk = b_ + pos_in_run + 1
            ns_ = n_s_[(key >> np.int64(32))]
            pos = (rnk * N_ + ns_ - 1) // ns_
            norm = p_v_[np.searchsorted(p_cum_, pos)]
            src = g["source"].to_numpy()[o]
            v = g["n_chars"].to_numpy()[o]
            return pd.DataFrame(
                {
                    "doc_id": did,
                    "source": src,
                    "n_chars": v.astype(np.int64),
                    "normalized": norm.astype(np.int64),
                }
            )

        return resolve

    return (
        ds.map_batches(shard, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(resolve_factory(), batch_format="pandas")
        .sort("doc_id")
    )


def doc_stitch(sf_dir: str) -> rd.Dataset:
    """Split-document stitching detection — the crawler pathology where
    one logical document is sharded into two rows: pair (a, b) when a's
    LAST two tokens equal b's FIRST two tokens (a != b).  Each doc
    reduces to one (prefix-key, suffix-key) row; candidate pairs come
    from the distributed hash_equijoin on token_hash64(suffix) ==
    token_hash64(prefix) with an exact post-join string equality filter
    (hash collisions die there, the standard hash-join-verify shape).
    Output is the stitch edge list — bounded by true matches, never
    all-pairs."""
    from geoglue_ray.functions.texthash import token_hash64
    from geoglue_ray.stages.join import hash_equijoin

    ds = read_documents_cols(sf_dir, ["doc_id", "text"])

    def keys(b: pa.Table) -> pa.Table:
        la = pc.split_pattern(b["text"], " ")
        lens = pc.list_value_length(la).to_numpy().astype(np.int64)
        flat = np.asarray(pc.list_flatten(la).to_pylist(), dtype=object)
        docidx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = flat != ""
        flat, docidx = flat[keep], docidx[keep]
        cnt = np.bincount(docidx, minlength=len(lens)).astype(np.int64)
        off = np.r_[0, np.cumsum(cnt)]
        ok = cnt >= 2
        i0 = off[:-1][ok]
        i1 = off[1:][ok]
        pfx = flat[i0] + " " + flat[i0 + 1]
        sfx = flat[i1 - 2] + " " + flat[i1 - 1]
        ids = b["doc_id"].to_numpy()[ok]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "pfx": pa.array(pfx.tolist(), pa.string()),
                "sfx": pa.array(sfx.tolist(), pa.string()),
            }
        )

    kt = ds.map_batches(keys, batch_format="pyarrow").materialize()

    def left_side(b: pa.Table) -> pa.Table:
        h = token_hash64(b["sfx"].to_pylist()).astype(np.int64) >> np.int64(1)
        return pa.table(
            {"a_doc": b["doc_id"], "a_sfx": b["sfx"], "hk": pa.array(h)}
        )

    def right_side(b: pa.Table) -> pa.Table:
        h = token_hash64(b["pfx"].to_pylist()).astype(np.int64) >> np.int64(1)
        return pa.table(
            {"b_doc": b["doc_id"], "b_pfx": b["pfx"], "hk2": pa.array(h)}
        )

    left = kt.map_batches(left_side, batch_format="pyarrow")
    right = kt.map_batches(right_side, batch_format="pyarrow")
    joined = hash_equijoin(
        left,
        right,
        "hk",
        "hk2",
        left_schema=pa.schema(
            [("a_doc", pa.int64()), ("a_sfx", pa.string()), ("hk", pa.int64())]
        ),
        right_schema=pa.schema(
            [("b_doc", pa.int64()), ("b_pfx", pa.string()), ("hk2", pa.int64())]
        ),
    )

    def verify(b: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.equal(b["a_sfx"], b["b_pfx"]),
            pc.not_equal(b["a_doc"], b["b_doc"]),
        )
        b = b.filter(ok)
        return pa.table(
            {
                "a_doc": b["a_doc"],
                "b_doc": b["b_doc"],
                "stitch_key": b["a_sfx"],
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow").sort(
        ["a_doc", "b_doc"]
    )


def raster_trend_surface(sf_dir: str) -> rd.Dataset:
    """First-order trend-surface analysis of hour-0 of the raster — the
    classic geostatistics decomposition v ~ a + b*row + c*col fitted by
    exact least squares: the 9 normal-equation moments are exact int64
    sums over CENTERED coordinates (r-32, c-16 — centering keeps every
    Cramer determinant product under 2^63; measured headroom ~60x), the
    three coefficients are single divisions of exact determinants, and
    every cell's fitted/residual row replays the identical double chain
    on both engines.  The field is plane + kmv noise (t2m alone IS a
    plane — residuals would be identically zero).  Distribution: one
    9-sum partial reduce (driver holds 9 ints), one broadcast-coefficient
    map pass."""
    import pandas as pd

    from geoglue_ray.functions.texthash import kmv_hash64
    from geoglue_ray.sources.raster import RXSIZE, read_raster

    T0R = np.datetime64(fx.T0, "us")

    ra = read_raster(n_days=1)

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["variable"], "t2m"))
        v0 = b["value"].to_numpy(zero_copy_only=False)
        h = (
            (b["valid_time"].to_numpy() - T0R).astype("timedelta64[h]").astype(np.int64)
        )
        keep = (h == 0) & np.isfinite(v0)
        r = b["cell_row"].to_numpy().astype(np.int64)[keep] - 32
        c = b["cell_col"].to_numpy().astype(np.int64)[keep] - 16
        cell = (r + 32) * RXSIZE + (c + 16)
        v = v0[keep].astype(np.int64) + (
            kmv_hash64(cell) % np.uint64(64)
        ).astype(np.int64)
        return pa.table({"r": pa.array(r), "c": pa.array(c), "v": pa.array(v)})

    cells = ra.map_batches(prep, batch_format="pyarrow").materialize()

    def moments(b: pa.Table) -> pa.Table:
        r = b["r"].to_numpy()
        c = b["c"].to_numpy()
        v = b["v"].to_numpy()
        vals = np.array(
            [
                len(r),
                r.sum(),
                c.sum(),
                v.sum(),
                (r * r).sum(),
                (r * c).sum(),
                (c * c).sum(),
                (r * v).sum(),
                (c * v).sum(),
            ],
            dtype=np.int64,
        )
        return pa.table(
            {"i": pa.array(np.arange(9, dtype=np.int64)), "m": pa.array(vals)}
        )

    mo = (
        cells.map_batches(moments, batch_format="pyarrow")
        .to_pandas()
        .groupby("i")["m"]
        .sum()
    )
    n, sr, sc, sv, srr, src, scc, srv, scv = (int(mo[i]) for i in range(9))
    det = (
        n * (srr * scc - src * src)
        - sr * (sr * scc - src * sc)
        + sc * (sr * src - srr * sc)
    )
    det_a = (
        sv * (srr * scc - src * src)
        - sr * (srv * scc - src * scv)
        + sc * (srv * src - srr * scv)
    )
    det_b = (
        n * (srv * scc - src * scv)
        - sv * (sr * scc - src * sc)
        + sc * (sr * scv - srv * sc)
    )
    det_c = (
        n * (srr * scv - srv * src)
        - sr * (sr * scv - srv * sc)
        + sv * (sr * src - srr * sc)
    )
    a = np.float64(det_a) / np.float64(det)
    bb = np.float64(det_b) / np.float64(det)
    cc_ = np.float64(det_c) / np.float64(det)

    def score(b: pa.Table) -> pa.Table:
        r = b["r"].to_numpy().astype(np.int64)
        c = b["c"].to_numpy().astype(np.int64)
        v = b["v"].to_numpy().astype(np.int64)
        fitted = a + bb * r.astype(np.float64) + cc_ * c.astype(np.float64)
        return pa.table(
            {
                "cell_row": pa.array(r + 32),
                "cell_col": pa.array(c + 16),
                "v": pa.array(v),
                "fitted": pa.array(fitted, pa.float64()),
                "residual": pa.array(v.astype(np.float64) - fitted, pa.float64()),
            }
        )

    return cells.map_batches(score, batch_format="pyarrow").sort(
        ["cell_row", "cell_col"]
    )


def events_forecast_mase(sf_dir: str, season: int = 24, train_hours: int = 48) -> rd.Dataset:
    """Seasonal-naive forecast backtest over the hourly event-count
    series — the forecasting-evaluation operator: forecast for hour h is
    the count at h-24, scored by MASE (mean absolute scaled error, the
    scale-free standard) against the naive-1 differences of the first
    48 train hours.  Everything is exact integer counts; MASE clears
    denominators into ONE division  (err * 47) / (denom * n_test).
    The hour axis anchors at the events table's OWN epoch (2024-01-01 —
    NOT derive_event_time; CLAUDE.md round-4).  Distribution: per-batch
    hour-count partials -> fixed-shard merge -> the driver holds the
    span-hours-bounded dense series (zero-filled) and replays the
    integer chain."""
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64

    EPOCH = np.datetime64("2024-01-01T00:00:00", "us")
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        h = ((us - EPOCH).astype(np.int64)) // np.int64(3_600_000_000)
        codes, uniq = pd.factorize(h, use_na_sentinel=False)
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"h": pa.array(uniq.astype(np.int64)), "cnt": pa.array(cnt)})

    def shard(b: pa.Table) -> pa.Table:
        h = b["h"].to_numpy()
        return b.append_column(
            "_sh", pa.array((int_hash64(h) % np.uint64(32)).astype(np.int64))
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        codes, uniq = pd.factorize(g["h"].to_numpy(), use_na_sentinel=False)
        cnt = np.bincount(codes, weights=g["cnt"].to_numpy(), minlength=len(uniq)).astype(
            np.int64
        )
        return pd.DataFrame({"h": uniq.astype(np.int64), "cnt": cnt})

    hrs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(shard, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )  # bounded: span hours
    H = int(hrs["h"].max()) + 1
    y = np.zeros(H, dtype=np.int64)
    y[hrs["h"].to_numpy()] = hrs["cnt"].to_numpy()
    denom = int(np.abs(np.diff(y[:train_hours])).sum())
    test = np.arange(train_hours, H)
    err = int(np.abs(y[test] - y[test - season]).sum())
    n_test = H - train_hours
    mase = np.float64(err * (train_hours - 1)) / np.float64(denom * n_test)
    return rd.from_arrow(
        pa.table(
            {
                "n_hours": pa.array([H], pa.int64()),
                "n_test": pa.array([n_test], pa.int64()),
                "train_denom": pa.array([denom], pa.int64()),
                "test_err": pa.array([err], pa.int64()),
                "mase": pa.array([float(mase)], pa.float64()),
            }
        )
    )


def events_bursts(sf_dir: str) -> rd.Dataset:
    """Burst detection over the hourly event-count series — maximal runs
    of hours at or above TWICE the median hourly rate (the log-free
    Kleinberg-lite): threshold y >= med2 where med2 = doubled median of
    the dense zero-filled series, so the comparison is all-integer.
    Same distribution as events_forecast_mase (hour-count partials ->
    fixed-shard merge -> span-bounded driver series); per-burst start,
    length, peak and total are exact ints mirrored by the
    gaps-and-islands SQL twin."""
    import pandas as pd

    from geoglue_ray.functions.texthash import int_hash64

    EPOCH = np.datetime64("2024-01-01T00:00:00", "us")
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        h = ((us - EPOCH).astype(np.int64)) // np.int64(3_600_000_000)
        codes, uniq = pd.factorize(h, use_na_sentinel=False)
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({"h": pa.array(uniq.astype(np.int64)), "cnt": pa.array(cnt)})

    def shard(b: pa.Table) -> pa.Table:
        h = b["h"].to_numpy()
        return b.append_column(
            "_sh", pa.array((int_hash64(h) % np.uint64(32)).astype(np.int64))
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        codes, uniq = pd.factorize(g["h"].to_numpy(), use_na_sentinel=False)
        cnt = np.bincount(codes, weights=g["cnt"].to_numpy(), minlength=len(uniq)).astype(
            np.int64
        )
        return pd.DataFrame({"h": uniq.astype(np.int64), "cnt": cnt})

    hrs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(shard, batch_format="pyarrow")
        .groupby("_sh")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )  # bounded: span hours
    H = int(hrs["h"].max()) + 1
    y = np.zeros(H, dtype=np.int64)
    y[hrs["h"].to_numpy()] = hrs["cnt"].to_numpy()
    ys = np.sort(y)
    med2 = int(ys[(H + 1) // 2 - 1]) + int(ys[(H + 2) // 2 - 1])
    hot = y >= med2
    brk = np.r_[hot[0], hot[1:] & ~hot[:-1]]
    run_id = np.cumsum(brk)
    starts, lens, peaks, tots = [], [], [], []
    idx = np.arange(H)
    for rid in np.unique(run_id[hot]):
        sel = hot & (run_id == rid)
        starts.append(int(idx[sel][0]))
        lens.append(int(sel.sum()))
        peaks.append(int(y[sel].max()))
        tots.append(int(y[sel].sum()))
    return rd.from_arrow(
        pa.table(
            {
                "start_h": pa.array(starts, pa.int64()),
                "n_hours": pa.array(lens, pa.int64()),
                "peak": pa.array(peaks, pa.int64()),
                "total": pa.array(tots, pa.int64()),
                "med2": pa.array([med2] * len(starts), pa.int64()),
            }
        )
    )
