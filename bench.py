"""Benchmark harness — one JSON line per run (driver contract).

Headline: the flagship interleaved-corpus -> spatial-join -> zonal-stats
pipeline over ``$GRAFT_SF_DIR`` (default sf0.1), with the corpus
deterministically replicated ``$GRAFT_REPLICAS``x (default 800 -> ~4M docs
at sf0.1) as the small-scale stand-in for the 10^12-row design point.

``--scaling`` runs the headline twice in fresh processes at
``num_cpus=8`` and ``num_cpus=32`` on the same input and reports both
throughputs plus scaling efficiency (the sandbox evidence for the
north_rule's N -> 4N cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# 16000 replicas = 80M docs: after the round-3 speedups the ~2s per-run
# constant (session + pool ramp) stays below 10% of the headline, so the
# recorded docs/s measures streaming throughput, not startup
# (BASELINE.md methodology; was 4000 in round 2 at ~1/4 the throughput)
REPLICAS = int(os.environ.get("GRAFT_REPLICAS", "16000"))


def _run_queries() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # Ray Data's per-operator resource reservation (ReservationOpResource-
    # Allocator) reserves CPU budget for every operator in the plan; at
    # small sessions the multi-operator flagship plan leaves the map stage
    # ~1 effective slot (measured: 4-CPU flagship 45.5s -> 15.1s with the
    # allocator off, 16-CPU 27.7s -> 17.6s).  Safe here: every bench
    # pipeline ships key-cardinality-sized shuffle payloads, so the
    # allocator's OOM-protection role is moot.
    ctx.op_resource_reservation_enabled = False

    # Ray's Sort operator emits SCHEMA-LESS bundles for empty partitions
    # (reproducible with any groupby over a dataset holding zero-row
    # blocks, even with fully-typed Arrow UDF empties end to end), which
    # trips its own schema-divergence warning inside the executor.  Our
    # UDF empties are all explicitly typed (tested) and every result is
    # oracle-verified bit-exact, so this specific Ray-internal warning is
    # noise — drop exactly it, nothing else.
    import logging

    class _DropEmptySchemaWarn(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return (
                "Operator produced a RefBundle with a different schema"
                not in record.getMessage()
            )

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_DropEmptySchemaWarn())

    # pyarrow 16's Schema.__hash__ raises on any schema carrying
    # key/value metadata, so Ray's unify_schemas dedup short-circuit
    # warns on every read of a pandas-written parquet file — including
    # the driver's testdata (all carry the b"pandas" metadata key).
    # Pure upstream noise; pinned by
    # tests/test_ray_internals.py::test_schema_hash_warning_is_pyarrow_internal,
    # which fails when a pyarrow upgrade fixes the hash so this filter
    # must then be deleted.
    class _DropSchemaHashWarn(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_DropSchemaHashWarn())

    import pyarrow.parquet as pq

    from geoglue_ray.pipelines import queries as q
    from geoglue_ray.pipelines import raster as r
    from geoglue_ray.pipelines.zonal import fused_zonal_pipeline

    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows

    def _as_ds(tbl):
        # bounded in-memory results (pa.Table) timed like any pipeline
        class _Done:
            def materialize(self):
                return tbl

        return _Done()

    # one fused actor pool at a fixed 3/4 of the session's CPUs (same
    # fraction at every level so scaling compares like with like), the rest
    # as headroom for shuffle/reduce tasks; fixed size (autoscaling ramps
    # too slowly for short stages — see BASELINE.md)
    pool = max(2, (3 * NUM_CPUS) // 4)

    # warm the worker pool with one small untimed run
    fused_zonal_pipeline(SF_DIR, replicas=2 * pool, concurrency=pool).materialize()

    results: dict[str, float] = {}

    # best-of-N: single samples on this host can sit 3-5x off right after
    # another Ray session tore down (BASELINE.md round-3 lesson); the min
    # of N back-to-back runs measures the code, not the hypervisor window.
    headline_reps = int(os.environ.get("GRAFT_HEADLINE_REPEATS", "2"))
    headline = float("inf")
    out = None
    for _ in range(max(1, headline_reps)):
        t0 = time.perf_counter()
        out = fused_zonal_pipeline(
            SF_DIR, replicas=REPLICAS, concurrency=pool
        ).materialize()
        headline = min(headline, time.perf_counter() - t0)
    results["zonal_flagship"] = round(headline, 3)
    total_docs = n_docs * REPLICAS
    assert out.count() > 0

    # determinism across parallelism levels: a content hash of the full
    # result, compared between the --scaling pair (two-parallelism
    # equivalence, SURVEY.md §5)
    import pandas as pd

    df = out.to_pandas()
    result_hash = int(pd.util.hash_pandas_object(df.round(9)).sum())

    extra = [] if os.environ.get("GRAFT_HEADLINE_ONLY") else [
        ("events_zonal", q.events_zonal),
        ("raster_weekly_zonal", lambda _sf: r.raster_weekly_zonal()),
        ("minhash_neardup", q.minhash_neardup),
        ("embed_knn", q.embed_knn),
        ("order_priority_revenue", q.order_priority_revenue),
        ("vocab_top", q.vocab_top),
        # two-table interval join at a bounded window count (~2.3k windows
        # x 100k events -> ~8M overlap pairs at sf0.1)
        ("events_in_windows", lambda sf: q.events_in_windows(sf, key_mod=64)),
        # market-basket pair co-occurrence (~1M within-order pairs at sf0.1)
        ("copurchase_pairs", q.copurchase_pairs),
        # bigram LM statistics over the full 5k-doc corpus
        ("bigram_stats", q.bigram_stats),
        # round-4 continuation families: chunk dedup + reassembly,
        # halo-exchange stencil, banded-Levenshtein near-dup
        ("dedup_chunks", q.dedup_chunks),
        ("raster_focal_mean", q.raster_focal_mean),
        ("edit_neardup", q.edit_neardup),
        # geostatistics family: moment-pass + halo stencil, grid-bucket
        # ring pair counting, exact bivariate-sums trend
        ("raster_moran", q.raster_moran),
        ("events_ripley", lambda sf: _as_ds(q.events_ripley(sf))),
        ("trend_admin1", q.trend_admin1),
        # round-4 continuation: movement analytics (gaps-and-islands),
        # space-time interaction, graph traversal, sequential statistics.
        # events_dbscan is NOT here: at sf0.1 the diffuse points percolate
        # into giant components and plain min-label propagation needs
        # ~diameter rounds (see stages/spatial.dbscan docstring).
        ("user_stops", q.user_stops),
        ("events_knox", lambda sf: _as_ds(q.events_knox(sf))),
        # round-4 continuation: continuous space-time interaction (knox
        # pass + the never-enumerated all-pairs |dt| rank identity)
        ("events_mantel", lambda sf: _as_ds(q.events_mantel(sf))),
        ("bfs_parts", lambda sf: _as_ds(q.bfs_parts(sf))),
        ("raster_cusum", q.raster_cusum),
        # round-4 continuation 3: the global-dependency hydrology pair
        # (row-band contraction + perimeter solve + pour pass)
        ("raster_flow_acc", q.raster_flow_acc),
        # round-4 continuation 4: iterative distributed EM (2 Lloyd
        # rounds, broadcast centroids + integer matmul per batch)
        ("embed_kmeans", q.embed_kmeans),
        # climate-epi exposure attribution: events x full space-time
        # raster big-big join on the packed (row, col, hour) key
        ("exposure_bands", q.exposure_bands),
        # round-5: prefix-filtered exact set-similarity join (candidates
        # 9.0M -> 4.5M at sf0.1; 16x on hub-skewed sets — BASELINE.md)
        ("jaccard_orders", q.jaccard_orders),
        # round-5: scan-level predicate pushdown — the one-week window is
        # applied INSIDE the parquet scan (~23% of rows leave the read op)
        ("events_window_profile", q.events_window_profile),
    ]
    extra_reps = int(os.environ.get("GRAFT_EXTRA_REPEATS", "2"))
    for name, fn in extra:
        best = float("inf")
        for _ in range(max(1, extra_reps)):
            t0 = time.perf_counter()
            fn(SF_DIR).materialize()
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 3)

    if not os.environ.get("GRAFT_HEADLINE_ONLY"):
        # hot-cell skew demo (north_star mega-cells): ~half the corpus in
        # ONE admin unit, salted vs unsalted two-level merge; results must
        # be bit-identical (integer partial sums) — recorded as a hash
        # equality alongside both wall times
        from geoglue_ray.pipelines.zonal import skewed_zonal

        skew_reps = int(os.environ.get("GRAFT_SKEW_REPLICAS", "1500"))
        skew_out = {}
        for mode, s in (("plain", None), ("salted", 16)):
            best = float("inf")
            for _ in range(max(1, extra_reps)):  # first call pays pool ramp
                t0 = time.perf_counter()
                df = skewed_zonal(
                    SF_DIR, replicas=skew_reps, concurrency=pool, salt=s
                ).to_pandas()
                best = min(best, time.perf_counter() - t0)
            results[f"zonal_skew_{mode}"] = round(best, 3)
            skew_out[mode] = df
        results["zonal_skew_equal"] = bool(
            skew_out["plain"].equals(skew_out["salted"])
        )

        # round-5 write-path bench (S12/S13 at scale): one-pass
        # day-partitioned parquet write of the derived corpus with
        # per-partition lineage manifests, plus the manifest-gated
        # resume (full skip).  Single sample (a warm repeat would just
        # measure the page cache); pools sized 1/4:1/2 of the session
        # per the concurrent-fixed-pool rule.
        import shutil
        import tempfile

        from geoglue_ray.pipelines.resumable import corpus_daily_write

        write_reps = int(os.environ.get("GRAFT_WRITE_REPLICAS", "2000"))
        wdir = tempfile.mkdtemp(prefix="bench_corpus_write_")
        try:
            t0 = time.perf_counter()
            s1 = corpus_daily_write(
                SF_DIR, wdir, replicas=write_reps,
                concurrency=max(2, NUM_CPUS // 2),
                derive_concurrency=max(1, NUM_CPUS // 4),
            )
            results["corpus_write"] = round(time.perf_counter() - t0, 3)
            results["corpus_write_rows"] = s1["rows_written"]
            t0 = time.perf_counter()
            s2 = corpus_daily_write(
                SF_DIR, wdir, replicas=write_reps,
                concurrency=max(2, NUM_CPUS // 2),
                derive_concurrency=max(1, NUM_CPUS // 4),
            )
            results["corpus_write_resume"] = round(time.perf_counter() - t0, 3)
            assert not s2["written"] and len(s2["skipped"]) == 30
        finally:
            shutil.rmtree(wdir, ignore_errors=True)

    payload = {
        "metric": "zonal_flagship_elapsed",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "replicas": REPLICAS,
        "docs": total_docs,
        "docs_per_s": round(total_docs / headline, 1),
        "result_hash": result_hash,
    }
    ray.shutdown()
    return payload


def _scaling() -> None:
    # larger corpus for the scaling pair so fixed startup costs amortize
    # (the criterion models a fixed-size cluster streaming 100 TB, where
    # per-job constants vanish); same input at both parallelism levels.
    # 32000 replicas (160M docs): after the round-3 engine speedups
    # (per-task partial collapse, uniform-edge PIP, single-task final
    # merge) the 16-slot run is ~25 s at this size, keeping per-run
    # constants (session + pool ramp, ~2 s) under 10%; at 4000 the hi
    # level finishes in ~5 s and the ratio measures startup
    scale_reps = os.environ.get("GRAFT_REPLICAS_SCALING", str(max(REPLICAS, 32000)))

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_REPLICAS=scale_reps,
            GRAFT_HEADLINE_ONLY="1",
            # the interleaved best-of-3 ACROSS processes is the noise
            # control here; inner repeats would double every level's cost
            GRAFT_HEADLINE_REPEATS="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # N and 4N scheduling slots, both kept below the sandbox's real core
    # ceiling (~27 concurrently-runnable cores incl. Ray system processes)
    # so the upper level isn't silently machine-bound — see BASELINE.md.
    levels = os.environ.get("GRAFT_SCALE_LEVELS", "4,16")
    n_lo, n_hi = (int(x) for x in levels.split(","))
    repeats = int(os.environ.get("GRAFT_SCALE_REPEATS", "3"))
    # INTERLEAVED best-of-N: the sandbox host is noisy (±50% run-to-run
    # hypervisor windows); alternating lo/hi runs makes both levels
    # sample the same window distribution before taking each level's
    # least-interfered (best) run
    los, his = [], []
    for _ in range(repeats):
        los.append(run(n_lo))
        his.append(run(n_hi))
    lo = min(los, key=lambda d: d["value"])
    hi = min(his, key=lambda d: d["value"])
    ratio = n_hi / n_lo
    eff = (lo["docs_per_s"] and (hi["docs_per_s"] / lo["docs_per_s"]) / ratio) or 0.0
    print(
        json.dumps(
            {
                f"sec_{n_lo}": lo["value"],
                f"sec_{n_hi}": hi["value"],
                f"docs_per_s_{n_lo}": lo["docs_per_s"],
                f"docs_per_s_{n_hi}": hi["docs_per_s"],
                "scaling_efficiency": round(eff, 3),
                "docs": lo["docs"],
                "results_match": lo["result_hash"] == hi["result_hash"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling()
    else:
        print(json.dumps(_run_queries()))
