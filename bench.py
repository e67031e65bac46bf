"""Benchmark harness — one JSON line per run (driver contract).

Headline: the flagship interleaved-corpus -> spatial-join -> zonal-stats
pipeline over ``$GRAFT_SF_DIR`` (default sf0.1), with the corpus
deterministically replicated ``$GRAFT_REPLICAS``x (default 200 -> ~1M docs
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
REPLICAS = int(os.environ.get("GRAFT_REPLICAS", "200"))


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

    import pyarrow.parquet as pq

    from geoglue_ray.pipelines import queries as q
    from geoglue_ray.pipelines.zonal import zonal_pipeline

    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows

    # warm the page cache / ray worker pool with one small untimed run
    zonal_pipeline(SF_DIR, replicas=1, concurrency=(1, 4)).materialize()

    results: dict[str, float] = {}

    t0 = time.perf_counter()
    out = zonal_pipeline(
        SF_DIR, replicas=REPLICAS, concurrency=(2, max(4, NUM_CPUS - 4))
    ).materialize()
    headline = time.perf_counter() - t0
    results["zonal_flagship"] = round(headline, 3)
    total_docs = n_docs * REPLICAS
    assert out.count() > 0

    for name, fn in [
        ("events_zonal", q.events_zonal),
        ("spatial_join", q.spatial_join_query),
        ("corpus_derive", q.corpus_derive),
    ]:
        t0 = time.perf_counter()
        fn(SF_DIR).materialize()
        results[name] = round(time.perf_counter() - t0, 3)

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
    }
    ray.shutdown()
    return payload


def _scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    eff = (lo["docs_per_s"] and (hi["docs_per_s"] / lo["docs_per_s"]) / 4.0) or 0.0
    print(
        json.dumps(
            {
                "sec_8": lo["value"],
                "sec_32": hi["value"],
                "docs_per_s_8": lo["docs_per_s"],
                "docs_per_s_32": hi["docs_per_s"],
                "scaling_efficiency": round(eff, 3),
                "docs": lo["docs"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling()
    else:
        print(json.dumps(_run_queries()))
