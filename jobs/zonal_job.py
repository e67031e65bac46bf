"""``ray job submit`` entrypoint for the flagship resumable pipeline.

The north_rule deployment shape: the engine runs as a Ray *job* against a
fixed-size multi-node cluster, writing day-partitioned zonal aggregates
with per-partition lineage and metrics, resumable from the manifest.  On
a real cluster:

    ray job submit --working-dir . -- \\
        python jobs/zonal_job.py --sf-dir /data/corpus \\
        --out-dir /data/out/zonal --replicas 200 --open-days 20240115

The Ray Jobs runner sets ``RAY_ADDRESS`` in the driver environment, so the
bare ``ray.init()`` below attaches to the submitted-to cluster; in this
sandbox the same script runs standalone (``RAY_ADDRESS=local`` is preset).
A rerun of the SAME command skips every committed partition (reads the
manifest, recomputes only ``--open-days``) — that is the crash-resume
contract, exercised end-to-end by tests/test_job.py in a fresh process.

Prints exactly one JSON summary line on success (machine-parseable by the
submitting orchestrator).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

# `ray job submit --working-dir .` ships the repo root; the script itself
# lives one level down, so anchor imports on its parent
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", required=True, help="corpus table directory")
    p.add_argument("--out-dir", required=True, help="partitioned output root")
    p.add_argument(
        "--replicas", type=int, default=1,
        help="corpus replication factor (scale knob for synthetic runs)",
    )
    p.add_argument(
        "--open-days", nargs="*", default=[],
        help="partition ids recomputed even if committed (the reference's "
        "current-month semantics)",
    )
    p.add_argument(
        "--days", nargs="*", default=None,
        help="explicit partition ids (default: derive from the fixture clock)",
    )
    args = p.parse_args(argv)

    import ray

    # the Jobs runner / driver owns the session when one exists
    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")

    from geoglue_ray.pipelines.resumable import zonal_daily_resumable

    summary = zonal_daily_resumable(
        args.sf_dir,
        args.out_dir,
        days=args.days,
        open_days=set(args.open_days),
        replicas=args.replicas,
    )
    print(json.dumps({"job": "zonal_daily", **summary}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
