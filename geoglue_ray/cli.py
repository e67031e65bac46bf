"""CLI — the engine's composition surface, mirroring the reference's
``geoglue`` CLI (``cli.py``): subcommands chainable via shell with output
paths printed on stdout and logfmt begin/end/elapsed lines on stderr
(``cli.py:296-305``), including the stdin-driven ``merge`` (``cli.py:81-93``).

    python -m geoglue_ray zonalstats --sf-dir /root/testdata/sf0.01 \
        --ops mean,sum,weighted_mean --output /tmp/zs
    python -m geoglue_ray crop --sf-dir ... --bbox 104,10,106,14 --output /tmp/crop
    ls /tmp/parts/*.parquet | python -m geoglue_ray merge --output /tmp/merged
    python -m geoglue_ray stats --input /tmp/zs

Owns its Ray session (guarded init), unlike the library code.
"""

from __future__ import annotations

import argparse
import sys
import time


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _logfmt(**kw):
    from geoglue_ray.functions.logfmt import logfmt_line

    print(logfmt_line(**kw), file=sys.stderr)


def cmd_zonalstats(args) -> int:
    _ensure_ray()
    from geoglue_ray.pipelines.zonal import zonal_pipeline

    t0 = time.time()
    _logfmt(event="begin", task="zonalstats", sf_dir=args.sf_dir, operation=args.ops)
    ds = zonal_pipeline(args.sf_dir, ops=args.ops.split(","))
    ds.write_parquet(args.output)
    _logfmt(event="end", task="zonalstats", output=args.output, elapsed=time.time() - t0)
    print(args.output)
    return 0


def cmd_crop(args) -> int:
    _ensure_ray()
    from geoglue_ray.geom import Bbox
    from geoglue_ray.sources.corpus import read_corpus
    from geoglue_ray.stages.crop import crop

    bbox = Bbox.from_string(args.bbox)
    t0 = time.time()
    _logfmt(event="begin", task="crop", bbox=args.bbox)
    ds = crop(read_corpus(args.sf_dir, with_spans=not args.no_spans), bbox)
    ds.write_parquet(args.output)
    _logfmt(event="end", task="crop", output=args.output, elapsed=time.time() - t0)
    print(args.output)
    return 0


def cmd_resample(args) -> int:
    _ensure_ray()
    from geoglue_ray.pipelines import queries as q

    t0 = time.time()
    _logfmt(event="begin", task="resample", method=args.method)
    fn = {
        "remapnn": q.resample_nearest,
        "remapbil": q.resample_bilinear,
        "sremapbil": q.resample_sparse,
    }.get(args.method)
    if fn is None:
        print(f"unknown method {args.method}", file=sys.stderr)
        return 1
    fn(args.sf_dir).write_parquet(args.output)
    _logfmt(event="end", task="resample", output=args.output, elapsed=time.time() - t0)
    print(args.output)
    return 0


def cmd_merge(args) -> int:
    """Union parquet inputs listed on stdin, one path per line
    (stdin-driven like the reference merge, ``cli.py:81-93``)."""
    _ensure_ray()
    import ray.data as rd

    from geoglue_ray.stages.merge import concat_time

    paths = [ln.strip() for ln in (args.file or sys.stdin) if ln.strip()]
    if not paths:
        print("merge: no input paths on stdin", file=sys.stderr)
        return 1
    t0 = time.time()
    _logfmt(event="begin", task="merge", n_inputs=len(paths))
    ds = concat_time([rd.read_parquet(p) for p in paths])
    ds.write_parquet(args.output)
    _logfmt(event="end", task="merge", output=args.output, elapsed=time.time() - t0)
    print(args.output)
    return 0


def cmd_stats(args) -> int:
    """Global per-column stats of a parquet output (``validate.py:37-43``).

    Streams through :func:`geoglue_ray.stages.validate.column_stats` —
    partial/final per-column aggregates, never a whole-input
    ``to_pandas()`` — so it is safe pointed at a corpus, not just at
    key-cardinality zonal outputs."""
    _ensure_ray()
    import ray.data as rd

    from geoglue_ray.stages.validate import column_stats

    stats = column_stats(rd.read_parquet(args.input))
    for row in stats.to_pylist():
        if row["kind"] == "numeric":
            _logfmt(
                column=row["column"],
                nna=row["nna"],
                mean=float("nan") if row["mean"] is None else row["mean"],
                min=float("nan") if row["min"] is None else row["min"],
                max=float("nan") if row["max"] is None else row["max"],
            )
        else:
            _logfmt(column=row["column"], nna=row["nna"], distinct=row["distinct"])
    print(args.input)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="geoglue_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    z = sub.add_parser("zonalstats", help="corpus -> per-admin zonal stats")
    z.add_argument("--sf-dir", required=True)
    z.add_argument("--ops", default="mean,sum,count,weighted_mean,weighted_sum,area_weighted_sum")
    z.add_argument("--output", required=True)
    z.set_defaults(fn=cmd_zonalstats)

    c = sub.add_parser("crop", help="bbox-crop the corpus")
    c.add_argument("--sf-dir", required=True)
    c.add_argument("--bbox", required=True, help="minx,miny,maxx,maxy")
    c.add_argument("--output", required=True)
    c.add_argument("--no-spans", action="store_true")
    c.set_defaults(fn=cmd_crop)

    r = sub.add_parser("resample", help="grid resampling demo pipelines")
    r.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    r.add_argument("--method", required=True, choices=["remapnn", "remapbil", "sremapbil"])
    r.add_argument("--output", required=True)
    r.set_defaults(fn=cmd_resample)

    m = sub.add_parser("merge", help="union parquet paths from stdin")
    m.add_argument("--output", required=True)
    m.add_argument("--file", type=argparse.FileType("r"), default=None)
    m.set_defaults(fn=cmd_merge)

    s = sub.add_parser("stats", help="per-column stats of a parquet dir")
    s.add_argument("--input", required=True)
    s.set_defaults(fn=cmd_stats)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
