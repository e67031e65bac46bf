"""Flagship pipeline: interleaved corpus -> spatial join -> zonal stats.

The engine's end-to-end equivalent of ``geoglue zonalstats RASTER REGION``
(``cli.py:255-305`` -> ``zonalstats.py:71-100``), over the interleaved
document corpus: read documents (column-pruned) -> derive observations +
spans -> GGrid cell encode -> broadcast polygon-index actor-pool join ->
weight lookup -> partial/final zonal groupby keyed ``admin_id`` -> stable
sort.  Every stage streams; nothing materializes the corpus.
"""

from __future__ import annotations

import ray
import ray.data as rd

from geoglue_ray.sources.admin import AdminIndex, build_admin_table
from geoglue_ray.sources.corpus import read_corpus
from geoglue_ray.sources.weights import build_weights_grid
from geoglue_ray.stages.spatial import encode_cells, spatial_join
from geoglue_ray.stages.zonal import zonal_aggregate

DEFAULT_OPS = [
    "mean",
    "sum",
    "count",
    "weighted_mean",
    "weighted_sum",
    "area_weighted_sum",
]


def corpus_with_admin(
    sf_dir: str,
    replicas: int = 1,
    with_spans: bool = True,
    concurrency: int | tuple[int, int] = (1, 8),
    with_weights: bool = False,
    emit_names: bool = True,
) -> rd.Dataset:
    """Corpus -> derived observations -> cell encode -> admin assignment.

    One actor-pool stage performs candidate lookup + PIP refine + kNN (and
    optional weight lookup) against broadcast state; Ray fuses the
    stateless derive/encode maps into the chain.
    """
    ds = read_corpus(
        sf_dir, replicas=replicas, with_spans=with_spans, concurrency=concurrency
    )
    ds = ds.map_batches(encode_cells, batch_format="pyarrow")
    index = AdminIndex.build(build_admin_table())
    weights_ref = ray.put(build_weights_grid()) if with_weights else None
    return spatial_join(
        ds,
        index_ref=ray.put(index),
        weights_ref=weights_ref,
        emit_names=emit_names,
        concurrency=concurrency,
    )


def zonal_pipeline(
    sf_dir: str,
    ops: list[str] | None = None,
    replicas: int = 1,
    with_spans: bool = True,
    concurrency: int | tuple[int, int] = (1, 8),
) -> rd.Dataset:
    """Full zonal-stats pipeline; returns (admin_id, <op columns>) sorted.

    The shuffle is keyed on the integer ``admin_idx``; the admin_id string
    is attached only to the ~N_ADMIN2-row aggregate result (narrow-shuffle
    principle — never move strings the key pool already knows).
    """
    ds = corpus_with_admin(
        sf_dir,
        replicas=replicas,
        with_spans=with_spans,
        concurrency=concurrency,
        with_weights=True,
        emit_names=False,
    )
    out = zonal_aggregate(ds, ops or DEFAULT_OPS, keys=["admin_idx"], weight_col="weight")
    names = build_admin_table()["admin_id"].combine_chunks()

    def attach_names(b: rd.Dataset) -> "rd.Dataset":
        idx = b["admin_idx"]
        b = b.drop_columns(["admin_idx"])
        import pyarrow as pa

        return b.add_column(0, "admin_id", names.take(pa.compute.cast(idx, "int64")))

    return out.map_batches(attach_names, batch_format="pyarrow").sort("admin_id")
