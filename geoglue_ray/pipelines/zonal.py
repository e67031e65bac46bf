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


_BROADCAST_CACHE: dict = {}


def _session_cached_put(key: str, build):
    """Driver-side memoized ``ray.put`` of plan artifacts, invalidated when
    the Ray session changes (the reference caches region artifacts the same
    way, ``paths.py:8-27`` ``@cache``)."""
    sid = ray.get_runtime_context().get_job_id() if ray.is_initialized() else None
    hit = _BROADCAST_CACHE.get(key)
    if hit and hit[0] == sid:
        return hit[1]
    ref = ray.put(build())
    _BROADCAST_CACHE[key] = (sid, ref)
    return ref


def _admin_index_ref():
    return _session_cached_put("admin_index", lambda: AdminIndex.build(build_admin_table()))


def _weights_ref():
    return _session_cached_put("weights", build_weights_grid)

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
    derive_concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    """Corpus -> derived observations -> cell encode -> admin assignment.

    One actor-pool stage performs candidate lookup + PIP refine + kNN (and
    optional weight lookup) against broadcast state; Ray fuses the
    stateless derive/encode maps into the chain.

    Pool sizing: prefer FIXED integer concurrency for throughput runs —
    autoscaling pools ramp from their minimum too slowly for short stages
    (measured ~2x worse on the 4M-doc bench).  The join stage needs ~2x the
    CPU of derive; ``derive_concurrency`` sizes the expansion pool
    separately (bench uses N/4 derive, N/2 join).
    """
    ds = read_corpus(
        sf_dir,
        replicas=replicas,
        with_spans=with_spans,
        concurrency=derive_concurrency or concurrency,
    )
    ds = ds.map_batches(encode_cells, batch_format="pyarrow")
    return spatial_join(
        ds,
        index_ref=_admin_index_ref(),
        weights_ref=_weights_ref() if with_weights else None,
        emit_names=emit_names,
        concurrency=concurrency,
    )


# per-worker-process cache of deserialized broadcast state, keyed by the
# (table, index, weights) ObjectRef hexes.  Size-1 replace-on-miss (the
# _sig_lookup pattern): the broadcast is only live for one pipeline run,
# and long-lived Ray workers must not accumulate stale copies.
_FUSED_STATE: dict = {}


def _fused_state(table_ref, index_ref, weights_ref):
    key = (table_ref.hex(), index_ref.hex(), weights_ref.hex())
    hit = _FUSED_STATE.get(key)
    if hit is None:
        _FUSED_STATE.clear()
        hit = tuple(ray.get([table_ref, index_ref, weights_ref]))
        _FUSED_STATE[key] = hit
    return hit


def fused_zonal_map(batch, *, table_ref, index_ref, weights_ref, stride: int):
    """One TASK stage for the whole per-document path: derive -> cell
    encode -> polygon join -> weight lookup -> PARTIAL zonal aggregate.

    The partial/final principle taken to its conclusion: per-document data
    never enters the object store — each task ships only its per-key
    partial rows (<= N_ADMIN2), so the shuffle payload is key-cardinality
    sized regardless of corpus size.  A plain-task stage (broadcast state
    via ``ray.put`` + a per-worker-process cache) rather than an actor
    pool: tasks reuse the session's warm worker processes, removing the
    per-execution actor-pool ramp (~2 s, i.e. ~18% of the 16-slot
    scaling run — the dominant constant after the round-3 streaming
    fixes).  Nothing downstream is an actor pool, so the round-1 fusion
    hazard (a bare function inheriting a downstream pool's batch_size)
    does not apply.
    """
    import pyarrow as pa

    from geoglue_ray.sources.corpus import DeriveObservations
    from geoglue_ray.sources.weights import lookup_weight
    from geoglue_ray.stages.zonal import partial_zonal, reduce_partials

    table, index, weights = _fused_state(table_ref, index_ref, weights_ref)
    derive = DeriveObservations(with_spans=False)
    parts = []
    for r in batch["id"].to_numpy():
        t = derive.derive(table, int(r) * stride)
        lon = t["lon"].to_numpy()
        lat = t["lat"].to_numpy()
        feat, _ = index.assign(lon, lat)
        t = t.append_column("admin_idx", pa.array(feat.astype("int32")))
        t = t.append_column("weight", pa.array(lookup_weight(lon, lat, weights)))
        parts.append(partial_zonal(t, ["admin_idx"], "value", "weight"))
    if parts:
        # collapse the per-replica partials to ONE row per key before
        # shipping — without this the batch emits replicas x n_keys
        # rows and the downstream merge pays ~2x the worker's own CPU
        # re-sorting them (measured: 4M partial rows / 212 MB shuffled
        # at 4000 replicas vs ~100k rows / 5 MB combined)
        yield reduce_partials(pa.concat_tables(parts), ["admin_idx"])


def fused_zonal_pipeline(
    sf_dir: str,
    ops: list[str] | None = None,
    replicas: int = 1,
    concurrency: int | tuple[int, int] = (1, 8),
    merge_bound: int = 5_000_000,
) -> rd.Dataset:
    """Bench/throughput variant of :func:`zonal_pipeline`: identical result,
    single fused actor pool, partials-only shuffle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geoglue_ray.ops import parse_ops
    from geoglue_ray.stages.zonal import _merge_partials

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    # size tasks from derived-row volume (~1.6us/row measured): ~1.25M
    # rows ~= 2s per task.  Ray's default block count for a range this
    # small is ~2x CPUs, which at a 3-actor pool quantizes the stage into
    # 3 waves with a 2/3-full tail (measured ~25% of 4-slot wall)
    pool_max = concurrency if isinstance(concurrency, int) else concurrency[1]
    nblocks = max(pool_max, -(-replicas * len(tbl) // 1_250_000))
    # round up to a multiple of the pool so the last wave runs full
    # (64 tasks over 12 actors leaves 8 actors idle for a whole task)
    nblocks = -(-nblocks // pool_max) * pool_max
    import functools

    partial = rd.range(replicas, override_num_blocks=min(nblocks, replicas)).map_batches(
        functools.partial(
            fused_zonal_map,
            table_ref=ray.put(tbl),
            index_ref=_admin_index_ref(),
            weights_ref=_weights_ref(),
            stride=len(tbl),
        ),
        batch_format="pyarrow",
        batch_size=None,  # whole block per call: ONE collapsed partial
        # table (<= key cardinality rows) ships per task; task size is set
        # by nblocks above (~1-2s), not by batch_size
        concurrency=pool_max if isinstance(concurrency, int) else None,
    )
    # Final merge, selected by partial volume (tasks x key cardinality):
    # below ~5M rows a single-task vectorized reduce replaces the
    # bucketed-shuffle machinery — the groupby path costs ~4.7s of
    # barrier + tiny-task dispatch constants on key-cardinality data
    # (measured 30% of the 16-slot wall).  Past the bound (wide clusters,
    # high-cardinality keys) _merge_partials shuffles on fixed buckets,
    # NEVER Ray's native sort-based aggregate (per-row sort cost over
    # every partial row — measured 65s CPU vs the workers' own 36s).
    specs = [(o, parse_ops([o])[0]) for o in (ops or DEFAULT_OPS)]
    names = build_admin_table()["admin_id"].combine_chunks()
    single_task_merge = nblocks * len(names) <= merge_bound

    def finalize(batch: "pa.Table") -> "pa.Table":
        import numpy as np

        sum_v = batch["sum_v"].to_numpy()
        cnt = batch["cnt"].to_numpy()
        sum_w = batch["sum_w"].to_numpy()
        sum_wv = batch["sum_wv"].to_numpy()
        idx = pa.compute.cast(batch["admin_idx"], "int64")
        cols = {"admin_id": names.take(idx)}
        with np.errstate(divide="ignore", invalid="ignore"):
            for raw, spec in specs:
                v = {
                    "mean": sum_v / cnt,
                    "sum": sum_v,
                    "count": cnt,
                    "min": batch["min_v"].to_numpy(),
                    "max": batch["max_v"].to_numpy(),
                    "weighted_sum": sum_wv,
                    "weighted_mean": sum_wv / sum_w,
                    "area_weighted_sum": sum_wv / cnt,
                }[spec.name]
                cols[raw] = pa.array(v)
        return pa.table(cols)

    # final order: the result is key-cardinality sized (~1k rows), so a
    # single-partition Arrow sort replaces Ray's distributed sort (sample
    # + 2 task waves of barrier machinery — ~1s of constants on tiny data)
    def reduce_finalize_sort(t: "pa.Table") -> "pa.Table":
        from geoglue_ray.stages.zonal import reduce_partials

        return finalize(reduce_partials(t, ["admin_idx"])).sort_by(
            [("admin_id", "ascending")]
        )

    if single_task_merge:
        return partial.repartition(1).map_batches(
            reduce_finalize_sort, batch_format="pyarrow"
        )
    merged = _merge_partials(partial, ["admin_idx"])
    return (
        merged.map_batches(finalize, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: t.sort_by([("admin_id", "ascending")]), batch_format="pyarrow"
        )
    )


def skewed_zonal(
    sf_dir: str,
    replicas: int = 1,
    concurrency: int | tuple[int, int] = (1, 8),
    salt: int | None = None,
    batch_size: int = 16384,
    hot_lon: float = 104.1875,
    hot_lat: float = 12.1875,
) -> rd.Dataset:
    """Hot-cell (mega-city) skew fixture for the salting path: every ODD
    replica shard teleports all its documents onto one interior point, so
    ~half of the whole corpus lands in a single admin unit — the
    north_star's "skewed mega-cells (cities, coastlines)" shape, far more
    extreme than real skew.  Runs the standard assign -> zonal_aggregate
    path so ``salt=k`` exercises stages/zonal's two-level salted merge;
    results are bit-identical salted or unsalted (integer-valued partial
    sums; asserted in tests/test_salting.py and in bench).

    Scale note (measured, see BASELINE.md): per-task partial collapse
    already absorbs ROW skew — every map task emits at most one partial
    row per key regardless of how many rows hit that key — so the hot
    key's extra load reaches the merge only as one row per source batch.
    Salting spreads those rows over k first-level reducers; it buys merge
    headroom, not map time.
    """
    import pyarrow.parquet as pq

    stride = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    # TWO fixed actor pools run concurrently here (replica expansion +
    # spatial join): split an integer budget ~1/3 : 2/3 so their SUM stays
    # within the session's CPUs — two full-size fixed pools oversubscribe
    # the scheduler and starve the join stage (measured: bench hung at
    # 24+24 actors on 32 slots; CLAUDE.md fixed-pool lesson).
    if isinstance(concurrency, int):
        derive_pool: int | tuple[int, int] = max(1, concurrency // 3)
        join_pool: int | tuple[int, int] = max(1, concurrency - concurrency // 3)
    else:
        derive_pool = join_pool = concurrency
    ds = read_corpus(
        sf_dir, replicas=replicas, with_spans=False, concurrency=derive_pool
    )

    def teleport(b):
        import numpy as np
        import pyarrow as pa

        ids = b["doc_id"].to_numpy()
        hot = ((ids // stride) % 2).astype(bool)
        lon = np.where(hot, hot_lon, b["lon"].to_numpy())
        lat = np.where(hot, hot_lat, b["lat"].to_numpy())
        # project to the aggregate's needs here — carrying text through
        # the join+shuffle would 10x the in-flight payload for nothing
        return pa.table(
            {"lon": pa.array(lon), "lat": pa.array(lat), "value": b["value"]}
        )

    ds = ds.map_batches(teleport, batch_format="pyarrow")
    ds = ds.map_batches(encode_cells, batch_format="pyarrow")
    ds = spatial_join(
        ds,
        index_ref=_admin_index_ref(),
        weights_ref=_weights_ref(),
        emit_names=False,
        concurrency=join_pool,
    )
    return zonal_aggregate(
        ds,
        ["mean", "sum", "count", "weighted_mean", "weighted_sum"],
        keys=["admin_idx"],
        weight_col="weight",
        salt=salt,
        batch_size=batch_size,
    ).sort("admin_idx")


def zonal_pipeline(
    sf_dir: str,
    ops: list[str] | None = None,
    replicas: int = 1,
    with_spans: bool = False,
    concurrency: int | tuple[int, int] = (1, 8),
    derive_concurrency: int | tuple[int, int] | None = None,
) -> rd.Dataset:
    """Full zonal-stats pipeline; returns (admin_id, <op columns>) sorted.

    The shuffle is keyed on the integer ``admin_idx``; the admin_id string
    is attached only to the ~N_ADMIN2-row aggregate result (narrow-shuffle
    principle — never move strings the key pool already knows).  Spans are
    NOT materialized here (prune-at-the-read: the aggregate never reads
    them); span-preserving flows use ``corpus_with_admin`` directly.
    """
    ds = corpus_with_admin(
        sf_dir,
        replicas=replicas,
        with_spans=with_spans,
        concurrency=concurrency,
        with_weights=True,
        emit_names=False,
        derive_concurrency=derive_concurrency,
    )
    out = zonal_aggregate(ds, ops or DEFAULT_OPS, keys=["admin_idx"], weight_col="weight")
    names = build_admin_table()["admin_id"].combine_chunks()

    def attach_names(b: rd.Dataset) -> "rd.Dataset":
        idx = b["admin_idx"]
        b = b.drop_columns(["admin_idx"])
        import pyarrow as pa

        return b.add_column(0, "admin_id", names.take(pa.compute.cast(idx, "int64")))

    return out.map_batches(attach_names, batch_format="pyarrow").sort("admin_id")
