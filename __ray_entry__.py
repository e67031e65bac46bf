"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship zonal-stats pipeline on sf0.001;
``queries()`` exposes one named pipeline per implemented operator
(SURVEY.md §2); ``oracle_sql()`` gives the bit-exact DuckDB equivalent for
every SQL-expressible query (see geoglue_ray/fixtures.py for why float
results match exactly).  Ray is initialised by the caller — nothing here
calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: interleaved corpus -> spatial join -> zonal stats (sf0.001)."""
    from geoglue_ray.pipelines.zonal import zonal_pipeline

    return zonal_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from geoglue_ray.pipelines import queries as q

    from geoglue_ray.pipelines import raster as r

    return {
        "corpus_derive": q.corpus_derive,
        "spatial_join": q.spatial_join_query,
        "knn_outside": q.knn_outside,
        "zonal_stats": q.zonal_stats,
        "zonal_stats_admin1": q.zonal_stats_admin1,
        "events_zonal": q.events_zonal,
        "daily_admin1": q.daily_admin1,
        "weekly_events": q.weekly_events,
        "timeshift_local_daily": q.timeshift_local_daily,
        "hourly_check": q.hourly_check,
        "raster_daily": lambda sf_dir: r.raster_daily(),
        "raster_zonal": lambda sf_dir: r.raster_zonal(),
        "zonal_coverage": lambda sf_dir: r.zonal_coverage(),
        "raster_weekly_zonal": lambda sf_dir: r.raster_weekly_zonal(),
        "raster_stats": lambda sf_dir: r.raster_stats(),
        "weekly_variation": lambda sf_dir: r.weekly_variation(),
        "q1_pricing": q.q1_pricing,
        "segment_revenue": q.segment_revenue,
        "region_revenue": q.region_revenue,
        "brand_stats": q.brand_stats,
        "order_priority_revenue": q.order_priority_revenue,
        "dormant_customers": q.dormant_customers,
        "customer_order_balance": q.customer_order_balance,
        "event_funnel": q.event_funnel,
        "topk_by_admin1": q.topk_by_admin1,
        "distinct_sources": q.distinct_sources,
        "events_sessionize": q.events_sessionize,
        "user_event_paths": q.user_event_paths,
        "running_user_total": q.running_user_total,
        "session_overlaps": q.session_overlaps,
        "events_in_windows": q.events_in_windows,
        "value_share_by_type": q.value_share_by_type,
        "user_growth": q.user_growth,
        "cohort_growth": q.cohort_growth,
        "pivot_daily_events": q.pivot_daily_events,
        "melt_daily_events": q.melt_daily_events,
        "events_asof_obs": q.events_asof_obs,
        "value_bands": q.value_bands,
        "rolling_daily_admin": q.rolling_daily_admin,
        "tile_pyramid": q.tile_pyramid,
        "zorder_events": q.zorder_events,
        "quantiles_admin1": q.quantiles_admin1,
        "weighted_median_admin1": q.weighted_median_admin1,
        "value_rank_admin1": q.value_rank_admin1,
        "tfidf_top_token": q.tfidf_top_token,
        "split_assign": q.split_assign,
        "stratified_sample": q.stratified_sample,
        "pack_documents": q.pack_documents,
        "crop_bbox": q.crop_bbox,
        "resample_nearest": q.resample_nearest,
        "resample_bilinear": q.resample_bilinear,
        "resample_idw": q.resample_idw,
        "resample_sparse": q.resample_sparse,
        # training-data ops (oracle-backed)
        "token_count": q.token_count_query,
        "text_quality": q.text_quality,
        "dedup_exact": q.dedup_exact,
        "curation_pipeline": q.curation_pipeline,
        "decontaminate_docs": q.decontaminate_docs,
        "vocab_top": q.vocab_top,
        "doc_repetition": q.doc_repetition,
        "hopping_window": q.hopping_window,
        "winsorized_admin1": q.winsorized_admin1,
        "media_explode": q.media_explode,
        "media_features": q.media_features,
        "media_resize": q.media_resize,
        "media_frames": q.media_frames,
        "media_ref_parse": q.media_ref_parse,
        "embed_knn": q.embed_knn,
        "embed_centroids": q.embed_centroids,
        "approx_distinct_check": q.approx_distinct_check,
        "heavy_hitters_check": q.heavy_hitters_check,
        "embed_lsh_recall": q.embed_lsh_recall,
        "embed_ivf_recall": q.embed_ivf_recall,
        "embed_neardup_recall": q.embed_neardup_recall,
        # training-data ops (rows-only: not SQL-expressible)
        "lang_id": q.lang_id,
        "doc_fingerprint": q.doc_fingerprint,
        "minhash_neardup": q.minhash_neardup,
        "dedup_clusters": q.dedup_clusters,
        "dedup_corpus": q.dedup_corpus,
        "simhash_neardup": q.simhash_neardup,
        "ngram_neardup": q.ngram_neardup,
        "embed_knn_lsh": q.embed_knn_lsh,
        "embed_knn_ivf": q.embed_knn_ivf,
        "embed_neardup": q.embed_neardup,
        # oracle-backed again since round 4 (KMV bottom-k replaces HLL here;
        # HLL stays driver-gated via approx_distinct_check)
        "approx_distinct_users": q.approx_distinct_users,
    }


def oracle_sql() -> dict[str, str]:
    from geoglue_ray import oracles as o

    return {
        "corpus_derive": o.corpus_derive(),
        "spatial_join": o.spatial_join(),
        "knn_outside": o.knn_outside(),
        "zonal_stats": o.zonal_stats(),
        "zonal_stats_admin1": o.zonal_stats_admin1(),
        "events_zonal": o.events_zonal(),
        "daily_admin1": o.daily_admin1(),
        "weekly_events": o.weekly_events(),
        "timeshift_local_daily": o.timeshift_local_daily(),
        "hourly_check": o.hourly_check(),
        "raster_daily": o.raster_daily(),
        "raster_zonal": o.raster_zonal(),
        "zonal_coverage": o.zonal_coverage(),
        "raster_weekly_zonal": o.raster_weekly_zonal(),
        "raster_stats": o.raster_stats(),
        "weekly_variation": o.weekly_variation(),
        "q1_pricing": o.q1_pricing(),
        "segment_revenue": o.segment_revenue(),
        "region_revenue": o.region_revenue(),
        "brand_stats": o.brand_stats(),
        "order_priority_revenue": o.order_priority_revenue(),
        "dormant_customers": o.dormant_customers(),
        "customer_order_balance": o.customer_order_balance(),
        "event_funnel": o.event_funnel(),
        "topk_by_admin1": o.topk_by_admin1(),
        "distinct_sources": o.distinct_sources(),
        "events_sessionize": o.events_sessionize(),
        "user_event_paths": o.user_event_paths(),
        "running_user_total": o.running_user_total(),
        "session_overlaps": o.session_overlaps(),
        "events_in_windows": o.events_in_windows(),
        "value_share_by_type": o.value_share_by_type(),
        "user_growth": o.user_growth(),
        "cohort_growth": o.cohort_growth(),
        "pivot_daily_events": o.pivot_daily_events(),
        "melt_daily_events": o.melt_daily_events(),
        "events_asof_obs": o.events_asof_obs(),
        "value_bands": o.value_bands(),
        "rolling_daily_admin": o.rolling_daily_admin(),
        "tile_pyramid": o.tile_pyramid(),
        "zorder_events": o.zorder_events(),
        "quantiles_admin1": o.quantiles_admin1(),
        "weighted_median_admin1": o.weighted_median_admin1(),
        "value_rank_admin1": o.value_rank_admin1(),
        "tfidf_top_token": o.tfidf_top_token(),
        "split_assign": o.split_assign(),
        "stratified_sample": o.stratified_sample(),
        "pack_documents": o.pack_documents(),
        "embed_neardup_recall": o.embed_neardup_recall(),
        "crop_bbox": o.crop_bbox(),
        "resample_nearest": o.resample_nearest(),
        "resample_bilinear": o.resample_bilinear(),
        "resample_idw": o.resample_idw(),
        "resample_sparse": o.resample_sparse(),
        "token_count": o.token_count(),
        "text_quality": o.text_quality(),
        "dedup_exact": o.dedup_exact(),
        "curation_pipeline": o.curation_pipeline(),
        "decontaminate_docs": o.decontaminate_docs(),
        "vocab_top": o.vocab_top(),
        "doc_repetition": o.doc_repetition(),
        "hopping_window": o.hopping_window(),
        "winsorized_admin1": o.winsorized_admin1(),
        "media_explode": o.media_explode(),
        "media_features": o.media_features(),
        "media_resize": o.media_resize(),
        "media_frames": o.media_frames(),
        "media_ref_parse": o.media_ref_parse(),
        "embed_knn": o.embed_knn(),
        "embed_centroids": o.embed_centroids(),
        "lang_id": o.lang_id(),
        "doc_fingerprint": o.doc_fingerprint(),
        "simhash_neardup": o.simhash_neardup(),
        "ngram_neardup": o.ngram_neardup(),
        "approx_distinct_check": o.approx_distinct_check(),
        "heavy_hitters_check": o.heavy_hitters_check(),
        "embed_lsh_recall": o.embed_lsh_recall(),
        "embed_ivf_recall": o.embed_ivf_recall(),
        "minhash_neardup": o.minhash_neardup(),
        "dedup_clusters": o.dedup_clusters(),
        "dedup_corpus": o.dedup_corpus(),
        "approx_distinct_users": o.approx_distinct_users(),
    }
