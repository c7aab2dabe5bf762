"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship tile-grid explode on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query (the correctness
gate compares row count + schema + order-insensitive value hash at
sf0.01).

Column-name parity rule: every computed column is aliased identically
in the Spark plan and the oracle SQL. Float rule: sums accumulate in
DECIMAL and cast to DOUBLE on both sides so hashes match exactly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataset_batch_processor_spark import catalog
from dataset_batch_processor_spark.multimodal import queries as mm_queries
from dataset_batch_processor_spark.sources import jsonl as jsonl_ops
from dataset_batch_processor_spark.sources import storage as storage_ops
from dataset_batch_processor_spark.sources import tabular as tabular_ops
from dataset_batch_processor_spark.streaming import batchcheck as stream_check
from dataset_batch_processor_spark.streaming import incremental as stream_inc
from dataset_batch_processor_spark.operators import (
    analytics,
    captions as cap_ops,
    components,
    corpusstats,
    dataops,
    decontam,
    linkage,
    curation,
    dedup as dedup_ops,
    merge as merge_ops,
    mlfilter,
    pq,
    quantize,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    routing,
    search,
    similarity,
    temporal,
    textanalysis,
    textclean,
    textops,
    tiling,
)

SF0001 = "/root/testdata/sf0.001"

# Canonical parameter grid (FIXTURES.md): reference defaults
# tile=1024, overlap=0.5, padding=10 (/root/reference/start_app.py:29-31).
SPEC_DEFAULT = tiling.TileSpec(
    tile_size=1024, overlap_ratio=0.5, padding=10, caption="a photo"
)
SPEC_AUTO = tiling.TileSpec(
    tile_size=1024, overlap_ratio=0.5, padding=0, pad_option="Auto Adjust",
    save_format="JPG",
)
SPEC_NUMTILES = tiling.TileSpec(
    tile_size=0, overlap_ratio=0.0, padding=0, num_tiles=9
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tile-grid explode (G1) over sf0.001 images_meta."""
    return tiling.tile_grid(catalog.images_meta(spark, SF0001), SPEC_DEFAULT)


# ---------------------------------------------------------------- queries

def _q_tile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tiling.tile_grid(catalog.images_meta(spark, sf_dir), SPEC_DEFAULT)


def _q_tile_grid_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tiling.tile_grid(catalog.images_meta(spark, sf_dir), SPEC_AUTO)


def _q_tile_grid_numtiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tiling.tile_grid(catalog.images_meta(spark, sf_dir), SPEC_NUMTILES)


def _q_route_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    return routing.route_images(catalog.images_meta(spark, sf_dir), 1024, 0.5)


def _q_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return routing.route_counts(
        routing.route_images(catalog.images_meta(spark, sf_dir), 1024, 0.5)
    )


def _q_auto_crop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return routing.auto_crop(
        routing.route_images(catalog.images_meta(spark, sf_dir), 1024, 0.5)
    )


def _q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.dedup_lines(catalog.text_lines(spark, sf_dir), key_len=24)


def _q_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.dedup_stats(catalog.text_lines(spark, sf_dir), key_len=24)


def _q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.dedup_lines_normalized(catalog.text_lines(spark, sf_dir))


def _q_merge_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.merge_text(catalog.text_lines(spark, sf_dir))


def _q_split_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.split_chunks(catalog.text_lines(spark, sf_dir), records_per_file=50)


def _q_caption_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cap_ops.join_captions(
        catalog.images_meta(spark, sf_dir), catalog.captions(spark, sf_dir)
    )


def _q_mru_captions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cap_ops.mru_captions(catalog.caption_dict(spark, sf_dir))


def _q_caption_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cap_ops.upsert_caption(
        catalog.caption_dict(spark, sf_dir), "Brand#11", 10_000_000
    )


# Names with a green driver row in CORRECTNESS_r01/r02/r03.json
# (driver oracle, sf0.01). The driver verifies at most ~50 queries per
# round in dict-insertion order, so anything NOT in this set is
# registered first (see ``_prioritize``) until every query has a green
# driver row. Round 4: ``distinct_sketches`` was mis-listed here in r3
# (its only row ever was r1 ``err: no_oracle``; the oracle added later
# never ran) — dropped from the set so it finally fronts the window,
# together with the new round-4 queries.
_DRIVER_VERIFIED = {
    "active_customers_semi", "asof_latest_order", "asof_next_order_30d",
    "auto_crop", "brand_type_rollup", "caption_join", "caption_upsert",
    "corpus_mixture_weights", "csv_roundtrip_orders", "customer_asof_snapshot",
    "customer_cube", "customer_first_last_order", "customer_order_gaps",
    "customer_scd2_dim", "customer_upsert_merge", "customer_value_ntiles",
    "customers_without_orders", "dedup_exact_docs", "dedup_lines",
    "dedup_lines_normalized", "dedup_stats",
    "docs_bloom_decontam", "docs_bpe_tokens", "docs_cdc_chunks",
    "docs_clean_pii", "docs_decontaminate",
    "docs_dedup_keep_longest", "docs_dedup_survivors",
    "docs_dup_components", "docs_fingerprint", "docs_keyword_search",
    "docs_lang_id", "docs_length_histogram", "docs_ngram_jaccard_pairs",
    "docs_quality_score", "docs_repetition_metrics", "docs_shard_packing",
    "docs_split_counts", "docs_stratified_sample", "docs_surprisal_rank",
    "docs_tfidf_topterms", "docs_token_rarity", "docs_token_stats",
    "docs_train_val_split", "docs_weighted_sample",
    "docs_winnow_fingerprint", "dup_graph_degree_stats",
    "dup_graph_pagerank", "emb_ann_lsh_topk", "emb_cosine_topk",
    "emb_ivf_fullprobe_equiv", "emb_ivf_topk",
    "emb_label_centroids", "emb_label_knn", "emb_near_dup_components",
    "emb_near_dup_pairs", "emb_quantize_int8",
    "event_followups_within_hour", "events_anomaly_hours",
    "events_cohort_retention", "events_daily_from_hourly",
    "events_funnel", "events_gap_fill_ffill", "events_hourly",
    "events_json_extract", "events_sessionize",
    "events_sliding_active_users", "events_stream_dedup",
    "events_stream_hourly", "events_value_percentiles",
    "jsonl_roundtrip_orders", "lineitem_grouping_sets",
    "lineitem_profile", "lineitem_qty_mode", "lineitem_quantiles",
    "merge_text", "minhash_jaccard_verify", "minhash_lsh_pairs",
    "minhash_signatures", "ml_face_route", "mm_decode_meta",
    "mm_jpeg_roundtrip", "mm_png_roundtrip", "mm_resize_roundtrip",
    "mm_wav_roundtrip", "mm_webp_roundtrip",
    "mru_captions", "names_union_all", "orc_roundtrip_lineitem",
    "orders_date_parts", "orders_median_by_priority",
    "orders_quality_report", "orders_running_total",
    "orders_stream_counts",
    "orders_trailing_30d", "part_string_funcs", "partkey_set_ops",
    "parts_above_brand_avg", "priority_pivot", "q10_returned_items",
    "q13_order_distribution", "q14_promo_effect", "q15_top_supplier",
    "q17_small_qty_revenue", "q18_large_volume", "q19_disjunctive",
    "q1_pricing_summary", "q21_waiting_suppliers",
    "q22_inactive_high_balance", "q3_shipping_priority",
    "q4_order_priority", "q5_regional_revenue", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "route_counts", "route_images", "salted_event_stats",
    "simhash_signatures", "split_chunks", "tile_grid",
    "tile_grid_auto_adjust", "tile_grid_num_tiles",
    "top_customers_per_nation", "value_percentiles_sketch",
}


def _prioritize(d: dict) -> dict:
    """Return ``d`` reordered: never-driver-verified names first."""
    front = {k: v for k, v in d.items() if k not in _DRIVER_VERIFIED}
    back = {k: v for k, v in d.items() if k in _DRIVER_VERIFIED}
    front.update(back)
    return front


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # --- reference parity (SURVEY.md §2) ---
        "tile_grid": _q_tile_grid,
        "tile_grid_auto_adjust": _q_tile_grid_auto,
        "tile_grid_num_tiles": _q_tile_grid_numtiles,
        "route_images": _q_route_images,
        "route_counts": _q_route_counts,
        "auto_crop": _q_auto_crop,
        "dedup_lines": _q_dedup_lines,
        "dedup_stats": _q_dedup_stats,
        "dedup_lines_normalized": _q_dedup_normalized,
        "merge_text": _q_merge_text,
        "split_chunks": _q_split_chunks,
        "caption_join": _q_caption_join,
        "mru_captions": _q_mru_captions,
        "caption_upsert": _q_caption_upsert,
        # --- standard relational surface ---
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q3_shipping_priority": relational.q3_shipping_priority,
        "q5_regional_revenue": relational.q5_regional_revenue,
        "top_customers_per_nation": relational.top_customers_per_nation,
        "events_hourly": relational.events_hourly,
        "events_json_extract": relational.events_json_extract,
        "orders_running_total": relational.orders_running_total,
    }
    q.update(dedup_ops.QUERIES)
    q.update(components.QUERIES)
    q.update(decontam.QUERIES)
    q.update(corpusstats.QUERIES)
    q.update(similarity.QUERIES)
    q.update(textanalysis.QUERIES)
    q.update(textclean.QUERIES)
    q.update(mlfilter.QUERIES)
    q.update(merge_ops.QUERIES)
    q.update(relational2.QUERIES)
    q.update(relational3.QUERIES)
    q.update(relational4.QUERIES)
    q.update(relational5.QUERIES)
    q.update(search.QUERIES)
    q.update(quantize.QUERIES)
    q.update(temporal.QUERIES)
    q.update(curation.QUERIES)
    q.update(mm_queries.QUERIES)
    q.update(storage_ops.QUERIES)
    q.update(tabular_ops.QUERIES)
    q.update(jsonl_ops.QUERIES)
    q.update(stream_check.QUERIES)
    q.update(analytics.QUERIES)
    q.update(dataops.QUERIES)
    q.update(pq.QUERIES)
    q.update(stream_inc.QUERIES)
    q.update(linkage.QUERIES)
    return _prioritize(q)


def oracle_sql() -> dict[str, str]:
    o = {
        "tile_grid": tiling.tile_grid_sql(SPEC_DEFAULT, catalog.IMAGES_META_SQL),
        "tile_grid_auto_adjust": tiling.tile_grid_sql(
            SPEC_AUTO, catalog.IMAGES_META_SQL
        ),
        "tile_grid_num_tiles": tiling.tile_grid_sql(
            SPEC_NUMTILES, catalog.IMAGES_META_SQL
        ),
        "route_images": routing.route_images_sql(catalog.IMAGES_META_SQL, 1024, 0.5),
        "route_counts": (
            "WITH "
            + catalog.IMAGES_META_SQL
            + """
SELECT CASE WHEN (width < 1024 OR height < 1024)
              OR ((width - 1024) % 512) <> 0
              OR ((height - 1024) % 512) <> 0
            THEN 'incompatible' ELSE 'ok' END AS route,
       count(*) AS n_images
FROM images_meta GROUP BY 1
"""
        ),
        "auto_crop": routing.auto_crop_sql(catalog.IMAGES_META_SQL, 1024, 0.5),
        "dedup_lines": textops.DEDUP_LINES_SQL.format(
            text_lines_cte=catalog.TEXT_LINES_SQL, key_len=24
        ),
        "dedup_stats": textops.DEDUP_STATS_SQL.format(
            text_lines_cte=catalog.TEXT_LINES_SQL, key_len=24
        ),
        "dedup_lines_normalized": textops.DEDUP_NORMALIZED_SQL.format(
            text_lines_cte=catalog.TEXT_LINES_SQL
        ),
        "merge_text": textops.MERGE_TEXT_SQL.format(
            text_lines_cte=catalog.TEXT_LINES_SQL
        ),
        "split_chunks": textops.SPLIT_CHUNKS_SQL.format(
            text_lines_cte=catalog.TEXT_LINES_SQL, records_per_file=50
        ),
        "caption_join": cap_ops.JOIN_CAPTIONS_SQL.format(
            images_cte=catalog.IMAGES_META_SQL, captions_cte=catalog.CAPTIONS_SQL
        ),
        "mru_captions": cap_ops.MRU_CAPTIONS_SQL.format(
            caption_dict_cte=catalog.CAPTION_DICT_SQL
        ),
        "caption_upsert": cap_ops.upsert_caption_sql(
            catalog.CAPTION_DICT_SQL, "Brand#11", 10_000_000
        ),
        "q1_pricing_summary": relational.Q1_SQL,
        "q3_shipping_priority": relational.Q3_SQL,
        "q5_regional_revenue": relational.Q5_SQL,
        "top_customers_per_nation": relational.TOP_CUSTOMERS_SQL,
        "events_hourly": relational.EVENTS_HOURLY_SQL,
        "events_json_extract": relational.EVENTS_JSON_SQL,
        "orders_running_total": relational.ORDERS_RUNNING_SQL,
    }
    o.update(dedup_ops.ORACLES)
    o.update(components.ORACLES)
    o.update(decontam.ORACLES)
    o.update(corpusstats.ORACLES)
    o.update(similarity.ORACLES)
    o.update(textanalysis.ORACLES)
    o.update(textclean.ORACLES)
    o.update(mlfilter.ORACLES)
    o.update(merge_ops.ORACLES)
    o.update(relational2.ORACLES)
    o.update(relational3.ORACLES)
    o.update(relational4.ORACLES)
    o.update(relational5.ORACLES)
    o.update(search.ORACLES)
    o.update(quantize.ORACLES)
    o.update(temporal.ORACLES)
    o.update(curation.ORACLES)
    o.update(mm_queries.ORACLES)
    o.update(storage_ops.ORACLES)
    o.update(tabular_ops.ORACLES)
    o.update(jsonl_ops.ORACLES)
    o.update(stream_check.ORACLES)
    o.update(analytics.ORACLES)
    o.update(dataops.ORACLES)
    o.update(pq.ORACLES)
    o.update(stream_inc.ORACLES)
    o.update(linkage.ORACLES)
    return _prioritize(o)
