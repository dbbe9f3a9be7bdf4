"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()[name](spark, sf_dir)`` and ``oracle_sql()[name]`` are the
per-operator correctness pairs the driver hash-compares at sf0.01
(row count + schema + order-insensitive value hash). The DuckDB twin
builders live in ``tweetaggregates_spark/oracle.py`` (re-exported
here unchanged — VERDICT r11 #8).

Determinism conventions shared by every pair (SURVEY.md §7):
  * top-k / rank always carries a unique tiebreaker;
  * double sums aggregate via DECIMAL(18,6) (exact, order-independent),
    with one final cast back to DOUBLE in both engines;
  * count()/sum(bigint) cast to BIGINT in DuckDB (avoids HUGEINT);
  * row_number cast to INTEGER in DuckDB (matches Spark IntegerType);
  * window_time = window END (Query.cs:50,164); windows epoch-aligned in
    both engines (Spark ``window()`` and DuckDB ``time_bucket``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# robust against being imported from a different working directory
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from tweetaggregates_spark.plans import events as ev
from tweetaggregates_spark.plans import llm, sequence, star

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per 10-min/1-min hopping window, top-10 user_ids by
    sum(value) with counts (SURVEY §7 M0)."""
    return ev.top_users_hopping(spark, SF0001)


GATE_HEAD_R16 = [
    # Round-16 gate head (VERDICT r15 #9 — registry reorder only, no
    # semantics): the driver hash-checks the FIRST 50 entries. Block
    # 1 = every entry whose code or plan shape changed this round
    # (the recall-metric checkpoint revert, the shared-tokenize
    # datasheet layer + tokens_col operator hooks, the neardup sizes
    # restructure, the streaming pool/checkpoint fixes) so the r16
    # diff is driver-verified; block 2 = the stalest never/oldest-
    # checked rows (q5_region_revenue onward — the rotation VERDICT
    # r14 asked for and r15 deferred). Everything else keeps its
    # previous relative order behind the head.
    # -- block 1: r16-touched entries (30) --
    "dataset_card_v2_docs",
    "dataset_card_docs",
    "curated_corpus_neardup_docs",
    "curated_corpus_docs",
    "lsh_recall_docs",
    "lsh_recall_sampled_docs",
    "oph_lsh_recall_docs",
    "lsh_plan_audit",
    "ann_filtered_recall_embeddings",
    "ann_recall_ivf_embeddings",
    "ann_recall_truncated_embeddings",
    "ann_refresh_recall_embeddings",
    "contamination_docs",
    "decontaminated_docs",
    "stream_exact_dedup_docs",
    "stream_near_dedup_docs",
    "stream_cluster_split_docs",
    "snapshot_ann_ingest_embeddings",
    "incremental_ann_ivf_embeddings",
    "incremental_dedup_delta_docs",
    "incremental_dedup_docs",
    "incremental_cluster_split_docs",
    "minhash_lsh_docs",
    "minhash_lsh_capped",
    "cluster_split_docs",
    "lsh_verified_pairs",
    "dedup_clusters_docs",
    "canonical_docs",
    "bm25_topk_docs",
    "bm25_eval_contamination_docs",
    # -- block 2: stalest rows (20; q5_region_revenue onward) --
    "q5_region_revenue",
    "q6_revenue_change",
    "q9_profit_by_nation",
    "quality_classifier_bottomk_docs",
    "quality_classifier_sampled_docs",
    "quality_docs",
    "random_projection_embeddings",
    "returnflag_measures_unpivot",
    "revenue_cube",
    "revenue_rollup",
    "simhash_pairs_banded",
    "stream_quality_scores_docs",
    "temperature_sample_docs",
    "winnow_dup_pairs_capped",
    "winnow_dup_pairs_docs",
    "winnow_fingerprints_docs",
    "zipf_fit_docs",
    "incremental_cdc_trim_docs",
    "bigram_lm_quality_bcast_docs",
    "html_extract_docs",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = _queries_base()
    ordered = {k: base[k] for k in GATE_HEAD_R16}
    ordered.update((k, v) for k, v in base.items() if k not in ordered)
    return ordered


def _queries_base() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # Historical (r14/r15) ordering below — the r16 gate order is
        # GATE_HEAD_R16 above; this dict is the registry itself.
        # -- round-14 registrations (never driver-checked) --
        "incremental_cluster_split_docs": llm.incremental_cluster_split_docs,
        "bm25_topk_indexed_docs": llm.bm25_topk_indexed_docs,
        "containment_verified_pairs_docs": llm.containment_verified_pairs_docs,
        "top_users_hopping_paned": ev.top_users_hopping_paned,
        "ann_refresh_recall_embeddings": llm.ann_refresh_recall_embeddings,
        "dataset_card_v2_docs": llm.dataset_card_v2_docs,
        "stream_cluster_split_docs": llm.stream_cluster_split_docs,
        "hopping_counts_auto": ev.hopping_counts_auto,
        # -- code changed this round --
        "snapshot_ann_ingest_embeddings": llm.snapshot_ann_ingest_embeddings,
        "incremental_ann_ivf_embeddings": llm.incremental_ann_ivf_embeddings,
        "bm25_topk_docs": llm.bm25_topk_docs,
        "bm25_eval_contamination_docs": llm.bm25_eval_contamination_docs,
        # -- stalest driver rows --
        "simhash_pairs_docs": llm.simhash_pairs_docs,
        "stream_pca_embeddings": llm.stream_pca_embeddings,
        "throughput_5min": ev.throughput_5min,
        "top_event_types_tumbling": ev.top_event_types_tumbling,
        "top_orders_per_customer": star.top_orders_per_customer,
        "top_users_for_entity": ev.top_users_for_entity,
        "top_users_hopping": ev.top_users_hopping,
        "tumbling_counts": ev.tumbling_counts,
        "unimax_mixture_docs": llm.unimax_mixture_docs,
        "unimax_sample_docs": llm.unimax_sample_docs,
        "value_quantiles_by_type": ev.value_quantiles_by_type,
        "bloom_dedup_new_docs": llm.bloom_dedup_new_docs,
        "c4_filter_docs": llm.c4_filter_docs,
        "canonical_docs": llm.canonical_docs_query,
        "cdc_chunks_docs": llm.cdc_chunks_docs,
        "cdc_dup_chunks_docs": llm.cdc_dup_chunks_docs,
        "coreset_embeddings": llm.coreset_embeddings,
        "cosine_near_dups_tiled": llm.cosine_near_dups_tiled,
        "dedup_clusters_docs": llm.dedup_clusters_docs,
        "domain_quality_filter_docs": llm.domain_quality_filter_docs,
        "exact_dedup_docs": llm.exact_dedup_docs,
        "gopher_rules_docs": llm.gopher_rules_docs,
        "knn_cosine": llm.knn_cosine,
        "knn_cosine_bucketed": llm.knn_cosine_bucketed,
        "knn_cosine_quantized": llm.knn_cosine_quantized,
        "knn_rp_embeddings": llm.knn_rp_embeddings,
        "lang_id_docs": llm.lang_id_docs,
        "lsh_verified_pairs": llm.lsh_verified_pairs,
        "minhash_lsh_docs": llm.minhash_lsh_docs,
        "ngram_jaccard_docs": llm.ngram_jaccard_docs,
        "order_latency_distribution": star.order_latency_distribution,
        "order_status_pivot": star.order_status_pivot,
        "ppl_buckets_docs": llm.ppl_buckets_docs,
        "q10_returned_items": star.q10_returned_items,
        "q13_order_count_distribution": star.q13_order_count_distribution,
        "q18_large_orders": star.q18_large_orders,
        "q20_heavy_suppliers": star.q20_heavy_suppliers,
        "q21_last_shipper": star.q21_last_shipper,
        # ---- gate boundary: entries below are NOT in the
        # ---- first-50 driver hash-check block this round
        "q5_region_revenue": star.q5_region_revenue,
        "q6_revenue_change": star.q6_revenue_change,
        "q9_profit_by_nation": star.q9_profit_by_nation,
        "quality_classifier_bottomk_docs": llm.quality_classifier_bottomk_docs,
        "quality_classifier_sampled_docs": llm.quality_classifier_sampled_docs,
        "quality_docs": llm.quality_docs,
        "random_projection_embeddings": llm.random_projection_embeddings,
        "returnflag_measures_unpivot": star.returnflag_measures_unpivot,
        "revenue_cube": star.revenue_cube,
        "revenue_rollup": star.revenue_rollup,
        "simhash_pairs_banded": llm.simhash_pairs_banded_docs,
        "stream_quality_scores_docs": llm.stream_quality_scores_docs,
        "temperature_sample_docs": llm.temperature_sample_docs,
        "winnow_dup_pairs_capped": llm.winnow_dup_pairs_capped_docs,
        "winnow_dup_pairs_docs": llm.winnow_dup_pairs_docs,
        "winnow_fingerprints_docs": llm.winnow_fingerprints_docs,
        "zipf_fit_docs": llm.zipf_fit_docs,
        "lsh_recall_sampled_docs": llm.lsh_recall_sampled_docs,
        "incremental_cdc_trim_docs": llm.incremental_cdc_trim_docs,
        "bigram_lm_quality_bcast_docs": llm.bigram_lm_quality_bcast_docs,
        "ann_recall_truncated_embeddings": llm.ann_recall_truncated_embeddings,
        "html_extract_docs": llm.html_extract_docs,
        "kll_value_daily": ev.kll_value_daily,
        "kll_value_monthly_rollup": ev.kll_value_monthly_rollup,
        "media_meta_docs": llm.media_meta_docs,
        "ann_recall_ivf_embeddings": llm.ann_recall_ivf_embeddings,
        "top_retweets_shape": ev.top_retweets_shape,
        "top_users_with_examples": ev.top_users_with_examples,
        "curated_corpus_docs": llm.curated_corpus_docs,
        "cdc_trim_docs": llm.cdc_trim_docs,
        "bigram_lm_quality_docs": llm.bigram_lm_quality_docs,
        "lsh_recall_docs": llm.lsh_recall_docs,
        "acctbal_rank_percentiles": sequence.acctbal_rank_percentiles,
        "chunk_docs": llm.chunk_docs,
        "click_purchase_correlation": sequence.click_purchase_correlation,
        "cms_heavy_hitters_monthly_rollup": (
            ev.cms_heavy_hitters_monthly_rollup
        ),
        "conversion_funnel": sequence.conversion_funnel,
        "curation_funnel_docs": llm.curation_funnel_docs,
        "daily_growth_by_type": sequence.daily_growth_by_type,
        "event_type_pagerank": sequence.event_type_pagerank,
        "event_type_transitions": sequence.event_type_transitions,
        "kmv_users_daily": ev.kmv_users_daily,
        "mixture_plan_docs": llm.mixture_plan_docs,
        "pack_sequences_docs": llm.pack_sequences_docs,
        "pii_mask_docs": llm.pii_mask_docs,
        "retention_cohorts": sequence.retention_cohorts,
        "rolling_user_value_avg": sequence.rolling_user_value_avg,
        "shuffle_order_docs": llm.shuffle_order_docs,
        "split_docs": llm.split_docs,
        "stratified_sample_docs": llm.stratified_sample_docs,
        "time_weighted_value_daily": sequence.time_weighted_value_daily,
        "token_counts_docs": llm.token_counts_docs,
        "user_event_gaps": sequence.user_event_gaps,
        "user_value_skyline": sequence.user_value_skyline,
        "value_bucket_histogram": sequence.value_bucket_histogram,
        "value_ntile_quartiles": sequence.value_ntile_quartiles,
        "weighted_sample_docs": llm.weighted_sample_docs,
        "bpe_merges_docs": llm.bpe_merges_docs,
        "cms_heavy_hitters_daily": ev.cms_heavy_hitters_daily,
        "coreset_embeddings_batched": llm.coreset_embeddings_batched,
        "cosine_near_dups_banded": llm.cosine_near_dups_banded,
        "cosine_near_dups_blocked": llm.cosine_near_dups_blocked,
        "cumulative_new_users": sequence.cumulative_new_users,
        "daily_count_anomalies": ev.daily_count_anomalies,
        "dense_tumbling_counts": ev.dense_tumbling_counts,
        "url_canonical_docs": llm.url_canonical_docs,
        "lsh_plan_audit": llm.lsh_plan_audit,
        "substring_trim_docs": llm.substring_trim_docs,
        "knn_filtered_embeddings": llm.knn_filtered_embeddings,
        "ann_filtered_recall_embeddings": llm.ann_filtered_recall_embeddings,
        "lang_segments_docs": llm.lang_segments_docs,
        "bpe_token_counts_docs": llm.bpe_token_counts_docs,
        "oph_lsh_pairs_docs": llm.oph_lsh_pairs_docs,
        "oph_lsh_recall_docs": llm.oph_lsh_recall_docs,
        "quality_calibrated_docs": llm.quality_calibrated_docs,
        "corpus_diff_docs": llm.corpus_diff_docs,
        "snapshot_ingest_docs": llm.snapshot_ingest_docs,
        "dataset_card_docs": llm.dataset_card_docs,
        "stream_cdc_trim_docs": llm.stream_cdc_trim_docs,
        "knn_ivf_pq_embeddings": llm.knn_ivf_pq_embeddings,
        "knn_ivf_pq_trained_embeddings": llm.knn_ivf_pq_trained_embeddings,
        "knn_ivf_pq_refined_embeddings": llm.knn_ivf_pq_refined_embeddings,
        "dsir_weights_docs": llm.dsir_weights_docs,
        "dup_cluster_size_histogram": llm.dup_cluster_size_histogram,
        "embedding_stats": llm.embedding_stats,
        "events_profile": ev.events_profile,
        "hll_users_daily": ev.hll_users_daily,
        "hll_users_monthly_rollup": ev.hll_users_monthly_rollup,
        "incremental_dedup_docs": llm.incremental_dedup_docs,
        "incremental_exact_dedup_docs": llm.incremental_exact_dedup_docs,
        "kmeans_clusters_embeddings": llm.kmeans_clusters_embeddings,
        "knn_pq_embeddings": llm.knn_pq_embeddings,
        "label_centroids": llm.label_centroids_query,
        "latest_events_snapshot": ev.latest_events_snapshot,
        "lm_quality_docs": llm.lm_quality_docs,
        "media_frames_docs": llm.media_frames_docs,
        "media_waveform_docs": llm.media_waveform_docs,
        "q11_part_revenue_share": star.q11_part_revenue_share,
        "q12_late_priority_counts": star.q12_late_priority_counts,
        "q15_top_supplier": star.q15_top_supplier,
        "q16_supplier_counts": star.q16_supplier_counts,
        "q17_small_quantity_revenue": star.q17_small_quantity_revenue,
        "q19_disjunctive_revenue": star.q19_disjunctive_revenue,
        "q22_idle_customers": star.q22_idle_customers,
        "q2_min_cost_supplier": star.q2_min_cost_supplier,
        "q4_priority_counts": star.q4_priority_counts,
        "q7_nation_volume": star.q7_nation_volume,
        "q8_market_share": star.q8_market_share,
        "quantized_embeddings": llm.quantized_embeddings_docs,
        "revenue_grouping_sets": ev.revenue_grouping_sets,
        "semantic_dup_embeddings": llm.semantic_dup_embeddings,
        "stream_exact_dedup_docs": llm.stream_exact_dedup_docs,
        "substring_dup_docs": llm.substring_dup_docs,
        "tfidf_docs": llm.tfidf_docs,
        "hopping_counts_paned": ev.hopping_counts_paned,
        "cluster_split_docs": llm.cluster_split_docs,
        "stream_near_dedup_docs": llm.stream_near_dedup_docs,
        "ngram_containment_docs": llm.ngram_containment_docs,
        "curated_corpus_neardup_docs": llm.curated_corpus_neardup_docs,
        "user_activity_concentration": ev.user_activity_concentration,
        "value_quantile_sketch_daily": ev.value_quantile_sketch_daily,
        "value_quantile_sketch_monthly": ev.value_quantile_sketch_monthly,
        "viewers_never_erroring": ev.viewers_never_erroring,
        "vocab_docs": llm.vocab_docs,
        "winsorized_value_stats": ev.winsorized_value_stats,
        "brand_supplier_stats": star.brand_supplier_stats,
        "clickers_who_purchased": ev.clickers_who_purchased,
        "clickers_without_purchase": ev.clickers_without_purchase,
        "contamination_docs": llm.contamination_docs,
        "cosine_near_dups": llm.cosine_near_dups,
        "counts_range": ev.counts_range,
        "customers_with_orders_semi": star.customers_with_orders_semi,
        "customers_without_orders": star.customers_without_orders,
        "daily_rollup_counts": ev.daily_rollup_counts,
        "decontaminated_docs": llm.decontaminated_docs,
        "distinct_users_daily": ev.distinct_users_daily,
        "domain_stats_docs": llm.domain_stats_docs,
        "events_summary": ev.events_summary,
        "fingerprint_docs": llm.fingerprint_docs,
        "hopping_counts": ev.hopping_counts,
        "incremental_dedup_delta_docs": llm.incremental_dedup_delta_docs,
        "inverted_index_docs": llm.inverted_index_docs,
        "json_props_daily": ev.json_props_daily,
        "kmv_users_monthly_rollup": ev.kmv_users_monthly_rollup,
        "line_dedup_docs": llm.line_dedup_docs,
        "minhash_lsh_capped": llm.minhash_lsh_capped_docs,
        "normalize_docs": llm.normalize_docs,
        "pca_embeddings": llm.pca_embeddings,
        "purchase_asof_click": ev.purchase_asof_click,
        "q14_promo_revenue": star.q14_promo_revenue,
        "q1_pricing_summary": star.q1_pricing_summary,
        "q3_shipping_priority": star.q3_shipping_priority,
        "quality_classifier_docs": llm.quality_classifier_docs,
        "quality_signals_docs": llm.quality_signals_docs,
        "recent_counts": ev.recent_counts,
        "repeated_ngrams_docs": llm.repeated_ngrams_docs,
        "repetition_docs": llm.repetition_docs,
        "running_total_counts": ev.running_total_counts,
        "session_windows": ev.session_windows,
        "simhash_docs": llm.simhash_docs,
    }


from tweetaggregates_spark.oracle import oracle_sql  # noqa: E402  (driver contract re-export)
