"""Assembles the query inventory for __spark_entry__.py.

QUERIES: name -> (spark, sf_dir) -> DataFrame
ORACLE_SQL: name -> DuckDB-runnable SQL on the same tables (omitted for
non-SQL-expressible operators — the driver then records rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import analytics as A
from . import llm as L
from . import tpch as T
from .io import load_table

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # pipeline-parity operators (SURVEY.md §2)
    "events_filter_project": A.q_events_filter_project,
    "events_enrich": A.q_events_enrich,
    "argmin_dedup": A.q_argmin_dedup,
    "events_per_hour": A.q_events_per_hour,
    "key_encode": A.q_key_encode,
    "json_extract": A.q_json_extract,
    "access_log_parse": A.q_access_log_parse,
    # batch analytics (SURVEY.md §7 Phase 5)
    "q1_pricing_summary": A.q1_pricing_summary,
    "q3_top_revenue_orders": A.q3_top_revenue_orders,
    "q5_region_revenue": A.q5_region_revenue,
    "top_parts_per_brand": A.q_top_parts_per_brand,
    "sessionize": A.q_sessionize,
    "user_daily": A.q_user_daily,
    "q4_order_priority": A.q4_order_priority,
    "q6_revenue_delta": A.q6_revenue_delta,
    "q7_nation_volume": A.q7_nation_volume,
    "q10_returned_customers": A.q10_returned_customers,
    "customers_no_orders": A.q_customers_no_orders,
    "rollup_revenue": A.q_rollup_revenue,
    "value_percentiles": A.q_value_percentiles,
    "asof_latest_order": A.q_asof_latest_order,
    "range_join_order_week": A.q_range_join_order_week,
    "normalize_abbreviate": A.q_normalize_abbreviate,
    "event_type_pivot": A.q_event_type_pivot,
    "active_buyer_overlap": A.q_active_buyer_overlap,
    "moving_avg": A.q_moving_avg,
    "salted_hot_key_join": A.q_salted_hot_key_join,
    "cube_activity": A.q_cube_activity,
    "full_outer_reconcile": A.q_full_outer_reconcile,
    "lineitem_unpivot": A.q_lineitem_unpivot,
    "events_profile": A.q_events_profile,
    "trending_topk": A.q_trending_topk,
    "gap_fill_locf": A.q_gap_fill_locf,
    "gap_fill_interpolate": A.q_gap_fill_interpolate,
    "funnel": A.q_funnel,
    "retention_cohorts": A.q_retention_cohorts,
    "anomaly_zscore": A.q_anomaly_zscore,
    "event_transitions": A.q_event_transitions,
    "value_histogram": A.q_value_histogram,
    "sample_per_key": A.q_sample_per_key,
    # remaining TPC-H shapes (plans/tpch.py): correlated subqueries,
    # semi/anti chains, disjunctive predicates, distributions, ratios
    "q2_min_cost_part": T.q2_min_cost_part,
    "q8_market_share": T.q8_market_share,
    "q9_product_profit": T.q9_product_profit,
    "q11_important_parts": T.q11_important_parts,
    "q12_priority_class": T.q12_priority_class,
    "q13_order_distribution": T.q13_order_distribution,
    "q14_promo_revenue": T.q14_promo_revenue,
    "q15_top_supplier": T.q15_top_supplier,
    "q16_supplier_part_count": T.q16_supplier_part_count,
    "q17_small_qty_revenue": T.q17_small_qty_revenue,
    "q18_large_volume_customers": T.q18_large_volume_customers,
    "q19_disjunctive_revenue": T.q19_disjunctive_revenue,
    "q20_promo_part_suppliers": T.q20_promo_part_suppliers,
    "q21_sole_returner": T.q21_sole_returner,
    "q22_idle_customers": T.q22_idle_customers,
    # LLM-training-data pipeline (project brief / SURVEY.md §7 Phase 5)
    "dedup_exact": L.q_dedup_exact,
    "dedup_ngram_jaccard": L.q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": L.q_dedup_minhash_lsh,
    "dedup_simhash": L.q_dedup_simhash,
    "dedup_levenshtein": L.q_dedup_levenshtein,
    "dedup_clusters": L.q_dedup_clusters,
    "curation_pipeline": L.q_curation_pipeline,
    "similarity_topk": L.q_similarity_topk,
    "similarity_lsh_topk": L.q_similarity_lsh_topk,
    "similarity_ivf_topk": L.q_similarity_ivf_topk,
    "embedding_near_dup": L.q_embedding_near_dup,
    "text_token_stats": L.q_text_token_stats,
    "text_quality": L.q_text_quality,
    "lang_id": L.q_lang_id,
    "doc_fingerprint": L.q_doc_fingerprint,
    "winnow_fingerprints": L.q_winnow_fingerprints,
    "multimodal_features": L.q_multimodal_features,
    "decontaminate": L.q_decontaminate,
    "stratified_split": L.q_stratified_split,
    "split_report": L.q_split_report,
    "pii_redact": L.q_pii_redact,
    "repetition_stats": L.q_repetition_stats,
    "word_topk": L.q_word_topk,
    "mixture_sample": L.q_mixture_sample,
    "tfidf_topterms": L.q_tfidf_topterms,
}

ORACLE_SQL: dict[str, str] = {
    "events_filter_project": A.ORACLE_EVENTS_FILTER_PROJECT,
    "events_enrich": A.ORACLE_EVENTS_ENRICH,
    "argmin_dedup": A.ORACLE_ARGMIN_DEDUP,
    "events_per_hour": A.ORACLE_EVENTS_PER_HOUR,
    "key_encode": A.ORACLE_KEY_ENCODE,
    "json_extract": A.ORACLE_JSON_EXTRACT,
    "q1_pricing_summary": A.ORACLE_Q1,
    "q3_top_revenue_orders": A.ORACLE_Q3,
    "q5_region_revenue": A.ORACLE_Q5,
    "top_parts_per_brand": A.ORACLE_TOP_PARTS,
    "sessionize": A.ORACLE_SESSIONIZE,
    "user_daily": A.ORACLE_USER_DAILY,
    "access_log_parse": A.ORACLE_ACCESS_LOG_PARSE,
    "q4_order_priority": A.ORACLE_Q4,
    "q6_revenue_delta": A.ORACLE_Q6,
    "q7_nation_volume": A.ORACLE_Q7,
    "q10_returned_customers": A.ORACLE_Q10,
    "customers_no_orders": A.ORACLE_CUSTOMERS_NO_ORDERS,
    "rollup_revenue": A.ORACLE_ROLLUP_REVENUE,
    "value_percentiles": A.ORACLE_VALUE_PERCENTILES,
    "asof_latest_order": A.ORACLE_ASOF_LATEST_ORDER,
    "range_join_order_week": A.ORACLE_RANGE_JOIN_ORDER_WEEK,
    "normalize_abbreviate": A.ORACLE_NORMALIZE_ABBREVIATE,
    "event_type_pivot": A.ORACLE_EVENT_TYPE_PIVOT,
    "active_buyer_overlap": A.ORACLE_ACTIVE_BUYER_OVERLAP,
    "moving_avg": A.ORACLE_MOVING_AVG,
    "salted_hot_key_join": A.ORACLE_SALTED_HOT_KEY_JOIN,
    "cube_activity": A.ORACLE_CUBE_ACTIVITY,
    "full_outer_reconcile": A.ORACLE_FULL_OUTER_RECONCILE,
    "lineitem_unpivot": A.ORACLE_LINEITEM_UNPIVOT,
    "events_profile": A.ORACLE_EVENTS_PROFILE,
    "trending_topk": A.ORACLE_TRENDING_TOPK,
    "gap_fill_locf": A.ORACLE_GAP_FILL_LOCF,
    "gap_fill_interpolate": A.ORACLE_GAP_FILL_INTERPOLATE,
    "funnel": A.ORACLE_FUNNEL,
    "retention_cohorts": A.ORACLE_RETENTION_COHORTS,
    "anomaly_zscore": A.ORACLE_ANOMALY_ZSCORE,
    "event_transitions": A.ORACLE_EVENT_TRANSITIONS,
    "value_histogram": A.ORACLE_VALUE_HISTOGRAM,
    "sample_per_key": A.ORACLE_SAMPLE_PER_KEY,
    "q2_min_cost_part": T.ORACLE_Q2,
    "q8_market_share": T.ORACLE_Q8,
    "q9_product_profit": T.ORACLE_Q9,
    "q11_important_parts": T.ORACLE_Q11,
    "q12_priority_class": T.ORACLE_Q12,
    "q13_order_distribution": T.ORACLE_Q13,
    "q14_promo_revenue": T.ORACLE_Q14,
    "q15_top_supplier": T.ORACLE_Q15,
    "q16_supplier_part_count": T.ORACLE_Q16,
    "q17_small_qty_revenue": T.ORACLE_Q17,
    "q18_large_volume_customers": T.ORACLE_Q18,
    "q19_disjunctive_revenue": T.ORACLE_Q19,
    "q20_promo_part_suppliers": T.ORACLE_Q20,
    "q21_sole_returner": T.ORACLE_Q21,
    "q22_idle_customers": T.ORACLE_Q22,
    "dedup_exact": L.ORACLE_DEDUP_EXACT,
    "dedup_ngram_jaccard": L.ORACLE_DEDUP_NGRAM_JACCARD,
    "dedup_levenshtein": L.ORACLE_DEDUP_LEVENSHTEIN,
    "dedup_clusters": L.ORACLE_DEDUP_CLUSTERS,
    "curation_pipeline": L.ORACLE_CURATION_PIPELINE,
    "similarity_topk": L.ORACLE_SIMILARITY_TOPK,
    "embedding_near_dup": L.ORACLE_EMBEDDING_NEAR_DUP,
    "text_token_stats": L.ORACLE_TEXT_TOKEN_STATS,
    "text_quality": L.ORACLE_TEXT_QUALITY,
    "lang_id": L.ORACLE_LANG_ID,
    "doc_fingerprint": L.ORACLE_DOC_FINGERPRINT,
    "decontaminate": L.ORACLE_DECONTAMINATE,
    "stratified_split": L.ORACLE_STRATIFIED_SPLIT,
    "split_report": L.ORACLE_SPLIT_REPORT,
    "pii_redact": L.ORACLE_PII_REDACT,
    "repetition_stats": L.ORACLE_REPETITION_STATS,
    "word_topk": L.ORACLE_WORD_TOPK,
    "mixture_sample": L.ORACLE_MIXTURE_SAMPLE,
    "tfidf_topterms": L.ORACLE_TFIDF_TOPTERMS,
    # rows-only (no oracle): dedup_minhash_lsh, dedup_simhash,
    # similarity_lsh_topk, winnow_fingerprints, multimodal_features
}
