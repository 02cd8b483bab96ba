"""Assembles the query inventory for __spark_entry__.py.

QUERIES: name -> (spark, sf_dir) -> DataFrame
ORACLE_SQL: name -> DuckDB-runnable SQL on the same tables (omitted for
non-SQL-expressible operators — the driver then records rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import analytics as A
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
    # batch analytics (SURVEY.md §7 Phase 5)
    "q1_pricing_summary": A.q1_pricing_summary,
    "q3_top_revenue_orders": A.q3_top_revenue_orders,
    "q5_region_revenue": A.q5_region_revenue,
    "top_parts_per_brand": A.q_top_parts_per_brand,
    "sessionize": A.q_sessionize,
    "user_daily": A.q_user_daily,
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
}
