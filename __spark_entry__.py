"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (TPC-H Q1 shape) on sf0.001.
queries()     — one callable per implemented operator (SURVEY.md §2 and
                the §7 Phase-5 analytics/LLM-pipeline layer).
oracle_sql()  — DuckDB-equivalent SQL per query; omitted entries are
                non-SQL-expressible and get the rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dwds_livestream_spark.plans import ORACLE_SQL, QUERIES  # noqa: E402
from dwds_livestream_spark.plans.analytics import q1_pricing_summary  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
