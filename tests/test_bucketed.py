"""Bucketed co-located joins (operators/bucketed.py): the join over two
co-bucketed tables must plan with ZERO Exchange — the shuffle was paid
at write time — and must match the plain join's rows."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dwds_livestream_spark.operators.bucketed import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    write_bucketed(
        orders, "b_orders", "o_custkey", buckets=8, path=str(tmp_path / "bo")
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        "o_custkey",
        buckets=8,
        path=str(tmp_path / "bc"),
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_is_shuffle_free_and_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    # force the join path a big-big join would take (no broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # the whole point of bucketing
        n_bucketed = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    assert n_bucketed == orders.join(customer, "o_custkey").count()


def test_bucket_pruning_on_key_predicate(spark, bucketed_tables):
    """Point predicates on the bucket key scan a single bucket.
    autoBucketedScan turns the bucketed layout off for scan-only plans
    (no operator needs the distribution), which also drops bucket
    pruning — pin it on, as a cluster doing point lookups would."""
    left, _ = bucketed_tables
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        df = spark.table(left).where(F.col("o_custkey") == 1)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.conf.set(conf, prev)
