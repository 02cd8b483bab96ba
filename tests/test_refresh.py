"""TPC-H-style refresh functions (operators/refresh.py): RF1 insert,
RF2 partition-scoped delete, untouched partitions stay byte-identical,
emptied partitions disappear, idempotent re-delete."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from dwds_livestream_spark.operators.refresh import delete_keys, insert_rows


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "orders")
    df = spark.range(100).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 7).alias("o_custkey"),
        (F.col("id") % 5).cast("int").alias("bucket"),
    )
    df.write.partitionBy("bucket").parquet(path)
    return path


def _files(path):
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/bucket=*/*.parquet")
    }


def test_rf1_insert_appends(spark, table):
    new = spark.range(100, 110).select(
        F.col("id").alias("o_orderkey"),
        F.lit(0).alias("o_custkey"),
        F.lit(99).cast("int").alias("bucket"),
    )
    insert_rows(table, new, "bucket")
    tbl = spark.read.parquet(table)
    assert tbl.count() == 110
    assert tbl.where("bucket = 99").count() == 10


def test_rf2_delete_rewrites_only_touched_partitions(spark, table):
    before = _files(table)
    # keys 10 and 11 live in buckets 0 and 1 only
    keys = spark.createDataFrame([(10,), (11,)], "o_orderkey long")
    n = delete_keys(spark, table, keys, "o_orderkey", "bucket")
    assert n == 2
    tbl = spark.read.parquet(table)
    assert tbl.count() == 98
    assert tbl.where("o_orderkey IN (10, 11)").count() == 0
    after = _files(table)
    # buckets 2,3,4 files byte-untouched (same path, same mtime)
    untouched_before = {f: m for f, m in before.items()
                        if "bucket=0" not in f and "bucket=1" not in f}
    for f, m in untouched_before.items():
        assert after.get(f) == m


def test_rf2_emptied_partition_is_removed(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "k long, bucket int"
    ).write.partitionBy("bucket").parquet(path)
    keys = spark.createDataFrame([(1,), (2,)], "k long")
    delete_keys(spark, path, keys, "k", "bucket")
    tbl = spark.read.parquet(path)
    assert [r["k"] for r in tbl.collect()] == [3]
    assert not os.path.exists(f"{path}/bucket=0")


def test_rf2_is_idempotent(spark, table):
    keys = spark.createDataFrame([(20,), (21,)], "o_orderkey long")
    delete_keys(spark, table, keys, "o_orderkey", "bucket")
    count1 = spark.read.parquet(table).count()
    n2 = delete_keys(spark, table, keys, "o_orderkey", "bucket")
    assert n2 == 0  # absent keys touch nothing
    assert spark.read.parquet(table).count() == count1
