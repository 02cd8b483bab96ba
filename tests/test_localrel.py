"""local_df: Arrow-backed local relations for small driver-side tables.

The pickled-RDD path of createDataFrame(list) launches a Python worker
per partition at every scan; local_df routes through pandas/Arrow so
scans stay JVM-side. These tests pin the contract: identical schema
and rows to the plain path, positional tuple matching, empty input.
"""

from pyspark.sql import functions as F

from dwds_livestream_spark.localrel import local_df


def test_local_df_matches_plain_create(spark):
    rows = [(0, "a", [1.0, 2.0]), (1, "b", [3.0, 4.0])]
    ddl = "cell long, name string, vec array<double>"
    got = local_df(spark, rows, ddl)
    want = spark.createDataFrame(rows, ddl)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_local_df_empty(spark):
    df = local_df(spark, [], "x int, y string")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["x", "y"]


def test_local_df_broadcast_join(spark):
    pats = local_df(spark, [("a.*",), ("b.*",)], "pattern string")
    base = spark.createDataFrame(
        [("apple",), ("cherry",)], "word string"
    )
    out = base.join(
        F.broadcast(pats), F.expr("word rlike pattern"), "left_anti"
    )
    assert [r.word for r in out.collect()] == ["cherry"]
