"""operators/ranking.distributed_rank — exact parity with the global
window it replaces (VERDICT r1 #2/#4), across directions, tie shapes,
and bucket counts (including degenerate n_buckets > n_rows)."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from dwds_livestream_spark.operators.ranking import (
    distributed_rank,
    ntile_from_rank,
)


@pytest.fixture(scope="module")
def frame(spark):
    # values with heavy ties (v repeats) and a unique tiebreaker id
    rows = [(i, float((i * 7) % 13)) for i in range(1, 501)]
    return spark.createDataFrame(rows, "id long, v double")


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("n_buckets", [1, 4, 32, 1000])
def test_rank_matches_global_window(frame, descending, n_buckets):
    order = [
        F.col("v").desc() if descending else F.col("v").asc(),
        F.col("id").asc(),
    ]
    expected = {
        r["id"]: r["rn"]
        for r in frame.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("rn")
        ).collect()
    }
    got = {
        r["id"]: r["rn"]
        for r in distributed_rank(
            frame,
            "v",
            descending=descending,
            tiebreakers=[F.col("id").asc()],
            n_buckets=n_buckets,
        ).collect()
    }
    assert got == expected


def test_total_col_attached(frame):
    out = distributed_rank(frame, "v", total_col="n").select("n").first()
    assert out["n"] == 500


@pytest.mark.parametrize("n", [1, 7, 9, 10, 500])
def test_ntile_from_rank_matches_sql_ntile(spark, n):
    df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
    got = df.select(
        "rn", ntile_from_rank(F.col("rn"), F.lit(n).cast("long"), 10).alias("t")
    )
    expected = spark.range(1, n + 1).select(
        F.col("id").alias("rn"),
        F.ntile(10).over(Window.orderBy("id")).alias("t"),
    )
    assert {(r.rn, r.t) for r in got.collect()} == {
        (r.rn, r.t) for r in expected.collect()
    }


def test_rank_plan_has_no_unpartitioned_window(frame):
    df = distributed_rank(frame, "v", tiebreakers=[F.col("id").asc()])
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "__bucket#" in line


def test_rrf_fuse_orders_by_reciprocal_rank_sum(spark):
    from pyspark.sql import Row

    from dwds_livestream_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [Row(doc_id=1, rank=1), Row(doc_id=2, rank=2), Row(doc_id=3, rank=3)]
    )
    sem = spark.createDataFrame(
        [Row(doc_id=3, rank=1), Row(doc_id=1, rank=2), Row(doc_id=9, rank=3)]
    )
    out = {r["doc_id"]: r for r in rrf_fuse([lex, sem], c=60).collect()}
    # doc 1: 1/61 + 1/62 ; doc 3: 1/63 + 1/61 ; doc 2: 1/62 ; doc 9: 1/63
    assert out[1]["rank"] == 1 and out[3]["rank"] == 2
    assert out[2]["rank"] == 3 and out[9]["rank"] == 4
    assert out[1]["n_lists"] == 2 and out[2]["n_lists"] == 1
    assert abs(out[1]["rrf_score"] - round(1 / 61 + 1 / 62, 6)) < 1e-9


def test_rrf_fuse_empty_raises(spark):
    import pytest as _pytest

    from dwds_livestream_spark.operators.retrieval import rrf_fuse

    with _pytest.raises(ValueError):
        rrf_fuse([])
