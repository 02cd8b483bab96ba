"""Data-quality expectations (operators/expectations.py) and keyed
snapshot diff (operators/diff.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from dwds_livestream_spark.operators.diff import snapshot_diff
from dwds_livestream_spark.operators.expectations import (
    freshness,
    in_range,
    matches,
    not_null,
    unique,
    validate,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            Row(id=1, v=10.0, kind="view", ts="2024-01-01 10:00:00"),
            Row(id=2, v=-5.0, kind="click", ts="2024-01-02 10:00:00"),
            Row(id=2, v=3.0, kind="click", ts="2024-01-03 10:00:00"),
            Row(id=4, v=None, kind="BAD!", ts="2024-01-04 10:00:00"),
            Row(id=5, v=2000.0, kind=None, ts="2024-01-05 10:00:00"),
        ]
    ).withColumn("ts", F.to_timestamp("ts"))


def test_validate_counts_each_rule(frame):
    out = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in validate(
            frame,
            [
                not_null("v"),
                in_range("v", 0, 1000),
                matches("kind", "^[a-z]+$"),
                unique("id"),
                freshness("ts", 86400, "2024-01-05 12:00:00"),
            ],
        ).collect()
    }
    assert out["not_null(v)"] == (1, False)
    # NULL v doesn't violate range; -5 and 2000 do
    assert out["in_range[0,1000](v)"] == (2, False)
    # NULL kind doesn't violate matches; 'BAD!' does
    assert out["matches[^[a-z]+$](kind)"] == (1, False)
    # one duplicated key GROUP (id=2)
    assert out["unique(id)"] == (1, False)
    # newest row is 2h old < 1 day
    assert out["freshness[86400s@2024-01-05 12:00:00](ts)"] == (0, True)


def test_validate_freshness_violates_when_stale(frame):
    out = validate(
        frame, [freshness("ts", 3600, "2024-03-01 00:00:00")]
    ).collect()
    assert out[0]["n_violations"] == 1 and out[0]["passed"] is False


def test_validate_single_pass_for_row_rules(frame):
    """All row rules must fuse into one aggregate over one scan."""
    out = validate(
        frame, [not_null("v"), in_range("v", 0, 1000), matches("kind", "x")]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame(
        [Row(k=1, a="x", b=1.0), Row(k=2, a="y", b=2.0), Row(k=3, a="z", b=3.0)]
    )
    new = spark.createDataFrame(
        [Row(k=1, a="x", b=1.0), Row(k=2, a="y2", b=2.5), Row(k=4, a="w", b=4.0)]
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, keys=["k"]).collect()}
    assert set(out) == {2, 3, 4}  # unchanged k=1 dropped
    assert out[2]["change"] == "changed"
    assert out[2]["changed_cols"] == ["a", "b"]
    assert out[3]["change"] == "removed" and out[3]["changed_cols"] == []
    assert out[4]["change"] == "added" and out[4]["changed_cols"] == []


def test_snapshot_diff_null_safe(spark):
    old = spark.createDataFrame([(1, None), (2, "v")], "k long, a string")
    new = spark.createDataFrame([(1, None), (2, None)], "k long, a string")
    out = {r["k"]: r for r in snapshot_diff(old, new, keys=["k"]).collect()}
    # NULL == NULL is not a change; value->NULL is
    assert set(out) == {2}
    assert out[2]["changed_cols"] == ["a"]


def test_snapshot_diff_schema_mismatch_raises(spark):
    old = spark.createDataFrame([Row(k=1, a="x")])
    new = spark.createDataFrame([Row(k=1, zz="x")])
    with pytest.raises(ValueError):
        snapshot_diff(old, new, keys=["k"])
