"""Approximate-aggregate coverage (SURVEY.md §2.5 'not present' in the
reference; the Spark scale path for exact-but-unmergeable aggregates).

Sketches are mergeable map-side — at 100 TB these replace exact
percentile/countDistinct, whose state grows with cardinality. The gates
here pin the error envelope against the exact answers on real testdata.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dwds_livestream_spark.plans.io import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events").cache()


def test_approx_percentile_tracks_exact(spark, events):
    rows = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.9)).alias("exact"),
        F.percentile_approx("value", F.lit(0.9), F.lit(10_000)).alias("approx"),
    ).collect()
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) / max(abs(r.exact), 1e-9) < 0.02, (
            r.event_type, r.exact, r.approx
        )


def test_approx_count_distinct_tracks_exact(spark, events):
    r = events.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).first()
    assert abs(r.approx - r.exact) / r.exact < 0.05, (r.exact, r.approx)


def test_sketches_merge_across_groups(spark, events):
    """The scale property that matters: per-partition sketches merged by
    a second aggregation equal the single-pass sketch."""
    two_phase = (
        events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("acd"))
        .agg(F.sum("acd").alias("summed"))
        .first()
        .summed
    )
    exact_sum = (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("cd"))
        .agg(F.sum("cd"))
        .first()[0]
    )
    assert abs(two_phase - exact_sum) / exact_sum < 0.05
