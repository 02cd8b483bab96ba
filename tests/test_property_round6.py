"""Hypothesis invariants for the round-6 operators — random inputs,
not the fixed testdata, so the distributed decompositions (bucketed
prefix-max, histogram folds, postings-list candidates) match their
naive single-machine definitions structurally rather than by data
luck (ADVICE r1 theme). Example counts kept small: every example is a
full Spark round trip."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dwds_livestream_spark.operators.intervals import interval_coverage
from dwds_livestream_spark.operators.ranking import weighted_median
from dwds_livestream_spark.operators.skyline import pareto_frontier
from dwds_livestream_spark.operators.stream_twins import (
    emit_on_change,
    watermark_late_drop,
)

import pytest

# Slow tier (pytest.ini): full-registry sweep / hypothesis suite —
# deselected from the default driver-budget run, in the release gate.
pytestmark = pytest.mark.slow

T0 = dt.datetime(2024, 1, 1)
SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --------------------------------------------------------------- watermark

arrivals = st.lists(
    st.integers(min_value=-3600, max_value=3600),  # ts offsets, seconds
    min_size=1,
    max_size=60,
)


@SET
@given(offsets=arrivals, n_buckets=st.sampled_from([1, 2, 7, 64]))
def test_watermark_any_input_matches_naive(spark, offsets, n_buckets):
    rows = [(i, T0 + dt.timedelta(seconds=s)) for i, s in enumerate(offsets)]
    df = spark.createDataFrame(rows, "arr long, ts timestamp")
    got = sorted(
        r.arr
        for r in watermark_late_drop(
            df, "arr", "ts", delay="100 seconds", n_buckets=n_buckets
        ).collect()
    )
    kept, seen = [], None
    for arr, ts in rows:
        if seen is None or ts >= seen - dt.timedelta(seconds=100):
            kept.append(arr)
        seen = ts if seen is None else max(seen, ts)
    assert got == kept


# ----------------------------------------------------------------- skyline

points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # coarse: forces ties
        st.integers(min_value=0, max_value=20),
    ),
    min_size=1,
    max_size=80,
)


@SET
@given(pts=points, n_buckets=st.sampled_from([1, 3, 64]))
def test_skyline_any_input_matches_brute_force(spark, pts, n_buckets):
    df = spark.createDataFrame(
        [(i, float(p), s) for i, (p, s) in enumerate(pts)],
        "id long, price double, size long",
    )
    got = sorted(
        r.id
        for r in pareto_frontier(
            df, "price", "size", n_buckets=n_buckets
        ).collect()
    )
    want = [
        i
        for i, (p, s) in enumerate(pts)
        if not any(
            q <= p and t >= s and (q < p or t > s) for q, t in pts
        )
    ]
    assert got == want


# --------------------------------------------------------- weighted median

pairs = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),  # value (as double)
        st.integers(min_value=1, max_value=9),  # weight
    ),
    min_size=1,
    max_size=60,
)


@SET
@given(pairs=pairs)
def test_weighted_median_any_input_matches_unrolled(spark, pairs):
    df = spark.createDataFrame(
        [("g", float(v), w) for v, w in pairs], "g string, v double, w long"
    )
    got = weighted_median(df, ["g"], "v", "w").first().weighted_median
    unrolled = sorted(float(v) for v, w in pairs for _ in range(w))
    assert got == unrolled[(len(unrolled) + 1) // 2 - 1]


# ---------------------------------------------------------------- intervals

ivs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=100),
        st.integers(min_value=0, max_value=40),  # length (0 allowed)
    ),
    min_size=1,
    max_size=50,
)


def _naive_coverage(intervals):
    islands, covered = 0, 0
    cur_s = cur_e = None
    for s, e in sorted(intervals):
        if cur_s is None or s > cur_e:
            if cur_s is not None:
                covered += cur_e - cur_s
            islands += 1
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    covered += cur_e - cur_s
    return covered, islands


@SET
@given(ivs=ivs)
def test_interval_coverage_any_input_matches_naive(spark, ivs):
    rows = [("u", s, s + ln) for s, ln in ivs]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = interval_coverage(df, ["k"], "s", "e").first()
    covered, islands = _naive_coverage([(s, e) for _, s, e in rows])
    assert (got.covered, got.n_islands) == (covered, islands)


# ------------------------------------------------------------ emit-on-change

runs = st.lists(
    st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
    min_size=1,
    max_size=60,
)


@SET
@given(vals=runs)
def test_emit_on_change_any_input_matches_scan(spark, vals):
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, o long, v long")
    got = sorted(
        r.o for r in emit_on_change(df, ["k"], ["o"], ["v"]).collect()
    )
    want, prev = [], object()
    for i, v in enumerate(vals):
        if v != prev:
            want.append(i)
        prev = v
    assert got == want
