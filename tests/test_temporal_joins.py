"""Semantic unit tests for the temporal join operators (asof, range) —
operator classes beyond the reference surface (SURVEY.md §2.4 "not
present"), exercised against hand-computed expectations.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dwds_livestream_spark.operators.asof import asof_join
from dwds_livestream_spark.operators.range_join import range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),
            (2, _ts("2024-01-01T11:00:00"), "a"),
            (3, _ts("2024-01-01T09:00:00"), "a"),
            (4, _ts("2024-01-01T10:00:00"), "b"),  # exact-tie match
            (5, _ts("2024-01-01T10:00:00"), "c"),  # key with no right rows
        ],
        "id long, ts timestamp, k string",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T09:30:00"), 100),
            ("a", _ts("2024-01-01T10:30:00"), 200),
            ("b", _ts("2024-01-01T10:00:00"), 300),
        ],
        "k string, rts timestamp, payload int",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    got = {r.id: (r.matched_ts, r.payload) for r in out.collect()}
    assert got[1] == (_ts("2024-01-01T09:30:00"), 100)  # latest <= 10:00
    assert got[2] == (_ts("2024-01-01T10:30:00"), 200)
    assert got[3] == (None, None)  # nothing earlier
    assert got[4] == (_ts("2024-01-01T10:00:00"), 300)  # inclusive
    assert got[5] == (None, None)  # left outer
    assert out.count() == 5


def test_asof_preserves_left_columns(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "a", "extra")],
        "id long, ts timestamp, k string, note string",
    )
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01T09:00:00"), 7)],
        "k string, rts timestamp, v int",
    )
    row = asof_join(left, right, on="k", left_ts="ts", right_ts="rts").first()
    assert row.note == "extra" and row.v == 7


def test_range_join_half_open_and_bins(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00")),  # == start -> in
            (2, _ts("2024-01-03T23:59:59")),  # inside
            (3, _ts("2024-01-04T00:00:00")),  # == end -> out (half-open)
            (4, _ts("2023-12-31T23:59:59")),  # before -> out
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, _ts("2024-01-01T00:00:00"), _ts("2024-01-04T00:00:00"))],
        "iid long, s timestamp, e timestamp",
    )
    # bin width much smaller than the interval: exercises multi-bin
    # explode; each pair must still appear exactly once
    out = range_join(points, intervals, "ts", "s", "e", bin_width_seconds=3600)
    rows = [(r.pid, r.iid) for r in out.collect()]
    assert sorted(rows) == [(1, 10), (2, 10)]


def test_range_join_with_equi_key(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "u1"), (2, _ts("2024-01-01T12:00:00"), "u2")],
        "pid long, ts timestamp, u string",
    )
    intervals = spark.createDataFrame(
        [("u1", _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"), 10)],
        "u string, s timestamp, e timestamp, iid long",
    )
    out = range_join(points, intervals, "ts", "s", "e", equi=["u"])
    assert [(r.pid, r.iid) for r in out.collect()] == [(1, 10)]


def test_asof_plan_single_shuffle(spark):
    """The union+window plan must shuffle once on the key — no join
    node, no cartesian/nested-loop."""
    left = spark.range(100).select(
        F.col("id").alias("lid"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        (F.col("id") % 5).alias("k"),
    )
    right = spark.range(20).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 90).alias("rts"),
        F.col("id").alias("payload"),
    )
    plan = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_gap_fill_locf_semantics(spark):
    """Gaps get the last prior observation; leading buckets exist only
    from each key's first observation; is_gap marks synthesized rows."""
    from pyspark.sql import Row

    from dwds_livestream_spark.operators.gapfill import gap_fill_locf

    df = spark.createDataFrame(
        [
            Row(k="a", ts="2024-01-01 10:15:00", v=1.0),
            Row(k="a", ts="2024-01-01 13:45:00", v=4.0),
            Row(k="b", ts="2024-01-01 11:05:00", v=9.0),
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = gap_fill_locf(
        df, ["k"], "ts", {"v": F.round(F.avg("v"), 6)}, step="hour"
    )
    rows = {
        (r.k0, r.bucket.strftime("%H")): (r.v, r.v_filled, r.is_gap)
        for r in out.collect()
    }
    # key a: spine 10..13, gaps at 11 and 12 carry 1.0 forward
    assert rows[("a", "10")] == (1.0, 1.0, False)
    assert rows[("a", "11")] == (None, 1.0, True)
    assert rows[("a", "12")] == (None, 1.0, True)
    assert rows[("a", "13")] == (4.0, 4.0, False)
    # key b: single observation, single-bucket spine
    assert rows[("b", "11")] == (9.0, 9.0, False)
    assert len(rows) == 5


def test_gap_fill_interpolate_semantics(spark):
    from pyspark.sql import Row

    from dwds_livestream_spark.operators.gapfill import gap_fill_interpolate

    df = spark.createDataFrame(
        [
            Row(k="a", ts="2024-01-01 10:00:00", v=1.0),
            Row(k="a", ts="2024-01-01 13:00:00", v=7.0),
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = gap_fill_interpolate(df, ["k"], "ts", F.avg("v"), step="hour")
    got = {r.bucket.strftime("%H"): r.v_interp for r in out.collect()}
    # linear ramp 1 -> 7 across 3 hours
    assert got == {"10": 1.0, "11": 3.0, "12": 5.0, "13": 7.0}


def test_asof_forward_nearest_later_inclusive(spark):
    import datetime as dt

    from dwds_livestream_spark.operators.asof import asof_join_forward

    def ts(s):
        return dt.datetime.fromisoformat(s)

    left = spark.createDataFrame(
        [(1, 7, ts("2024-01-01 10:00:00")),
         (2, 7, ts("2024-01-01 12:30:00")),
         (3, 8, ts("2024-01-01 10:00:00"))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, ts("2024-01-01 09:00:00"), "early"),
         (7, ts("2024-01-01 10:00:00"), "same"),   # inclusive match for id=1
         (7, ts("2024-01-01 11:00:00"), "later")],
        "k long, rts timestamp, tag string",
    )
    out = {r.id: r for r in asof_join_forward(
        left, right, on="k", left_ts="ts", right_ts="rts", payload=["tag"]
    ).collect()}
    assert out[1].tag == "same"            # ts == rts is a match
    assert out[2].tag is None              # nothing later -> left outer null
    assert out[3].tag is None              # other key untouched


# ------------------------------------------------- k-nearest preceding


def test_knearest_preceding_matches_brute_force(spark):
    import datetime as dt

    from dwds_livestream_spark.operators.range_join import (
        knearest_preceding,
    )

    base = dt.datetime(2024, 1, 1)
    # deterministic pseudo-random events across 2 users, ~6 hours
    lrows = [
        (i, i % 2, base + dt.timedelta(seconds=((i * 997) % 21600)))
        for i in range(40)
    ]
    rrows = [
        (100 + i, i % 2, base + dt.timedelta(seconds=((i * 641) % 21600)))
        for i in range(120)
    ]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(rrows, "event_id long, user_id long, ts timestamp")

    K, BOUND = 3, 1800
    got = {
        (r.event_id, r["rank"]): (r.preceding_id, r.gap_us)
        for r in knearest_preceding(
            left, right, k=K, bound_seconds=BOUND, equi=["user_id"]
        ).collect()
    }

    expected = {}
    for lid, lu, lts in lrows:
        cands = sorted(
            (
                (int((lts - rts).total_seconds() * 1_000_000), rid)
                for rid, ru, rts in rrows
                if ru == lu and rts <= lts
                and (lts - rts).total_seconds() <= BOUND
            ),
        )
        for rank, (gap, rid) in enumerate(cands[:K], start=1):
            expected[(lid, rank)] = (rid, gap)
    assert got == expected
    assert expected, "fixture must produce matches"


def test_knearest_preceding_boundaries(spark):
    import datetime as dt

    from dwds_livestream_spark.operators.range_join import (
        knearest_preceding,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, t0)], "event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, t0),                                  # ts tie: gap 0
            (11, t0 - dt.timedelta(seconds=3600)),     # exactly at bound
            (12, t0 - dt.timedelta(seconds=3601)),     # past bound: out
            (13, t0 + dt.timedelta(seconds=1)),        # future: out
            (14, t0),                                  # gap-0 tie: id order
        ],
        "event_id long, ts timestamp",
    )
    rows = sorted(
        (r["rank"], r.preceding_id, r.gap_us)
        for r in knearest_preceding(
            left, right, k=10, bound_seconds=3600
        ).collect()
    )
    assert rows == [
        (1, 10, 0),
        (2, 14, 0),
        (3, 11, 3_600_000_000),
    ]


def test_knearest_preceding_validates_args(spark):
    import pytest as _pytest

    from dwds_livestream_spark.operators.range_join import (
        knearest_preceding,
    )

    df = spark.createDataFrame([], "event_id long, ts timestamp")
    with _pytest.raises(ValueError):
        knearest_preceding(df, df, k=0, bound_seconds=10)
    with _pytest.raises(ValueError):
        knearest_preceding(df, df, k=1, bound_seconds=0)
    # ADVICE r7: a float bound in (0,1) used to truncate to w=0 AFTER
    # the guard, making every bin NULL and silently joining nothing
    with _pytest.raises(ValueError):
        knearest_preceding(df, df, k=1, bound_seconds=0.5)
    # ADVICE r8: a fractional bound >= 1 used to silently narrow
    # (2.7 -> 2, excluding rows 2.0-2.7 s back); now loud
    with _pytest.raises(ValueError):
        knearest_preceding(df, df, k=1, bound_seconds=2.7)
    # whole-valued floats remain accepted (2.0 == 2)
    knearest_preceding(df, df, k=1, bound_seconds=2.0)


def test_preceding_window_agg_matches_brute_force(spark):
    import datetime as dt

    from dwds_livestream_spark.operators.range_join import (
        preceding_window_agg,
    )

    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, i % 2, base + dt.timedelta(seconds=((i * 997) % 21600)))
        for i in range(30)
    ]
    # user 5 has no right rows at all -> guaranteed zero-match rows
    lrows.append((999, 5, base + dt.timedelta(seconds=100)))
    rrows = [
        (100 + i, i % 2, base + dt.timedelta(seconds=((i * 641) % 21600)))
        for i in range(90)
    ]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(rrows, "event_id long, user_id long, ts timestamp")

    BOUND = 1800
    got = {
        r.event_id: (r.n_preceding, r.mean_gap_us, r.min_gap_us, r.max_gap_us)
        for r in preceding_window_agg(
            left, right, bound_seconds=BOUND, equi=["user_id"]
        ).collect()
    }
    assert len(got) == len(lrows), "every left row survives (left outer)"

    saw_zero = False
    for lid, lu, lts in lrows:
        gaps = [
            int((lts - rts).total_seconds() * 1_000_000)
            for _, ru, rts in rrows
            if ru == lu and rts <= lts
            and (lts - rts).total_seconds() <= BOUND
        ]
        if not gaps:
            assert got[lid] == (0, None, None, None)
            saw_zero = True
        else:
            n, mean, mn, mx = got[lid]
            assert n == len(gaps)
            assert mn == min(gaps) and mx == max(gaps)
            assert mean == round(sum(gaps) / len(gaps), 6)
    assert saw_zero, "fixture must include zero-match left rows"


def test_knearest_following_matches_brute_force(spark):
    import datetime as dt

    from dwds_livestream_spark.operators.range_join import (
        knearest_following,
    )

    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, i % 2, base + dt.timedelta(seconds=((i * 997) % 21600)))
        for i in range(40)
    ]
    rrows = [
        (100 + i, i % 2, base + dt.timedelta(seconds=((i * 641) % 21600)))
        for i in range(120)
    ]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(rrows, "event_id long, user_id long, ts timestamp")

    K, BOUND = 3, 1800
    got = {
        (r.event_id, r["rank"]): (r.following_id, r.gap_us)
        for r in knearest_following(
            left, right, k=K, bound_seconds=BOUND, equi=["user_id"]
        ).collect()
    }

    expected = {}
    for lid, lu, lts in lrows:
        cands = sorted(
            (
                (int((rts - lts).total_seconds() * 1_000_000), rid)
                for rid, ru, rts in rrows
                if ru == lu and rts >= lts
                and (rts - lts).total_seconds() <= BOUND
            ),
        )
        for rank, (gap, rid) in enumerate(cands[:K], start=1):
            expected[(lid, rank)] = (rid, gap)
    assert got == expected
    assert expected, "fixture must produce matches"


def test_knearest_following_boundaries(spark):
    import datetime as dt

    from dwds_livestream_spark.operators.range_join import (
        knearest_following,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, t0)], "event_id long, ts timestamp")
    right = spark.createDataFrame(
        [
            (10, t0),                                # ts tie: gap 0
            (11, t0 + dt.timedelta(seconds=3600)),   # exactly at bound
            (12, t0 + dt.timedelta(seconds=3601)),   # past bound: out
            (13, t0 - dt.timedelta(seconds=1)),      # past: out
        ],
        "event_id long, ts timestamp",
    )
    rows = sorted(
        (r["rank"], r.following_id, r.gap_us)
        for r in knearest_following(
            left, right, k=10, bound_seconds=3600
        ).collect()
    )
    assert rows == [(1, 10, 0), (2, 11, 3_600_000_000)]
