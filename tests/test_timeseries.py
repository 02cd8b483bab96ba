"""Unit gates for the time-series battery (OHLC bars, time-weighted
average, winsorize, grouping sets, MAD outliers) on tiny hand-built
frames where the right answer is computable by eye. The DuckDB oracle
covers the same queries at sf0.01; these pin the semantics (tie-breaks,
weighting, clamp bounds) independent of the testdata distribution.
"""

from __future__ import annotations

import datetime as dt

from dwds_livestream_spark.plans import analytics as A


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_ohlc_open_close_tie_break(spark, tmp_path, monkeypatch):
    # two events share the opening timestamp -> open comes from the
    # lower event_id; close from the max (ts, event_id).
    df = _events(
        spark,
        [
            (2, _ts("2024-01-01 10:00:00"), 1, "click", 20.0),
            (1, _ts("2024-01-01 10:00:00"), 1, "click", 10.0),
            (3, _ts("2024-01-01 10:30:00"), 1, "click", 5.0),
            (4, _ts("2024-01-01 10:59:00"), 1, "click", 15.0),
        ],
    )
    monkeypatch.setattr(A, "_t", lambda spark, sf, name: df)
    [bar] = A.q_ohlc_bars(spark, "unused").collect()
    assert (bar.open, bar.high, bar.low, bar.close, bar.n_events) == (
        10.0, 20.0, 5.0, 15.0, 4,
    )


def test_time_weighted_avg_duration_weighting(spark, monkeypatch):
    # value 10 held 30 min, value 90 held 10 min -> twa = (10*3 + 90)/4
    df = _events(
        spark,
        [
            (1, _ts("2024-01-01 00:00:00"), 7, "m", 10.0),
            (2, _ts("2024-01-01 00:30:00"), 7, "m", 90.0),
            (3, _ts("2024-01-01 00:40:00"), 7, "m", 0.0),  # terminal, unweighted
        ],
    )
    monkeypatch.setattr(A, "_t", lambda spark, sf, name: df)
    [row] = A.q_time_weighted_avg(spark, "unused").collect()
    assert row.user_id == 7
    assert row.twa == 30.0
    assert row.n_segments == 2
    assert row.span_us == 40 * 60 * 1_000_000


def test_winsorize_clamps_to_band(spark, monkeypatch):
    # 11 values 0..100 by 10: p05 = 5.0, p95 = 95.0 (linear interp).
    rows = [
        (i, _ts("2024-01-01 00:00:00"), 1, "m", float(i * 10)) for i in range(11)
    ]
    df = _events(spark, rows)
    monkeypatch.setattr(A, "_t", lambda spark, sf, name: df)
    [row] = A.q_winsorize(spark, "unused").collect()
    assert (row.p05, row.p95) == (5.0, 95.0)
    assert row.mean_raw == 50.0
    # clamped: 0->5 and 100->95 shift the sum by 0 net -> mean unchanged
    assert row.mean_winsorized == 50.0


def test_grouping_sets_flags_and_totals(spark, monkeypatch):
    df = _events(
        spark,
        [
            (1, _ts("2024-01-01 00:00:00"), 1, "a", 1.0),
            (2, _ts("2024-01-02 00:00:00"), 1, "b", 2.0),
        ],
    )
    monkeypatch.setattr(A, "_t", lambda spark, sf, name: df)
    out = A.q_grouping_sets(spark, "unused").collect()
    # 2 (type,day) + 2 type + 2 day + 1 grand total
    assert len(out) == 7
    [grand] = [r for r in out if r.g_type == 1 and r.g_day == 1]
    assert (grand.n, grand.sum_value) == (2, 3.0)


def test_mad_outliers_flags_extreme_point(spark, monkeypatch):
    # med=3, MAD=1 -> threshold 3*1.4826 = 4.4478; |100-3| flags once.
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    df = _events(
        spark,
        [(i, _ts("2024-01-01 00:00:00"), 1, "m", v) for i, v in enumerate(vals)],
    )
    monkeypatch.setattr(A, "_t", lambda spark, sf, name: df)
    [row] = A.q_mad_outliers(spark, "unused").collect()
    assert (row.med, row.mad, row.n, row.n_outliers) == (3.0, 1.0, 5, 1)


def test_cdc_apply_last_write_wins_and_delete(spark, monkeypatch):
    df = _events(
        spark,
        [
            (1, _ts("2024-01-01 00:00:00"), 1, "a", 50.0),
            (2, _ts("2024-01-01 00:01:00"), 1, "a", 70.0),   # wins for (1,a)
            (3, _ts("2024-01-01 00:00:00"), 2, "a", 60.0),
            (4, _ts("2024-01-01 00:01:00"), 2, "a", 5.0),    # tombstone (<10)
        ],
    )
    monkeypatch.setattr(A, "_t", lambda spark, sf, name: df)
    out = {r.user_id: r.state_value for r in A.q_cdc_apply(spark, "unused").collect()}
    assert out == {1: 70.0}


def test_max_concurrency_sweep_line(spark, monkeypatch):
    # intervals [0,60) [30,90) [45,105): peak 3 open at t=45
    df = _events(
        spark,
        [
            (1, _ts("2024-01-01 00:00:00"), 1, "m", 60.0),
            (2, _ts("2024-01-01 00:00:30"), 1, "m", 60.0),
            (3, _ts("2024-01-01 00:00:45"), 1, "m", 60.0),
        ],
    )
    monkeypatch.setattr(A, "_t", lambda spark, sf, name: df)
    [row] = A.q_max_concurrency(spark, "unused").collect()
    assert row.peak_concurrency == 3
    assert row.peak_at == _ts("2024-01-01 00:00:45")


def test_activity_streaks_longest_island(spark, monkeypatch):
    # user 1 active Jan 1-3 (streak 3) and Jan 10; earliest-start tie-break
    days = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-10"]
    df = _events(
        spark,
        [(i, _ts(f"{d} 12:00:00"), 1, "m", 1.0) for i, d in enumerate(days)],
    )
    monkeypatch.setattr(A, "_t", lambda spark, sf, name: df)
    [row] = A.q_activity_streaks(spark, "unused").collect()
    assert (row.streak_days, str(row.start_day)) == (3, "2024-01-01")
