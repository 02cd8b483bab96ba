"""Python UDTF surface (operators/udtf_ops.py): lateral hour
splitting — cardinality, overlap accounting, null guards."""

from __future__ import annotations

from dwds_livestream_spark.operators.udtf_ops import HourSplit


def test_hour_split_lateral(spark):
    spark.udtf.register("hour_split", HourSplit)
    spark.sql(
        """
        SELECT * FROM VALUES
          (1, TIMESTAMP '2024-01-01 09:30:00', TIMESTAMP '2024-01-01 11:15:00'),
          (2, TIMESTAMP '2024-01-01 10:00:00', TIMESTAMP '2024-01-01 10:20:00'),
          (3, TIMESTAMP '2024-01-01 10:00:00', TIMESTAMP '2024-01-01 10:00:00'),
          (4, NULL, TIMESTAMP '2024-01-01 10:00:00')
          AS sessions(session_id, start_ts, end_ts)
        """
    ).createOrReplaceTempView("sessions")
    rows = spark.sql(
        """
        SELECT s.session_id, h.hour_start, h.seconds_in_hour
        FROM sessions s, LATERAL hour_split(s.start_ts, s.end_ts) h
        ORDER BY s.session_id, h.hour_start
        """
    ).collect()
    by_sess = {}
    for r in rows:
        by_sess.setdefault(r.session_id, []).append(
            (str(r.hour_start), r.seconds_in_hour)
        )
    # session 1 spans three clock hours: 30 min + full hour + 15 min
    assert by_sess[1] == [
        ("2024-01-01 09:00:00", 1800.0),
        ("2024-01-01 10:00:00", 3600.0),
        ("2024-01-01 11:00:00", 900.0),
    ]
    # session 2 is inside one hour
    assert by_sess[2] == [("2024-01-01 10:00:00", 1200.0)]
    # zero-length and NULL sessions emit nothing
    assert 3 not in by_sess and 4 not in by_sess
    # total seconds are conserved per session
    assert sum(s for _, s in by_sess[1]) == 6300.0
