"""Hypothesis invariants for the quantile-histogram rollup and the
truncated EWMA — random inputs, not the fixed testdata, so the claims
hold structurally rather than by data luck (ADVICE r1 theme)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from dwds_livestream_spark.operators.quantile_hist import (
    histogram_rollup,
    range_quantiles,
)

import pytest

# Slow tier (pytest.ini): full-registry sweep / hypothesis suite —
# deselected from the default driver-budget run, in the release gate.
pytestmark = pytest.mark.slow

LO, HI, NBINS = 0.0, 100.0, 25
BIN_W = (HI - LO) / NBINS

values = st.lists(
    st.floats(
        min_value=-50.0, max_value=150.0,  # includes out-of-domain
        allow_nan=False, allow_infinity=False,
    ),
    min_size=1,
    max_size=120,
)


def _df(spark, vals):
    return spark.createDataFrame(
        [(f"2024-01-{(i % 28) + 1:02d} 06:00:00", float(v))
         for i, v in enumerate(vals)],
        "ts string, value double",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values)
def test_quantile_error_bounded_by_bin_width(spark, vals):
    """For IN-DOMAIN data the interpolated quantile is within one bin
    width of the exact rank statistic; N is preserved regardless."""
    hist = histogram_rollup(_df(spark, vals), lo=LO, hi=HI, n_bins=NBINS)
    assert hist.agg(F.sum("cnt")).first()[0] == len(vals)

    in_domain = [v for v in vals if LO <= v < HI]
    if not in_domain:
        return
    hist_in = histogram_rollup(
        _df(spark, in_domain), lo=LO, hi=HI, n_bins=NBINS
    )
    got = {
        r.q: r.est
        for r in range_quantiles(
            hist_in, "2024-01-01", "2024-01-28",
            qs=(0.5, 0.9), lo=LO, hi=HI, n_bins=NBINS,
        ).collect()
    }
    s = sorted(in_domain)
    for q in (0.5, 0.9):
        exact = s[math.ceil(q * len(s)) - 1]
        assert abs(got[q] - exact) <= BIN_W + 1e-9, (q, got[q], exact, s)


series = st.lists(
    st.floats(
        min_value=0.1, max_value=1000.0,
        allow_nan=False, allow_infinity=False,
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(series)
def test_ewma_matches_direct_python_kernel(spark, xs):
    """The registry EWMA equals the truncated kernel computed directly
    in Python on the same daily series (weights, lookback, rounding
    identical)."""
    from dwds_livestream_spark.plans.analytics import (
        _EWMA_LOOKBACK,
        _EWMA_W,
        q_ewma_user_value,
    )

    # one user, one value per day -> the daily aggregate is the series
    rows = [
        (1, f"2024-{(i // 28) + 1:02d}-{(i % 28) + 1:02d} 12:00:00",
         float(x))
        for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )

    import dwds_livestream_spark.plans.analytics as A

    real_t = A._t
    A._t = lambda spark, sf, name: df
    try:
        got = {
            str(r.day): r.ewma
            for r in q_ewma_user_value(spark, "synthetic").collect()
        }
    finally:
        A._t = real_t

    daily = [round(x, 6) for x in xs]
    for i, (_, ts, _v) in enumerate(rows):
        lo = max(0, i - _EWMA_LOOKBACK + 1)
        window = daily[lo : i + 1]
        ws = [_EWMA_W[i - j] for j in range(lo, i + 1)]
        want = round(
            sum(w * x for w, x in zip(ws, window)) / sum(ws), 6
        )
        day = ts.split(" ")[0]
        assert abs(got[day] - want) <= 1e-6, (day, got[day], want)
