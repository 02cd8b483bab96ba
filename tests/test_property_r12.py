"""Hypothesis invariants for the r12 growth batch — random inputs so
the max–min isotonic fit matches sequential PAV structurally (not by
fixture luck) and the sketch drift leg stays consistent with its
standalone readouts. Example counts kept small: every example is a
full Spark round trip."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Slow tier (pytest.ini): full-registry sweep / hypothesis suite —
# deselected from the default driver-budget run, in the release gate.
pytestmark = pytest.mark.slow



def _round6(x: float) -> float:
    """Spark/DuckDB ROUND semantics (HALF_UP on the exact binary
    value) — Python's banker's round diverges on exact 6-decimal ties
    (reachable here: dyadic ratios a/2^7 with a odd, e.g. a 128x
    quantile shift reads 0.0078125)."""
    return float(
        Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------------------------------------------------
# isotonic_calibration vs sequential PAV
# ------------------------------------------------------------------

# per-bin (n, pos<=n) counts over up to 6 occupied score bins
iso_bins = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),
        st.integers(min_value=0, max_value=5),
    ).map(lambda t: (t[0], min(t[0], t[1]))),
    min_size=1,
    max_size=6,
)


def _pav_loop(blocks):
    """Sequential PAV over [sum_y, weight] blocks with exact integer
    pooling decisions; returns one fitted mean per input block."""
    out = []
    sizes = []
    for pos, n in blocks:
        out.append([pos, n])
        sizes.append(1)
        while len(out) > 1 and (
            out[-2][0] * out[-1][1] >= out[-1][0] * out[-2][1]
        ):
            s, w = out.pop()
            k = sizes.pop()
            out[-1][0] += s
            out[-1][1] += w
            sizes[-1] += k
    fit = []
    for (s, w), k in zip(out, sizes):
        fit.extend([s / w] * k)
    return fit


@SET
@given(bins=iso_bins)
def test_isotonic_maxmin_matches_sequential_pav(spark, bins):
    from dwds_livestream_spark.operators.calibration import (
        isotonic_calibration,
    )

    rows = []
    for b, (n, pos) in enumerate(bins):
        for i in range(n):
            rows.append(("g", float(b + 1), 1 if i < pos else 0))
    df = spark.createDataFrame(
        rows, "source string, score double, label int"
    )
    got = sorted(
        (r.bin, r.rate_iso)
        for r in isotonic_calibration(
            df, score_col="score", label_col="label",
            group_col="source", bins=len(bins),
        ).collect()
    )
    ref = _pav_loop([(pos, n) for n, pos in bins])
    assert [iso for _, iso in got] == [_round6(x) for x in ref]
    # monotone non-decreasing by construction
    fits = [iso for _, iso in got]
    assert fits == sorted(fits)


# ------------------------------------------------------------------
# logbucket_quantile_drift vs standalone per-period readouts
# ------------------------------------------------------------------

drift_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),        # period
        st.integers(min_value=1, max_value=100_000),  # value
    ),
    min_size=2,
    max_size=30,
)


@SET
@given(rows=drift_rows)
def test_logbucket_drift_consistent_with_readouts(spark, rows):
    from dwds_livestream_spark.operators.quantile_hist import (
        logbucket_quantile_drift,
        logbucket_quantiles,
    )

    data = [("g", p, v) for p, v in rows]
    df = spark.createDataFrame(
        data, "source string, snapshot int, n_chars long"
    )
    drift = {
        (r.snapshot, r.next_snapshot, r.percentile): (
            r.n_prev, r.n_next, r.q_prev, r.q_next, r.q_ratio
        )
        for r in logbucket_quantile_drift(df).collect()
    }
    periods = sorted({p for p, _ in rows})
    per = {}
    for p in periods:
        from pyspark.sql import functions as F

        for r in logbucket_quantiles(
            df.where(F.col("snapshot") == p)
        ).collect():
            per[(p, r.percentile)] = (r.n, r.q_est)
    # pairs are exactly the consecutive OBSERVED periods
    assert {(a, b) for a, b, _ in drift} == {
        (periods[i], periods[i + 1]) for i in range(len(periods) - 1)
    }
    for (p, np_, pct), (n_prev, n_next, q_prev, q_next, ratio) in (
        drift.items()
    ):
        assert per[(p, pct)] == (n_prev, q_prev)
        assert per[(np_, pct)] == (n_next, q_next)
        assert ratio == _round6(q_next / q_prev)
        # readout bound: q_est <= exact < q_est * (sub+1)/sub
        vals = sorted(v for pp, v in rows if pp == p)
        exact = vals[math.ceil(pct * len(vals)) - 1]
        assert q_prev <= exact < q_prev * 17 / 16
