"""Hypothesis invariants for the r11 growth batch — random inputs so
the distributed decompositions (order-free span ledger via keyed
min(batch), exact-rank conformal gate over a content-addressed split)
match their naive single-machine definitions structurally, not by
testdata luck. Example counts kept small: every example is a full
Spark round trip."""

from __future__ import annotations

import collections
import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Slow tier (pytest.ini): full-registry sweep / hypothesis suite —
# deselected from the default driver-budget run, in the release gate.
pytestmark = pytest.mark.slow


SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------------------------------------------------
# paragraph_ledger_replay vs naive first-seen ledger
# ------------------------------------------------------------------

para_words = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])

para_corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),          # batch
        st.lists(para_words, min_size=0, max_size=5),   # paragraphs
    ),
    min_size=1,
    max_size=12,
)


@SET
@given(rows=para_corpora)
def test_paragraph_ledger_matches_naive(spark, rows):
    from dwds_livestream_spark.operators.dedup import paragraph_ledger_replay

    data = [(i, b, "\n".join(ps)) for i, (b, ps) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, batch int, text string")
    got = {
        r.doc_id: (r.batch, r.n_paras, r.n_held, r.held_frac)
        for r in paragraph_ledger_replay(df, batch_col="batch").collect()
    }

    first: dict[str, int] = {}
    for _, (b, ps) in enumerate(rows):
        for p in ps:
            first[p] = min(first.get(p, 99), b)
    expect = {}
    for i, (b, ps) in enumerate(rows):
        if not ps:
            continue
        held = sum(1 for p in ps if first[p] < b)
        expect[i] = (b, len(ps), held, round(held / len(ps), 6))
    assert got == expect


# ------------------------------------------------------------------
# conformal_outlier_bounds vs naive rank arithmetic
# ------------------------------------------------------------------

conf_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),   # doc_id
        st.integers(min_value=0, max_value=1),     # group index
        st.integers(min_value=0, max_value=50),    # score
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@SET
@given(rows=conf_rows, alpha=st.sampled_from([0.05, 0.1, 0.25]))
def test_conformal_matches_naive(spark, rows, alpha):
    from dwds_livestream_spark.operators.curation import (
        conformal_outlier_bounds,
    )

    data = [(i, f"g{g}", s) for i, g, s in rows]
    df = spark.createDataFrame(data, "doc_id long, source string, n_chars int")
    got = {
        r.source: (r.n_cal, r.n_test, r.bound, r.n_flagged, r.flag_rate)
        for r in conformal_outlier_bounds(df, alpha=alpha).collect()
    }

    by: dict[str, dict[str, list]] = collections.defaultdict(
        lambda: {"cal": [], "test": []}
    )
    for i, g, s in rows:
        cal = hashlib.md5(str(i).encode()).hexdigest()[:2] < "cc"
        by[f"g{g}"]["cal" if cal else "test"].append((s, i))
    expect = {}
    for g, d in by.items():
        cal = sorted(d["cal"])
        n_cal, n_test = len(cal), len(d["test"])
        r = math.ceil((1 - alpha) * (n_cal + 1))
        bound = float(cal[r - 1][0]) if r <= n_cal else None
        flagged = (
            sum(1 for s, _ in d["test"] if s > bound)
            if bound is not None
            else 0
        )
        rate = round(flagged / n_test, 6) if n_test else None
        expect[g] = (n_cal, n_test, bound, flagged, rate)
    assert got == expect


# ------------------------------------------------------------------
# paragraph_ledger_yield vs naive curve
# ------------------------------------------------------------------


@SET
@given(rows=para_corpora)
def test_paragraph_yield_matches_naive(spark, rows):
    from dwds_livestream_spark.operators.dedup import paragraph_ledger_yield

    data = [(i, b, "\n".join(ps)) for i, (b, ps) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, batch int, text string")
    got = {
        r.batch: (r.n_docs, r.n_spans, r.n_held, r.held_frac, r.ledger_size)
        for r in paragraph_ledger_yield(df, batch_col="batch").collect()
    }

    first: dict[str, int] = {}
    for b, ps in rows:
        for p in ps:
            first[p] = min(first.get(p, 99), b)
    per: dict[int, list[int]] = {}
    docs: dict[int, set] = {}
    for i, (b, ps) in enumerate(rows):
        if not ps:
            continue
        d = per.setdefault(b, [0, 0])
        d[0] += len(ps)
        d[1] += sum(1 for p in ps if first[p] < b)
        docs.setdefault(b, set()).add(i)
    newc = collections.Counter(first.values())
    expect = {}
    led = 0
    for b in sorted(per):
        led += newc.get(b, 0)
        n_spans, n_held = per[b]
        expect[b] = (
            len(docs[b]), n_spans, n_held,
            round(n_held / n_spans, 6), led,
        )
    assert got == expect


# ------------------------------------------------------------------
# conformal_drift_gate vs naive rank arithmetic
# ------------------------------------------------------------------

gate_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),     # group index
        st.integers(min_value=0, max_value=2),     # snapshot
        st.integers(min_value=0, max_value=30),    # score
    ),
    min_size=1,
    max_size=40,
)


@SET
@given(rows=gate_rows, alpha=st.sampled_from([0.1, 0.25]))
def test_conformal_drift_gate_matches_naive(spark, rows, alpha):
    from dwds_livestream_spark.operators.curation import (
        conformal_drift_gate,
    )

    data = [(f"g{g}", s, v) for g, s, v in rows]
    df = spark.createDataFrame(
        data, "source string, snapshot int, n_chars int"
    )
    got = {
        (r.source, r.snapshot, r.next_snapshot): (
            r.n_cal, r.n_test, r.bound, r.n_flagged, r.flag_rate
        )
        for r in conformal_drift_gate(df, alpha=alpha).collect()
    }

    by: dict[tuple, list] = {}
    for g, s, v in data:
        by.setdefault((g, s), []).append(v)
    snaps = sorted({s for _, s, _ in data})
    expect = {}
    for p, np_ in zip(snaps, snaps[1:]):
        for g in {g for g, _ in by}:
            cal, test = by.get((g, p)), by.get((g, np_))
            if not cal or not test:
                continue
            cal_s = sorted(cal)
            r = math.ceil((1 - alpha) * (len(cal_s) + 1))
            bound = float(cal_s[r - 1]) if r <= len(cal_s) else None
            flagged = (
                sum(1 for v in test if v > bound)
                if bound is not None
                else 0
            )
            expect[(g, p, np_)] = (
                len(cal_s), len(test), bound, flagged,
                round(flagged / len(test), 6),
            )
    assert got == expect


# ------------------------------------------------------------------
# logbucket_quantiles vs naive exact quantiles (error-bound invariant)
# ------------------------------------------------------------------

lbq_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),          # group index
        st.integers(min_value=1, max_value=100_000),    # value
    ),
    min_size=1,
    max_size=50,
)


@SET
@given(rows=lbq_rows, sub=st.sampled_from([4, 16]))
def test_logbucket_error_bound_invariant(spark, rows, sub):
    from dwds_livestream_spark.operators.quantile_hist import (
        logbucket_quantiles,
    )

    data = [(f"g{g}", v) for g, v in rows]
    df = spark.createDataFrame(data, "source string, n_chars long")
    ps = (0.5, 0.9, 1.0)
    got = {
        (r.source, r.percentile): (r.n, r.q_est)
        for r in logbucket_quantiles(df, percentiles=ps, sub=sub).collect()
    }
    by: dict[str, list] = {}
    for g, v in data:
        by.setdefault(g, []).append(v)
    for g, vals in by.items():
        s = sorted(vals)
        for p in ps:
            n, est = got[(g, p)]
            exact = float(s[math.ceil(p * len(s)) - 1])
            assert n == len(vals)
            assert est <= exact < est * (sub + 1) / sub
