"""Hypothesis invariants for the early r10 batch (temporal path
drift, URL novelty, grouped KS panel) — random inputs so the
distributed decompositions (distinct fold + consecutive-pair frame,
min()-as-prefix-scan, group-partitioned ECDF on a union grid) match
their naive single-machine definitions structurally, not by testdata
luck. Example counts kept small: every example is a full Spark round
trip."""

from __future__ import annotations

import collections

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dwds_livestream_spark.operators.curation import ks_panel
from dwds_livestream_spark.operators.urls import path_drift, path_novelty

import pytest
# Slow tier (pytest.ini): full-registry sweep / hypothesis suite —
# deselected from the default driver-budget run, in the release gate.
pytestmark = pytest.mark.slow


SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# (snapshot, domain idx, path idx) corpora — small alphabets force
# overlap, births and deaths
snap_corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=1),
        st.integers(min_value=0, max_value=4),
    ),
    min_size=1,
    max_size=14,
)


def _sets(rows):
    """{(domain, snap): {path}} plus the sorted snapshot calendar."""
    by = collections.defaultdict(set)
    for s, d, p in rows:
        by[(f"d{d}.com", s)].add(f"/p{p}")
    snaps = sorted({s for s, _, _ in rows})
    return by, snaps


def _df(spark, rows):
    data = [
        (s, f"https://d{d}.com/p{p}") for s, d, p in rows
    ]
    return spark.createDataFrame(data, "snapshot int, url string")


@SET
@given(rows=snap_corpora)
def test_path_drift_matches_naive(spark, rows):
    got = {
        (r.domain, r.snapshot, r.next_snapshot): (
            r.n_prev, r.n_next, r.n_common, r.jaccard
        )
        for r in path_drift(_df(spark, rows), period_col="snapshot").collect()
    }

    by, snaps = _sets(rows)
    expect = {}
    for a, b in zip(snaps, snaps[1:]):
        doms = {d for (d, s) in by if s in (a, b)}
        for d in doms:
            pa, pb = by.get((d, a), set()), by.get((d, b), set())
            c = len(pa & pb)
            expect[(d, a, b)] = (
                len(pa), len(pb), c,
                round(c / len(pa | pb), 6),
            )
    assert set(got) == set(expect)
    for k, (na, nb, c, j) in expect.items():
        assert got[k][:3] == (na, nb, c), k
        assert abs(got[k][3] - j) < 1e-9, k


@SET
@given(rows=snap_corpora)
def test_path_novelty_matches_naive(spark, rows):
    got = {
        r.snapshot: (r.n_urls, r.n_new, r.novelty)
        for r in path_novelty(
            _df(spark, rows), period_col="snapshot"
        ).collect()
    }

    by, snaps = _sets(rows)
    seen: set = set()
    expect = {}
    for s in snaps:
        urls = {(d, p) for (d, ss), ps in by.items() if ss == s for p in ps}
        new = urls - seen
        seen |= urls
        expect[s] = (len(urls), len(new), round(len(new) / len(urls), 6))
    assert set(got) == set(expect)
    for s, (nu, nn, nov) in expect.items():
        assert got[s][:2] == (nu, nn), s
        assert abs(got[s][2] - nov) < 1e-9, s
    # invariant: the first snapshot is always all-new
    assert got[snaps[0]][2] == 1.0


# (group idx, value) samples + reference values
panel_samples = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=14,
)
panel_refs = st.lists(
    st.integers(min_value=0, max_value=9), min_size=1, max_size=14
)


@SET
@given(samp=panel_samples, ref=panel_refs)
def test_ks_panel_matches_naive(spark, samp, ref):
    sdf = spark.createDataFrame(
        [(f"g{g}", v) for g, v in samp], "source string, n_chars long"
    )
    rdf = spark.createDataFrame([(v,) for v in ref], "n_chars long")
    got = {
        r.source: (r.n_sample, r.n_ref, r.ks)
        for r in ks_panel(sdf, rdf).collect()
    }

    by = collections.defaultdict(list)
    for g, v in samp:
        by[f"g{g}"].append(v)

    def ecdf(vs, x):
        return sum(1 for v in vs if v <= x) / len(vs)

    assert set(got) == set(by)
    for g, vals in by.items():
        pts = sorted(set(vals) | set(ref))
        ks = round(max(abs(ecdf(vals, x) - ecdf(ref, x)) for x in pts), 6)
        assert got[g][:2] == (len(vals), len(ref)), g
        assert abs(got[g][2] - ks) < 1e-9, g


# (snapshot, group idx, token-index tuple) documents — tiny vocab
# forces gram overlap across snapshots
doc_corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=1),
        st.lists(st.integers(min_value=0, max_value=3), min_size=0,
                 max_size=6),
    ),
    min_size=1,
    max_size=10,
)


@SET
@given(rows=doc_corpora)
def test_content_drift_matches_naive(spark, rows):
    from dwds_livestream_spark.operators.curation import content_drift

    n = 2
    data = [
        (s, f"g{g}", " ".join(f"w{t}" for t in toks))
        for s, g, toks in rows
    ]
    df = spark.createDataFrame(
        data, "snapshot int, source string, text string"
    )
    got = {
        (r.source, r.snapshot, r.next_snapshot): (
            r.n_prev, r.n_next, r.n_common, r.jaccard
        )
        for r in content_drift(
            df, period_col="snapshot", n=n
        ).collect()
    }

    by = collections.defaultdict(set)
    for s, g, toks in rows:
        words = [f"w{t}" for t in toks]
        for i in range(len(words) - n + 1):
            by[(f"g{g}", s)].add(" ".join(words[i:i + n]))
    # groups with zero grams in a snapshot contribute no set row
    by = {k: v for k, v in by.items() if v}
    snaps = sorted({s for (_, s) in by})
    expect = {}
    for a, b in zip(snaps, snaps[1:]):
        gs = {g for (g, s) in by if s in (a, b)}
        for g in gs:
            pa, pb = by.get((g, a), set()), by.get((g, b), set())
            c = len(pa & pb)
            expect[(g, a, b)] = (
                len(pa), len(pb), c, round(c / len(pa | pb), 6)
            )
    assert set(got) == set(expect)
    for k, (na, nb, c, j) in expect.items():
        assert got[k][:3] == (na, nb, c), k
        assert abs(got[k][3] - j) < 1e-9, k


# (snapshot, group idx, text idx) docs — tiny text alphabet forces
# duplicates within and across (group, snapshot) cells
dup_corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=1),
        st.integers(min_value=0, max_value=3),
    ),
    min_size=1,
    max_size=14,
)


@SET
@given(rows=dup_corpora)
def test_dup_rate_drift_matches_naive(spark, rows):
    from dwds_livestream_spark.operators.curation import dup_rate_drift

    data = [
        (s, f"g{g}", i, f"text body {t}")
        for i, (s, g, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "snapshot int, source string, doc_id long, text string"
    )
    got = {
        (r.source, r.snapshot, r.next_snapshot): (
            r.n_docs, r.next_n_docs, r.dup_rate, r.next_dup_rate, r.delta
        )
        for r in dup_rate_drift(df).collect()
    }

    cells = collections.defaultdict(list)
    for s, g, t in rows:
        cells[(f"g{g}", s)].append(t)
    snaps = sorted({s for s, _, _ in rows})

    def rate(ts):
        return round((len(ts) - len(set(ts))) / len(ts), 6)

    expect = {}
    for a, b in zip(snaps, snaps[1:]):
        for g in {g for (g, s) in cells}:
            ta, tb = cells.get((g, a)), cells.get((g, b))
            if ta and tb:   # both sides present, else no row
                ra, rb = rate(ta), rate(tb)
                expect[(g, a, b)] = (
                    len(ta), len(tb), ra, rb, round(rb - ra, 6)
                )
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert got[k][:2] == v[:2], k
        for i in (2, 3, 4):
            assert abs(got[k][i] - v[i]) < 1e-9, k


@SET
@given(samp=panel_samples)
def test_ks_drift_matches_naive(spark, samp):
    """samp: (group idx, value) pairs; snapshot = value % 3 gives a
    deterministic but irregular period assignment."""
    from dwds_livestream_spark.operators.curation import ks_drift

    data = [(v % 3, f"g{g}", v) for g, v in samp]
    df = spark.createDataFrame(
        data, "snapshot int, source string, n_chars long"
    )
    got = {
        (r.source, r.snapshot, r.next_snapshot): (r.n_prev, r.n_next, r.ks)
        for r in ks_drift(df).collect()
    }

    cells = collections.defaultdict(list)
    for s, g, v in data:
        cells[(g, s)].append(v)
    snaps = sorted({s for s, _, _ in data})

    def ecdf(vs, x):
        return sum(1 for v in vs if v <= x) / len(vs)

    expect = {}
    for a, b in zip(snaps, snaps[1:]):
        for g in {g for (g, s) in cells}:
            va, vb = cells.get((g, a)), cells.get((g, b))
            if va and vb:
                pts = sorted(set(va) | set(vb))
                ks = round(
                    max(abs(ecdf(va, x) - ecdf(vb, x)) for x in pts), 6
                )
                expect[(g, a, b)] = (len(va), len(vb), ks)
    assert set(got) == set(expect)
    for k, (na, nb, ks) in expect.items():
        assert got[k][:2] == (na, nb), k
        assert abs(got[k][2] - ks) < 1e-9, k
