"""Hypothesis invariants for the late-round-8 trio — random inputs so
the distributed decompositions (grouped bucketed rank, posting-list
candidates, consecutive-pair RBO) match their naive single-machine
definitions structurally, not by testdata luck. Example counts kept
small: every example is a full Spark round trip."""

from __future__ import annotations

import collections

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dwds_livestream_spark.operators.embedding_ops import quantile_normalize
from dwds_livestream_spark.operators.retrieval import rbo_drift, rbo_panel
from dwds_livestream_spark.operators.urls import path_neardup_pairs

import pytest
# Slow tier (pytest.ini): full-registry sweep / hypothesis suite —
# deselected from the default driver-budget run, in the release gate.
pytestmark = pytest.mark.slow


SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --------------------------------------- grouped quantile normalization

vec_corpora = st.lists(  # one entry per row: (group id, vector)
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.lists(
            st.integers(min_value=-50, max_value=50).map(float),
            min_size=3, max_size=3,
        ),
    ),
    min_size=2,
    max_size=12,
)


@SET
@given(rows=vec_corpora, n_buckets=st.sampled_from([1, 2, 8]))
def test_group_quantile_normalize_matches_naive(spark, rows, n_buckets):
    data = [(i, f"g{g}", v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "vec_id long, label string, embedding array<double>"
    )
    got = {
        (r.vec_id, r.dim): (r.label, r.qn)
        for r in quantile_normalize(
            df, group_col="label", n_buckets=n_buckets
        ).collect()
    }

    by_group = collections.defaultdict(list)
    for i, g, v in data:
        by_group[g].append((i, v))
    expect = {}
    for g, members in by_group.items():
        d = 3
        rank = {}
        for dim in range(d):
            order = sorted(members, key=lambda m: (m[1][dim], m[0]))
            for rn, (i, _) in enumerate(order, 1):
                rank[(i, dim)] = rn
        sums = collections.defaultdict(list)
        for (i, dim), rn in rank.items():
            sums[rn].append(dict(members)[i][dim])
        mu = {rn: sum(v) / len(v) for rn, v in sums.items()}
        for (i, dim), rn in rank.items():
            expect[(i, dim)] = (g, mu[rn])
    assert set(got) == set(expect)
    for key, (g, m) in expect.items():
        assert got[key][0] == g
        assert abs(got[key][1] - m) < 1e-9, key


# --------------------------------------------------- URL path near-dup

url_corpora = st.lists(  # (domain idx, segment multiset as indices)
    st.tuples(
        st.integers(min_value=0, max_value=1),
        st.lists(st.integers(min_value=0, max_value=5), max_size=4),
    ),
    min_size=2,
    max_size=10,
)


@SET
@given(rows=url_corpora, threshold=st.sampled_from([0.25, 0.5, 1.0]))
def test_path_neardup_matches_naive(spark, rows, threshold):
    def url(dom, segs):
        return f"https://site{dom}.com/" + "/".join(f"s{x}" for x in segs)

    data = [(i, url(d, segs)) for i, (d, segs) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, url string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in path_neardup_pairs(df, threshold=threshold).collect()
    }

    sets = {i: (d, {f"s{x}" for x in segs}) for i, (d, segs) in enumerate(rows)}
    expect = {}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            da, sa = sets[a]
            db, sb = sets[b]
            if da != db or not (sa & sb):
                continue
            j = round(len(sa & sb) / len(sa | sb), 6)
            if j >= threshold:
                expect[(a, b)] = j
    assert set(got) == set(expect)
    for k, j in expect.items():
        assert abs(got[k] - j) < 1e-9, k


# ------------------------------------------------------------ RBO drift

leaderboards = st.lists(  # per period: a permutation prefix of item ids
    st.permutations(list(range(6))),
    min_size=2,
    max_size=4,
)


@SET
@given(boards=leaderboards, depth=st.sampled_from([1, 3, 5]))
def test_rbo_drift_matches_naive(spark, boards, depth):
    p = 0.9
    data = [
        (f"t{t}", item, r + 1)
        for t, perm in enumerate(boards)
        for r, item in enumerate(perm)
    ]
    df = spark.createDataFrame(data, "day string, doc_id long, rank int")
    got = {
        (r.day, r.next_day): (r.n_shared, r.rbo)
        for r in rbo_drift(
            df, depth=depth, p=p, period_col="day"
        ).collect()
    }

    def brute(ra, rb):
        rbo = 0.0
        for d in range(1, depth + 1):
            A = {x for x, rk in ra.items() if rk <= d}
            B = {x for x, rk in rb.items() if rk <= d}
            rbo += p ** (d - 1) * len(A & B) / d
        return round(rbo * (1 - p), 6)

    ranks = [
        {item: r + 1 for r, item in enumerate(perm)} for perm in boards
    ]
    assert set(got) == {(f"t{t}", f"t{t+1}") for t in range(len(boards) - 1)}
    for t in range(len(boards) - 1):
        ra, rb = ranks[t], ranks[t + 1]
        shared = {
            x for x in ra
            if x in rb and ra[x] <= depth and rb[x] <= depth
        }
        key = (f"t{t}", f"t{t+1}")
        assert got[key][0] == len(shared), key
        assert abs(got[key][1] - brute(ra, rb)) < 1e-9, key


# ------------------------------------------------------------ RBO panel

panel_groups = st.lists(
    st.permutations(list(range(6))), min_size=1, max_size=3
)


@SET
@given(boards=panel_groups, ref=st.permutations(list(range(6))),
       depth=st.sampled_from([1, 3, 5]))
def test_rbo_panel_matches_naive(spark, boards, ref, depth):
    p = 0.9
    rows = [
        (f"g{g}", item, r + 1)
        for g, perm in enumerate(boards)
        for r, item in enumerate(perm)
    ]
    gdf = spark.createDataFrame(rows, "source string, doc_id long, rank int")
    rdf = spark.createDataFrame(
        [(item, r + 1) for r, item in enumerate(ref)], "doc_id long, rank int"
    )
    got = {r.source: (r.n_shared, r.rbo)
           for r in rbo_panel(gdf, rdf, depth=depth, p=p,
                              group_col="source").collect()}

    dref = {item: r + 1 for r, item in enumerate(ref)}
    assert set(got) == {f"g{g}" for g in range(len(boards))}
    for g, perm in enumerate(boards):
        dg = {item: r + 1 for r, item in enumerate(perm)}
        rbo = 0.0
        for d in range(1, depth + 1):
            A = {x for x, rk in dg.items() if rk <= d}
            B = {x for x, rk in dref.items() if rk <= d}
            rbo += p ** (d - 1) * len(A & B) / d
        shared = len({x for x in dg
                      if x in dref and dg[x] <= depth and dref[x] <= depth})
        assert got[f"g{g}"][0] == shared
        assert abs(got[f"g{g}"][1] - round(rbo * (1 - p), 6)) < 1e-9


# ------------------------------------------------------------ KS audit

samples = st.lists(st.integers(min_value=0, max_value=20),
                   min_size=1, max_size=25)


@SET
@given(a_vals=samples, b_vals=samples)
def test_ks_distance_matches_naive(spark, a_vals, b_vals):
    from dwds_livestream_spark.operators.curation import ks_distance

    a = spark.createDataFrame([(v,) for v in a_vals], "n_chars long")
    b = spark.createDataFrame([(v,) for v in b_vals], "n_chars long")
    (row,) = ks_distance(a, b).collect()

    def ecdf(vals, x):
        return sum(1 for v in vals if v <= x) / len(vals)

    pts = sorted(set(a_vals) | set(b_vals))
    expect = round(
        max(abs(ecdf(a_vals, x) - ecdf(b_vals, x)) for x in pts), 6
    )
    assert (row.n_sample, row.n_ref) == (len(a_vals), len(b_vals))
    assert abs(row.ks - expect) < 1e-9
    assert 0.0 <= row.ks <= 1.0
