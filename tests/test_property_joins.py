"""Property-based semantics checks (hypothesis): the temporal join
operators against brute-force Python references on random inputs.

Few examples, deadline off — each example is a Spark job; the value is
in randomized edge shapes (dup timestamps, empty sides, boundary hits),
not volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from dwds_livestream_spark.operators.asof import asof_join
from dwds_livestream_spark.operators.range_join import range_join

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: int) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


keys = st.sampled_from(["a", "b", "c"])
secs = st.integers(min_value=0, max_value=5_000)

asof_cases = st.tuples(
    st.lists(st.tuples(secs, keys), min_size=1, max_size=25),
    st.lists(
        st.tuples(secs, keys, st.integers(min_value=0, max_value=99)),
        max_size=25,
        unique_by=lambda r: (r[1], r[0]),  # one right row per (key, ts):
        # DuckDB/pandas asof tie choice is arbitrary; dedup makes the
        # expected match unique (same restriction the query entry uses)
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(asof_cases)
def test_asof_matches_bruteforce(spark, case):
    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(i, _ts(s), k) for i, (s, k) in enumerate(left_rows)],
        "lid long, ts timestamp, k string",
    )
    right = spark.createDataFrame(
        [(k, _ts(s), p) for (s, k, p) in right_rows] or [],
        "k string, rts timestamp, payload long",
    )
    got = {
        r.lid: (r.matched_ts, r.payload)
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    }
    for i, (s, k) in enumerate(left_rows):
        earlier = [(rs, p) for (rs, rk, p) in right_rows if rk == k and rs <= s]
        expect = (None, None) if not earlier else (
            _ts(max(earlier)[0]), max(earlier)[1]
        )
        assert got[i] == expect, f"left row {i} ({s}, {k})"
    assert len(got) == len(left_rows)  # left outer: nothing dropped


range_cases = st.tuples(
    st.lists(st.tuples(secs, keys), min_size=1, max_size=25),
    st.lists(
        st.tuples(secs, st.integers(min_value=0, max_value=600), keys),
        max_size=15,
    ),
    st.sampled_from([60, 300, 3600]),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(range_cases)
def test_range_join_matches_bruteforce(spark, case):
    point_rows, interval_rows, bin_w = case
    points = spark.createDataFrame(
        [(i, _ts(s), k) for i, (s, k) in enumerate(point_rows)],
        "pid long, ts timestamp, k string",
    )
    intervals = spark.createDataFrame(
        [(j, _ts(s), _ts(s + d), k) for j, (s, d, k) in enumerate(interval_rows)]
        or [],
        "iid long, s timestamp, e timestamp, k string",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(
            points, intervals, "ts", "s", "e",
            bin_width_seconds=bin_w, equi=["k"],
        ).collect()
    }
    expect = {
        (i, j)
        for i, (ps, pk) in enumerate(point_rows)
        for j, (s, d, ik) in enumerate(interval_rows)
        if pk == ik and s <= ps < s + d
    }
    assert got == expect


# ---- paragraph dedup: global invariants under arbitrary corpora ----

para_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x"])
paragraph = st.lists(para_word, min_size=1, max_size=4).map(" ".join)
doc = st.lists(paragraph, min_size=0, max_size=5).map("\n".join)
corpus = st.lists(doc, min_size=1, max_size=8)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus)
def test_paragraph_dedup_invariants(spark, texts):
    from dwds_livestream_spark.operators.dedup import paragraph_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = paragraph_dedup(df).collect()

    # 1. no paragraph appears twice anywhere in the output corpus
    all_paras = [p for r in out for p in r["text"].split("\n")]
    assert len(all_paras) == len(set(all_paras))

    # 2. the set of surviving paragraphs == set of distinct non-blank
    #    input paragraphs (dedup never loses content, only copies)
    want = {
        p.strip()
        for t in texts
        for p in t.split("\n")
        if p.strip()
    }
    assert set(all_paras) == want

    # 3. each paragraph survives in its FIRST containing document, and
    #    per-doc order is preserved
    first_holder = {}
    for i, t in enumerate(texts):
        for j, p in enumerate(p.strip() for p in t.split("\n")):
            if p and p not in first_holder:
                first_holder[p] = (i, j)
    for r in out:
        paras = r["text"].split("\n")
        assert all(first_holder[p][0] == r["doc_id"] for p in paras)
        idxs = [first_holder[p][1] for p in paras]
        assert idxs == sorted(idxs)
        assert r["n_kept"] == len(paras)
