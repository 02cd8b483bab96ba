"""Property-based semantics checks (hypothesis) for the dedup
family: duplicate_spans in both modes (corpus-occurrence min_count
and cross-document min_docs) and the incremental ledger replay,
each against a brute-force Python reference on random inputs.

A 3-token alphabet makes repeated grams common, so random cases hit
the interesting shapes: overlapping coverage merges, adjacent-window
joins (gap == length), single-doc-only repetition (the min_docs
discriminator), and docs shorter than the window.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dwds_livestream_spark.operators.substring_dedup import duplicate_spans

import pytest
# Slow tier (pytest.ini): full-registry sweep / hypothesis suite —
# deselected from the default driver-budget run, in the release gate.
pytestmark = pytest.mark.slow


L = 3

token = st.sampled_from(["x", "y", "z"])
doc = st.lists(token, min_size=0, max_size=12).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=6)


def _ref_spans(docs, length, min_count=None, min_docs=None):
    """Brute-force reference: mark every position whose length-gram
    qualifies, then merge positions whose successive starts differ by
    <= length (equal-length intervals overlap or touch exactly then)."""
    toks = {i: t.split() for i, t in enumerate(docs)}
    occ: dict[tuple, list[tuple[int, int]]] = defaultdict(list)
    for d, t in toks.items():
        for p in range(len(t) - length + 1):
            occ[tuple(t[p : p + length])].append((d, p))
    if min_docs is not None:
        dup = {g for g, o in occ.items() if len({d for d, _ in o}) >= min_docs}
    else:
        dup = {g for g, o in occ.items() if len(o) >= min_count}
    out = set()
    for d, t in toks.items():
        hits = sorted(
            p
            for p in range(len(t) - length + 1)
            if tuple(t[p : p + length]) in dup
        )
        start = prev = None
        for p in hits:
            if start is None:
                start = prev = p
            elif p - prev > length:
                out.add((d, start, prev + length))
                start = prev = p
            else:
                prev = p
        if start is not None:
            out.add((d, start, prev + length))
    return out


replay_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=99),  # doc_id
        st.integers(min_value=0, max_value=3),  # batch_id
        st.sampled_from(["f0", "f1", "f2"]),  # fingerprint
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda r: r[0],
)
replay_batches = st.lists(
    st.sampled_from([0, 1, 2, 3]), min_size=1, max_size=4, unique=True
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(replay_rows, replay_batches)
def test_replay_matches_min_batch_id_bruteforce(spark, rows, batches):
    """The ledger-replay equivalence claim, randomized: for every row
    of the replayed batches the keeper is min (batch, id) over its key
    within those batches — replay order must equal the one-window
    formulation the DuckDB oracle uses; rows outside the replayed
    batches never appear."""
    from dwds_livestream_spark.operators.dedup import (
        incremental_dedup_replay,
    )

    df = spark.createDataFrame(rows, ["doc_id", "batch_id", "fingerprint"])
    got = {
        r.doc_id: r.keeper_id
        for r in incremental_dedup_replay(
            df, key_col="fingerprint", batch_values=sorted(batches)
        ).collect()
    }
    replayed = [r for r in rows if r[1] in batches]
    keeper = {}
    for doc_id, batch_id, key in replayed:
        cur = keeper.get(key)
        if cur is None or (batch_id, doc_id) < cur:
            keeper[key] = (batch_id, doc_id)
    want = {doc_id: keeper[key][1] for doc_id, _, key in replayed}
    assert got == want, (rows, batches, got, want)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus)
def test_duplicate_and_cross_doc_spans_match_bruteforce(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    for kwargs in ({"min_count": 2}, {"min_docs": 2}):
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in duplicate_spans(df, length=L, **kwargs).collect()
        }
        want = _ref_spans(docs, L, **kwargs)
        assert got == want, (docs, kwargs, got, want)
