"""Property-based semantics check (hypothesis): duplicate_spans in
both modes (corpus-occurrence min_count and cross-document min_docs)
against a brute-force Python reference on random tiny corpora.

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
