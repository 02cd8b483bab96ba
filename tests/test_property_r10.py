"""Hypothesis invariants for the r10 growth batch — random inputs so
the distributed decompositions (per-dim centroid fold + pair join,
sequential ledger probe, exact-support JS algebra, keyed first-seen
min) match their naive single-machine definitions structurally, not
by testdata luck. Example counts kept small: every example is a full
Spark round trip."""

from __future__ import annotations

import collections
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
# centroid_drift vs naive numpy
# ------------------------------------------------------------------

vec_corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),            # label
        st.integers(min_value=0, max_value=2),            # snapshot
        st.lists(
            st.integers(min_value=-3, max_value=3).map(float),
            min_size=2, max_size=2,
        ),
    ),
    min_size=1,
    max_size=12,
)


@SET
@given(rows=vec_corpora)
def test_centroid_drift_matches_naive(spark, rows):
    import numpy as np

    from dwds_livestream_spark.operators.embedding_ops import centroid_drift

    df = spark.createDataFrame(
        rows, "label int, snapshot int, embedding array<double>"
    )
    got = {
        (r.label, r.snapshot, r.next_snapshot): (
            r.n_prev, r.n_next, r.cos_sim, r.l2_shift
        )
        for r in centroid_drift(df, group_col="label").collect()
    }

    by = collections.defaultdict(list)
    for lab, s, v in rows:
        by[(lab, s)].append(v)
    snaps = sorted({s for _, s, _ in rows})
    expect = {}
    for a, b in zip(snaps, snaps[1:]):
        for lab in {x for (x, _) in by}:
            va, vb = by.get((lab, a)), by.get((lab, b))
            if not va or not vb:
                continue   # one-sided: no centroid pair
            ca = np.mean(np.array(va), axis=0)
            cb = np.mean(np.array(vb), axis=0)
            den = np.linalg.norm(ca) * np.linalg.norm(cb)
            cos = float(ca @ cb) / den if den > 0 else None
            expect[(lab, a, b)] = (
                len(va), len(vb), cos, float(np.linalg.norm(ca - cb))
            )

    assert set(got) == set(expect)
    for k, (np_, nn, cos, l2) in expect.items():
        gp, gn, gcos, gl2 = got[k]
        assert (gp, gn) == (np_, nn)
        if cos is None:
            assert gcos is None
        else:
            assert gcos == pytest.approx(cos, abs=1e-6)
        assert gl2 == pytest.approx(l2, abs=1e-6)


# ------------------------------------------------------------------
# minhash_ledger_replay vs naive sequential simulation
# ------------------------------------------------------------------

_POOL = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "one two three four five six seven eight nine ten eleven",
    "red orange yellow green blue indigo violet ultraviolet xray",
]

ledger_corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # batch
        st.integers(min_value=0, max_value=2),   # pool text idx
    ),
    min_size=1,
    max_size=10,
)


def test_pool_texts_do_not_cross_collide(spark):
    """Precondition for the simulation below: distinct pool texts never
    reach the 0.5 estimate threshold, so 'match' == 'same text'."""
    from dwds_livestream_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_POOL)], "doc_id long, text string"
    )
    assert minhash_lsh_pairs(df, threshold=0.5).count() == 0


@SET
@given(rows=ledger_corpora)
def test_ledger_replay_matches_naive_simulation(spark, rows):
    from dwds_livestream_spark.operators.dedup import minhash_ledger_replay

    data = [(i, b, _POOL[t]) for i, (b, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, batch int, text string")
    got = {
        r.doc_id: (r.keeper_id, r.est_jaccard)
        for r in minhash_ledger_replay(
            df, batch_values=[0, 1, 2], threshold=0.5
        ).collect()
    }

    # naive replay: ledger = text -> min surviving id per text, batches
    # in order; within a batch nothing deduplicates
    ledger: dict[str, list[int]] = collections.defaultdict(list)
    expect = {}
    for b in (0, 1, 2):
        batch = sorted(
            (i, t) for i, (bb, t) in enumerate(rows) if bb == b
        )
        survivors = []
        for i, t in batch:
            text = _POOL[t]
            if ledger[text]:
                expect[i] = (min(ledger[text]), 1.0)
            else:
                expect[i] = (i, None)
                survivors.append((text, i))
        for text, i in survivors:
            ledger[text].append(i)

    assert got == expect


# ------------------------------------------------------------------
# token_js_divergence vs full-support naive
# ------------------------------------------------------------------

js_corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # group
        st.lists(
            st.integers(min_value=0, max_value=5), min_size=1, max_size=6
        ),
    ),
    min_size=1,
    max_size=8,
)


@SET
@given(rows=js_corpora)
def test_token_js_divergence_matches_full_support(spark, rows):
    from dwds_livestream_spark.operators.curation import token_js_divergence

    data = [
        (f"g{g}", " ".join(f"w{t}" for t in toks)) for g, toks in rows
    ]
    df = spark.createDataFrame(data, "source string, text string")
    got = {r.source: r.js for r in token_js_divergence(df).collect()}

    corpus = collections.Counter()
    per = collections.defaultdict(collections.Counter)
    for g, toks in rows:
        per[f"g{g}"].update(f"w{t}" for t in toks)
        corpus.update(f"w{t}" for t in toks)
    nt = sum(corpus.values())
    for g, cnt in per.items():
        ng = sum(cnt.values())
        js = 0.0
        for t, ct in corpus.items():
            p = cnt.get(t, 0) / ng
            q = ct / nt
            m = (p + q) / 2
            if p > 0:
                js += 0.5 * p * math.log(p / m)
            js += 0.5 * q * math.log(q / m)
        assert got[g] == pytest.approx(js, abs=1e-6)
        assert -1e-9 <= got[g] <= math.log(2) + 1e-9
    assert set(got) == set(per)


# ------------------------------------------------------------------
# path_novelty(per_domain=True) vs naive first-seen
# ------------------------------------------------------------------

url_corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # snapshot
        st.integers(min_value=0, max_value=1),   # domain
        st.integers(min_value=0, max_value=4),   # path
    ),
    min_size=1,
    max_size=14,
)


@SET
@given(rows=url_corpora)
def test_path_novelty_per_domain_matches_naive(spark, rows):
    from dwds_livestream_spark.operators.urls import path_novelty

    data = [(s, f"https://d{d}.com/p{p}") for s, d, p in rows]
    df = spark.createDataFrame(data, "snapshot int, url string")
    got = {
        (r.domain, r.snapshot): (r.n_urls, r.n_new)
        for r in path_novelty(df, per_domain=True).collect()
    }

    by = collections.defaultdict(set)
    for s, d, p in rows:
        by[(f"d{d}.com", s)].add(f"/p{p}")
    first = {}
    for (dom, s) in sorted(by, key=lambda k: k[1]):
        for path in by[(dom, s)]:
            first.setdefault((dom, path), s)
    expect = {}
    for (dom, s), paths in by.items():
        n_new = sum(1 for p in paths if first[(dom, p)] == s)
        expect[(dom, s)] = (len(paths), n_new)
    assert got == expect


# ------------------------------------------------------------------
# psi_drift vs naive (binning replicated in python)
# ------------------------------------------------------------------

psi_corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),    # group
        st.integers(min_value=0, max_value=2),    # snapshot
        st.integers(min_value=0, max_value=9),    # value (int-valued)
    ),
    min_size=2,
    max_size=16,
)

PSI_BINS_T = 4


def _bucket(v, lo, hi, bins):
    if hi == lo:
        return 1
    if v >= hi:
        return bins
    return min(bins, max(1, int((v - lo) / (hi - lo) * float(bins)) + 1))


@SET
@given(rows=psi_corpora)
def test_psi_drift_matches_naive(spark, rows):
    from dwds_livestream_spark.operators.curation import psi_drift

    df = spark.createDataFrame(
        [(f"g{g}", s, float(v)) for g, s, v in rows],
        "source string, snapshot int, v double",
    )
    got = {
        (r.source, r.snapshot, r.next_snapshot): (r.n_prev, r.n_next, r.psi)
        for r in psi_drift(
            df, value_col="v", group_col="source",
            period_col="snapshot", bins=PSI_BINS_T,
        ).collect()
    }

    lo, hi = float(min(v for _, _, v in rows)), float(max(v for _, _, v in rows))
    by = collections.defaultdict(collections.Counter)
    for g, s, v in rows:
        by[(f"g{g}", s)][_bucket(float(v), lo, hi, PSI_BINS_T)] += 1
    snaps = sorted({s for _, s, _ in rows})
    expect = {}
    for a, b in zip(snaps, snaps[1:]):
        for grp in {g for (g, _) in by}:
            ca, cb = by.get((grp, a)), by.get((grp, b))
            if not ca or not cb:
                continue
            na, nb = sum(ca.values()), sum(cb.values())
            psi = 0.0
            for bin_ in range(1, PSI_BINS_T + 1):
                pa = (ca.get(bin_, 0) + 0.5) / (na + PSI_BINS_T / 2.0)
                pb = (cb.get(bin_, 0) + 0.5) / (nb + PSI_BINS_T / 2.0)
                psi += (pa - pb) * math.log(pa / pb)
            expect[(grp, a, b)] = (na, nb, psi)

    assert set(got) == set(expect)
    for k, (na, nb, psi) in expect.items():
        gna, gnb, gpsi = got[k]
        assert (gna, gnb) == (na, nb)
        assert gpsi == pytest.approx(psi, abs=1e-6)
        assert gpsi >= -1e-9   # PSI is non-negative


# ------------------------------------------------------------------
# js_drift vs naive two-sample JS
# ------------------------------------------------------------------

jsd_corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),    # group
        st.integers(min_value=0, max_value=2),    # snapshot
        st.lists(
            st.integers(min_value=0, max_value=4), min_size=1, max_size=5
        ),
    ),
    min_size=1,
    max_size=8,
)


@SET
@given(rows=jsd_corpora)
def test_js_drift_matches_naive(spark, rows):
    from dwds_livestream_spark.operators.curation import js_drift

    df = spark.createDataFrame(
        [
            (f"g{g}", s, " ".join(f"w{t}" for t in toks))
            for g, s, toks in rows
        ],
        "source string, snapshot int, text string",
    )
    got = {
        (r.source, r.snapshot, r.next_snapshot): (r.n_prev, r.n_next, r.js)
        for r in js_drift(df).collect()
    }

    by = collections.defaultdict(collections.Counter)
    for g, s, toks in rows:
        by[(f"g{g}", s)].update(f"w{t}" for t in toks)
    snaps = sorted({s for _, s, _ in rows})
    expect = {}
    for a, b in zip(snaps, snaps[1:]):
        for grp in {g for (g, _) in by}:
            pa, pb = by.get((grp, a)), by.get((grp, b))
            if not pa or not pb:
                continue
            na, nb = sum(pa.values()), sum(pb.values())
            js = 0.0
            for t in set(pa) | set(pb):
                p = pa.get(t, 0) / na
                q = pb.get(t, 0) / nb
                m = (p + q) / 2
                if p > 0:
                    js += 0.5 * p * math.log(p / m)
                if q > 0:
                    js += 0.5 * q * math.log(q / m)
            expect[(grp, a, b)] = (na, nb, js)

    assert set(got) == set(expect)
    for k, (na, nb, js) in expect.items():
        gna, gnb, gjs = got[k]
        assert (gna, gnb) == (na, nb)
        assert gjs == pytest.approx(js, abs=1e-6)
        assert -1e-9 <= gjs <= math.log(2) + 1e-9


# ------------------------------------------------------------------
# token_novelty vs naive first-seen
# ------------------------------------------------------------------


@SET
@given(rows=jsd_corpora)
def test_token_novelty_matches_naive(spark, rows):
    from dwds_livestream_spark.operators.curation import token_novelty

    df = spark.createDataFrame(
        [
            (f"g{g}", s, " ".join(f"w{t}" for t in toks))
            for g, s, toks in rows
        ],
        "source string, snapshot int, text string",
    )
    got = {
        (r.source, r.snapshot): (r.n_tokens, r.n_new)
        for r in token_novelty(df).collect()
    }

    by = collections.defaultdict(set)
    for g, s, toks in rows:
        by[(f"g{g}", s)].update(f"w{t}" for t in toks)
    first = {}
    for (grp, s) in sorted(by, key=lambda k: k[1]):
        for t in by[(grp, s)]:
            first.setdefault((grp, t), s)
    expect = {
        (grp, s): (len(ts), sum(1 for t in ts if first[(grp, t)] == s))
        for (grp, s), ts in by.items()
    }
    assert got == expect


# ------------------------------------------------------------------
# unigram_entropy vs naive Counter entropy
# ------------------------------------------------------------------

ent_corpora = st.lists(
    st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=12),
    min_size=1,
    max_size=6,
)


@SET
@given(docs=ent_corpora)
def test_unigram_entropy_matches_naive(spark, docs):
    from dwds_livestream_spark.operators.curation import unigram_entropy

    df = spark.createDataFrame(
        [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.vocab, r.entropy)
        for r in unigram_entropy(df).collect()
    }
    for i, toks in enumerate(docs):
        cnt = collections.Counter(f"w{t}" for t in toks)
        n = sum(cnt.values())
        h = math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n
        gn, gv, gh = got[i]
        assert (gn, gv) == (n, len(cnt))
        assert gh == pytest.approx(h, abs=1e-6)
