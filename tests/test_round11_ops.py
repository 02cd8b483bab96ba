"""Round-11 operator tests: the growth batch's brute-force parity —
the paragraph-level cross-snapshot exact ledger, the group-wise
split-conformal outlier gate, and the two yield-signal compositions
(dedup yield curve, distributional drift panel join)."""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------------------
# paragraph_ledger_replay
# ------------------------------------------------------------------


def _pled(spark, rows, sep="\n"):
    from dwds_livestream_spark.operators.dedup import paragraph_ledger_replay

    df = spark.createDataFrame(rows, "doc_id long, batch int, text string")
    out = paragraph_ledger_replay(df, batch_col="batch", sep=sep)
    return {
        r.doc_id: (r.batch, r.n_paras, r.n_held, r.held_frac)
        for r in out.collect()
    }


def test_paragraph_ledger_cross_batch_semantics(spark):
    rows = [
        (1, 0, "alpha\nbeta"),            # seeds alpha, beta
        (2, 1, "alpha\ngamma"),           # alpha held, gamma new
        (3, 2, "alpha\nbeta\ngamma\ndelta"),  # 3 held, delta new
        (4, 2, "delta"),                  # delta first seen IN batch 2
    ]
    got = _pled(spark, rows)
    assert got == {
        1: (0, 2, 0, 0.0),
        2: (1, 2, 1, 0.5),
        3: (2, 4, 3, 0.75),
        4: (2, 1, 0, 0.0),
    }


def test_paragraph_ledger_intra_batch_repeats_are_new(spark):
    # two docs in the SAME batch sharing a fresh paragraph: neither is
    # held (the ledger answers only the cross-snapshot question)
    rows = [(1, 1, "shared\nmine"), (2, 1, "shared\nyours")]
    got = _pled(spark, rows)
    assert got == {1: (1, 2, 0, 0.0), 2: (1, 2, 0, 0.0)}


def test_paragraph_ledger_occurrence_weighting_and_trim(spark):
    # repeated boilerplate inside one doc counts per OCCURRENCE;
    # whitespace-only paragraphs drop
    rows = [
        (1, 0, "boiler"),
        (2, 1, "boiler\n  boiler  \n\n \nfresh"),
    ]
    got = _pled(spark, rows)
    assert got == {
        1: (0, 1, 0, 0.0),
        2: (1, 3, 2, pytest.approx(2 / 3, abs=1e-6)),
    }


def test_paragraph_ledger_drops_empty_docs_and_null_keys(spark):
    rows = [
        (1, 0, "p"),
        (2, 1, "   \n \n"),     # zero surviving paragraphs -> drops
        (None, 1, "p"),          # NULL id -> drops
        (3, None, "p"),          # NULL batch -> drops
    ]
    got = _pled(spark, rows)
    assert set(got) == {1}


def test_paragraph_ledger_vs_brute_force(spark):
    # order-free contract: held iff the paragraph's min batch over ALL
    # occurrences is strictly earlier than the row's own batch
    docs = [
        (i, i % 3, " ".join(f"w{(i * 7 + j) % 11}" for j in range(6)))
        for i in range(40)
    ]
    rows = [(i, b, t.replace(" ", "\n")) for i, b, t in docs]
    first: dict[str, int] = {}
    for i, b, t in rows:
        for p in t.split("\n"):
            first[p] = min(first.get(p, 99), b)
    want = {}
    for i, b, t in rows:
        ps = [p for p in t.split("\n") if p.strip()]
        held = sum(1 for p in ps if first[p] < b)
        want[i] = (b, len(ps), held, round(held / len(ps), 6))
    got = _pled(spark, rows)
    assert got == want


# ------------------------------------------------------------------
# conformal_outlier_bounds
# ------------------------------------------------------------------


def _is_cal(doc_id) -> bool:
    return hashlib.md5(str(doc_id).encode()).hexdigest()[:2] < "cc"


def _conf(spark, rows, alpha=0.1):
    from dwds_livestream_spark.operators.curation import (
        conformal_outlier_bounds,
    )

    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars int"
    )
    out = conformal_outlier_bounds(df, alpha=alpha)
    return {
        r.source: (r.n_cal, r.n_test, r.bound, r.n_flagged, r.flag_rate)
        for r in out.collect()
    }


def test_conformal_vs_brute_force(spark):
    rows = [(i, f"s{i % 3}", (i * 37) % 101) for i in range(120)]
    alpha = 0.1
    want = {}
    by_g: dict[str, dict[str, list]] = {}
    for i, g, s in rows:
        side = "cal" if _is_cal(i) else "test"
        by_g.setdefault(g, {"cal": [], "test": []})[side].append((s, i))
    for g, d in by_g.items():
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
        want[g] = (n_cal, n_test, bound, flagged, rate)
    assert _conf(spark, rows, alpha=alpha) == want


def test_conformal_tiny_group_gate_is_infinite(spark):
    # n_cal so small that ceil(0.9 * (n_cal + 1)) > n_cal -> NULL
    # bound, nothing flagged
    rows = [(1, "g", 10), (2, "g", 20), (3, "g", 999)]
    cal_ids = [i for i, _, _ in rows if _is_cal(i)]
    assert len(cal_ids) < 9  # rank 0.9 * (n+1) must exceed n_cal
    got = _conf(spark, rows)
    n_cal, n_test, bound, n_flagged, rate = got["g"]
    assert bound is None and n_flagged == 0
    assert n_cal == len(cal_ids) and n_test == 3 - len(cal_ids)


def test_conformal_one_sided_groups_and_nulls(spark):
    # choose ids with known split sides
    cal_id = next(i for i in range(100) if _is_cal(i))
    test_id = next(i for i in range(100) if not _is_cal(i))
    rows = [
        (cal_id, "calonly", 5),
        (test_id, "testonly", 7),
        (None, "nullid", 1),
        (test_id + 100 if not _is_cal(test_id + 100) else test_id + 101,
         None, 1),
        (cal_id, "nullscore", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars int"
    )
    from dwds_livestream_spark.operators.curation import (
        conformal_outlier_bounds,
    )

    got = {
        r.source: (r.n_cal, r.n_test, r.bound, r.n_flagged, r.flag_rate)
        for r in conformal_outlier_bounds(df).collect()
    }
    assert set(got) == {"calonly", "testonly"}
    assert got["calonly"][1] == 0 and got["calonly"][4] is None
    assert got["testonly"] == (0, 1, None, 0, 0.0)


def test_conformal_alpha_validation(spark):
    from dwds_livestream_spark.operators.curation import (
        conformal_outlier_bounds,
    )

    df = spark.createDataFrame([(1, "g", 1)], "doc_id long, source string, n_chars int")
    with pytest.raises(ValueError):
        conformal_outlier_bounds(df, alpha=0.0)
    with pytest.raises(ValueError):
        conformal_outlier_bounds(df, alpha=1.0)


def test_conformal_coverage_on_exchangeable_data(spark):
    """Finite-sample validity sanity: with exchangeable scores the
    empirical flag rate stays near alpha (<= alpha + small slack; the
    split-conformal guarantee is P(flag) <= alpha in expectation)."""
    rows = [(i, "g", (i * 131) % 997) for i in range(600)]
    got = _conf(spark, rows, alpha=0.2)
    n_cal, n_test, bound, n_flagged, rate = got["g"]
    assert n_cal + n_test == 600
    assert bound is not None
    assert rate <= 0.2 + 0.08


# ------------------------------------------------------------------
# dedup_yield_curve (composition consistency)
# ------------------------------------------------------------------


def test_dedup_yield_curve_agrees_with_replay(spark):
    sf_dir = "/root/testdata/sf0.001"
    from dwds_livestream_spark.plans.llm import (
        q_dedup_yield_curve,
        q_minhash_ledger_replay,
    )

    rep = q_minhash_ledger_replay(spark, sf_dir).collect()
    per: dict[int, list[int]] = {}
    for r in rep:
        d = per.setdefault(r.batch, [0, 0])
        d[0] += 1
        d[1] += int(r.keeper_id != r.doc_id)
    got = {
        r.batch: (r.n_docs, r.n_dup, r.dup_rate, r.ledger_size)
        for r in q_dedup_yield_curve(spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    ledger = 0
    for b in sorted(per):
        n, dup = per[b]
        ledger += n - dup
        assert got[b] == (n, dup, round(dup / n, 6), ledger)


# ------------------------------------------------------------------
# drift_panel_join (composition consistency)
# ------------------------------------------------------------------


def test_drift_panel_join_agrees_with_its_legs(spark):
    sf_dir = "/root/testdata/sf0.001"
    from dwds_livestream_spark.plans.llm import KS_BINS, q_drift_panel_join
    from dwds_livestream_spark.operators.curation import (
        js_drift,
        ks_drift,
        psi_drift,
    )
    from dwds_livestream_spark.plans.io import load_table

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "snapshot", (F.col("doc_id") % 3).cast("int")
    )
    kw = dict(
        value_col="n_chars", group_col="source", period_col="snapshot",
        bins=KS_BINS,
    )
    psi = {
        (r.source, r.snapshot, r.next_snapshot): (
            r.n_prev, r.n_next, r.psi
        )
        for r in psi_drift(docs, **kw).collect()
    }
    ks = {
        (r.source, r.snapshot, r.next_snapshot): r.ks
        for r in ks_drift(docs, **kw).collect()
    }
    js = {
        (r.source, r.snapshot, r.next_snapshot): r.js
        for r in js_drift(
            docs, text_col="text", group_col="source",
            period_col="snapshot",
        ).collect()
    }
    panel = {
        (r.source, r.snapshot, r.next_snapshot): r
        for r in q_drift_panel_join(spark, sf_dir).collect()
    }
    assert set(panel) == set(psi) == set(ks)
    for key, row in panel.items():
        assert (row.n_prev, row.n_next, row.psi) == psi[key]
        assert row.ks == ks[key]
        assert row.js == js.get(key)


# ------------------------------------------------------------------
# paragraph_ledger_yield
# ------------------------------------------------------------------


def _pyield(spark, rows, sep="\n"):
    from dwds_livestream_spark.operators.dedup import paragraph_ledger_yield

    df = spark.createDataFrame(rows, "doc_id long, batch int, text string")
    out = paragraph_ledger_yield(df, batch_col="batch", sep=sep)
    return {
        r.batch: (r.n_docs, r.n_spans, r.n_held, r.held_frac, r.ledger_size)
        for r in out.collect()
    }


def test_paragraph_yield_hand_computed(spark):
    rows = [
        (1, 0, "alpha\nbeta"),                 # ledger {alpha, beta}
        (2, 1, "alpha\ngamma"),                # 1 held; +gamma
        (3, 1, "beta\nbeta"),                  # 2 held (occurrences)
        (4, 2, "alpha\nbeta\ngamma\ndelta"),   # 3 held; +delta
    ]
    got = _pyield(spark, rows)
    assert got == {
        0: (1, 2, 0, 0.0, 2),
        1: (2, 4, 3, 0.75, 3),
        2: (1, 4, 3, 0.75, 4),
    }


def test_paragraph_yield_intra_batch_one_ledger_entry(spark):
    # a span repeated across docs of the SAME batch: new mass (not
    # held) but exactly ONE ledger entry
    rows = [(1, 0, "x"), (2, 0, "x"), (3, 1, "x\ny")]
    got = _pyield(spark, rows)
    assert got == {0: (2, 2, 0, 0.0, 1), 1: (1, 2, 1, 0.5, 2)}


def test_paragraph_yield_agrees_with_replay(spark):
    # curve == the replay output refolded per batch (mass columns),
    # on the same fixture
    from dwds_livestream_spark.operators.dedup import (
        paragraph_ledger_replay,
    )

    rows = [
        (i, i % 3, " ".join(f"w{(i * 5 + j) % 13}" for j in range(7)))
        for i in range(30)
    ]
    data = [(i, b, t.replace(" ", "\n")) for i, b, t in rows]
    df = spark.createDataFrame(data, "doc_id long, batch int, text string")
    rep = paragraph_ledger_replay(df, batch_col="batch").collect()
    per: dict[int, list[int]] = {}
    for r in rep:
        d = per.setdefault(r.batch, [0, 0, 0])
        d[0] += 1
        d[1] += r.n_paras
        d[2] += r.n_held
    got = _pyield(spark, data)
    assert set(got) == set(per)
    for b, (n_docs, n_spans, n_held) in per.items():
        assert got[b][:3] == (n_docs, n_spans, n_held)
    # ledger_size is cumulative distinct spans
    seen: set[tuple[int, str]] = set()
    first: dict[str, int] = {}
    for i, b, t in rows:
        for w_ in t.split(" "):
            first[w_] = min(first.get(w_, 99), b)
    import collections

    newc = collections.Counter(first.values())
    led = 0
    for b in sorted(got):
        led += newc.get(b, 0)
        assert got[b][4] == led


# ------------------------------------------------------------------
# conformal_drift_gate
# ------------------------------------------------------------------


def _cgate(spark, rows, alpha=0.1):
    from dwds_livestream_spark.operators.curation import (
        conformal_drift_gate,
    )

    df = spark.createDataFrame(
        rows, "source string, snapshot int, n_chars int"
    )
    out = conformal_drift_gate(
        df, score_col="n_chars", group_col="source",
        period_col="snapshot", alpha=alpha,
    )
    return {
        (r.source, r.snapshot, r.next_snapshot): (
            r.n_cal, r.n_test, r.bound, r.n_flagged, r.flag_rate
        )
        for r in out.collect()
    }


def test_conformal_drift_gate_vs_brute_force(spark):
    rows = [
        ("g", s, (i * 31 + s * 7) % 97)
        for s in (0, 1, 2)
        for i in range(25)
    ] + [("h", 0, v) for v in (1, 2, 3)] + [("h", 1, v) for v in (1, 50)]
    alpha = 0.2
    got = _cgate(spark, rows, alpha=alpha)

    by: dict[tuple, list] = {}
    for g, s, v in rows:
        by.setdefault((g, s), []).append(v)
    snaps = sorted({s for _, s, _ in rows})
    want = {}
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
            want[(g, p, np_)] = (
                len(cal_s), len(test), bound, flagged,
                round(flagged / len(test), 6),
            )
    assert got == want


def test_conformal_drift_gate_shift_alarm_and_null_contract(spark):
    # stationary group ~alpha flags; shifted group alarms at 1.0
    rows = (
        [("flat", 0, v) for v in range(20)]
        + [("flat", 1, v) for v in range(20)]
        + [("up", 0, v) for v in range(20)]
        + [("up", 1, v + 1000) for v in range(20)]
        + [("only0", 0, 5)]          # no next side -> no pair row
        + [("only1", 1, 5)]          # no prev side -> no pair row
        + [(None, 0, 1), ("flat", None, 1)]
    )
    got = _cgate(spark, rows, alpha=0.25)
    assert set(got) == {("flat", 0, 1), ("up", 0, 1)}
    # up: every next-side score exceeds the bound
    assert got[("up", 0, 1)][3] == 20 and got[("up", 0, 1)][4] == 1.0
    # flat: identical distribution, flag rate <= alpha + slack
    assert got[("flat", 0, 1)][4] <= 0.25 + 0.1


def test_conformal_drift_gate_tiny_calibration_infinite(spark):
    rows = [("g", 0, 7), ("g", 1, 999), ("g", 1, 1)]
    got = _cgate(spark, rows, alpha=0.1)
    n_cal, n_test, bound, n_flagged, rate = got[("g", 0, 1)]
    assert (n_cal, n_test) == (1, 2)
    assert bound is None and n_flagged == 0 and rate == 0.0


def test_conformal_drift_gate_alpha_validation(spark):
    from dwds_livestream_spark.operators.curation import (
        conformal_drift_gate,
    )

    df = spark.createDataFrame(
        [("g", 0, 1)], "source string, snapshot int, n_chars int"
    )
    with pytest.raises(ValueError):
        conformal_drift_gate(df, alpha=1.5)


# ------------------------------------------------------------------
# logbucket_quantiles
# ------------------------------------------------------------------


def _lbq(spark, rows, percentiles=(0.5, 0.9, 0.99), sub=16):
    from dwds_livestream_spark.operators.quantile_hist import (
        logbucket_quantiles,
    )

    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = logbucket_quantiles(
        df, percentiles=percentiles, sub=sub
    )
    return {
        (r.source, r.percentile): (r.n, r.q_est) for r in out.collect()
    }


def _exact_quantile(vals, p):
    s = sorted(vals)
    return float(s[math.ceil(p * len(s)) - 1])


def test_logbucket_error_bound_vs_exact(spark):
    """The sketch guarantee: q_est <= exact < q_est * (sub+1)/sub."""
    vals = [((i * 131) % 9973) + 1 for i in range(500)]
    rows = [("g", v) for v in vals]
    sub = 16
    got = _lbq(spark, rows, sub=sub)
    for p in (0.5, 0.9, 0.99):
        n, est = got[("g", p)]
        exact = _exact_quantile(vals, p)
        assert n == 500
        assert est <= exact < est * (sub + 1) / sub, (p, est, exact)


def test_logbucket_bucket_arithmetic_hand_computed(spark):
    # v=1 -> e=0,m=0 -> est 1.0; v=23 -> e=4, m=((23-16)*16)//16=7 ->
    # lower bound (16+7)*16/16 = 23.0 (23 = 10111b: exact bucket edge)
    rows = [("a", 1), ("b", 23)]
    got = _lbq(spark, rows, percentiles=(1.0,))
    assert got[("a", 1.0)] == (1, 1.0)
    assert got[("b", 1.0)] == (1, 23.0)


def test_logbucket_exact_on_powers_of_two(spark):
    # powers of two are bucket lower bounds -> estimates are EXACT
    vals = [2 ** k for k in range(11)]
    rows = [("g", v) for v in vals]
    got = _lbq(spark, rows, percentiles=(0.5, 1.0))
    assert got[("g", 0.5)] == (11, float(2 ** 5))
    assert got[("g", 1.0)] == (11, float(2 ** 10))


def test_logbucket_contract_and_validation(spark):
    from dwds_livestream_spark.operators.quantile_hist import (
        logbucket_quantiles,
    )

    rows = [("g", 5), ("g", 0), ("g", -3), ("g", None), (None, 7)]
    got = _lbq(spark, rows, percentiles=(1.0,))
    assert got == {("g", 1.0): (1, 5.0)}  # only v >= 1 with a group

    df = spark.createDataFrame([("g", 1)], "source string, n_chars long")
    with pytest.raises(ValueError):
        logbucket_quantiles(df, sub=12)        # not a power of two
    with pytest.raises(ValueError):
        logbucket_quantiles(df, percentiles=(0.0,))
    with pytest.raises(ValueError):
        logbucket_quantiles(df, percentiles=())


def test_logbucket_merge_order_invariance(spark):
    """Mergeability: the sketch is a plain additive aggregate, so the
    readout is identical under different partitionings (the
    determinism-sweep property asserted directly)."""
    vals = [((i * 17) % 4099) + 1 for i in range(300)]
    rows = [("g", v) for v in vals]
    df1 = spark.createDataFrame(rows, "source string, n_chars long").repartition(1)
    df17 = spark.createDataFrame(rows, "source string, n_chars long").repartition(17)
    from dwds_livestream_spark.operators.quantile_hist import (
        logbucket_quantiles,
    )

    a = {(r.source, r.percentile): (r.n, r.q_est)
         for r in logbucket_quantiles(df1).collect()}
    b = {(r.source, r.percentile): (r.n, r.q_est)
         for r in logbucket_quantiles(df17).collect()}
    assert a == b


def test_conformal_heavy_ties_at_rank_boundary(spark):
    """Duplicate scores straddling the conformal rank: the bound VALUE
    is order-independent (row_number tie order differs per engine,
    but every row at the rank carries the same score), and strict->
    gating keeps tied test scores unflagged."""
    # 30 calibration-side candidates all scoring 7, a few 9s on top
    rows = [(i, "g", 7) for i in range(40)] + [
        (i + 100, "g", 9) for i in range(8)
    ]
    got = _conf(spark, rows, alpha=0.2)
    n_cal, n_test, bound, n_flagged, rate = got["g"]
    # brute force on the same split
    cal = sorted(
        s for i, _, s in rows if _is_cal(i)
    )
    r = math.ceil(0.8 * (len(cal) + 1))
    assert bound == float(cal[r - 1])
    test = [s for i, _, s in rows if not _is_cal(i)]
    # strict > gating: scores EQUAL to the bound never count
    assert n_flagged == sum(1 for s in test if s > bound)
    assert (n_cal, n_test) == (len(cal), len(test))


def test_logbucket_all_identical_values(spark):
    """A degenerate single-value distribution: every percentile reads
    the one occupied bucket, whose lower bound is <= the value within
    the 1/sub relative guarantee."""
    rows = [("g", 1000)] * 50
    got = _lbq(spark, rows, percentiles=(0.01, 0.5, 1.0))
    for p in (0.01, 0.5, 1.0):
        n, est = got[("g", p)]
        assert n == 50
        assert est <= 1000 < est * 17 / 16


def test_logbucket_full_long_range_no_overflow(spark):
    """ADVICE r11: the multiply-first sub-bucket form overflows signed
    64-bit once (v - 2^e)*sub >= 2^63 (e >= 59 at sub=16); the
    divide-first form is exact for the FULL positive long range. Values
    up to Long.MAX must bucket correctly (pre-fix they silently
    mis-bucketed in legacy mode / raised in ANSI mode)."""
    sub = 16
    big = [
        2 ** 63 - 1,          # e=62, m=15 (top bucket)
        2 ** 62,              # e=62, m=0 (exact lower bound)
        2 ** 62 + 3 * 2 ** 58,  # e=62, m=3
        2 ** 60 + 2 ** 56 - 1,  # e=60, m=0 (just under the m=1 edge)
        2 ** 59,              # e=59, m=0
    ]

    def ref_bucket(v):
        e = v.bit_length() - 1
        return e, ((v - (1 << e)) * sub) >> e  # exact in Python ints

    for v in big:
        got = _lbq(spark, [("g", v)], percentiles=(1.0,), sub=sub)
        n, est = got[("g", 1.0)]
        e, m = ref_bucket(v)
        want = float((sub + m) * (1 << e)) / sub
        assert (n, est) == (1, want), (v, est, want)
        assert est <= v < est * (sub + 1) / sub

    # the DuckDB oracle's mirrored CASE form agrees on the same values
    import duckdb

    s = sub.bit_length() - 1
    con = duckdb.connect()
    for v in big:
        e, m = ref_bucket(v)
        got_m = con.sql(
            f"SELECT CASE WHEN {e} >= {s} THEN "
            f"({v}::BIGINT - (1::BIGINT << {e})) "
            f"// (1::BIGINT << ({e} - {s})) "
            f"ELSE (({v}::BIGINT - (1::BIGINT << {e})) * {sub}) "
            f"// (1::BIGINT << {e}) END"
        ).fetchone()[0]
        assert got_m == m, (v, got_m, m)
