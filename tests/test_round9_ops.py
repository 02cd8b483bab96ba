"""Round-9 operator tests: temporal path drift (the ROADMAP r10
candidate, landed with its evidence kit on declaration day)."""

from __future__ import annotations

import pytest


def _drift_rows(df):
    return {
        (r.domain, r.snapshot, r.next_snapshot): (
            r.n_prev, r.n_next, r.n_common, r.jaccard
        )
        for r in df.collect()
    }


def test_path_drift_vs_brute_force(spark):
    from dwds_livestream_spark.operators.urls import path_drift

    rows = [
        # a.com: snap 0 paths {/x/y, /z}; snap 1 paths {/x/y, /w};
        # snap 2 paths {/w}
        (0, "https://www.a.com/x/y"),
        (0, "https://a.com/z"),
        (0, "https://cdn.a.com/x/y/"),   # dup of /x/y after slash fold
        (1, "https://a.com/x/y"),
        (1, "https://a.com/w"),
        (2, "https://a.com/w"),
        # b.com exists only in snap 0 -> (b.com, 0, 1) emits jaccard 0
        (0, "https://b.com/only"),
        # c.com is born in snap 1 -> (c.com, 0->1)? no: present only
        # on the NEXT side -> row with n_prev 0
        (1, "https://c.com/new"),
    ]
    df = spark.createDataFrame(rows, "snapshot int, url string")
    got = _drift_rows(path_drift(df, url_col="url", period_col="snapshot"))
    assert got == {
        ("a.com", 0, 1): (2, 2, 1, pytest.approx(1 / 3, abs=1e-6)),
        ("a.com", 1, 2): (2, 1, 1, 0.5),
        ("b.com", 0, 1): (1, 0, 0, 0.0),
        ("c.com", 0, 1): (0, 1, 0, 0.0),   # birth
        ("c.com", 1, 2): (1, 0, 0, 0.0),   # death
    }

    # NULL url / NULL period rows are excluded, not crash or pair
    withnull = spark.createDataFrame(
        rows + [(None, "https://a.com/x/y"), (0, None)],
        "snapshot int, url string",
    )
    assert _drift_rows(
        path_drift(withnull, url_col="url", period_col="snapshot")
    ) == got

    # identical sets across snapshots -> jaccard 1.0
    stable = spark.createDataFrame(
        [(0, "https://s.com/p"), (1, "https://s.com/p")],
        "snapshot int, url string",
    )
    (r,) = path_drift(stable, period_col="snapshot").collect()
    assert (r.domain, r.jaccard) == ("s.com", 1.0)

    # a single snapshot has no consecutive pair -> empty output
    single = spark.createDataFrame(
        [(0, "https://s.com/p")], "snapshot int, url string"
    )
    assert path_drift(single, period_col="snapshot").count() == 0


def test_path_drift_gap_periods_pair_consecutively(spark):
    """Periods need not be dense: lead() pairs each period with the
    next OBSERVED one (snap 0 -> snap 5), the rbo_drift convention."""
    from dwds_livestream_spark.operators.urls import path_drift

    df = spark.createDataFrame(
        [(0, "https://g.com/a"), (5, "https://g.com/a"),
         (5, "https://g.com/b")],
        "snapshot int, url string",
    )
    got = _drift_rows(path_drift(df, period_col="snapshot"))
    assert got == {("g.com", 0, 5): (1, 2, 1, 0.5)}


def test_path_novelty_vs_brute_force(spark):
    from dwds_livestream_spark.operators.urls import path_novelty

    rows = [
        (0, "https://a.com/x"),
        (0, "https://a.com/y"),
        (0, "https://www.a.com/x"),      # same (domain, path) as row 0
        (1, "https://a.com/x"),          # carried over
        (1, "https://a.com/z"),          # new
        (1, "https://b.com/x"),          # new domain -> new URL
        (2, "https://a.com/z"),          # all carried over
        (2, "https://b.com/x"),
    ]
    df = spark.createDataFrame(rows, "snapshot int, url string")
    got = {
        r.snapshot: (r.n_urls, r.n_new, r.novelty)
        for r in path_novelty(df, period_col="snapshot").collect()
    }
    assert got == {
        0: (2, 2, 1.0),                  # first snapshot: all new
        1: (3, 2, pytest.approx(2 / 3, abs=1e-6)),
        2: (2, 0, 0.0),                  # fully saturated
    }

    # NULL url / period rows excluded
    withnull = spark.createDataFrame(
        rows + [(None, "https://a.com/x"), (1, None)],
        "snapshot int, url string",
    )
    assert {
        r.snapshot: (r.n_urls, r.n_new, r.novelty)
        for r in path_novelty(withnull, period_col="snapshot").collect()
    } == got


def test_ks_panel_vs_brute_force(spark):
    from dwds_livestream_spark.operators.curation import ks_panel

    sample = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 2), ("b", 7), ("b", 9)],
        "source string, n_chars long",
    )
    ref = spark.createDataFrame(
        [(v,) for v in (1, 2, 4, 4, 5)], "n_chars long"
    )
    got = {
        r.source: (r.n_sample, r.n_ref, r.ks)
        for r in ks_panel(sample, ref).collect()
    }

    def ks(vals, rvals):
        pts = sorted(set(vals) | set(rvals))
        def e(vs, x):
            return sum(1 for v in vs if v <= x) / len(vs)
        return round(max(abs(e(vals, x) - e(rvals, x)) for x in pts), 6)

    assert got.keys() == {"a", "b"}
    assert got["a"] == (3, 5, pytest.approx(ks([1, 2, 2], [1, 2, 4, 4, 5]), abs=1e-9))
    # b's support is fully above the reference -> ks 1.0
    assert got["b"] == (2, 5, 1.0)

    # each group against itself as reference -> 0 for the full match
    same = {
        r.source: r.ks
        for r in ks_panel(
            sample.where("source = 'a'"),
            sample.where("source = 'a'").select("n_chars"),
        ).collect()
    }
    assert same == {"a": 0.0}

    # degenerate reference (empty): truthful counts, NULL ks
    empty = spark.createDataFrame([], "n_chars long")
    rows = ks_panel(sample, empty).collect()
    assert {(r.source, r.n_sample, r.n_ref, r.ks) for r in rows} == {
        ("a", 3, 0, None), ("b", 2, 0, None)
    }

    # NULL groups / NULL values excluded
    withnull = spark.createDataFrame(
        [("a", 1), ("a", None), (None, 5)], "source string, n_chars long"
    )
    (only,) = ks_panel(withnull, ref).collect()
    assert (only.source, only.n_sample) == ("a", 1)


def test_ks_binned_matches_exact_on_integer_grid(spark):
    """With bins >= the distinct-value count and integer values, the
    binned D must be ordinally equivalent to exact D wherever the grid
    separates the same values; with a coarse grid it is a lower bound
    on exact D."""
    from dwds_livestream_spark.operators.curation import (
        ks_distance,
        ks_panel,
    )

    a = spark.createDataFrame(
        [(v,) for v in (1, 2, 2, 3, 7)], "n_chars long"
    )
    b = spark.createDataFrame(
        [(v,) for v in (1, 2, 4, 4, 5, 9)], "n_chars long"
    )
    (exact,) = ks_distance(a, b).collect()
    # 1024 bins over [1, 9]: every integer lands in its own bucket
    (fine,) = ks_distance(a, b, bins=1024).collect()
    assert fine.ks == pytest.approx(exact.ks, abs=1e-9)
    assert (fine.n_sample, fine.n_ref) == (5, 6)
    # a coarse grid can only merge evaluation points -> lower bound
    (coarse,) = ks_distance(a, b, bins=2).collect()
    assert coarse.ks <= exact.ks + 1e-9

    # degenerate range (all values equal) -> one bucket, ks 0
    c = spark.createDataFrame([(5,), (5,)], "n_chars long")
    (dg,) = ks_distance(c, c, bins=8).collect()
    assert dg.ks == 0.0

    # panel: same grid across groups, group keys survive
    s = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 8.5), ("b", 9.0)],
        "source string, n_chars double",
    )
    r = spark.createDataFrame(
        [(v,) for v in (1.0, 2.0, 8.5, 9.0)], "n_chars double"
    )
    rows = {x.source: x for x in ks_panel(s, r, bins=512).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"].n_sample == 2 and rows["a"].n_ref == 4
    # group a occupies the bottom of the shared grid: D = |1 - 0.5|
    assert rows["a"].ks == pytest.approx(0.5, abs=1e-6)
    assert rows["b"].ks == pytest.approx(0.5, abs=1e-6)

    import pytest as _pt
    with _pt.raises(ValueError):
        ks_distance(a, b, bins=0)


def test_ks_quantize_clamps_top_bucket(spark):
    """Review r9 #1: (x-lo)/(hi-lo) can round to exactly 1.0 for x
    strictly below hi, so the bucket expression must clamp BOTH ends
    to [1, bins] — reproduced with the exact doubles from the review."""
    import math

    from dwds_livestream_spark.operators.curation import _ks_quantize

    lo = -731.2715117751975
    hi = 116.16237772829822
    x = math.nextafter(hi, -math.inf)   # strictly below hi
    s = spark.createDataFrame([(lo,), (x,)], "n_chars double")
    r = spark.createDataFrame([(hi,)], "n_chars double")
    qs, qr = _ks_quantize(s, r, "n_chars", 32)
    sample_buckets = sorted(row.n_chars for row in qs.collect())
    (ref_bucket,) = [row.n_chars for row in qr.collect()]
    assert ref_bucket == 32
    assert sample_buckets == [1, 32]    # was [1, 33] before the clamp


def test_content_drift_vs_brute_force(spark):
    from dwds_livestream_spark.operators.curation import content_drift

    rows = [
        # src a, snap 0: grams of "x y z w" = {x y z, y z w}
        (0, "a", "x y z w"),
        # snap 1 doc shares one gram: "x y z" -> {x y z}
        (1, "a", "x y z"),
        # snap 1 also adds a disjoint doc
        (1, "a", "p q r"),
        # src b: identical text both snaps -> jaccard 1
        (0, "b", "m n o"),
        (1, "b", "m n o"),
        # src c: only in snap 0 -> death row
        (0, "c", "d e f"),
        # too-short doc contributes nothing
        (1, "c", "hi"),
    ]
    df = spark.createDataFrame(rows, "snapshot int, source string, text string")
    got = {
        (r.source, r.snapshot, r.next_snapshot): (
            r.n_prev, r.n_next, r.n_common, r.jaccard
        )
        for r in content_drift(df, period_col="snapshot", n=3).collect()
    }
    assert got == {
        # a: prev {xyz, yzw}, next {xyz, pqr} -> common 1, union 3
        ("a", 0, 1): (2, 2, 1, pytest.approx(1 / 3, abs=1e-6)),
        ("b", 0, 1): (1, 1, 1, 1.0),
        ("c", 0, 1): (1, 0, 0, 0.0),   # the short doc adds no grams
    }

    # NULL group / period rows excluded
    withnull = spark.createDataFrame(
        rows + [(None, "a", "x y z"), (0, None, "x y z")],
        "snapshot int, source string, text string",
    )
    assert {
        (r.source, r.snapshot, r.next_snapshot)
        for r in content_drift(withnull, period_col="snapshot", n=3).collect()
    } == set(got)

    import pytest as _pt
    with _pt.raises(ValueError):
        content_drift(df, n=0)


def test_dup_rate_drift_vs_brute_force(spark):
    from dwds_livestream_spark.operators.curation import dup_rate_drift

    rows = [
        # src a snap 0: 3 docs, one dup pair -> rate 1/3
        (0, "a", 10, "t1"), (0, "a", 11, "t1"), (0, "a", 12, "t2"),
        # src a snap 1: 2 distinct docs -> rate 0
        (1, "a", 13, "t3"), (1, "a", 14, "t4"),
        # src b in snap 0 only -> no pair row (rate undefined in 1)
        (0, "b", 15, "t5"),
        # src c: all-dup snap 1 pairizes with snap 2
        (1, "c", 16, "t6"), (1, "c", 17, "t6"),
        (2, "c", 18, "t7"),
    ]
    df = spark.createDataFrame(
        rows, "snapshot int, source string, doc_id long, text string"
    )
    got = {
        (r.source, r.snapshot, r.next_snapshot): (
            r.n_docs, r.next_n_docs, r.dup_rate, r.next_dup_rate, r.delta
        )
        for r in dup_rate_drift(df).collect()
    }
    third = round(1 / 3, 6)
    assert got == {
        ("a", 0, 1): (3, 2, third, 0.0, -third),
        ("c", 1, 2): (2, 1, 0.5, 0.0, -0.5),
    }
    assert ("b", 0, 1) not in got  # absent side -> no fabricated row

    # NULL group / period rows excluded
    withnull = spark.createDataFrame(
        rows + [(None, "a", 99, "t1"), (0, None, 98, "t1")],
        "snapshot int, source string, doc_id long, text string",
    )
    assert {
        (r.source, r.snapshot, r.next_snapshot)
        for r in dup_rate_drift(withnull).collect()
    } == set(got)


def test_dup_rate_by_group_composite_key(spark):
    """The list-valued group_col is the dup_rate_drift fold and must
    agree with per-slice scalar calls."""
    from dwds_livestream_spark.operators.curation import dup_rate_by_group

    df = spark.createDataFrame(
        [("a", 0, 1, "x"), ("a", 0, 2, "x"), ("a", 1, 3, "x"),
         ("b", 0, 4, "y")],
        "source string, snapshot int, doc_id long, text string",
    )
    rows = {
        (r.source, r.snapshot): (r.n_docs, r.n_dup_docs, r.dup_rate)
        for r in dup_rate_by_group(
            df, group_col=["source", "snapshot"]
        ).collect()
    }
    assert rows == {
        ("a", 0): (2, 1, 0.5),
        ("a", 1): (1, 0, 0.0),
        ("b", 0): (1, 0, 0.0),
    }


def test_ks_drift_vs_brute_force(spark):
    from dwds_livestream_spark.operators.curation import ks_drift

    rows = [
        (0, "a", 1), (0, "a", 2), (0, "a", 2),
        (1, "a", 7), (1, "a", 9),          # fully shifted -> ks 1
        (0, "b", 5), (1, "b", 5),          # identical -> ks 0
        (0, "c", 3),                        # absent in 1 -> no row
        (2, "a", 7),                        # a: {7,9} -> {7}
    ]
    df = spark.createDataFrame(rows, "snapshot int, source string, n_chars long")
    got = {
        (r.source, r.snapshot, r.next_snapshot): (r.n_prev, r.n_next, r.ks)
        for r in ks_drift(df).collect()
    }
    assert got == {
        ("a", 0, 1): (3, 2, 1.0),
        ("a", 1, 2): (2, 1, 0.5),   # ECDF gap at v=7: |0.5 - 1.0|
        ("b", 0, 1): (1, 1, 0.0),
    }
    assert not any(k[0] == "c" for k in got)

    # NULL value/group/period rows excluded
    withnull = spark.createDataFrame(
        rows + [(0, "a", None), (None, "a", 1), (0, None, 1)],
        "snapshot int, source string, n_chars long",
    )
    assert {
        (r.source, r.snapshot, r.next_snapshot): (r.n_prev, r.n_next, r.ks)
        for r in ks_drift(withnull).collect()
    } == got


def test_ks_drift_binned_vs_unbinned_on_integer_grid(spark):
    """bins >= the distinct-value count on integer values reproduces
    the exact drift; a coarse grid is a lower bound per cell."""
    from dwds_livestream_spark.operators.curation import ks_drift

    rows = [
        (0, "a", 1.0), (0, "a", 2.0), (0, "a", 2.0),
        (1, "a", 7.0), (1, "a", 9.0),
        (0, "b", 5.0), (1, "b", 5.0),
    ]
    df = spark.createDataFrame(rows, "snapshot int, source string, n_chars double")
    exact = {
        (r.source, r.snapshot): r.ks for r in ks_drift(df).collect()
    }
    fine = {
        (r.source, r.snapshot): r.ks
        for r in ks_drift(df, bins=1024).collect()
    }
    assert fine == pytest.approx(exact)
    coarse = {
        (r.source, r.snapshot): r.ks
        for r in ks_drift(df, bins=2).collect()
    }
    assert set(coarse) == set(exact)
    for k in coarse:
        assert coarse[k] <= exact[k] + 1e-9


def test_drift_anomaly_vs_brute_force(spark):
    """The composition query's z-scores against a naive population
    computation — exercised via the registry entry at sf0.001."""
    import math

    from dwds_livestream_spark.plans import llm as L

    sf = "/root/testdata/sf0.001"
    rows = L.q_drift_anomaly(spark, sf).collect()
    assert rows
    from collections import defaultdict
    by_pair = defaultdict(list)
    for r in rows:
        by_pair[(r.snapshot, r.next_snapshot)].append(r)
    for pair, rs in by_pair.items():
        js = [round(r.jaccard * 1e6) for r in rs]
        n = len(js)
        mu = sum(js) / n
        var = (sum(j * j for j in js) - sum(js) ** 2 / n) / n
        for r in rs:
            j = round(r.jaccard * 1e6)
            want = 0.0 if var <= 0 else (j - mu) / math.sqrt(var)
            assert abs(r.z - round(want, 6)) < 1e-9, (pair, r.domain)
        # z-scores of a population are centered: sum ~ 0
        assert abs(sum(r.z for r in rs)) < 1e-3 * max(n, 1)
