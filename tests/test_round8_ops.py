"""Round-8 operators, each vs an in-test naive reference:
url normalization / registered-domain dedup, corpus-vs-corpus n-gram
novelty, quantile normalization, per-group length-band filter, Zipf
fit, and the percentile-bucketed join's ntile parity.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from dwds_livestream_spark.operators.curation import (
    length_band_filter,
    ngram_novelty,
    zipf_fit,
)
from dwds_livestream_spark.operators.embedding_ops import quantile_normalize
from dwds_livestream_spark.operators.urls import (
    domain_dedup,
    normalize_url,
    registered_domain,
    url_host,
)


# ------------------------------------------------------------- urls
URL_CASES = [
    # url, host, registered_domain, normalized
    ("https://www.Example.COM/a/b", "www.example.com", "example.com",
     "example.com/a/b"),
    ("https://cdn.news.example.co.uk:8080/x/", "cdn.news.example.co.uk",
     "example.co.uk", "cdn.news.example.co.uk/x"),
    ("http://user:pw@api.shop.com.br/p?q=1#f", "api.shop.com.br",
     "shop.com.br", "api.shop.com.br/p"),
    ("https://localhost:9000", "localhost", "localhost", "localhost/"),
    ("//static.site.fr/img//", "static.site.fr", "site.fr",
     "static.site.fr/img"),
    ("bare.host.de/path", "bare.host.de", "host.de", "bare.host.de/path"),
    ("https://www.co.uk/", "www.co.uk", "www.co.uk", "co.uk/"),
]


def test_url_parts_unit_cases(spark):
    df = spark.createDataFrame(
        [(u,) for u, *_ in URL_CASES], "url string"
    ).select(
        "url",
        url_host(F.col("url")).alias("host"),
        registered_domain(url_host(F.col("url"))).alias("dom"),
        normalize_url(F.col("url")).alias("nurl"),
    )
    got = {r.url: (r.host, r.dom, r.nurl) for r in df.collect()}
    for url, host, dom, nurl in URL_CASES:
        assert got[url] == (host, dom, nurl), url


def test_domain_dedup_vs_brute_force(spark):
    rows = [
        (0, "https://www.a.com/x"),
        (1, "http://a.com/x/"),          # same normalized URL as 0
        (2, "https://cdn.a.com/x"),      # same domain, new host+url
        (3, "https://a.com/y?utm=1"),    # same domain, new path
        (4, "https://b.co.uk/x"),
        (5, "https://www.b.co.uk/x#top"),  # dup of 4 after normalize
    ]
    out = {
        r.domain: r.asDict()
        for r in domain_dedup(
            spark.createDataFrame(rows, "doc_id long, url string")
        ).collect()
    }
    a = out["a.com"]
    assert (a["n_docs"], a["n_hosts"], a["n_urls"], a["n_url_dups"],
            a["keeper_id"]) == (4, 3, 3, 1, 0)
    b = out["b.co.uk"]
    assert (b["n_docs"], b["n_hosts"], b["n_urls"], b["n_url_dups"],
            b["keeper_id"]) == (2, 2, 1, 1, 4)


# ---------------------------------------------------- ngram novelty
def _shingles(text: str, n: int) -> set[str]:
    w = [t for t in re.split(r"\s+", text.lower()) if t]
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def test_ngram_novelty_vs_brute_force(spark):
    train_rows = [
        (0, "the cat sat on the mat"),
        (1, "a dog barked at the cat"),
    ]
    eval_rows = [
        (10, "the cat sat on a chair"),   # shares "the cat sat" etc.
        (11, "completely novel text here now"),
        (12, "on the mat"),               # fully memorized
        (13, "xy"),                       # < n tokens -> 0 shingles
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    got = {r.doc_id: r for r in ngram_novelty(train, ev, n=3).collect()}

    train_set = set().union(*(_shingles(t, 3) for _, t in train_rows))
    for doc_id, text in eval_rows:
        sh = _shingles(text, 3)
        seen = len(sh & train_set)
        r = got[doc_id]
        assert r.n_shingles == len(sh)
        assert r.n_seen == seen
        if sh:
            assert r.novelty == pytest.approx(
                round(1 - seen / len(sh), 6), abs=1e-9
            )
        else:
            assert r.novelty is None


# ------------------------------------------------ quantile normalize
@pytest.mark.parametrize("n_buckets", [1, 4])
def test_quantile_normalize_vs_numpy(spark, n_buckets):
    rng = np.random.RandomState(7)
    n, d = 40, 5
    mat = rng.randn(n, d).astype(np.float32)
    mat[3, 2] = mat[9, 2]  # exact tie inside one dim
    rows = [Row(vec_id=i, embedding=[float(x) for x in mat[i]])
            for i in range(n)]
    df = spark.createDataFrame(rows)
    got = {
        (r.vec_id, r.dim): r.qn
        for r in quantile_normalize(df, n_buckets=n_buckets).collect()
    }
    assert len(got) == n * d

    x = mat.astype(np.float64)
    # rank within dim by (value, vec_id); mean across dims at each rank
    order = np.zeros((n, d), dtype=int)  # rank-1 -> row index per dim
    for j in range(d):
        order[:, j] = sorted(range(n), key=lambda i: (x[i, j], i))
    rank_mean = np.array([
        np.mean([x[order[r, j], j] for j in range(d)]) for r in range(n)
    ])
    for j in range(d):
        for r in range(n):
            i = order[r, j]
            assert got[(i, j)] == pytest.approx(rank_mean[r], rel=1e-12)


def test_quantile_normalize_equalizes_marginals(spark):
    rng = np.random.RandomState(3)
    rows = [
        Row(vec_id=i, embedding=[float(rng.randn()), float(10 + 5 * rng.randn())])
        for i in range(30)
    ]
    out = quantile_normalize(spark.createDataFrame(rows))
    per_dim = {
        r.dim: r
        for r in out.groupBy("dim")
        .agg(F.round(F.avg("qn"), 9).alias("mu"),
             F.round(F.min("qn"), 9).alias("lo"),
             F.round(F.max("qn"), 9).alias("hi"))
        .collect()
    }
    assert per_dim[0].asDict() == (per_dim[1].asDict() | {"dim": 0})


# ------------------------------------------------- length band filter
def test_length_band_filter_vs_brute_force(spark):
    rows = [(i, "g1" if i < 20 else "g2", v)
            for i, v in enumerate([*range(100, 120), *range(500, 540, 2)])]
    df = spark.createDataFrame(rows, "doc_id long, grp string, v long")
    out = length_band_filter(df, group_col="grp", value_col="v",
                             lo_p=0.1, hi_p=0.9)
    got = {r.doc_id for r in out.collect()}

    expect = set()
    bands = {}
    for g in ("g1", "g2"):
        vals = sorted(v for _, gg, v in rows if gg == g)
        lo = vals[math.ceil(0.1 * len(vals)) - 1]
        hi = vals[math.ceil(0.9 * len(vals)) - 1]
        bands[g] = (lo, hi)
        expect |= {i for i, gg, v in rows if gg == g and lo <= v <= hi}
    assert got == expect
    b = {(r.grp, r.band_lo, r.band_hi) for r in out.collect()}
    assert b == {("g1", *bands["g1"]), ("g2", *bands["g2"])}

    with pytest.raises(ValueError):
        length_band_filter(df, group_col="grp", value_col="v",
                           lo_p=0.9, hi_p=0.1)


# ------------------------------------------------------------- zipf
def test_zipf_fit_vs_numpy(spark):
    # zipf-ish corpus: word w_i appears ~ N/i times
    words = []
    for i in range(1, 30):
        words += [f"w{i:02d}"] * (300 // i)
    docs = [(0, "lang_a", " ".join(words))]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    r = zipf_fit(df, group_col="lang", k=10).collect()[0]
    assert r.n_types == 29

    counts = sorted(
        ((words.count(f"w{i:02d}"), f"w{i:02d}") for i in range(1, 30)),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    lr = np.log(np.arange(1, 11))
    lf = np.log([c for c, _ in counts])
    slope, intercept = np.polyfit(lr, lf, 1)
    ss_res = np.sum((lf - (slope * lr + intercept)) ** 2)
    ss_tot = np.sum((lf - lf.mean()) ** 2)
    assert r.zipf_slope == pytest.approx(round(slope, 6), abs=2e-6)
    assert r.zipf_intercept == pytest.approx(round(intercept, 6), abs=2e-6)
    assert r.r2 == pytest.approx(round(1 - ss_res / ss_tot, 6), abs=2e-6)
    assert -1.3 < r.zipf_slope < -0.7  # zipf-shaped by construction


# ------------------------------------ post-window r8: sketch accuracy
def test_minhash_jaccard_error_vs_brute_force(spark):
    from dwds_livestream_spark.operators.dedup import minhash_jaccard_error

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (0, base.strip()),
        (1, base.strip()),                       # exact dup of 0
        (2, (base + "and then some more words").strip()),
        (3, "an entirely different document about spark shuffles"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.doc_a, r.doc_b): r
           for r in minhash_jaccard_error(df, n=3, k=64, bands=16).collect()}
    assert (0, 1) in out  # exact dups must collide in every band
    r01 = out[(0, 1)]
    assert r01.est_jaccard == 1.0 and r01.jaccard == 1.0 and r01.abs_err == 0.0
    for (a, b), r in out.items():
        sa, sb = _shingles(rows[a][1], 3), _shingles(rows[b][1], 3)
        exact = len(sa & sb) / len(sa | sb)
        assert r.jaccard == pytest.approx(round(exact, 6), abs=1e-9), (a, b)
        assert 0.0 <= r.est_jaccard <= 1.0
        assert r.abs_err == pytest.approx(
            round(abs(r.est_jaccard - exact), 6), abs=1e-6
        )


def test_dup_rate_by_group_vs_brute_force(spark):
    from dwds_livestream_spark.operators.curation import dup_rate_by_group

    rows = [
        (0, "s1", "aaa"), (1, "s1", "aaa"), (2, "s1", "bbb"),
        (3, "s2", "ccc"),
        (4, "s3", "ddd"), (5, "s3", "ddd"), (6, "s3", "ddd"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.source: r for r in dup_rate_by_group(df).collect()}
    assert (got["s1"].n_docs, got["s1"].n_unique, got["s1"].n_dup_docs) == (3, 2, 1)
    assert got["s1"].dup_rate == pytest.approx(round(1 / 3, 6))
    assert got["s2"].dup_rate == 0.0
    assert (got["s3"].n_dup_docs, got["s3"].dup_rate) == (
        2, pytest.approx(round(2 / 3, 6)))
    # keeper convention: min id per group (exact_dedup / domain_dedup)
    assert (got["s1"].keeper_id, got["s2"].keeper_id,
            got["s3"].keeper_id) == (0, 3, 4)


# ---------------------------------- post-window r8: r9-candidate trio
def test_domain_quota_sample_deterministic_and_nested(spark):
    import hashlib

    from dwds_livestream_spark.operators.urls import domain_quota_sample

    rows = [(i, f"https://www.big.com/p/{i}") for i in range(20)] + [
        (100, "https://small.fr/x"), (101, "https://www.small.fr/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out3 = domain_quota_sample(df, quota=3)
    got = {r.domain: sorted(x.doc_id for x in out3.collect() if x.domain == r.domain)
           for r in out3.collect()}
    # brute force: md5(doc_id) order within big.com
    order = sorted(range(20), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    assert got["big.com"] == sorted(order[:3])
    assert got["small.fr"] == [100, 101]  # under quota: all kept

    # nested property: quota=5 keeps quota=3's picks
    out5 = {r.doc_id for r in domain_quota_sample(df, quota=5).collect()}
    assert {r.doc_id for r in out3.collect()} <= out5

    with pytest.raises(ValueError):
        domain_quota_sample(df, quota=0)


def test_suffix_prefix_pairs_vs_brute_force(spark):
    from dwds_livestream_spark.operators.dedup import suffix_prefix_pairs

    rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "gamma delta epsilon zeta eta"),   # 0's tail = 1's head
        (2, "delta epsilon zeta"),              # 1's tail? no: 'zeta eta' != head; 2's head = middle of 1
        (3, "zeta eta theta iota"),             # 1's tail 'epsilon zeta eta' vs 3 head 'zeta eta theta' no
        (4, "xx yy"),                           # < n tokens: excluded
        (5, "alpha beta gamma"),                # head == tail == itself; 5 tail = 0's head
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b, r.boundary)
           for r in suffix_prefix_pairs(df, n=3).collect()}

    def toks(t): return t.split(" ")
    expect = set()
    keyed = {i: (" ".join(toks(t)[:3]), " ".join(toks(t)[-3:]))
             for i, t in rows if len(toks(t)) >= 3}
    for a, (_, ta) in keyed.items():
        for b, (hb, _) in keyed.items():
            if a != b and ta == hb:
                expect.add((a, b, ta))
    assert got == expect
    assert (0, 1, "gamma delta epsilon") in got
    assert (5, 0, "alpha beta gamma") in got
    assert all(4 not in (a, b) for a, b, _ in got)


def test_rbo_overlap_vs_brute_force(spark):
    from dwds_livestream_spark.operators.retrieval import rbo_overlap

    # two rankings over partially overlapping items
    ra = [(10, 1), (11, 2), (12, 3), (13, 4)]
    rb = [(11, 1), (10, 2), (14, 3), (12, 4)]
    a = spark.createDataFrame(ra, "doc_id long, rank int")
    b = spark.createDataFrame(rb, "doc_id long, rank int")
    k, p = 4, 0.9
    (row,) = rbo_overlap(a, b, depth=k, p=p).collect()

    # brute force: prefix overlaps
    da = {doc: rank for doc, rank in ra}
    db = {doc: rank for doc, rank in rb}
    rbo = 0.0
    for d in range(1, k + 1):
        A = {doc for doc, rank in da.items() if rank <= d}
        B = {doc for doc, rank in db.items() if rank <= d}
        rbo += p ** (d - 1) * len(A & B) / d
    rbo *= 1 - p
    assert row.n_shared == 3  # 10, 11, 12 shared within depth
    assert row.rbo == pytest.approx(round(rbo, 6), abs=1e-9)
    assert (row.p, row.depth) == (0.9, 4)

    # identical rankings -> RBO = (1-p) * sum p^(d-1) (overlap d/d = 1)
    (ident,) = rbo_overlap(a, a, depth=k, p=p).collect()
    assert ident.rbo == pytest.approx(
        round((1 - p) * sum(p ** (d - 1) for d in range(1, k + 1)), 6)
    )
    # disjoint rankings -> 0
    c = spark.createDataFrame([(99, 1), (98, 2)], "doc_id long, rank int")
    (disj,) = rbo_overlap(a, c, depth=k, p=p).collect()
    assert (disj.n_shared, disj.rbo) == (0, 0.0)

    with pytest.raises(ValueError):
        rbo_overlap(a, b, depth=0)
    with pytest.raises(ValueError):
        rbo_overlap(a, b, depth=4, p=1.0)


# ------------------------------ late-r8: remaining r9-candidate trio
def test_group_quantile_normalize_vs_brute_force(spark):
    rows = [
        # (id, group, vec) — two groups with different scales/offsets
        (0, "a", [1.0, 10.0]),
        (1, "a", [3.0, 30.0]),
        (2, "a", [2.0, 20.0]),
        (3, "b", [100.0, 0.5]),
        (4, "b", [300.0, 1.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    got = {(r.vec_id, r.dim): (r.label, r.qn)
           for r in quantile_normalize(df, group_col="label").collect()}

    # brute force per group: rank within (group, dim), mean across dims
    import collections
    by_group = collections.defaultdict(list)
    for i, g, v in rows:
        by_group[g].append((i, v))
    expect = {}
    for g, members in by_group.items():
        d = len(members[0][1])
        ranked = {}  # (id, dim) -> rn
        for dim in range(d):
            order = sorted(members, key=lambda m: (m[1][dim], m[0]))
            for rn, (i, _) in enumerate(order, 1):
                ranked[(i, dim)] = rn
        for rn in range(1, len(members) + 1):
            vals = [v[dim] for i, v in members for dim in range(d)
                    if ranked[(i, dim)] == rn]
            mu = sum(vals) / len(vals)
            for i, v in members:
                for dim in range(d):
                    if ranked[(i, dim)] == rn:
                        expect[(i, dim)] = (g, mu)
    assert set(got) == set(expect)
    for key, (g, mu) in expect.items():
        assert got[key][0] == g
        assert got[key][1] == pytest.approx(mu, abs=1e-9), key

    # group marginals: within a group every dim carries the same
    # multiset of values; across groups they differ
    # NULL group rows are excluded
    withnull = spark.createDataFrame(
        [(0, "a", [1.0, 2.0]), (1, None, [3.0, 4.0])],
        "vec_id long, label string, embedding array<double>",
    )
    assert {r.vec_id for r in
            quantile_normalize(withnull, group_col="label").collect()
            } == {0}

    a_dims = collections.defaultdict(list)
    for (i, dim), (g, qn) in got.items():
        if g == "a":
            a_dims[dim].append(round(qn, 9))
    vals = [sorted(v) for v in a_dims.values()]
    assert all(v == vals[0] for v in vals)


def test_path_neardup_pairs_vs_brute_force(spark):
    from dwds_livestream_spark.operators.urls import path_neardup_pairs

    rows = [
        (0, "https://www.a.com/x/y/z"),
        (1, "https://cdn.a.com/x/y/w"),     # same domain, J = 2/4
        (2, "https://a.com/x/y/z/"),        # trailing slash: J = 1 with 0
        (3, "https://b.com/x/y/z"),         # other domain: never pairs w/ 0
        (4, "https://b.com/p/q"),           # same domain as 3, disjoint path
        (5, "https://a.com/"),              # root path: no segments
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {(r.doc_a, r.doc_b): (r.domain, r.jaccard)
           for r in path_neardup_pairs(df, threshold=0.6).collect()}
    assert got == {(0, 2): ("a.com", 1.0)}

    lo = {(r.doc_a, r.doc_b): (r.domain, r.jaccard)
          for r in path_neardup_pairs(df, threshold=0.4).collect()}
    assert lo == {
        (0, 2): ("a.com", 1.0),
        (0, 1): ("a.com", 0.5),
        (1, 2): ("a.com", 0.5),
    }
    # root-path and cross-domain docs never appear
    assert all(5 not in pair and (3, 4) != pair for pair in lo)

    # stop-segment cap: shared-by-all segment 'x' dropped at df<=2
    capped = path_neardup_pairs(df, threshold=0.4, max_segment_df=2)
    # 'x' and 'y' appear in docs 0,1,2 within a.com (df=3) -> dropped;
    # 'z' (docs 0,2) survives -> only (0,2) can still meet
    assert {(r.doc_a, r.doc_b) for r in capped.collect()} == {(0, 2)}

    with pytest.raises(ValueError):
        path_neardup_pairs(df, threshold=0.0)

    # NULL url rows are excluded, not join-dropped by accident
    withnull = spark.createDataFrame(
        rows + [(9, None)], "doc_id long, url string"
    )
    same = {(r.doc_a, r.doc_b)
            for r in path_neardup_pairs(withnull, threshold=0.4).collect()}
    assert same == set(lo)


def test_path_neardup_default_cap_is_finite(spark):
    """VERDICT r8 #3: the ambient default must bound posting lists —
    unbounded fan-out is opt-in via max_segment_df=None only."""
    import inspect

    from dwds_livestream_spark.operators.urls import path_neardup_pairs

    sig = inspect.signature(path_neardup_pairs)
    default = sig.parameters["max_segment_df"].default
    assert default is not None and default == 10_000

    # a boilerplate segment shared by > cap docs is dropped under the
    # default; None restores the exact (quadratic) semantics
    rows = [(i, f"https://big.com/boiler/p{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    capped = path_neardup_pairs(df, threshold=0.3, max_segment_df=3)
    assert capped.count() == 0  # 'boiler' df=6 > 3, unique p{i} never pair
    exact = path_neardup_pairs(df, threshold=0.3, max_segment_df=None)
    assert exact.count() == 15  # all C(6,2) pairs share 'boiler', J=1/3


def test_rbo_drift_vs_brute_force(spark):
    from dwds_livestream_spark.operators.retrieval import rbo_drift

    # three periods; day 3 disjoint from day 2
    rows = (
        [("d1", i + 10, r + 1) for r, i in enumerate([0, 1, 2, 3])]
        + [("d2", i + 10, r + 1) for r, i in enumerate([1, 0, 4, 2])]
        + [("d3", 99, 1), ("d3", 98, 2)]
    )
    df = spark.createDataFrame(rows, "day string, doc_id long, rank int")
    k, p = 4, 0.9
    got = {(r.day, r.next_day): (r.n_shared, r.rbo)
           for r in rbo_drift(df, depth=k, p=p, period_col="day").collect()}

    def brute(ra, rb):
        rbo = 0.0
        for d in range(1, k + 1):
            A = {doc for doc, rank in ra.items() if rank <= d}
            B = {doc for doc, rank in rb.items() if rank <= d}
            rbo += p ** (d - 1) * len(A & B) / d
        return round(rbo * (1 - p), 6)

    d1 = {10: 1, 11: 2, 12: 3, 13: 4}
    d2 = {11: 1, 10: 2, 14: 3, 12: 4}
    assert set(got) == {("d1", "d2"), ("d2", "d3")}
    assert got[("d1", "d2")][0] == 3
    assert got[("d1", "d2")][1] == pytest.approx(brute(d1, d2), abs=1e-9)
    # disjoint consecutive pair still emits a row with rbo = 0
    assert got[("d2", "d3")] == (0, 0.0)

    # NULL period rows are excluded
    withnull = spark.createDataFrame(
        rows + [(None, 7, 1)], "day string, doc_id long, rank int"
    )
    assert {(r.day, r.next_day) for r in
            rbo_drift(withnull, depth=k, p=p, period_col="day").collect()
            } == set(got)

    with pytest.raises(ValueError):
        rbo_drift(df, depth=0)
    with pytest.raises(ValueError):
        rbo_drift(df, depth=4, p=0.0)


def test_rbo_panel_vs_brute_force(spark):
    from dwds_livestream_spark.operators.retrieval import rbo_panel

    ref = [(10, 1), (11, 2), (12, 3), (13, 4)]
    groups = {
        "g_same": [(10, 1), (11, 2), (12, 3), (13, 4)],   # identical
        "g_perm": [(11, 1), (10, 2), (14, 3), (12, 4)],   # shared 3
        "g_disj": [(97, 1), (98, 2), (99, 3), (96, 4)],   # disjoint
    }
    rows = [(g, i, r) for g, lst in groups.items() for i, r in lst]
    gdf = spark.createDataFrame(rows, "source string, doc_id long, rank int")
    rdf = spark.createDataFrame(ref, "doc_id long, rank int")
    k, p = 4, 0.9
    got = {r.source: (r.n_shared, r.rbo)
           for r in rbo_panel(gdf, rdf, depth=k, p=p,
                              group_col="source").collect()}

    dref = dict(ref)
    for g, lst in groups.items():
        dg = dict(lst)
        rbo = 0.0
        for d in range(1, k + 1):
            A = {x for x, rk in dg.items() if rk <= d}
            B = {x for x, rk in dref.items() if rk <= d}
            rbo += p ** (d - 1) * len(A & B) / d
        rbo = round(rbo * (1 - p), 6)
        shared = len(set(dg) & set(dref))
        assert got[g][0] == shared, g
        assert got[g][1] == pytest.approx(rbo, abs=1e-9), g
    assert got["g_disj"] == (0, 0.0)
    assert got["g_same"][1] == pytest.approx(
        round((1 - p) * sum(p ** (d - 1) for d in range(1, k + 1)), 6))

    # NULL group rows excluded
    withnull = spark.createDataFrame(
        rows + [(None, 10, 1)], "source string, doc_id long, rank int")
    assert set(r.source for r in
               rbo_panel(withnull, rdf, depth=k, p=p,
                         group_col="source").collect()) == set(groups)

    with pytest.raises(ValueError):
        rbo_panel(gdf, rdf, depth=0)
    with pytest.raises(ValueError):
        rbo_panel(gdf, rdf, depth=k, p=1.5)


def test_ks_distance_vs_brute_force(spark):
    from dwds_livestream_spark.operators.curation import ks_distance

    a_vals = [1, 2, 2, 3, 7]
    b_vals = [1, 2, 4, 4, 5, 9]
    a = spark.createDataFrame([(v,) for v in a_vals], "n_chars long")
    b = spark.createDataFrame([(v,) for v in b_vals], "n_chars long")
    (row,) = ks_distance(a, b).collect()

    def ecdf(vals, x):
        return sum(1 for v in vals if v <= x) / len(vals)

    pts = sorted(set(a_vals) | set(b_vals))
    expect = round(max(abs(ecdf(a_vals, x) - ecdf(b_vals, x)) for x in pts), 6)
    assert (row.n_sample, row.n_ref) == (5, 6)
    assert row.ks == pytest.approx(expect, abs=1e-9)

    # identical distributions -> 0
    (same,) = ks_distance(a, a).collect()
    assert same.ks == 0.0
    # fully separated supports -> 1
    c = spark.createDataFrame([(100,), (101,)], "n_chars long")
    (sep,) = ks_distance(a, c).collect()
    assert sep.ks == 1.0
    # NULLs excluded from both sides
    an = spark.createDataFrame([(v,) for v in a_vals] + [(None,)],
                               "n_chars long")
    (nrow,) = ks_distance(an, b).collect()
    assert (nrow.n_sample, nrow.ks) == (5, pytest.approx(expect, abs=1e-9))


def test_ks_distance_degenerate_inputs(spark):
    """ADVICE r8: an empty (or all-NULL) side must yield one row with
    true counts and NULL ks — not an ANSI DIVIDE_BY_ZERO crash."""
    from dwds_livestream_spark.operators.curation import ks_distance

    a = spark.createDataFrame([(v,) for v in (1, 2, 3)], "n_chars long")
    empty = spark.createDataFrame([], "n_chars long")
    allnull = spark.createDataFrame([(None,), (None,)], "n_chars long")

    (row,) = ks_distance(empty, a).collect()
    assert (row.n_sample, row.n_ref, row.ks) == (0, 3, None)
    (row,) = ks_distance(a, empty).collect()
    assert (row.n_sample, row.n_ref, row.ks) == (3, 0, None)
    (row,) = ks_distance(allnull, a).collect()
    assert (row.n_sample, row.n_ref, row.ks) == (0, 3, None)
    (row,) = ks_distance(empty, empty).collect()
    assert (row.n_sample, row.n_ref, row.ks) == (0, 0, None)
