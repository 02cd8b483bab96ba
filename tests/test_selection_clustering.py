"""Unit tests for operators/selection.py and operators/clustering.py."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dwds_livestream_spark.operators.clustering import kmeans
from dwds_livestream_spark.operators.selection import (
    bpe_pair_topk,
    dsir_weights,
    length_bounds_filter,
    ngram_topk,
    source_overlap,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "tgt"),
        (2, "the quick brown fox sleeps all day", "tgt"),
        (3, "spark shuffles partition data across executors", "web"),
        (4, "spark shuffles partition data across the cluster", "web"),
        (5, "x", "web"),  # shorter than any n-gram — must not error
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    return df.withColumn("n_chars", F.length("text").cast("long"))


def test_ngram_topk_counts_and_short_doc_guard(docs):
    got = {r.gram: r.cnt for r in ngram_topk(docs, n=3, k=50).collect()}
    assert got["the quick brown"] == 2
    assert got["quick brown fox"] == 2
    assert got["spark shuffles partition"] == 2
    # doc 5 has 1 token < n: contributed nothing, and nothing crashed
    assert all(" " in g for g in got)


def test_ngram_topk_tiebreak_deterministic(docs):
    top = ngram_topk(docs, n=3, k=5).collect()
    # sorted by cnt desc then gram asc
    pairs = [(r.cnt, r.gram) for r in top]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_bpe_pair_topk(spark):
    df = spark.createDataFrame(
        [(1, "aaab aab", "s")], "doc_id long, text string, source string"
    )
    got = {r.pair: r.cnt for r in bpe_pair_topk(df, k=10).collect()}
    # "aaab" -> aa,aa,ab ; "aab" -> aa,ab
    assert got == {"aa": 3, "ab": 2}


def test_dsir_weights_separates_domains(docs):
    out = {
        r.doc_id: r
        for r in dsir_weights(docs, ["tgt"]).collect()
    }
    # target-domain docs score higher than web docs
    assert out[1].log_ratio > out[3].log_ratio
    assert out[2].log_ratio > out[4].log_ratio
    assert out[1].keep and not out[3].keep
    # token counts are exact
    assert out[1].n_tokens == 9
    assert out[5].n_tokens == 1


def test_length_bounds_filter_trims_tails(spark):
    df = spark.createDataFrame(
        [(i, "t", "s", n) for i, n in enumerate([1, 10, 11, 12, 13, 14, 15, 16, 17, 1000])],
        "doc_id long, text string, source string, n_chars long",
    )
    kept = sorted(r.n_chars for r in length_bounds_filter(df, 0.05, 0.95).collect())
    assert 1 not in kept and 1000 not in kept
    assert kept[0] >= 5 and kept[-1] <= 1000


def test_source_overlap_jaccard(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f", "s1"),
            (2, "a b c d e f", "s2"),  # full mirror of doc 1
            (3, "q r s t u v", "s3"),  # disjoint
        ],
        "doc_id long, text string, source string",
    )
    rows = {(r.src_a, r.src_b): r.jaccard for r in source_overlap(df, n=5).collect()}
    assert rows[("s1", "s2")] == 1.0
    assert ("s1", "s3") not in rows  # zero-intersection pairs absent


def test_kmeans_matches_numpy_lloyd(spark):
    rng = np.random.default_rng(7)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 5.0]])
    pts = np.vstack([rng.normal(c, 0.5, size=(20, 2)) for c in centers])
    ids = list(range(len(pts)))
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in ids],
        "vec_id long, embedding array<double>",
    )
    out, cents = kmeans(df, k=3, n_iter=4)
    got = {r.vec_id: r.cluster for r in out.collect()}

    # reference: identical deterministic Lloyd's iterations in numpy
    ref_c = pts[:3].astype(float).copy()
    for _ in range(4):
        d2 = ((pts[:, None, :] - ref_c[None, :, :]) ** 2).sum(axis=2)
        lab = d2.argmin(axis=1)
        for j in range(3):
            if (lab == j).any():
                ref_c[j] = pts[lab == j].mean(axis=0)
    d2 = ((pts[:, None, :] - ref_c[None, :, :]) ** 2).sum(axis=2)
    ref_lab = d2.argmin(axis=1)

    assert np.allclose(cents, ref_c)
    assert all(got[i] == ref_lab[i] for i in ids)
    # each true blob ends up in one cluster
    assert len({got[i] for i in range(20)}) == 1
    assert len({got[i] for i in range(20, 40)}) == 1


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=3 but only 2 distinct points: one cluster must stay empty
    # without NaNs (empty cluster keeps its previous centroid)
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    out, cents = kmeans(df, k=3, n_iter=3)
    assert not np.isnan(cents).any()
    assert out.count() == 3


def test_pmi_prefers_exclusive_pairs(spark):
    from dwds_livestream_spark.operators.selection import pmi_collocations

    # "strong coffee" always co-occur exclusively; "the" pairs with many
    rows = [(i, "strong coffee is the best the worst the thing", "s") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = pmi_collocations(df, k=50, min_count=5).collect()
    scores = {(r.w1, r.w2): r.pmi for r in out}
    assert scores[("strong", "coffee")] == max(scores.values())


def test_canonical_dedup_catches_reformatted(spark):
    from dwds_livestream_spark.operators.selection import canonical_dedup

    df = spark.createDataFrame(
        [
            (1, "Hello, World!", "s"),
            (2, "hello   world", "s"),
            (3, "HELLO... WORLD?!", "s"),
            (4, "different text", "s"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.keeper_id: r.n_dups for r in canonical_dedup(df).collect()}
    assert out == {1: 3, 4: 1}


def test_inverted_index_postings_sorted(spark):
    from dwds_livestream_spark.operators.retrieval import inverted_index

    df = spark.createDataFrame(
        [(3, "b a", "s"), (1, "a b", "s"), (2, "a c", "s")],
        "doc_id long, text string, source string",
    )
    out = {r.term: (r.df, r.postings) for r in inverted_index(df, min_df=2).collect()}
    assert out["a"] == (3, "1,2,3")
    assert out["b"] == (2, "1,3")
    assert "c" not in out  # below min_df
