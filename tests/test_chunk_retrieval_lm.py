"""Unit semantics for chunking, BM25 retrieval, and bigram-LM scoring
(the sf0.01 oracle equivalence is covered by the driver gate /
scripts/check_oracle.py; these pin the hand-checkable small cases)."""

from __future__ import annotations

import math

import pytest

from dwds_livestream_spark.operators.chunking import chunk_documents
from dwds_livestream_spark.operators.lm import lm_perplexity
from dwds_livestream_spark.operators.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_overlap_and_tail(spark):
    # 10 tokens, size 4, overlap 1 -> step 3 -> chunks at 0,3,6,9?
    # n_chunks = 1 + ceil((10-4)/3) = 3 -> starts 0,3,6
    text = " ".join(f"t{i}" for i in range(10))
    out = chunk_documents(
        _docs(spark, [(1, text)]), size=4, overlap=1
    ).collect()
    got = {(r.chunk_no, r.chunk_text, r.n_tokens) for r in out}
    assert got == {
        (0, "t0 t1 t2 t3", 4),
        (1, "t3 t4 t5 t6", 4),
        (2, "t6 t7 t8 t9", 4),
    }


def test_chunk_short_tail_and_empty_doc(spark):
    out = chunk_documents(
        _docs(spark, [(1, "a b c d e"), (2, "   "), (3, "x")]),
        size=4,
        overlap=2,
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc  # zero tokens -> no chunks
    assert [(r.chunk_no, r.chunk_text) for r in sorted(
        by_doc[3], key=lambda r: r.chunk_no
    )] == [(0, "x")]
    tail = sorted(by_doc[1], key=lambda r: r.chunk_no)[-1]
    assert tail.chunk_text == "c d e" and tail.n_tokens == 3


def test_chunk_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), size=4, overlap=4)


def test_bm25_matches_hand_formula(spark):
    docs = _docs(
        spark,
        [
            (1, "apple apple banana"),
            (2, "apple pear pear pear"),
            (3, "pear pear pear pear"),
        ],
    )
    out = bm25_topk(docs, ["apple"], k1=1.2, b=0.75, topk=10).collect()
    # df(apple)=2, N=3, avgdl=11/3
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)

    def score(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (11 / 3)))

    expect = {1: round(score(2, 3), 6), 2: round(score(1, 4), 6)}
    assert {r.doc_id: r.score for r in out} == expect
    assert [r.doc_id for r in out] == [1, 2]  # ranked desc


def test_bm25_case_insensitive_and_no_hit_docs_dropped(spark):
    docs = _docs(spark, [(1, "Apple pie"), (2, "cherry pie")])
    out = bm25_topk(docs, ["APPLE"], topk=5).collect()
    assert [r.doc_id for r in out] == [1]


def test_lm_perplexity_repetition_scores_lower(spark):
    docs = _docs(
        spark,
        [
            (1, "a b a b a b a b a b"),  # one dominant bigram pattern
            (2, "a b c d e f g h i j"),  # all bigrams unique
        ],
    )
    out = {r.doc_id: r for r in lm_perplexity(docs).collect()}
    assert out[1].n_bigrams == 9 and out[2].n_bigrams == 9
    assert out[1].ppl < out[2].ppl
    for r in out.values():
        assert abs(math.exp(r.avg_nll) - r.ppl) < 1e-4


def test_lm_perplexity_hand_case(spark):
    # corpus: "x y" twice -> uni c(x)=2,c(y)=2; bi c(x,y)=2; V=2; a=0.5
    docs = _docs(spark, [(1, "x y"), (2, "x y")])
    out = lm_perplexity(docs, add_k=0.5).collect()
    p = (2 + 0.5) / (2 + 0.5 * 2)
    for r in out:
        assert r.n_bigrams == 1
        assert abs(r.avg_nll - round(-math.log(p), 6)) < 1e-9
    # single-token / empty docs excluded
    out2 = lm_perplexity(_docs(spark, [(1, "x y"), (2, "z")])).collect()
    assert {r.doc_id for r in out2} == {1}


# ---------------------------------------------- duplicate spans
from dwds_livestream_spark.operators.substring_dedup import (  # noqa: E402
    duplicate_spans,
)


def test_duplicate_spans_finds_planted_repeat(spark):
    shared = " ".join(f"s{i}" for i in range(10))  # 10-token shared run
    docs = _docs(
        spark,
        [
            (1, "u1 u2 u3 " + shared + " u4 u5"),
            (2, "v1 " + shared + " v2 v3 v4"),
            (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),  # unique, no spans
        ],
    )
    out = duplicate_spans(docs, length=8).collect()
    spans = {r.doc_id: (r.span_start, r.span_end) for r in out}
    # doc1: shared tokens occupy offsets [3, 13); doc2: [1, 11)
    assert spans == {1: (3, 13), 2: (1, 11)}
    assert all(r.span_tokens == 10 for r in out)


def test_duplicate_spans_merges_overlapping_coverage(spark):
    # two dup 4-grams overlapping in doc 3 -> one merged span
    docs = _docs(
        spark,
        [
            (1, "a b c d"),
            (2, "c d e f"),
            (3, "a b c d e f"),  # covers [0,4) and [2,6) -> merge [0,6)
        ],
    )
    out = duplicate_spans(docs, length=4).collect()
    d3 = [r for r in out if r.doc_id == 3]
    assert [(r.span_start, r.span_end) for r in d3] == [(0, 6)]


def test_cross_doc_spans_ignores_single_doc_repetition(spark):
    boiler = " ".join(f"b{i}" for i in range(4))  # 4-token phrase
    shared = " ".join(f"s{i}" for i in range(6))  # cross-doc 6-token run
    docs = _docs(
        spark,
        [
            # boiler repeats TWICE inside doc 1 only: plain
            # duplicate_spans marks it, cross-doc mode must not
            (1, boiler + " " + boiler + " " + shared),
            (2, "v1 v2 " + shared + " v3"),
        ],
    )
    plain = duplicate_spans(docs, length=4).collect()
    cross = duplicate_spans(docs, length=4, min_docs=2).collect()
    plain_d1 = sorted((r.span_start, r.span_end) for r in plain if r.doc_id == 1)
    cross_d1 = sorted((r.span_start, r.span_end) for r in cross if r.doc_id == 1)
    # plain: boiler coverage [0,8) merges with shared [8,14) -> [0,14)
    assert plain_d1 == [(0, 14)]
    # cross-doc: only the shared run, at offsets [8,14) in doc 1
    assert cross_d1 == [(8, 14)]
    assert sorted((r.span_start, r.span_end) for r in cross if r.doc_id == 2) == [
        (2, 8)
    ]


def test_cross_doc_spans_hash_equals_text_keys(spark):
    shared = " ".join(f"s{i}" for i in range(9))
    docs = _docs(
        spark,
        [(i, f"p{i} {shared} q{i}") for i in range(5)],
    )
    a = sorted(
        map(
            tuple,
            duplicate_spans(docs, length=8, min_docs=2, hash_grams=True).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            duplicate_spans(docs, length=8, min_docs=2, hash_grams=False).collect(),
        )
    )
    assert a == b and len(a) == 5


def test_duplicate_spans_hash_equals_text_keys(spark):
    docs = _docs(
        spark,
        [(i, f"p{i} " + " ".join(f"c{j}" for j in range(12))) for i in range(6)],
    )
    a = sorted(
        map(tuple, duplicate_spans(docs, length=8, hash_grams=True).collect())
    )
    b = sorted(
        map(tuple, duplicate_spans(docs, length=8, hash_grams=False).collect())
    )
    assert a == b and len(a) > 0
