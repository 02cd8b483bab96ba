"""operators/lm.py persisted model — lm_train_write + lm_score:
scoring the training corpus under the artifact reproduces
lm_perplexity exactly; held-out text with unseen bigrams gets the
add-k backoff (finite, high perplexity) instead of dropped rows."""

from __future__ import annotations

import math

import pytest

from dwds_livestream_spark.operators.lm import lm_perplexity, lm_score

SF_DIR = "/root/testdata/sf0.001"
ADD_K = 0.5


@pytest.fixture(scope="module")
def model(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path_factory.mktemp("lm") / "model")
    from dwds_livestream_spark.operators.lm import lm_train_write

    lm_train_write(docs, path)
    return path, docs


def test_artifact_scores_training_corpus_identically(spark, model):
    path, docs = model
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll, r.ppl)
        for r in lm_score(spark, path, docs, add_k=ADD_K).collect()
    }
    want = {
        r.doc_id: (r.n_bigrams, r.avg_nll, r.ppl)
        for r in lm_perplexity(docs, add_k=ADD_K).collect()
    }
    assert got == want and len(got) > 0


def test_heldout_unseen_bigrams_get_addk_backoff(spark, model):
    path, _ = model
    held = spark.createDataFrame(
        [
            (900001, "zzqx vvrk zzqx vvrk zzqx"),  # fully OOV
            (900002, "zz"),  # single token: no bigrams, excluded
        ],
        "doc_id long, text string",
    )
    rows = lm_score(spark, path, held, add_k=ADD_K).collect()
    assert [r.doc_id for r in rows] == [900001]
    r = rows[0]
    # every bigram is OOV with OOV context: nll = -ln(a / (0 + a*V))
    #                                           = ln(V)
    v = spark.read.parquet(f"{path}/meta").first().v
    assert r.n_bigrams == 4
    assert abs(r.avg_nll - round(math.log(v), 6)) <= 1e-6
    # ppl = exp(unrounded avg nll) = exp(ln V) = V exactly
    assert math.isfinite(r.ppl) and r.ppl == pytest.approx(v, abs=1e-4)


def test_heldout_ppl_exceeds_in_domain(spark, model):
    """Out-of-domain text must look worse than the TYPICAL training
    document — the property the quality filter depends on. (Median,
    not a tail percentile: fully-OOV text scores exactly ln|V| per
    bigram — the uniform ceiling — while in-domain RARE bigrams can
    legitimately exceed it on this toy-sized vocabulary.)"""
    import pyspark.sql.functions as F

    path, docs = model
    in_dom = (
        lm_score(spark, path, docs, add_k=ADD_K)
        .agg(F.expr("percentile_approx(ppl, 0.5, 100000)"))
        .first()[0]
    )
    held = spark.createDataFrame(
        [(900001, "zzqx vvrk qqpl mmxw zzqx vvrk qqpl")],
        "doc_id long, text string",
    )
    oov = lm_score(spark, path, held, add_k=ADD_K).first().ppl
    assert oov > in_dom
