"""operators/text_index.py — persisted BM25 inverted index: identical
scores to the in-memory bm25_topk, and the postings scan reads ONLY
the probed term buckets (PartitionFilters)."""

from __future__ import annotations

import pytest

from dwds_livestream_spark.operators.retrieval import bm25_topk
from dwds_livestream_spark.operators.text_index import (
    _term_bucket_py,
    bm25_index_query,
    bm25_index_write,
)

SF_DIR = "/root/testdata/sf0.001"
TERMS = ["data", "stream", "quality"]


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path_factory.mktemp("bm25idx") / "idx")
    bm25_index_write(docs, path, n_buckets=16)
    return path, docs


def test_index_query_identical_to_in_memory(spark, index):
    path, docs = index
    got = [
        (r.doc_id, r.score)
        for r in bm25_index_query(spark, path, TERMS, topk=20).collect()
    ]
    want = [
        (r.doc_id, r.score)
        for r in bm25_topk(docs, TERMS, topk=20).collect()
    ]
    assert got == want and len(got) > 0


def test_postings_scan_is_partition_pruned(spark, index):
    path, _ = index
    q = bm25_index_query(spark, path, TERMS, topk=5)
    plan = q._jdf.queryExecution().executedPlan().toString()
    buckets = sorted({_term_bucket_py(t, 16) for t in TERMS})
    # the postings FileScan must carry tbucket partition filters
    assert "PartitionFilters" in plan
    scan_lines = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "postings" in ln
    ]
    assert scan_lines, plan
    assert any(
        "tbucket" in ln and "PartitionFilters: []" not in ln
        for ln in scan_lines
    ), scan_lines


def test_bucket_assignment_lockstep(spark, index):
    """Driver-side bucket twin matches the column expression for every
    indexed term (the property partition pruning's correctness rests
    on)."""
    path, _ = index
    rows = (
        spark.read.parquet(f"{path}/postings")
        .select("term", "tbucket")
        .distinct()
        .collect()
    )
    assert rows
    for r in rows:
        assert _term_bucket_py(r.term, 16) == r.tbucket, r

def test_unknown_term_scores_empty(spark, index):
    path, _ = index
    out = bm25_index_query(spark, path, ["zzz-not-a-term-zzz"], topk=5)
    assert out.count() == 0
