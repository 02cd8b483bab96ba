"""Persisted BM25 inverted index: term-bucket-partitioned postings
where Spark's partition pruning IS the inverted file — the text twin
of the persisted IVF ANN index (operators/ann_index.py).

Beyond-reference operator (project brief: retrieval at scale).
``retrieval.bm25_topk`` recomputes term frequencies over the whole
corpus per query batch — right for one-shot scoring, wrong for a
served corpus. This module persists the index once; every later query
reads ONLY the partitions holding its terms' postings:

- ``bm25_index_write``: tokenize -> postings (term, doc_id, tf)
  written partitioned by ``tbucket`` = md5(term) mod n_buckets, plus
  a doc-length table and a 1-row stats table (n_docs, avgdl, AND
  n_buckets — persisting the layout parameter is what makes a
  write/query bucket-count mismatch impossible, the same reason
  ann_index persists its centroids). Two tokenize passes (doclen,
  postings); corpus stats aggregate the already-written doclen files,
  not the corpus.
- ``bm25_index_query``: reads the persisted n_buckets, computes the
  query terms' buckets DRIVER-SIDE from the same md5 (no scan), and
  scans postings with ``tbucket IN (...)`` — PartitionFilters,
  asserted in tests. Per-term document frequencies come from the
  probed slice itself (exact: the slice holds every posting of each
  query term); the doc-length table is pruned to matched doc_ids with
  a broadcast semi-join BEFORE joining, so no query ever shuffles the
  corpus-sized doclen table. The per-document score is assembled from
  per-term conditional sums added in fixed query-term order — the
  SAME addition sequence as ``bm25_topk``'s in-row expression, so
  equality is exact, not merely within float-reassociation noise.

Scoring uses retrieval.bm25_part — one shared formula, so the
identity with ``bm25_topk`` (asserted in tests/test_text_index.py and
by the registry entry reusing its DuckDB oracle) cannot drift.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from .retrieval import bm25_part


def _term_bucket_col(term, n_buckets: int):
    """md5-derived bucket for a term COLUMN — same layout as
    feature_hash_tf / count-min (md5, not xxhash64, so the assignment
    is reproducible outside the JVM — see _term_bucket_py)."""
    return F.pmod(
        F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def _term_bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side twin of _term_bucket_col — MUST stay in lockstep."""
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets


def bm25_index_write(
    documents: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """Build and persist: ``path/postings`` partitioned by tbucket,
    ``path/doclen`` (doc_id, dl), ``path/stats`` (1 row: n_docs,
    avgdl, n_buckets)."""
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("__toks"),
    )
    toks.select("doc_id", F.size("__toks").alias("dl")).write.mode(
        "overwrite"
    ).parquet(f"{path}/doclen")
    spark = documents.sparkSession
    (
        # stats from the WRITTEN doclen files — no third corpus pass
        spark.read.parquet(f"{path}/doclen")
        .agg(
            F.count("*").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            F.lit(int(n_buckets)).alias("n_buckets"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/stats")
    )
    postings = (
        toks.select("doc_id", F.explode("__toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
        .withColumn("tbucket", _term_bucket_col(F.col("term"), n_buckets))
    )
    (
        postings.repartition("tbucket")
        .write.mode("overwrite")
        .partitionBy("tbucket")
        .parquet(f"{path}/postings")
    )


def bm25_index_query(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """Top-``topk`` (doc_id, score) for ``query_terms``, reading ONLY
    the probed term buckets' partitions. Identical scores to
    ``retrieval.bm25_topk`` on the indexed corpus. The bucket count
    comes from the persisted stats row — a query can never probe with
    a different layout than the index was written with."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = list(dict.fromkeys(t.lower() for t in query_terms))

    stats = spark.read.parquet(f"{path}/stats")
    n_buckets = int(stats.first().n_buckets)
    buckets = sorted({_term_bucket_py(t, n_buckets) for t in terms})

    postings = (
        spark.read.parquet(f"{path}/postings")
        .where(F.col("tbucket").isin(buckets))  # partition pruning
        .where(F.col("term").isin(terms))       # row pruning in-bucket
    )
    # document frequency per term from the slice itself; postings are
    # unique per (term, doc_id) by construction, so a plain count IS
    # the distinct-document count
    df_t = postings.groupBy("term").agg(F.count("*").alias("df"))
    # prune the corpus-sized doclen table to matched docs with a
    # broadcast semi-join BEFORE joining — the slice's doc_ids are
    # top-k-query-sized, the corpus never shuffles
    matched = postings.select("doc_id").distinct()
    doclen = (
        spark.read.parquet(f"{path}/doclen")
        .join(F.broadcast(matched), "doc_id", "left_semi")
    )
    scored = (
        postings.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(doclen), "doc_id")
        .withColumn(
            "part",
            bm25_part(
                F.col("tf"), F.col("df"),
                F.col("n_docs"), F.col("avgdl"), F.col("dl"), k1, b,
            ),
        )
    )
    # assemble the doc score in FIXED query-term order (each per-term
    # sum covers <= 1 row, so it is exact; missing terms contribute a
    # literal 0.0) — bit-identical to bm25_topk's in-row p0+p1+...,
    # immune to shuffle-order float reassociation
    per_term = [
        F.sum(F.when(F.col("term") == t, F.col("part"))).alias(f"__p_{i}")
        for i, t in enumerate(terms)
    ]
    score = None
    for i in range(len(terms)):
        p = F.coalesce(F.col(f"__p_{i}"), F.lit(0.0))
        score = p if score is None else score + p
    return (
        scored.groupBy("doc_id")
        .agg(*per_term)
        .select("doc_id", F.round(score, 6).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), "doc_id")
        .limit(topk)
    )
