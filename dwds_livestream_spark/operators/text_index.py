"""Persisted BM25 inverted index: term-bucket-partitioned postings
where Spark's partition pruning IS the inverted file — the text twin
of the persisted IVF ANN index (operators/ann_index.py).

Beyond-reference operator (project brief: retrieval at scale).
``retrieval.bm25_topk`` recomputes term frequencies over the whole
corpus per query batch — right for one-shot scoring, wrong for a
served corpus. This module persists the index once; every later query
reads ONLY the partitions holding its terms' postings:

- ``bm25_index_write``: one tokenize pass -> postings (term, doc_id,
  tf) written partitioned by ``tbucket`` = md5(term) mod n_buckets,
  plus a doc-length table and a 1-row corpus-stats table (n_docs,
  avgdl). At 100 TB this is one scan + one partitioned write; the
  postings shuffle is |distinct (doc, term)|, never |tokens|.
- ``bm25_index_query``: the query's term buckets are computed
  DRIVER-SIDE from the same md5 (no scan), the postings scan carries
  ``tbucket IN (...)`` so only those partitions are read
  (PartitionFilters — asserted in tests), per-term document
  frequencies come from the postings slice itself, and scoring joins
  the slice with the doc-length table. Shuffle is O(matching
  postings), never O(corpus).

Scoring is the same Robertson-Sparck Jones / Lucene BM25 variant as
``bm25_topk`` with identical tokenization, so an index built from a
corpus answers queries identically to the in-memory operator —
asserted in tests/test_text_index.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens


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
    ``path/doclen`` (doc_id, dl), ``path/stats`` (1 row)."""
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("__toks"),
    )
    doclen = toks.select("doc_id", F.size("__toks").alias("dl"))
    doclen.write.mode("overwrite").parquet(f"{path}/doclen")
    (
        doclen.agg(
            F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
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
    n_buckets: int = 64,
) -> DataFrame:
    """Top-``topk`` (doc_id, score) for ``query_terms``, reading ONLY
    the probed term buckets' partitions. Identical scores to
    ``retrieval.bm25_topk`` on the indexed corpus."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    buckets = sorted({_term_bucket_py(t, n_buckets) for t in terms})

    postings = (
        spark.read.parquet(f"{path}/postings")
        .where(F.col("tbucket").isin(buckets))  # partition pruning
        .where(F.col("term").isin(terms))       # row pruning in-bucket
    )
    stats = spark.read.parquet(f"{path}/stats")
    doclen = spark.read.parquet(f"{path}/doclen")

    # document frequency per term, from the slice itself (the slice
    # holds EVERY posting of each query term — df is exact)
    df_t = postings.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = (
        postings.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .join(doclen, "doc_id")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    norm = F.lit(k1) * (
        1 - b + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    part = idf * F.col("tf") * (k1 + 1) / (F.col("tf") + norm)
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum(part), 6).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), "doc_id")
        .limit(topk)
    )
