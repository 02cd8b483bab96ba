"""Identity-reuse cross-engine verification for the rows-only k-means
family (ROADMAP "oracle tightening", executed as pytest gates rather
than driver oracles — the driver's oracle runs against pre-registered
views only, and tying it to a Spark-written scratch artifact would
couple correctness to driver execution order).

The trick: the ITERATIVE part (Lloyd's training) stays numpy-parity
-gated, but the model artifact it produces is just data — so DuckDB
can independently re-derive the entire ASSIGNMENT / query stage from
the Spark-produced centroids and the Spark-written index parquet:

- kmeans: argmin squared-L2 per vector over the trained centroids must
  reproduce every cluster id and (to float tolerance) every distance;
- persisted IVF ANN: DuckDB reads the index files themselves
  (centroids + cell-partitioned vectors), re-ranks the nprobe cells,
  re-scores the probed cells by exact cosine and must reproduce the
  full (query, rank, neighbor) answer of ivf_index_query.

Cosines/distances compare to 2e-6 (both engines round at 6dp; the
grid-boundary residual is the documented negligible-risk class), ids
and ranks compare exactly.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"
DIM = 64


def test_kmeans_assignments_rederived_by_duckdb(spark):
    from dwds_livestream_spark.operators.clustering import kmeans

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert len(emb.head().embedding) == DIM
    out, cents = kmeans(emb, k=8, n_iter=5)
    got = {r.vec_id: (r.cluster, r.dist) for r in out.collect()}

    con = duckdb.connect()
    cent_pdf = pd.DataFrame(
        {"cluster": range(len(cents)), "c": [list(map(float, c)) for c in cents]}
    )
    con.register("cents", cent_pdf)
    want = con.execute(
        f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM read_parquet('{SF}/embeddings.parquet')),
        d AS (
          SELECT e.vec_id, c.cluster,
                 list_sum([(v[i] - c.c[i]) ^ 2 FOR i IN range(1, {DIM + 1})]) AS d2
          FROM e, cents c),
        r AS (
          SELECT vec_id, cluster, sqrt(d2) AS dist,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
          FROM d)
        SELECT vec_id, cluster, dist FROM r WHERE rn = 1
        """
    ).fetchall()
    assert len(want) == len(got) > 0
    for vec_id, cluster, dist in want:
        g_cluster, g_dist = got[vec_id]
        assert g_cluster == cluster, (vec_id, g_cluster, cluster)
        assert abs(g_dist - dist) < 2e-6, (vec_id, g_dist, dist)


def test_ivf_index_query_rederived_by_duckdb_from_index_files(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    from dwds_livestream_spark.operators.ann_index import (
        ivf_index_query,
        ivf_index_write,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "idx")
    ivf_index_write(emb, path, n_centroids=16)
    queries = emb.where(F.col("vec_id") < 10)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in ivf_index_query(
            spark, path, queries, k=10, nprobe=4
        ).collect()
    }

    con = duckdb.connect()
    # cell ranking: normalized-query dot centroids, score desc then
    # cell asc (_assign_centroids_udf uses a STABLE argsort, so exact
    # ties resolve to the lower cell id — same as this ORDER BY);
    # dividing by the positive query norm never changes the order, so
    # the SQL ranks the raw dot product
    want = con.execute(
        f"""
        WITH q AS (
          SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM read_parquet('{SF}/embeddings.parquet')
          WHERE vec_id < 10),
        cent AS (
          SELECT cell, centroid
          FROM read_parquet('{path}/centroids/*.parquet')),
        probe AS (
          SELECT query_id, qv, cell,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY list_sum([qv[i] * centroid[i]
                                      FOR i IN range(1, {DIM + 1})]) DESC,
                            cell ASC) AS prn
          FROM q, cent),
        vec AS (
          SELECT cell, vec_id, embedding
          FROM read_parquet('{path}/vectors/*/*.parquet',
                            hive_partitioning = 1)),
        scored AS (
          SELECT p.query_id, v.vec_id AS neighbor_id,
                 round(
                   list_sum([p.qv[i] * v.embedding[i]
                             FOR i IN range(1, {DIM + 1})])
                   / (sqrt(list_sum([p.qv[i] ^ 2
                                     FOR i IN range(1, {DIM + 1})]))
                      * sqrt(list_sum([v.embedding[i] ^ 2
                                       FOR i IN range(1, {DIM + 1})]))),
                   6) AS cosine
          FROM probe p JOIN vec v USING (cell)
          WHERE p.prn <= 4 AND v.vec_id <> p.query_id),
        ranked AS (
          SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id, cosine
        FROM ranked WHERE rank <= 10
        """
    ).fetchall()
    assert len(want) == len(got) > 0
    for query_id, rank, neighbor_id, cosine in want:
        g_neighbor, g_cos = got[(query_id, rank)]
        assert g_neighbor == neighbor_id, (query_id, rank, g_neighbor, neighbor_id)
        assert abs(g_cos - cosine) < 2e-6, (query_id, rank, g_cos, cosine)
