"""Similarity search over embedding columns (project brief; beyond the
reference surface).

- cosine_topk: exact brute-force top-k — the correctness baseline. The
  query set is broadcast; the corpus never shuffles; per-pair cosine is
  computed JVM-side with zip_with/aggregate (no Python). Ranking uses
  the 6dp-rounded score (+ id tie-break) so results are engine- and
  partitioning-independent.
- lsh_topk: random-hyperplane (SimHash-for-vectors) LSH bucketing — the
  scale path. Vectors meeting in a hash bucket are scored exactly;
  recall is tuned by (n_planes, n_tables). Shuffle is O(n·tables), not
  O(n·queries).
- embedding_near_dup_pairs: all-pairs cosine >= threshold via the same
  LSH candidates (embedding-cosine near-dup from the brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _as_double(col):
    return F.col(col).cast("array<double>")


def cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: query_id, rank, neighbor_id, cosine. Excludes self-matches.
    At scale: queries broadcast (must fit in memory — thousands of
    vectors), corpus scanned once, per-partition top-k via the window's
    partial TakeOrderedAndProject when k is small.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, table: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG dependency: a
    splitmix64-ish integer mix mapped to [-1, 1])."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            z = (table * 1_000_003 + p * 8191 + d) * 0x9E3779B97F4A7C15 % (1 << 64)
            z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
            z = (z ^ (z >> 27)) * 0x94D049BB133111EB % (1 << 64)
            z ^= z >> 31
            row.append((z / float(1 << 63)) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_keys(
    vec_col,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 4,
):
    """Array of (table, bucket) structs: per table, the sign pattern of
    the vector against n_planes random hyperplanes packed into an int."""
    keys = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, t)
        bucket = F.lit(0)
        for p, plane in enumerate(planes):
            proj = F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(v) for v in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bit = F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))
            bucket = bucket + F.shiftleft(bit, p)
        keys.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    return F.array(*keys)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 10,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: only corpus vectors sharing an LSH bucket with
    the query (any table) are scored. Same output shape as cosine_topk;
    recall < 1 by construction — tests measure it against the exact op."""
    keys = lambda df, idn: df.select(  # noqa: E731
        F.col(id_col).alias(idn),
        _as_double(vec_col).alias(f"{idn}_vec"),
        F.explode(
            lsh_bucket_keys(_as_double(vec_col), dim, n_planes, n_tables)
        ).alias("bk"),
    ).select(idn, f"{idn}_vec", "bk.table", "bk.bucket")
    qk = keys(queries, "query_id")
    ck = keys(corpus, "neighbor_id")
    cand = (
        ck.join(F.broadcast(qk), ["table", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("query_id_vec"), F.col("neighbor_id_vec")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 6,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    ``exact=True`` scores all pairs (O(n²) — correctness oracle path);
    otherwise LSH candidates only. Output: id_a, id_b, cosine.
    """
    base = df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("vec"))
    if exact:
        a = base.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
        b = base.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
        cand = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        keyed = base.select(
            "id",
            "vec",
            F.explode(lsh_bucket_keys(F.col("vec"), dim, n_planes, n_tables)).alias(
                "bk"
            ),
        ).select("id", "vec", "bk.table", "bk.bucket")
        a = keyed.select(
            F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "table", "bucket"
        )
        b = keyed.select(
            F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "table", "bucket"
        )
        cand = (
            a.join(b, ["table", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    return cand.select(
        "id_a",
        "id_b",
        F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cosine"),
    ).where(F.col("cosine") >= threshold)
