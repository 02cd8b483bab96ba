"""Distributed exact global ranking — row_number / ntile / percent_rank
over the whole relation WITHOUT a single-partition sort.

A bare ``Window.orderBy(...)`` (no partition key) forces every row
through one task — the classic scale-killer for "rank all users by
spend" shapes. This operator computes the *identical* rank values with
a three-stage plan whose every shuffle is hash- or broadcast-sized:

1. **Bounds**: ``percentile_approx`` over the order column yields
   ``n_buckets - 1`` equi-depth split points (one aggregate; the final
   combine is a merge of mergeable sketches, rows = #partitions).
2. **Bucket**: each row is assigned a bucket by comparing its value to
   the broadcast bounds (map-only). Approximation of the bounds only
   affects bucket *balance*, never rank *values* — ties share a bucket
   by construction (strict ``>`` comparison), so the within-bucket
   window below sees every peer group whole.
3. **Offsets**: per-bucket counts (tiny: ``n_buckets`` rows) are
   turned into cumulative offsets with a triangular self-join over
   those few rows; global rank = bucket offset + ``row_number`` within
   the bucket (hash-partitioned window).

The result is exact: identical to ``row_number() OVER (ORDER BY ...)``
for any total ordering (caller supplies tiebreakers that make the
ordering total). At 100 TB the input would be persisted by the caller
before ranking (the bounds/counts branches re-scan it otherwise); the
per-bucket frames are ~n/n_buckets rows each.

No reference-parity citation: the reference (dwds-livestream) has no
ranking operator; this exists to scale the analytics layer's
percent_rank/ntile queries (plans/analytics.py) per VERDICT r1 #2/#4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["distributed_rank", "ntile_from_rank", "weighted_median"]


def distributed_rank(
    df: DataFrame,
    value_col: str,
    *,
    descending: bool = False,
    tiebreakers: list[Column] | None = None,
    n_buckets: int = 32,
    rank_col: str = "rn",
    total_col: str | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Append an exact global ``row_number`` (1-based) column ordered by
    ``value_col`` (+ ``tiebreakers``) without a global sort.

    ``tiebreakers`` must make the ordering total (e.g. a unique id);
    otherwise ranks among exact peers are nondeterministic, same as
    ``row_number`` itself. When ``total_col`` is given, the total row
    count is attached as a constant column (for percent_rank /
    cume_dist / ntile derivation).

    ``materialize`` (default True) localCheckpoints ``df`` first: the
    frame fans out to the bounds aggregate, the bucket counts, and the
    ranked output, so a lazily-derived input (typically an aggregate
    of something much bigger) would otherwise be recomputed three
    times. Pass False only when ``df`` is a raw scan that's cheaper to
    re-read than to store.
    """
    ties = tiebreakers or []
    if materialize:
        # lazy: compute-once at first action WITHOUT running the
        # upstream job at DataFrame-construction time (plan tooling
        # builds registry queries only to read .explain output)
        df = df.localCheckpoint(eager=False)
    v = F.col(value_col)

    if n_buckets < 2:  # degenerate: one bucket IS the global window
        bucketed = df.withColumn("__bucket", F.lit(0)).withColumn(
            "__bs", F.array().cast("array<double>")
        )
        return _rank_over_buckets(
            df, bucketed, v, ties, descending, rank_col, total_col
        )

    bounds = df.agg(
        F.percentile_approx(
            value_col,
            F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)]),
            F.lit(10_000),
        ).alias("__bs")
    )
    # strict > : rows equal to a bound land below it, so a peer group
    # never straddles a bucket boundary
    asc_bucket = F.aggregate(
        F.col("__bs"),
        F.lit(0),
        lambda acc, x: acc + F.when(v > x, 1).otherwise(0),
    )
    bucket = (
        F.lit(n_buckets - 1) - asc_bucket if descending else asc_bucket
    )
    bucketed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__bucket", bucket
    )
    return _rank_over_buckets(
        df, bucketed, v, ties, descending, rank_col, total_col
    )


def _rank_over_buckets(
    df: DataFrame,
    bucketed: DataFrame,
    v: Column,
    ties: list[Column],
    descending: bool,
    rank_col: str,
    total_col: str | None,
) -> DataFrame:
    counts = bucketed.groupBy("__bucket").agg(F.count("*").alias("__cnt"))
    lower = counts.select(
        F.col("__bucket").alias("__lb"), F.col("__cnt").alias("__lcnt")
    )
    offsets = (
        counts.join(lower, F.col("__lb") < F.col("__bucket"), "left")
        .groupBy("__bucket")
        .agg(F.coalesce(F.sum("__lcnt"), F.lit(0)).alias("__offset"))
    )

    order = [v.desc() if descending else v.asc(), *ties]
    w = Window.partitionBy("__bucket").orderBy(*order)
    out = (
        bucketed.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            rank_col, (F.col("__offset") + F.row_number().over(w)).cast("long")
        )
        .drop("__bucket", "__bs", "__offset")
    )
    if total_col is not None:
        # derived from the per-bucket counts already computed — not
        # another full re-scan branch of df
        total = counts.agg(F.sum("__cnt").alias(total_col))
        out = out.crossJoin(F.broadcast(total))
    return out


def ntile_from_rank(rn: Column, n: Column, k: int) -> Column:
    """The bucket ``ntile(k)`` assigns to global row ``rn`` of ``n``
    rows — SQL-standard semantics: the first ``n % k`` tiles get
    ``n div k + 1`` rows, the rest ``n div k``. Pure arithmetic, so a
    distributed rank turns into a distributed ntile with zero extra
    shuffles.
    """
    q = (n / k).cast("long")  # floor for non-negative n
    r = n - q * F.lit(k)
    big = r * (q + 1)  # rows covered by the (q+1)-sized head tiles
    return (
        F.when(rn <= big, F.ceil(rn / (q + 1)))
        .otherwise(r + F.ceil((rn - big) / q))
        .cast("int")
    )


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col,
    out_col: str = "weighted_median",
) -> DataFrame:
    """Exact per-group weighted median: the smallest value v with
    cumulative weight(x <= v) >= total_weight / 2 — equivalently, the
    value at 1-based rank ceil(total/2) of the weight-unrolled sorted
    multiset (which is what the independent DuckDB oracle computes by
    actually unrolling).

    Scale: never unrolls and never sorts corpus rows. One hash
    aggregate folds the corpus to the DISTINCT-value histogram
    (group, value, sum weight) — shuffle is distinct-value-sized —
    then the cumulative sum runs over histogram rows within each
    group. Weights must be integral (cast upstream): integer-valued
    cumulative sums are order-exact, so both engines agree bit-for-bit
    where floating cumsums would not. The 2*cum >= total comparison
    stays in integer space for the same reason. For groups whose
    distinct-value histogram is itself huge, compose with
    distributed_rank's split-point bucketing; the registry query's
    per-group histograms are value-domain-bounded.
    """
    hist = df.groupBy(*group_cols, value_col).agg(
        F.sum(weight_col).alias("__w")
    )
    wv = Window.partitionBy(*group_cols).orderBy(value_col)
    wg = Window.partitionBy(*group_cols)
    return (
        hist.withColumn("__cum", F.sum("__w").over(wv))
        .withColumn("__tot", F.sum("__w").over(wg))
        .where(2 * F.col("__cum") >= F.col("__tot"))
        .groupBy(*group_cols)
        .agg(F.min(value_col).alias(out_col))
    )
