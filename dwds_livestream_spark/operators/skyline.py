"""2-D skyline (Pareto frontier): the rows no other row dominates.

Beyond-reference analytics operator (the reference has no analytics
layer; project brief). Row q dominates row p iff q is <= on the
minimized column AND >= on the maximized column, strictly better on
at least one. The textbook formulation is the O(n²) NOT EXISTS
anti-join — that IS the DuckDB oracle, kept deliberately definitional
— but at scale the frontier falls out of a sort-free decomposition:

1. fold to the DISTINCT-value histogram ``(min_val, max(max_val))`` —
   one hash aggregate; dominance within an equal-min_val group is
   decided here (only the group's max survives),
2. bucket the distinct values equi-width (bounds from one 2-row
   aggregate), per-bucket best (tiny), exclusive cross-bucket prefix
   over the bucket summary (single-partition window over n_buckets
   rows — driver-sized),
3. within-bucket running best over strictly-smaller values
   (hash-partitioned window over distinct values, not corpus rows),
4. a distinct value is on the frontier iff its group max strictly
   beats every smaller value's best; join frontier values back to the
   corpus (hash join on the value, matching rows equal to the group
   max).

No global sort; shuffles are distinct-value- or bucket-sized. The
same shape extends to d>2 via repeated 2-D passes (not implemented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Rows of ``df`` not dominated under (minimize ``minimize_col``,
    maximize ``maximize_col``). Ties survive together: two identical
    (min, max) points do not dominate each other, so both return."""
    mn, mx = minimize_col, maximize_col
    hist = df.groupBy(mn).agg(F.max(mx).alias("__best"))

    bounds = hist.agg(F.min(mn).alias("lo"), F.max(mn).alias("hi")).first()
    if bounds is None or bounds["lo"] is None:
        return df.where(F.lit(False))
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    width = (hi - lo) / n_buckets or 1.0
    h = hist.withColumn(
        "__b",
        F.least(
            F.floor((F.col(mn) - F.lit(lo)) / F.lit(width)),
            F.lit(n_buckets - 1),
        ).cast("bigint"),
    )
    prefix = (
        h.groupBy("__b")
        .agg(F.max("__best").alias("__bbest"))
        .select(
            "__b",
            F.max("__bbest")
            .over(
                Window.orderBy("__b").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
            .alias("__prefix"),
        )
    )
    # distinct values within a bucket: preceding rows in value order
    # are exactly the strictly-smaller values (histogram rows are
    # unique per value)
    run = Window.partitionBy("__b").orderBy(mn).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        h.join(F.broadcast(prefix), "__b")
        .withColumn(
            "__cheaper_best",
            F.greatest(F.col("__prefix"), F.max("__best").over(run)),
        )
        .where(
            F.col("__cheaper_best").isNull()
            | (F.col("__best") > F.col("__cheaper_best"))
        )
        .select(mn, "__best")
    )
    return df.join(frontier, on=mn, how="inner").where(
        F.col(mx) == F.col("__best")
    ).drop("__best")
