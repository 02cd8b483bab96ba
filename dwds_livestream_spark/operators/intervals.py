"""Per-key interval union coverage (merge overlapping intervals).

Beyond-reference analytics operator (project brief): given keyed
intervals ``[start, end)``, compute per key the total length covered
by their UNION and the number of merged islands — "how long was this
user actually active", robust to overlapping/nested activity spans.

Classic gaps-and-islands, fully parallel per key: within each key
(hash-partitioned window, never a global sort), order intervals by
start; an interval starts a new island iff its start lies strictly
past the running max end of all preceding intervals; island id is the
running count of starts; one keyed aggregate folds islands to
(min start, max end) and a second sums their lengths. Two hash
shuffles on (key) / (key, island), both map-side combined. Touching
intervals (start == previous end) merge — [0,10) + [10,20) is one
island of 20.

For well-formed intervals (end >= start) the result is invariant to
the within-key tie order of equal starts: an interval whose start
equals a peer's start can never open a new island after it (the
running max end is then >= that start). Degenerate intervals
(end < start) can leave the running max end BELOW the shared start
(e.g. prior max 3, then [5,4) and [5,9)), making n_islands depend on
which tied row the window visits first — determinism there comes from
the (start, end) secondary sort, which the DuckDB oracle shares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_coverage(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key union length of ``[start_col, end_col)`` intervals.

    Output: key cols, ``covered`` (sum of merged island lengths, same
    unit as the inputs), ``n_islands``. Intervals with end <= start
    contribute zero length but still count toward their island.
    """
    w = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    island = F.sum(
        F.when(
            prev_end.isNull() | (F.col(start_col) > prev_end), 1
        ).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    islands = (
        df.withColumn("__island", island)
        .groupBy(*key_cols, "__island")
        .agg(
            F.min(start_col).alias("__s"),
            F.max(end_col).alias("__e"),
        )
    )
    return islands.groupBy(*key_cols).agg(
        F.sum(F.greatest(F.col("__e") - F.col("__s"), F.lit(0))).alias(
            "covered"
        ),
        F.count("*").alias("n_islands"),
    )
