"""As-of (nearest-earlier) join — a temporal operator the reference does
not have (SURVEY.md §2.4 "not present") and Spark lacks as a primitive,
implemented as a composition of built-in DataFrame ops (project brief:
custom operators as compositions first).

Semantics: for each left row, attach the payload of the right row with
the same key and the greatest ``right_ts <= left_ts`` (backward as-of,
inclusive). Rows with no earlier right match keep null payloads (left
outer), matching DuckDB's ``ASOF LEFT JOIN``.

Implementation — the "union + running last_value" plan, not a join:
both sides are unioned on (key, ts), sorted within key, and each right
payload column is carried forward with ``last(col, ignorenulls=True)``
over ``rowsBetween(unboundedPreceding, 0)``; left rows then read the
most recent right payload. Cost: ONE shuffle of (|L|+|R|) rows on the
key — identical partitioning to a sort-merge join but with no
candidate-pair explosion, no range-duplicate blowup, and no driver-side
loop, so it survives 100 TB the same way any keyed window does. Skewed
keys are the same risk as any window; AQE/salting applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str] | None = None,
) -> DataFrame:
    """Backward inclusive as-of join (left outer).

    Output: all left columns + ``payload`` columns from the matched
    right row + ``matched_ts`` (the matched ``right_ts``, null if none).

    Ties: if several right rows share the same (key, right_ts), the one
    that sorts last on (payload...) wins — a total, engine-independent
    tie-break (DuckDB ASOF picks an arbitrary one; callers who need
    determinism should pre-dedup the right side, as the test queries do).
    """
    payload = payload or [c for c in right.columns if c not in (on, right_ts)]

    # side=0 sorts right rows before left rows at equal ts -> inclusive <=
    lhs = left.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(F.col(right_ts).alias("__matched_ts"), *payload).alias("__p"),
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    for c in ("__p",):
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None).cast(rhs.schema["__p"].dataType))

    unioned = lhs.select(
        on, "__ts", "__side", "__p", *[c for c in left.columns if c != on]
    ).unionByName(
        rhs.select(
            on, "__ts", "__side", "__p", *[c for c in left.columns if c != on]
        )
    )

    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side", "__p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__last_p", F.last("__p", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("__side") == 1).select(
        *left.columns,
        F.col("__last_p.__matched_ts").alias("matched_ts"),
        *[F.col(f"__last_p.{c}").alias(c) for c in payload],
    )
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str] | None = None,
) -> DataFrame:
    """Forward (nearest-later, inclusive) as-of join: for each left row
    attach the right row with the same key and the SMALLEST
    ``right_ts >= left_ts`` — the mirror of :func:`asof_join`, same
    one-shuffle union+window plan with the frame reversed
    (first non-null over [current, unbounded following]; left rows
    sort before right rows at equal ts so same-instant matches are
    inclusive). Matches DuckDB ``ASOF LEFT JOIN ... ON l.ts <= r.ts``.
    """
    payload = payload or [c for c in right.columns if c not in (on, right_ts)]

    lhs = left.withColumn("__side", F.lit(0)).withColumn(
        "__ts", F.col(left_ts)
    )
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(F.col(right_ts).alias("__matched_ts"), *payload).alias("__p"),
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    if "__p" not in lhs.columns:
        lhs = lhs.withColumn("__p", F.lit(None).cast(rhs.schema["__p"].dataType))

    unioned = lhs.select(
        on, "__ts", "__side", "__p", *[c for c in left.columns if c != on]
    ).unionByName(
        rhs.select(
            on, "__ts", "__side", "__p", *[c for c in left.columns if c != on]
        )
    )

    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side", "__p")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = unioned.withColumn(
        "__next_p", F.first("__p", ignorenulls=True).over(w)
    )
    return carried.where(F.col("__side") == 0).select(
        *left.columns,
        F.col("__next_p.__matched_ts").alias("matched_ts"),
        *[F.col(f"__next_p.{c}").alias(c) for c in payload],
    )
