"""Declarative data-quality expectations (Deequ/Great-Expectations
shape, Spark-native): evaluate a rule set against a frame in ONE
aggregate pass and emit a violation report.

Beyond-reference operator (project brief: pipeline ops). A 100 TB
ingest needs its gate checks (nulls, ranges, uniqueness, formats,
freshness) to cost one scan, not one scan per rule — every rule here
compiles to a conditional-count expression inside a single groupless
aggregate (automatic map-side partials, one 1-row result), except
uniqueness, which needs its own keyed aggregate by nature (duplicate
detection is a groupBy — also one shuffle, keys only).

Rules (constructors return an opaque spec consumed by ``validate``):
- ``not_null(col)``
- ``in_range(col, lo, hi)`` — inclusive; NULLs don't violate (compose
  with not_null to forbid them)
- ``matches(col, regex)``
- ``unique(*cols)`` — duplicate KEY GROUPS count as violations
- ``freshness(ts_col, max_lag_seconds, now)`` — newest row must be
  within the lag (``now`` explicit for determinism)

Output: rule string, n_violations long, passed boolean — one row per
rule, ordered by rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple:
    return ("not_null", col, F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple:
    c = F.col(col)
    return (
        f"in_range[{lo},{hi}]",
        col,
        c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi)),
    )


def matches(col: str, regex: str) -> tuple:
    c = F.col(col)
    return (
        f"matches[{regex}]",
        col,
        c.isNotNull() & ~c.rlike(regex),
    )


def unique(*cols: str) -> tuple:
    return ("unique", list(cols), None)


def freshness(ts_col: str, max_lag_seconds: int, now: str) -> tuple:
    lag = F.unix_timestamp(F.lit(now)) - F.unix_timestamp(F.max(ts_col))
    return (
        f"freshness[{max_lag_seconds}s@{now}]",
        ts_col,
        # fail-closed on an EMPTY table: max(ts) is null there, the lag
        # is null, and when(null > max_lag) would fall to otherwise(0)
        # — reporting a pipeline that stopped producing rows entirely
        # as fresh forever, the one scenario this gate exists to catch
        (
            "agg",
            F.when(F.max(ts_col).isNull() | (lag > max_lag_seconds), 1)
            .otherwise(0)
            .cast("long"),
        ),
    )


def validate(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """One row per rule: rule, n_violations, passed. Row rules share a
    single scan; each unique() rule adds one keyed (cols-only)
    aggregate, unioned in."""
    row_aggs: list[Column] = []
    names: list[str] = []
    uniques: list[list[str]] = []
    for kind, target, pred in rules:
        label = f"{kind}({target if isinstance(target, str) else ','.join(target)})"
        if kind == "unique":
            uniques.append((label, target))
            continue
        if isinstance(pred, tuple) and pred[0] == "agg":
            row_aggs.append(pred[1].alias(label))
        else:
            row_aggs.append(
                F.count_if(pred).cast("long").alias(label)
            )
        names.append(label)

    parts: list[DataFrame] = []
    if row_aggs:
        one = df.agg(*row_aggs)
        stacked = one.selectExpr(
            "stack({n}, {pairs}) as (rule, n_violations)".format(
                n=len(names),
                pairs=", ".join(f"'{n}', `{n}`" for n in names),
            )
        )
        parts.append(stacked)
    for label, cols in uniques:
        dup_groups = (
            df.groupBy(*[F.col(c) for c in cols])
            .agg(F.count("*").alias("__n"))
            .where(F.col("__n") > 1)
            .agg(F.count("*").cast("long").alias("n_violations"))
            .select(F.lit(label).alias("rule"), "n_violations")
        )
        parts.append(dup_groups)
    if not parts:
        raise ValueError("validate() needs at least one rule")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("rule")
