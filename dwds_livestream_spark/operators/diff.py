"""Keyed snapshot diff: added / removed / changed rows between two
table versions.

Beyond-reference operator (project brief: pipeline ops). The
reference's dimension refresh replaces the whole snapshot blindly
(wbdb.clj:39-49); at 100 TB you want the DELTA — audit what a refresh
actually changed, feed incremental downstream maintenance, or verify a
migration. One full-outer join on the key (single shuffle, both sides
keyed the same so AQE can co-locate), null-safe column comparison via
a struct equality (<=> on the packed struct), change columns listed
per row.

Output: key cols, change ('added'|'removed'|'changed'), changed_cols
(sorted array, empty for added/removed). Unchanged rows are dropped —
the output is |delta|-sized, not |table|-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    value_cols = [c for c in new.columns if c not in keys]
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshots must share a schema")
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__vo"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__vn"),
    )
    # presence MARKERS, not key-null checks: with plain equality a
    # NULL-valued key never matches, and "old-side key is null" would
    # misread a null-keyed removed row as 'added'. eqNullSafe lets
    # null-keyed rows pair up; the markers make added/removed immune
    # to key values entirely.
    o = o.withColumn("__in_old", F.lit(1))
    n = n.withColumn("__in_new", F.lit(1))
    cond = None
    for k in keys:
        c = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    added = F.col("__in_old").isNull()
    removed = F.col("__in_new").isNull()
    changed_cols = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"__vo.{c}").eqNullSafe(F.col(f"__vn.{c}")),
                    F.lit(c),
                )
                for c in value_cols
            ]
        ),
        lambda x: x.isNotNull(),
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"__kn_{k}"), F.col(f"__ko_{k}")).alias(k)
            for k in keys
        ],
        F.when(added, F.lit("added"))
        .when(removed, F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
        .alias("change"),
        F.when(added | removed, F.array().cast("array<string>"))
        .otherwise(F.array_sort(changed_cols))
        .alias("changed_cols"),
    )
    return out.where(F.col("change").isNotNull())
