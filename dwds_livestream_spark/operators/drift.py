"""Generic consecutive-period set-drift assembly.

``set_drift`` is the shared engine behind the temporal audit family:
``operators/urls.path_drift`` (per-domain URL-set Jaccard between
crawl snapshots) and ``operators/curation.content_drift`` (per-source
n-gram-set Jaccard between snapshots — the content twin). Both fold
their corpus to a distinct (key, period, item) frame and hand it
here; extracting the assembly keeps the two operators from diverging
(the round-9 self-review dedup rule).

Scale shape (inherited by every caller): the consecutive-pair frame
is a lead() over the DISTINCT periods — one task, bounded by the
calendar, never the corpus — and moves by BROADCAST; the
intersection is ONE equi hash join on (key, next_period, item);
per-side set sizes are map-side-combined counts; the final assembly
is key-sized outer joins. No all-pairs anywhere, no corpus-sized
ordered pass. A key present in only ONE side of a pair still emits
(jaccard 0, counts truthful) so births/deaths are visible.
Denominator = |union| >= 1 whenever a row exists, so the division is
ANSI-safe by construction.

No reference parity: the reference (dwds-livestream) has no temporal
audit surface; this serves the project brief's LLM-pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["set_drift"]


def set_drift(
    keyed: DataFrame,
    key_out: str,
    period_out: str,
) -> DataFrame:
    """Consecutive-period Jaccard over a distinct item-set frame.

    ``keyed`` contract: exactly the columns ``__k`` (set key, e.g.
    domain or source), ``__p`` (period), ``__i`` (set item, e.g. a
    normalized path or gram digest) — already DISTINCT and, because
    this plan fans it out to four consumers, already lazily
    checkpointed by the caller (both existing callers pin it).

    Output: <key_out>, <period_out>, next_<period_out>, n_prev,
    n_next, n_common, jaccard (6dp).
    """
    from pyspark.sql import Window

    next_col = f"next_{period_out}"
    periods = keyed.select("__p").distinct()
    pairs = periods.select(
        "__p",
        F.lead("__p").over(Window.orderBy("__p")).alias("__np"),
    ).where(F.col("__np").isNotNull())
    sizes = keyed.groupBy("__k", "__p").agg(F.count("*").alias("__n"))
    cur = keyed.join(F.broadcast(pairs), "__p")
    nxt = keyed.select("__k", F.col("__p").alias("__np"), "__i")
    common = (
        cur.join(nxt, ["__k", "__np", "__i"])
        .groupBy("__k", "__p", "__np")
        .agg(F.count("*").alias("__c"))
    )
    a = sizes.join(F.broadcast(pairs), "__p").select(
        "__k", "__p", "__np", F.col("__n").alias("__na")
    )
    b = (
        sizes.withColumnRenamed("__p", "__np")
        .join(F.broadcast(pairs), "__np")
        .select("__k", "__p", "__np", F.col("__n").alias("__nb"))
    )
    merged = (
        a.join(b, ["__k", "__p", "__np"], "full_outer")
        .join(common, ["__k", "__p", "__np"], "left")
        .select(
            F.col("__k").alias(key_out),
            F.col("__p").alias(period_out),
            F.col("__np").alias(next_col),
            F.coalesce("__na", F.lit(0)).cast("long").alias("n_prev"),
            F.coalesce("__nb", F.lit(0)).cast("long").alias("n_next"),
            F.coalesce("__c", F.lit(0)).cast("long").alias("n_common"),
        )
    )
    jac = F.round(
        F.col("n_common")
        / (F.col("n_prev") + F.col("n_next") - F.col("n_common")),
        6,
    ) + F.lit(0.0)
    return merged.select(
        key_out, period_out, next_col,
        "n_prev", "n_next", "n_common",
        jac.alias("jaccard"),
    )
