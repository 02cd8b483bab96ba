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

__all__ = ["set_drift", "set_novelty"]


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


def set_novelty(
    keyed: DataFrame,
    key_out: str,
    period_out: str,
    count_cols: "tuple[str, str]" = ("n_urls", "n_new"),
    per_key: bool = True,
) -> DataFrame:
    """First-seen novelty over a distinct item-set frame — the
    cumulative complement of :func:`set_drift`, extracted from
    ``operators/urls.path_novelty`` so its lexical twin
    (``operators/curation.token_novelty``) shares the assembly.

    ``keyed`` contract: exactly the columns ``__k`` (set key), ``__p``
    (period), ``__i`` (set item) — already DISTINCT and lazily
    checkpointed by the caller (it fans out to the first-seen fold
    and the totals fold). An item's identity is ALWAYS (``__k``,
    ``__i``); ``per_key`` only controls whether the output is keyed
    (one novelty curve per key) or global (counts collapsed over
    keys — the original path_novelty view).

    Window-free: "seen before" is exactly "first_period < period", so
    the prefix scan collapses into one keyed min(); per-period counts
    join key-sized frames. First observed period reports novelty 1.0
    by construction. Output: [<key_out>,] <period_out>,
    <count_cols[0]>, <count_cols[1]>, novelty (6dp; the total is
    >= 1 whenever the row exists, so the division is ANSI-safe).
    """
    n_tot, n_new = count_cols
    first = keyed.groupBy("__k", "__i").agg(F.min("__p").alias("__first"))
    gk = ["__k"] if per_key else []
    new_counts = first.groupBy(
        *gk, F.col("__first").alias("__p")
    ).agg(F.count("*").alias(n_new))
    totals = keyed.groupBy(*gk, "__p").agg(F.count("*").alias(n_tot))
    nov = F.round(F.col(n_new) / F.col(n_tot), 6) + F.lit(0.0)
    out_keys = [F.col("__k").alias(key_out)] if per_key else []
    return (
        totals.join(new_counts, [*gk, "__p"], "left")
        .select(
            *out_keys,
            F.col("__p").alias(period_out),
            F.col(n_tot).cast("long").alias(n_tot),
            F.coalesce(n_new, F.lit(0)).cast("long").alias(n_new),
        )
        .select(
            *([key_out] if per_key else []),
            period_out, n_tot, n_new, nov.alias("novelty"),
        )
    )
