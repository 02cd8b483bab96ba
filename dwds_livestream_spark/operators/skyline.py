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

No global sort; shuffles are distinct-value- or bucket-sized. For
d >= 3 see ``skyline_md`` below (grid filter-and-refine — repeated
2-D passes are NOT sound as a pre-filter; counterexample in its
docstring).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..localrel import local_df

# Refine-stage budget: the candidate cell-pair relation is broadcast
# (two int64 cols -> ~16 bytes/row), so cap it well under driver/
# executor broadcast comfort. 8M pairs ~ 128 MB.
_PAIR_BROADCAST_CAP = 8_000_000


def pareto_frontier(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Rows of ``df`` not dominated under (minimize ``minimize_col``,
    maximize ``maximize_col``). Ties survive together: two identical
    (min, max) points do not dominate each other, so both return.

    Null policy: rows with NULL in either objective column are
    EXCLUDED from the result (filtered up front). This differs from a
    literal NOT EXISTS oracle, where NULL comparisons make the inner
    predicate unknown and a NULL row would trivially survive — a
    definitional artifact, not useful dominance semantics. Callers who
    want NULL rows back must union them in explicitly.
    """
    mn, mx = minimize_col, maximize_col
    df = df.where(F.col(mn).isNotNull() & F.col(mx).isNotNull())
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


# ---------------------------------------------------------------------
# d >= 3: grid filter + candidate-pair refine


def skyline_md(
    df: DataFrame,
    minimize_cols: list[str],
    maximize_cols: list[str],
    n_buckets: int = 8,
) -> DataFrame:
    """d-dimensional skyline: the rows no other row dominates, where
    q dominates p iff q is <= p on every ``minimize_cols`` entry, >= p
    on every ``maximize_cols`` entry, and strictly better on at least
    one. Identical tuples never dominate each other, so exact ties all
    survive together. Rows with NULL in any objective column are
    excluded (same policy as ``pareto_frontier`` above).

    The 2-D distinct-value prefix decomposition above does not extend:
    ROADMAP r6 sketched "repeated 2-D passes", but a 2-D pass is
    UNSOUND as a pre-filter — p=(1,5,9) is in the 3-D skyline against
    q=(0,6,0) yet q dominates p in the (d1,d2) projection, so a
    (d1,d2) skyline pass would wrongly drop p. Instead this is the
    classic grid filter-and-refine:

    1. normalize every dim to minimize orientation; fold to DISTINCT
       tuples (one hash aggregate — dominance only depends on values),
    2. equi-width bucket each dim (bounds from one 2-row aggregate);
       per-cell corner summary (componentwise min/max over the cell's
       points) — at most n_buckets**d rows, collected (driver-sized by
       construction, like the 2-D bucket summary),
    3. driver-side cell pruning (vectorized numpy, O(cells²) on <=
       n_buckets**d cells): cell X kills cell Y iff maxcorner(X) <=
       mincorner(Y) componentwise, strict in >= 1 dim — then EVERY
       X-point dominates EVERY Y-point (x <= maxX <= minY <= y).
       Killing dominated points as dominators is safe by transitivity,
       and the kill relation is acyclic (a 2-cycle forces all corners
       equal, contradicting strictness),
    4. refine only the surviving cells: broadcast the (dominator_cell,
       target_cell) candidate pairs — X can dominate into Y only if
       mincorner(X) <= maxcorner(Y) componentwise — join survivor
       tuples through the pair list, evaluate exact dominance, anti-
       join dominated tuples away, and join the frontier back to the
       corpus rows.

    Shuffles are distinct-tuple- and survivor-sized, never corpus-
    sized; there is no global sort. Worst case (every point near the
    Pareto surface, e.g. anti-correlated dims) degenerates toward the
    all-pairs refine on the survivor set — the known lower bound for
    exact skylines; n_buckets trades pruning power against the
    cell-summary size.
    """
    dims = list(minimize_cols) + list(maximize_cols)
    if len(dims) < 2:
        raise ValueError("skyline needs >= 2 objective columns")
    g = int(n_buckets)
    if g < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    d = len(dims)

    cond = None
    for c in dims:
        nn = F.col(c).isNotNull()
        cond = nn if cond is None else cond & nn
    df = df.where(cond)

    # minimize orientation: m_i = col (minimize) or -col (maximize)
    ms = [f"__m{i}" for i in range(d)]
    orient = df.select(
        *df.columns,
        *[
            (F.col(c).cast("double") * (1 if c in minimize_cols else -1)
             ).alias(m)
            for c, m in zip(dims, ms)
        ],
    )
    # the distinct-tuple frame feeds four consumers (bounds, cell
    # summary, survivor refine, frontier anti-join) — cache it so the
    # corpus-sized distinct runs ONCE; it is the SMALL frame (distinct
    # objective tuples, bounded by value cardinality, not corpus rows).
    # Same persisted-intermediate pattern as the minhash signature
    # frame (operators/dedup.py); bench drops leftover caches between
    # queries via session.drop_leftover_state.
    tuples = orient.select(*ms).distinct().cache()

    bounds = tuples.agg(
        *[F.min(m).alias(f"lo{i}") for i, m in enumerate(ms)],
        *[F.max(m).alias(f"hi{i}") for i, m in enumerate(ms)],
    ).first()
    if bounds is None or bounds["lo0"] is None:
        return df.where(F.lit(False))
    los = [float(bounds[f"lo{i}"]) for i in range(d)]
    widths = [
        (float(bounds[f"hi{i}"]) - los[i]) / g or 1.0 for i in range(d)
    ]

    cell = None
    for i, m in enumerate(ms):
        b = F.least(
            F.floor((F.col(m) - F.lit(los[i])) / F.lit(widths[i])),
            F.lit(g - 1),
        ).cast("bigint")
        cell = b if cell is None else cell * g + b
    binned = tuples.withColumn("__cell", cell)

    # cell corner summary: <= g**d rows by construction
    summary = (
        binned.groupBy("__cell")
        .agg(
            *[F.min(m).alias(f"mn{i}") for i, m in enumerate(ms)],
            *[F.max(m).alias(f"mx{i}") for i, m in enumerate(ms)],
        )
        .collect()
    )
    cells = np.array([r["__cell"] for r in summary], dtype=np.int64)
    mn = np.array(
        [[r[f"mn{i}"] for i in range(d)] for r in summary], dtype=np.float64
    )
    mx = np.array(
        [[r[f"mx{i}"] for i in range(d)] for r in summary], dtype=np.float64
    )
    n = len(cells)
    # kills[x, y]: maxcorner(x) <= mincorner(y) all dims, strict >= 1
    le = np.ones((n, n), dtype=bool)
    lt = np.zeros((n, n), dtype=bool)
    for i in range(d):
        le &= mx[:, i][:, None] <= mn[:, i][None, :]
        lt |= mx[:, i][:, None] < mn[:, i][None, :]
    killed = (le & lt).any(axis=0)
    alive = cells[~killed]
    amn, amx = mn[~killed], mx[~killed]

    # candidate dominator pairs among survivors: X may dominate into Y
    # only if mincorner(X) <= maxcorner(Y) componentwise (includes X=Y)
    may = np.ones((len(alive), len(alive)), dtype=bool)
    for i in range(d):
        may &= amn[:, i][:, None] <= amx[:, i][None, :]
    xs, ys = np.nonzero(may)
    # The pair relation is worst-case len(alive)^2 = n_buckets**(2d)
    # (weak pruning, e.g. anti-correlated dims). It is built
    # vectorized (numpy index arrays -> Arrow, never a Python tuple
    # list) and broadcast for the routing join below, so past the
    # broadcast-size budget the refine can't work — fail loudly with
    # guidance instead of letting the broadcast OOM (ADVICE r7).
    if len(xs) > _PAIR_BROADCAST_CAP:
        raise ValueError(
            f"skyline_md refine would broadcast {len(xs)} candidate "
            f"cell pairs ({len(alive)} surviving cells); grid pruning "
            f"is too weak at n_buckets={g} for this distribution — "
            "lower n_buckets (coarser cells prune less per cell but "
            "bound the pair relation) or pre-filter the input"
        )
    spark = df.sparkSession
    pairs_pdf = pd.DataFrame(
        {
            "__dom_cell": alive[xs].astype(np.int64),
            "__tgt_cell": alive[ys].astype(np.int64),
        }
    )
    pairs = spark.createDataFrame(
        pairs_pdf, "__dom_cell long, __tgt_cell long"
    )

    surv = binned.join(
        F.broadcast(
            local_df(spark, [(int(c),) for c in alive], "__cell long")
        ),
        "__cell",
    )
    tgt = surv.select(
        F.col("__cell").alias("__tgt_cell"),
        *[F.col(m).alias(f"__t{i}") for i, m in enumerate(ms)],
    )
    dom = surv.select(
        F.col("__cell").alias("__dom_cell"),
        *[F.col(m).alias(f"__d{i}") for i, m in enumerate(ms)],
    )
    all_le = None
    any_lt = None
    for i in range(d):
        le_i = F.col(f"__d{i}") <= F.col(f"__t{i}")
        lt_i = F.col(f"__d{i}") < F.col(f"__t{i}")
        all_le = le_i if all_le is None else all_le & le_i
        any_lt = lt_i if any_lt is None else any_lt | lt_i
    dominated = (
        tgt.join(F.broadcast(pairs), "__tgt_cell")
        .join(dom, "__dom_cell")
        .where(all_le & any_lt)
        .select(*[F.col(f"__t{i}").alias(m) for i, m in enumerate(ms)])
        .distinct()
    )
    # Materialize the frontier keys (skyline-tuple-sized) so the
    # distinct-tuple cache can be released HERE instead of leaking for
    # the session (ADVICE r7): localCheckpoint computes the frontier
    # while `tuples` is still cached, after which the returned plan
    # only references the checkpointed frontier + one corpus scan.
    # Checkpoint blocks are ContextCleaner-managed (freed when the
    # result goes out of scope), unlike CacheManager entries.
    frontier = (
        surv.select(*ms)
        .join(dominated, ms, "left_anti")
        .localCheckpoint(eager=True)
    )
    tuples.unpersist()
    return orient.join(frontier, ms, "left_semi").drop(*ms)
