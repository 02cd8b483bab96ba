"""Group-wise probability calibration: isotonic (PAV) calibration
curves and reliability/ECE diagnostics.

Beyond-reference operators (project brief: training-data pipeline at
scale — quality-score calibration is the step between a scored corpus
and a thresholded one: a score only supports "keep the top X%" if its
relationship to the ground-truth label is monotone and known). The
calibration twin of the split-conformal gate
(curation.conformal_outlier_bounds): conformal fences score OUTLIERS
with finite-sample guarantees; isotonic regression fits the monotone
P(label | score) curve the threshold policy actually consumes.

Design for hash-oracle-ability (the module's house constraint): PAV
is usually presented as a sequential pool-adjacent-violators loop —
order-dependent and engine-specific. We compute the IDENTICAL fit via
the closed-form max–min characterization of L2 isotonic regression

    iso_k = max_{i <= k} min_{j >= k} (pos_{i..j}) / (n_{i..j})

(Ayer et al. 1955; Robertson–Wright–Dykstra 1988, §1.2 — the fitted
value at position k of the weighted least-squares monotone fit), over
BINNED integer sums: pos/n range sums come from exact integer prefix
sums, each candidate mean is ONE IEEE double division of two exact
integers, and min/max over doubles are order-free — so Spark and
DuckDB produce bit-identical curves, where a loop-based PAV would be
a rows-only entry. Cost: the range frame is bins² per group and the
max–min join is bins³ per group — bins is a SMALL constant (<= 32 by
contract), so this is deliberately "quadratic in a constant", never
in the data.

At 100 TB: one corpus scan folds map-side to (group, bin) integer
sums (<= bins rows per group); everything after — prefix windows,
the range self-join, the max–min fold — runs on bins-bounded frames
keyed by group. Corpus rows never shuffle past the first fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .curation import _ks_quantize


def _binned_counts(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
    bins: int,
) -> DataFrame:
    """(group, bin) -> (n, pos) integer sums over the shared
    equal-width grid (:func:`curation._ks_quantize`: one 1-row min/max
    broadcast bounds the domain; bucketing is the engine-exact
    subtract/divide/floor form). Rows with NULL group/score/label
    drop; labels must be 0/1 after a long cast."""
    lab = F.col(label_col).cast("long")
    base = df.where(
        F.col(group_col).isNotNull()
        & F.col(score_col).isNotNull()
        & lab.isNotNull()
    ).select(
        F.col(group_col).alias("__g"),
        F.col(score_col).alias("__s"),
        lab.alias("__y"),
    )
    q, _ = _ks_quantize(base, None, "__s", bins, keep_cols=("__g", "__y"))
    return q.groupBy("__g", F.col("__s").alias("__b")).agg(
        F.count("*").cast("long").alias("__n"),
        F.sum("__y").cast("long").alias("__pos"),
    )


def isotonic_calibration(
    df: DataFrame,
    score_col: str = "n_chars",
    label_col: str = "label",
    group_col: str = "source",
    bins: int = 16,
    pin: bool = True,
) -> DataFrame:
    """Per-group isotonic calibration curve over ``bins`` equal-width
    score bins: the weighted L2 monotone fit of the per-bin positive
    rate, via the exact max–min characterization (module docstring) —
    iso_k = max_{i<=k} min_{j>=k} pooled_rate(i..j) over OBSERVED
    bins in score order. rate_iso is non-decreasing in the bin index
    per group (asserted in tests), equals rate_raw wherever the raw
    rates are already monotone, and pools adjacent violators exactly
    as sequential PAV would.

    Contract: labels are 0/1 (long cast; NULL rows drop with NULL
    group/score); ``bins`` <= 32 — the max–min frame is bins³ per
    group by design (constant-bounded), and a 32-point curve is
    already denser than any threshold policy reads.

    Scale (100 TB): one map-side-combined groupBy(group, bin) integer
    fold bounds everything downstream to <= bins rows per group;
    prefix sums are a group-partitioned window over those rows; the
    range self-join and max–min fold are equi-joins on the group key
    over bins²/bins³-row frames. Corpus rows shuffle once (the fold's
    partial-aggregate exchange), never again. Output: <group_col>,
    bin, n, pos, rate_raw, rate_iso (6dp).
    """
    if not (1 <= bins <= 32):
        raise ValueError(f"bins must be in [1, 32]: {bins}")
    cells = _binned_counts(df, score_col, label_col, group_col, bins)
    if pin:
        # feeds the prefix frame twice (both sides of the range join)
        # and the k-index frame — pin per the multi-consumer rule
        cells = cells.localCheckpoint(eager=False)
    wpre = (
        Window.partitionBy("__g")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = cells.select(
        "__g",
        "__b",
        "__n",
        "__pos",
        (F.sum("__n").over(wpre) - F.col("__n")).alias("__pn"),
        (F.sum("__pos").over(wpre) - F.col("__pos")).alias("__ppos"),
    )
    lo = pre.select(
        "__g",
        F.col("__b").alias("__i"),
        F.col("__pn").alias("__pn_i"),
        F.col("__ppos").alias("__ppos_i"),
    )
    hi = pre.select(
        "__g",
        F.col("__b").alias("__j"),
        (F.col("__pn") + F.col("__n")).alias("__cn_j"),
        (F.col("__ppos") + F.col("__pos")).alias("__cpos_j"),
    )
    # pooled mean over observed-bin range [i, j]: ONE double division
    # of two exact integer range sums — engine-identical
    ranges = (
        lo.join(hi, "__g")
        .where(F.col("__i") <= F.col("__j"))
        .select(
            "__g",
            "__i",
            "__j",
            (
                (F.col("__cpos_j") - F.col("__ppos_i")).cast("double")
                / (F.col("__cn_j") - F.col("__pn_i")).cast("double")
            ).alias("__avg"),
        )
    )
    ks = cells.select("__g", F.col("__b").alias("__k"))
    minj = (
        ranges.join(ks, "__g")
        .where((F.col("__i") <= F.col("__k")) & (F.col("__j") >= F.col("__k")))
        .groupBy("__g", "__k", "__i")
        .agg(F.min("__avg").alias("__minj"))
    )
    iso = (
        minj.groupBy("__g", "__k")
        .agg(F.max("__minj").alias("__iso"))
        # rename the join key: iso derives from cells, and a raw
        # self-join on __g would be ambiguous
        .select(
            F.col("__g").alias("__gi"),
            F.col("__k").alias("__bi"),
            "__iso",
        )
    )
    return (
        cells.join(
            iso,
            (cells["__g"] == iso["__gi"]) & (cells["__b"] == iso["__bi"]),
        )
        .select(
            cells["__g"].alias(group_col),
            F.col("__b").alias("bin"),
            F.col("__n").alias("n"),
            F.col("__pos").alias("pos"),
            (
                F.round(
                    F.col("__pos").cast("double")
                    / F.col("__n").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("rate_raw"),
            (F.round(F.col("__iso"), 6) + F.lit(0.0)).alias("rate_iso"),
        )
    )


def calibration_reliability(
    df: DataFrame,
    conf_col: str = "conf",
    label_col: str = "label",
    group_col: str = "source",
    bins: int = 10,
) -> DataFrame:
    """Per-group reliability diagram + Expected Calibration Error over
    ``bins`` fixed equal bins of the [0, 1] confidence domain — the
    standard "is the score a probability" audit read next to the
    isotonic curve (fixed domain, so NO min/max pre-pass: bucketing
    is floor(conf·bins)+1 clamped to [1, bins], engine-exact).

    acc = pos/n is a division of exact integers; avg_conf sums
    doubles, so it sits in the psi_drift determinism class (IEEE sum
    whose ~ulp order-variation the 6dp round absorbs — guarded by the
    per-round shuffle-order determinism sweep, NOT the lossless
    integer class). ECE = Σ_b (n_b/N)·|acc_b − avg_conf_b| folds the
    bins-sized frame per group and is attached to every bin row of
    its group (bins-bounded group window, never corpus rows).

    Contract: conf in [0, 1] (rows outside drop with NULLs — a
    confidence outside the unit interval is a caller bug this audit
    must not silently clamp into the edge bins); labels 0/1.

    Scale: one map-side-combined groupBy(group, bin) fold, then
    bins-bounded per-group windows. Output: <group_col>, bin, n,
    n_total, avg_conf, acc, gap, ece (6dp; ece repeats per group
    row — the dashboard reads one row per (group, bin)).
    """
    if not (1 <= bins <= 64):
        raise ValueError(f"bins must be in [1, 64]: {bins}")
    conf = F.col(conf_col).cast("double")
    lab = F.col(label_col).cast("long")
    base = df.where(
        F.col(group_col).isNotNull()
        & conf.isNotNull()
        & lab.isNotNull()
        & (conf >= 0.0)
        & (conf <= 1.0)
    ).select(
        F.col(group_col).alias("__g"),
        conf.alias("__c"),
        lab.alias("__y"),
    )
    b = F.least(
        F.lit(int(bins)),
        F.greatest(
            F.lit(1), (F.floor(F.col("__c") * F.lit(float(bins))) + 1).cast("int")
        ),
    )
    cells = (
        base.select("__g", b.alias("__b"), "__c", "__y")
        .groupBy("__g", "__b")
        .agg(
            F.count("*").cast("long").alias("__n"),
            F.sum("__y").cast("long").alias("__pos"),
            F.sum("__c").alias("__sc"),
        )
    )
    wg = Window.partitionBy("__g")
    acc = F.col("__pos").cast("double") / F.col("__n").cast("double")
    avg_conf = F.col("__sc") / F.col("__n").cast("double")
    out = cells.select(
        "__g",
        "__b",
        "__n",
        "__pos",
        F.sum("__n").over(wg).cast("long").alias("n_total"),
        (F.round(avg_conf, 6) + F.lit(0.0)).alias("avg_conf"),
        (F.round(acc, 6) + F.lit(0.0)).alias("acc"),
        (F.round(acc - avg_conf, 6) + F.lit(0.0)).alias("gap"),
        (
            F.col("__n").cast("double")
            * F.abs(acc - avg_conf)
        ).alias("__w_gap"),
    )
    return out.select(
        F.col("__g").alias(group_col),
        F.col("__b").alias("bin"),
        F.col("__n").alias("n"),
        "n_total",
        "avg_conf",
        "acc",
        "gap",
        (
            F.round(
                F.sum("__w_gap").over(wg) / F.col("n_total").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("ece"),
    )
