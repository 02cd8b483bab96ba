"""Mergeable fixed-bin quantile histograms: the HLL-table pattern
(operators/hll.py) applied to percentiles.

Beyond-reference operator (project brief: pipeline ops at scale). The
existing ``value_percentiles`` query answers ONE fixed question per
event scan; this module persists a per-day histogram whose bins are
summable, so ANY later date-range percentile question is answered from
``days x n_bins`` rollup rows — no rescan of the events, no
percentile_approx shuffle of raw values.

Unlike HLL (whose sketch blobs force a rows-only check), a fixed-bin
histogram is *deterministic arithmetic* — bin assignment, merge, and
the interpolated quantile reconstruction are all reproducible in ANSI
SQL, so the registry entry carries a full DuckDB value-hash oracle.

- ``histogram_rollup``: one groupBy(day, bin) pass -> (day, bin, cnt).
  Out-of-domain values clamp into the edge bins (the standard
  fixed-domain trade-off; pick [lo, hi) from domain knowledge or a
  prior profile scan).
- ``range_quantiles``: merge a date slice (sum bins), then reconstruct
  quantiles by linear interpolation inside the covering bin. Rank
  convention: the q-quantile is the value at 1-based rank
  ceil(q * N) of the sorted multiset, located by the first bin whose
  cumulative count reaches that rank.

Error bound: an interpolated quantile is off by at most one bin width
(exact if values were uniform within the bin) — gated against exact
percentiles in tests/test_quantile_hist.py.

At 100 TB: the rollup is one map-side-combined aggregate (the same
shuffle volume as any daily count); the persisted table is
|days| x n_bins rows of (date, int, long) — kilobytes per year — and
every range-quantile query touches only those rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..localrel import local_df


def day_bin_cells(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    lo: float = 0.0,
    hi: float = 512.0,
    n_bins: int = 64,
) -> DataFrame:
    """(day, bin) cell per row — the shared binning projection behind
    the batch rollup and its streaming twin
    (streaming/sketches.py::histogram_stream). Values outside [lo, hi)
    clamp to the edge bins so every NUMERIC row is counted (N over
    non-null values is preserved exactly); NULL and NaN are EXCLUDED —
    greatest(0, null) would otherwise silently clamp them into bin 0
    and drag every reconstructed quantile toward ``lo``, where
    percentile/percentile_approx ignore them."""
    w = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(w)).cast("long")
    bin_ = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw))
    return df.where(
        F.col(value_col).isNotNull() & ~F.isnan(value_col)
    ).select(F.to_date(ts_col).alias("day"), bin_.alias("bin"))


def histogram_rollup(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    lo: float = 0.0,
    hi: float = 512.0,
    n_bins: int = 64,
) -> DataFrame:
    """Per-day fixed-bin histogram: (day, bin, cnt). Bin width is
    (hi - lo) / n_bins."""
    return (
        day_bin_cells(events, value_col, ts_col, lo, hi, n_bins)
        .groupBy("day", "bin")
        .agg(F.count("*").alias("cnt"))
    )


def range_quantiles(
    hist: DataFrame,
    start: str,
    end: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    lo: float = 0.0,
    hi: float = 512.0,
    n_bins: int = 64,
) -> DataFrame:
    """Approximate quantiles for days in [start, end], computed ONLY
    from the persisted histogram rows: (q, est). Merge = bin-wise sum;
    the window runs over <= n_bins merged rows (bounded by
    construction, not by the data — whitelisted in the plan sweep)."""
    w = (hi - lo) / n_bins
    merged = (
        hist.where(F.col("day").between(F.lit(start), F.lit(end)))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    cum_w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = merged.select(
        "bin",
        "cnt",
        F.sum("cnt").over(cum_w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy("bin").rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
        # exact integer identity — no third window spec needed
    ).withColumn("cum_before", F.col("cum") - F.col("cnt"))
    q_df = local_df(
        hist.sparkSession, [(float(q),) for q in qs], "q double"
    )
    ranked = cum.join(
        F.broadcast(q_df),
        (F.ceil(F.col("q") * F.col("n")) > F.col("cum_before"))
        & (F.ceil(F.col("q") * F.col("n")) <= F.col("cum")),
    )
    est = (
        F.lit(lo)
        + F.lit(w)
        * (
            F.col("bin")
            + (F.ceil(F.col("q") * F.col("n")) - F.col("cum_before"))
            / F.col("cnt")
        )
    )
    return ranked.select("q", F.round(est, 6).alias("est")).orderBy("q")


def histogram_rollup_by(
    events: DataFrame,
    key_col: str,
    value_col: str = "value",
    ts_col: str = "ts",
    lo: float = 0.0,
    hi: float = 512.0,
    n_bins: int = 64,
) -> DataFrame:
    """Keyed rollup: (key, day, bin, cnt) — per-segment percentile
    state (per event type, per tenant, per endpoint). Still ONE
    map-side-combined aggregate; the artifact is |keys| x |days| x
    n_bins rows. Same binning rule (and null/NaN exclusion) as the
    global rollup."""
    w = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(w)).cast("long")
    bin_ = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw))
    return (
        events.where(
            F.col(value_col).isNotNull() & ~F.isnan(value_col)
        )
        .select(
            F.col(key_col).alias("key"),
            F.to_date(ts_col).alias("day"),
            bin_.alias("bin"),
        )
        .groupBy("key", "day", "bin")
        .agg(F.count("*").alias("cnt"))
    )


def range_quantiles_by(
    hist: DataFrame,
    start: str,
    end: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    lo: float = 0.0,
    hi: float = 512.0,
    n_bins: int = 64,
) -> DataFrame:
    """Per-key quantiles for days in [start, end] from the keyed
    rollup: (key, q, est). Unlike the global variant, every window
    here partitions BY KEY — no single-partition stage at any key
    cardinality (the plan the global form only approximates via its
    bounded-64-row whitelist)."""
    w = (hi - lo) / n_bins
    merged = (
        hist.where(F.col("day").between(F.lit(start), F.lit(end)))
        .groupBy("key", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    cum_w = Window.partitionBy("key").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot_w = Window.partitionBy("key")
    cum = merged.select(
        "key",
        "bin",
        "cnt",
        F.sum("cnt").over(cum_w).alias("cum"),
        F.sum("cnt").over(tot_w).alias("n"),
    ).withColumn("cum_before", F.col("cum") - F.col("cnt"))
    q_df = local_df(
        hist.sparkSession, [(float(q),) for q in qs], "q double"
    )
    ranked = cum.join(
        F.broadcast(q_df),
        (F.ceil(F.col("q") * F.col("n")) > F.col("cum_before"))
        & (F.ceil(F.col("q") * F.col("n")) <= F.col("cum")),
    )
    est = (
        F.lit(lo)
        + F.lit(w)
        * (
            F.col("bin")
            + (F.ceil(F.col("q") * F.col("n")) - F.col("cum_before"))
            / F.col("cnt")
        )
    )
    return ranked.select(
        "key", "q", F.round(est, 6).alias("est")
    ).orderBy("key", "q")


def logbucket_quantiles(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
    percentiles: tuple = (0.5, 0.9, 0.99),
    sub: int = 16,
    pin: bool = True,
) -> DataFrame:
    """Per-group quantiles from a DETERMINISTIC mergeable LOG-BUCKET
    sketch — the domain-free sibling of :func:`histogram_rollup` and
    the deterministic stand-in for a KLL/t-digest table (VERDICT r10
    #5's named candidate): one single-pass fold, NO whole-frame
    min/max pre-pass (the gap ``_ks_quantize``'s exact grid leaves),
    bucket count bounded by 63 × ``sub`` per group on ANY value
    range, and — unlike KLL/t-digest, whose compaction paths are
    execution-order-dependent — every step is exact integer
    arithmetic, so the sketch AND its quantile readout are
    bit-identical across engines, partitionings and merge orders
    (hash-oracle-able where a real KLL would be rows-only).

    Bucketing: a value v >= 1 (cast to long) lands in bucket
    (e, m) with e = floor(log2 v) computed EXACTLY as
    length(bin(v)) − 1 — string-of-bits, no libm log whose boundary
    ulps differ per engine — and m = floor((v − 2^e) · sub / 2^e) in
    integer arithmetic, computed divide-first as
    (v − 2^e) div 2^(e − log2 sub) once e >= log2(sub) so the fold is
    exact and overflow-free for the FULL positive long range (the
    multiply-first form overflows at e >= 63 − log2(sub)): ``sub``
    equal sub-buckets per octave, i.e. the
    classic base-(1 + 1/sub) log histogram (the HDR-histogram /
    DDSketch layout) in exact integer form. Quantile readout: the
    value at 1-based rank ceil(p·n) (the repo's percentile-approx
    rank convention) is located in the first bucket whose cumulative
    count reaches the rank; the estimate is the bucket's LOWER bound
    (sub + m) · 2^e / sub — an exact dyadic rational when ``sub`` is
    a power of two, so the output double is engine-exact. Guarantee:
    estimate <= exact quantile < estimate · (sub + 1)/sub — relative
    error < 1/sub (6.25 % at sub=16), gated against exact
    percentiles in tests.

    Contract: values are positive integers (>= 1) after a long cast —
    lengths, counts, token totals, byte sizes: the curation scores
    this table serves. NULL group/value and v < 1 rows drop
    (sub-unit and negative domains need sign/zero octaves — out of
    scope for the integer-score use case). ``sub`` must be a power
    of two (the exactness condition); percentiles in (0, 1].

    Scale (100 TB): ONE groupBy(group, e, m) count fold with map-side
    combine — the sketch IS the group's partial aggregate, mergeable
    by addition, so executors stream any value distribution into
    <= 63·sub cells without coordination; the cumulative/readout pass
    is a group-partitioned window over bucket rows (<= 63·sub per
    group, never corpus rows); rank targets join key-sized frames.
    The cell frame feeds TWO consumers (the cumulative window and the
    per-group totals), so it is pinned lazily by default — unpinned,
    the corpus fold would run twice; ``pin=False`` keeps the lineage
    visible for plan-shape tests. Output: <group_col>, percentile, n,
    q_est — long format, one row per group × percentile.
    """
    if sub < 1 or (sub & (sub - 1)) != 0:
        raise ValueError(f"sub must be a power of two >= 1: {sub}")
    if not percentiles or not all(0.0 < p <= 1.0 for p in percentiles):
        raise ValueError(f"percentiles must be in (0, 1]: {percentiles}")
    v = F.col(value_col).cast("long")
    base = df.where(
        F.col(group_col).isNotNull() & v.isNotNull() & (v >= 1)
    ).select(F.col(group_col).alias("__g"), v.alias("__v"))
    out = _logbucket_readout(base, ["__g"], percentiles, sub, pin)
    return out.select(
        F.col("__g").alias(group_col), "percentile", "n", "q_est"
    )


def _logbucket_readout(
    base: DataFrame,
    keys: list,
    percentiles: tuple,
    sub: int,
    pin: bool,
) -> DataFrame:
    """The log-bucket sketch fold + rank readout over a prepared frame
    (``keys`` + ``__v`` long >= 1) — shared by
    :func:`logbucket_quantiles` (keys = [group]) and
    :func:`logbucket_quantile_drift` (keys = [group, period]). Plan
    shape is identical per key arity: one map-side-combined
    groupBy(keys, e, m) count fold, a key-partitioned cumulative
    window over <= 63·sub bucket rows, and key-sized rank joins."""
    e = (F.length(F.bin(F.col("__v"))) - 1).cast("int")
    # m = floor((v − 2^e) · sub / 2^e) via integral `div` (a double
    # product would lose bits past 2^53). For e >= log2(sub) divide
    # BEFORE multiplying — (v − 2^e) div 2^(e − log2(sub)) — which is
    # the same floor exactly (sub divides 2^e) and never overflows;
    # the multiply-first form would overflow signed 64-bit once
    # (v − 2^e)·sub >= 2^63 (e >= 63 − log2(sub)). Below log2(sub)
    # the residual is < sub, so multiply-first is tiny and exact.
    s = int(sub).bit_length() - 1
    m = F.expr(
        f"CASE WHEN __e >= {s} THEN "
        f"(__v - shiftleft(1L, cast(__e as int))) div "
        f"shiftleft(1L, cast(__e as int) - {s}) "
        f"ELSE ((__v - shiftleft(1L, cast(__e as int))) * {int(sub)}) "
        "div shiftleft(1L, cast(__e as int)) END"
    )
    cells = (
        base.select(*keys, "__v", e.alias("__e"))
        .select(*keys, "__e", m.alias("__m"))
        .groupBy(*keys, "__e", "__m")
        .agg(F.count("*").alias("__c"))
    )
    if pin:
        cells = cells.localCheckpoint(eager=False)
    wcum = (
        Window.partitionBy(*keys)
        .orderBy("__e", "__m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.withColumn("__cum", F.sum("__c").over(wcum))
    targets = (
        cells.groupBy(*keys)
        .agg(F.sum("__c").cast("long").alias("n"))
        .select(
            *keys,
            "n",
            F.explode(
                F.array(*[F.lit(float(p)) for p in percentiles])
            ).alias("percentile"),
        )
        .withColumn(
            "__r",
            F.ceil(F.col("percentile") * F.col("n")).cast("long"),
        )
    )
    hit = (
        cum.join(targets, keys)
        .where(F.col("__cum") >= F.col("__r"))
        .groupBy(*keys, "percentile", "n")
        .agg(F.min(F.struct("__e", "__m")).alias("__b"))
    )
    # (sub + m) has <= 6 significant bits and 2^e is a power of two,
    # so the double product and the division by the power-of-two
    # ``sub`` are both IEEE-exact; double-side arithmetic avoids the
    # long overflow a 2^e integer product would hit at e >= 59
    est = (
        (F.lit(int(sub)) + F.col("__b.__m")).cast("double")
        * F.expr("shiftleft(1L, cast(__b.__e as int))").cast("double")
        / F.lit(float(sub))
    )
    return hit.select(*keys, "percentile", "n", est.alias("q_est"))


def logbucket_quantile_drift(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
    period_col: str = "snapshot",
    percentiles: tuple = (0.5, 0.9, 0.99),
    sub: int = 16,
    pin: bool = True,
) -> DataFrame:
    """Per-group quantile SHIFT between consecutive snapshots from the
    shared log-bucket sketch (VERDICT r11 #4 — the sketch's temporal
    composition): p50/p90/p99 of ``value_col`` per (group, period)
    read from ONE sketch fold, then consecutive periods joined on the
    calendar — the temporal-audit dashboard's "did the length/score
    distribution move" row, with the sketch's determinism contract
    intact (every column exact integer arithmetic or a dyadic-double
    readout, so the drift table hash-matches the oracle where a
    KLL-based twin would be rows-only). q_ratio = q_next / q_prev is
    an exact IEEE division of two dyadic doubles; values within one
    sketch bucket read ratio 1.0 by construction (shifts below the
    1/sub resolution are invisible — the sketch's documented error
    class).

    Same temporal contract as the drift family (psi/ks/js): pairs are
    consecutive DISTINCT period values in ascending order, rows emit
    only where the (group, percentile) exists on BOTH sides, NULL
    group/period/value and v < 1 drop.

    Scale (100 TB): the sketch fold is ONE map-side-combined
    groupBy(group, period, e, m) count — per-key state <= 63·sub
    cells regardless of value range; the readout window and rank
    joins are bucket-row-sized. The period calendar (distinct period
    values + lead) is calendar-sized and the pair join keys are
    (group × period × percentile)-sized — never corpus rows. Output:
    <group_col>, <period_col>, next_<period_col>, percentile, n_prev,
    n_next, q_prev, q_next, q_ratio (6dp).
    """
    if sub < 1 or (sub & (sub - 1)) != 0:
        raise ValueError(f"sub must be a power of two >= 1: {sub}")
    if not percentiles or not all(0.0 < p <= 1.0 for p in percentiles):
        raise ValueError(f"percentiles must be in (0, 1]: {percentiles}")
    v = F.col(value_col).cast("long")
    base = df.where(
        F.col(group_col).isNotNull()
        & F.col(period_col).isNotNull()
        & v.isNotNull()
        & (v >= 1)
    ).select(
        F.col(group_col).alias("__g"),
        F.col(period_col).alias("__p"),
        v.alias("__v"),
    )
    ro = _logbucket_readout(base, ["__g", "__p"], percentiles, sub, pin)
    # the readout frame feeds BOTH sides of the pair join; pin it so
    # the sketch fold runs once (the module's multi-consumer
    # localCheckpoint convention)
    if pin:
        ro = ro.localCheckpoint(eager=False)
    # consecutive-period calendar: distinct periods + lead — a
    # calendar-sized frame, the drift family's documented
    # global-window class
    wlead = Window.orderBy("__p")
    pairs = (
        ro.select("__p")
        .distinct()
        .withColumn("__np", F.lead("__p").over(wlead))
        .where(F.col("__np").isNotNull())
    )
    prev = ro.select(
        "__g",
        F.col("__p").alias("__pp"),
        "percentile",
        F.col("n").alias("n_prev"),
        F.col("q_est").alias("q_prev"),
    )
    nxt = ro.select(
        "__g",
        F.col("__p").alias("__pn"),
        "percentile",
        F.col("n").alias("n_next"),
        F.col("q_est").alias("q_next"),
    )
    next_col = f"next_{period_col}"
    return (
        prev.join(
            F.broadcast(pairs),
            prev["__pp"] == pairs["__p"],
        )
        .join(
            nxt,
            (F.col("__np") == nxt["__pn"])
            & (prev["__g"] == nxt["__g"])
            & (prev["percentile"] == nxt["percentile"]),
        )
        .select(
            prev["__g"].alias(group_col),
            F.col("__pp").alias(period_col),
            F.col("__np").alias(next_col),
            prev["percentile"].alias("percentile"),
            "n_prev",
            "n_next",
            "q_prev",
            "q_next",
            (
                F.round(F.col("q_next") / F.col("q_prev"), 6)
                + F.lit(0.0)
            ).alias("q_ratio"),
        )
    )
