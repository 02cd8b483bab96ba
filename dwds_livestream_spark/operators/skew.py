"""Skew mitigation: salted equi-join for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the
explicit, planning-time tool for the pathological case AQE can't fix:
ONE key so hot that even a split partition is a straggler, joined
against a dimension too large to broadcast.

Mechanics: each fact row gets a uniform salt in [0, n); the dimension
side is replicated n times (one copy per salt value); the join key
becomes (key, salt), spreading a hot key over n tasks. Cost: dimension
side grows n-fold — pick n ~ (hot-key rows / healthy partition rows),
and salt only the keys that need it (`hot_keys` arg) to keep the
replication bill bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
    hot_keys: list | None = None,
) -> DataFrame:
    """Equi-join `fact ⋈ dim ON on` with the fact side salted.

    With ``hot_keys``, only those keys are salted (dimension rows for
    cold keys are not replicated); otherwise every key is salted.
    Output columns = plain join output (salt column dropped).
    """
    if salt < 1:
        raise ValueError(f"salt must be >= 1: {salt}")

    # deterministic-enough uniform salt; any spread works — correctness
    # does not depend on which salt a row gets
    fact_salt = F.floor(F.rand(seed=42) * salt).cast("int")
    all_salts = F.sequence(F.lit(0), F.lit(salt - 1))

    if hot_keys is not None:
        is_hot = F.col(on).isin(*hot_keys)
        f = fact.withColumn("__salt", F.when(is_hot, fact_salt).otherwise(0))
        d = dim.withColumn(
            "__salt",
            F.explode(
                F.when(dim[on].isin(*hot_keys), all_salts).otherwise(
                    F.array(F.lit(0))
                )
            ),
        )
    else:
        f = fact.withColumn("__salt", fact_salt)
        d = dim.withColumn("__salt", F.explode(all_salts))

    return f.join(d, on=[on, "__salt"], how=how).drop("__salt")


def detect_hot_keys(
    df: DataFrame,
    on: str,
    share_threshold: float = 0.05,
    sample_fraction: float = 0.01,
    min_sample_rows: int = 100_000,
    approx_rows: int | None = None,
) -> list:
    """Sample-based hot-key detection feeding :func:`salted_join`.

    Returns keys whose share of a uniform sample exceeds
    ``share_threshold`` (default: any key holding >=5% of rows — the
    kind AQE's partition splitting cannot fully spread). The sample is
    seeded, so a given input yields the same key list run over run.

    Scale: ONE sampled scan (ADVICE r1). The per-key counts are
    persisted (tiny: distinct sampled keys), the sample total is the
    sum of those counts — not a second scan — and the only full-table
    job is the row count used to honor ``min_sample_rows``, which
    callers skip entirely by passing ``approx_rows`` (a catalog
    estimate; err LOW — an under-estimate merely over-samples, while
    an over-estimate shrinks the realized sample below
    ``min_sample_rows`` and weakens detection on small tables).
    At 100 TB sample_fraction=0.01 still sees ~1B rows — more than
    enough to find >=5%-share keys; keys the sample misses are exactly
    the keys that did not need salting.
    """
    if not 0 < share_threshold <= 1:
        raise ValueError(f"share_threshold in (0, 1]: {share_threshold}")
    n = approx_rows if approx_rows is not None else df.count()
    frac = min(1.0, max(sample_fraction, min_sample_rows / max(n, 1)))
    sampled = df.select(on) if frac >= 1.0 else df.select(on).sample(
        fraction=frac, seed=42
    )
    counts = sampled.groupBy(on).count().persist()
    try:
        total = counts.agg(F.sum("count")).first()[0] or 0
        if total == 0:
            return []
        hot = counts.where(F.col("count") >= share_threshold * total)
        return [r[0] for r in hot.select(on).collect()]
    finally:
        counts.unpersist()
