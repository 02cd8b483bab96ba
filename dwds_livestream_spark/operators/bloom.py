"""Bloom-prefiltered semi-join: prune the probe side with a Bloom-style
membership filter built from the build side BEFORE the exact join.

Beyond-reference operator (project brief: 100 TB pipeline ops). The
reference joins a stream against a small dimension (wb.clj:21-27,
broadcast-sized); at 100 TB the common shape is the opposite — a huge
fact/probe side joined to a mid-sized build side that is too big to
broadcast as a hash table but whose FINGERPRINT (distinct hash
positions) is tiny. Spark's AQE injects such runtime filters for some
shapes (InjectRuntimeFilter); this operator makes the pattern explicit
and composable.

Scale design:
- The filter is represented DECLARATIVELY as the distinct set of
  ``min(k·|build|, m_bits)`` hash positions — a DataFrame, built with
  one map-side-combined aggregate over xxhash64 (JVM codegen, no UDF).
- The probe side is pruned by k consecutive **broadcast left-semi
  joins** (one per hash function): no shuffle of the probe at all; a
  row survives only if all k positions hit, i.e. exactly Bloom
  semantics with false-positive rate ≈ (1 - e^{-k·n/m})^k.
- Only the surviving ~|match| + FP·|probe| rows reach the exact
  semi-join's shuffle — the result is EXACTLY the plain semi-join
  (the Bloom stage can only over-admit, never drop a true match), so
  the operator is oracle-checkable against `WHERE key IN (...)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _position(col, seed: int, m_bits: int):
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m_bits))


def bloom_positions(
    build: DataFrame, key: str, m_bits: int = 1 << 18, k_hashes: int = 3
) -> DataFrame:
    """Distinct Bloom positions of the build side's keys: one exploded
    projection + distinct (map-side combine collapses duplicates per
    partition before the one bounded shuffle of ≤ m_bits longs)."""
    pos = F.array(
        *[_position(F.col(key), i, m_bits) for i in range(k_hashes)]
    )
    return build.select(F.explode(pos).alias("__pos")).distinct()


def bloom_prefilter_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    build_key: str | None = None,
    m_bits: int = 1 << 18,
    k_hashes: int = 3,
) -> DataFrame:
    """Semi-join of ``probe`` against ``build`` on ``key``, Bloom-pruned
    first. Output is exactly ``probe WHERE key IN (SELECT build_key
    FROM build)`` — the Bloom stage only removes definite non-matches
    before the exact join's shuffle.
    """
    bk = build_key or key
    positions = bloom_positions(build, bk, m_bits, k_hashes)
    hits = probe
    for i in range(k_hashes):
        hits = hits.join(
            F.broadcast(positions),
            on=_position(F.col(key), i, m_bits) == F.col("__pos"),
            how="left_semi",
        )
    return hits.join(
        build.select(F.col(bk).alias(key)).distinct(), on=key, how="left_semi"
    )
