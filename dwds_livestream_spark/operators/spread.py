"""Partition-floor helper for CPU-dense per-row kernels.

Spark parallelism is bounded by input partitions, and a parquet file is
splittable only at row-group boundaries — a small single-row-group file
(or a heavily filtered scan) arrives as ONE partition, serializing any
downstream compute no matter how many cores exist (measured 10x on the
thresholded-levenshtein band join, 32 cores).

``spread`` round-robin repartitions ONLY when the plan's current
partition count is below the session default parallelism; on a real
multi-terabyte table the source already yields thousands of splits and
this is a no-op — no shuffle is added at scale.

Apply it ONLY where per-row/per-pair compute strongly dominates the
added exchange — today that is the thresholded-levenshtein band join
(O(d·len) dynamic program per pair; measured 10x on 32 cores).
Measured and REJECTED everywhere else in this codebase: on shingling /
signature / regex projections the extra exchange plus 32x task+Arrow
overhead cost more than the parallelism bought (word_topk 0.5s -> 6s),
it fragments deliberately-coarse chunking (cosine_topk's broadcast
query side must stay ONE chunk), and inside iterative plans every
round re-pays the exchange (dedup_clusters 5s -> 36s).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(
    df: DataFrame, min_fraction: float = 1.0, force: bool = False
) -> DataFrame:
    """Ensure at least ``min_fraction * defaultParallelism`` partitions.

    ``force=False`` probes ``rdd.getNumPartitions`` and skips the
    repartition when the plan already has enough splits. That probe is
    free ONLY on scan-side plans (projection/explode over a source):
    under AQE, ``df.rdd`` MATERIALIZES every shuffle stage in the plan
    to finalize partitioning — on a post-shuffle frame the whole
    upstream computation runs at plan-build time and again at query
    time (measured: the minhash-levenshtein candidate join billed 8.3s
    of bench "setup" this way). Pass ``force=True`` for post-shuffle
    frames: one unconditional exchange of (usually tiny) rows, which
    also deliberately overrides AQE's small-output coalescing right
    before a CPU-dense per-row stage — the exact case spread exists
    for.
    """
    target = int(
        df.sparkSession.sparkContext.defaultParallelism * min_fraction
    )
    if target <= 1:
        return df
    if not force and df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
