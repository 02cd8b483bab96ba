"""Frequency sketches: exact heavy hitters and a mergeable distributed
Misra-Gries summary.

Beyond-reference operators (project brief: large-scale pipeline ops).
The reference's only frequency machinery is its Dropwizard throughput
meters (reference metrics.clj:16-26) — rates, not per-key frequencies.
A 100 TB corpus needs per-key frequency answers ("which lemmata /
tokens / domains dominate?") without a full-cardinality shuffle.

Two tiers:
- ``heavy_hitters``: EXACT support-threshold frequent items. Two-phase
  aggregation (map-side partial combine is automatic for groupBy-count)
  and the total count comes from the same single pass via a window —
  one shuffle on the key, one scalar exchange for the total.
- ``misra_gries_topk``: the scale path when even the keyed shuffle is
  too wide (e.g. all n-grams of a 100 TB corpus). Per-partition
  Misra-Gries summaries of size k — O(k) memory per task regardless of
  partition cardinality — then one tiny shuffle over ≤ k·partitions
  summary rows. Guarantee (Misra-Gries merge property): the summed
  lower bounds undercount any item by at most (n_total - n_retained)/
  (k+1) ≤ n/(k+1), so every item with true frequency > n/(k+1) SURVIVES
  in the merged summary; asserted as a superset-of-exact test in
  tests/test_sketches.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def heavy_hitters(
    df: DataFrame, col: str, min_share: float = 0.01
) -> DataFrame:
    """Exact frequent items: values of ``col`` whose frequency is
    ≥ ``min_share`` of all rows. One keyed shuffle; the global total is
    a 1-row aggregate of the counts broadcast back — NOT an
    unpartitioned window, which would funnel every distinct item
    through one task at high cardinality."""
    counts = df.groupBy(F.col(col).alias("item")).agg(
        F.count("*").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("cnt") / F.col("__total"), 6))
        .where(F.col("share") >= min_share)
        .select("item", "cnt", "share")
    )


_MG_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType(), True),
        T.StructField("weight", T.LongType(), False),
    ]
)


def _mg_partial(k: int):
    """Per-partition Misra-Gries: ≤ k counters, arbitrary input size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf["item"]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"item": list(counters), "weight": list(counters.values())}
        )

    return run


def misra_gries_topk(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Approximate top-k by merged Misra-Gries summaries.

    Output: item, weight_lb (summed lower bound — undercounts the true
    frequency by at most n/(k+1)), ranked descending. Deterministic
    given a deterministic partitioning of the input.
    """
    partials = df.select(F.col(col).cast("string").alias("item")).mapInPandas(
        _mg_partial(k), _MG_SCHEMA
    )
    merged = partials.groupBy("item").agg(F.sum("weight").alias("weight_lb"))
    return merged.orderBy(F.desc("weight_lb"), "item").limit(k)
