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


def _cm_pos(item, d: int, width: int):
    """Row-d Bloom/CM position: top-32-bits of md5(item + '#d') mod
    width. md5+conv (not xxhash64) so an external engine (the DuckDB
    oracle) can reproduce the exact cell layout."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(item, F.lit(f"#{d}"))), 1, 8), 16, 10
        ).cast("long"),
        F.lit(width),
    )


def countmin_sketch(
    df: DataFrame,
    col: str,
    width: int = 512,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a depth×width
    cell-count DataFrame — the distributed-native representation: cells
    are additive, so the ONE shuffle (groupBy d,pos with automatic
    map-side partial combine) merges every partition's sub-sketch;
    sketch size is depth·width rows regardless of input cardinality.

    ``weight_col`` feeds pre-aggregated counts (or arbitrary positive
    weights): cells become Σweight instead of row counts. Hashing then
    runs once per DISTINCT item instead of once per occurrence —
    ``df.groupBy(col).count()`` first, then sketch the counts; the
    resulting cells are bit-identical to sketching raw occurrences
    because cell addition commutes with the pre-aggregation.

    All hashing is JVM-side codegen (md5+conv) — no Python in the path.
    Output: d, pos, cnt.
    """
    item = F.col(col).cast("string")
    extra = [F.col(weight_col).alias("__w")] if weight_col else []
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cm_pos(item, d, width).alias("pos")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s"),
        *extra,
    ).select("s.d", "s.pos", *(["__w"] if weight_col else []))
    agg = F.sum("__w") if weight_col else F.count("*")
    return cells.groupBy("d", "pos").agg(agg.alias("cnt"))


def countmin_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    width: int = 512,
    depth: int = 4,
) -> DataFrame:
    """Point-query the sketch for each row of ``items``: est = min over
    the depth rows of that item's cell counts. Never undercounts;
    overcounts by ≤ e·N/width with prob ≥ 1 - e^-depth.

    The sketch is depth·width rows → broadcast; the probe never
    shuffles its payload, only the final per-item min groups (by the
    item itself, uniform)."""
    item = F.col(col).cast("string")
    probe = items.select(
        item.alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cm_pos(item, d, width).alias("pos")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s"),
    ).select("item", "s.d", "s.pos")
    joined = probe.join(F.broadcast(sketch), ["d", "pos"], "left")
    return joined.groupBy("item").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est")
    )
