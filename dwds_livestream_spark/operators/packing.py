"""Sequence packing: group documents into fixed token-budget training
sequences ("packs"), the standard pre-training step that concatenates
short documents so every training sequence is ~budget tokens.

Beyond-reference operator (project brief: operations a large-scale
training-data pipeline needs). The reference has no analog; closest
shape is the collector's count-based micro-batching
(reference collector.clj:97-98) — grouping a stream into fixed-size
units — generalized here from "128 rows" to "N tokens".

Semantics (greedy contiguous fill, deterministic):
- documents are ordered by ``doc_id`` within each shard;
- a running token total assigns each doc the pack whose range its
  *starting* offset falls in: ``pack_no = floor(cumsum_exclusive /
  budget)`` — a doc may straddle a boundary (packs can overflow by up
  to one doc), which is the usual "greedy fill then truncate/roll"
  policy and keeps the operator a pure window expression.

Scale design (100 TB):
- ONE shuffle: ``repartition`` by (source, shard) implied by the window
  partition key. Packing needs contiguity only WITHIN a pack, so the
  corpus is sharded (``n_shards`` content-derived buckets per source)
  and packed independently per shard — the window state never exceeds
  one shard, no global sort, no driver involvement.
- The token count is a pure column expression (split on whitespace) —
  stays in whole-stage codegen; swap in a real tokenizer via a
  pandas_udf without changing the packing plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_pack(
    documents: DataFrame,
    budget: int = 2048,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Assign every document a (shard, pack_no, pack_pos) such that each
    pack's documents are contiguous in (shard, doc_id) order and hold
    ~``budget`` tokens. Output grain: one row per document."""
    n_tokens = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0)
    )
    shard = (F.col(id_col) % n_shards).cast("int")
    df = documents.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        shard.alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    w = Window.partitionBy("source", "shard").orderBy("doc_id")
    cum_excl = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    df = df.withColumn("pack_no", F.floor(cum_excl / budget).cast("int"))
    wp = Window.partitionBy("source", "shard", "pack_no").orderBy("doc_id")
    return df.select(
        "doc_id",
        "source",
        "shard",
        "n_tokens",
        "pack_no",
        (F.row_number().over(wp) - 1).alias("pack_pos"),
    )


def pack_stats(packed: DataFrame, budget: int = 2048) -> DataFrame:
    """Per-pack fill statistics — the packing-efficiency report
    (docs/pack, tokens/pack, fill ratio vs budget)."""
    return (
        packed.groupBy("source", "shard", "pack_no")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
        .select(
            "source",
            "shard",
            "pack_no",
            "n_docs",
            "pack_tokens",
            F.round(F.col("pack_tokens") / budget, 6).alias("fill_ratio"),
        )
    )
