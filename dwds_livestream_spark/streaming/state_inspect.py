"""Offline streaming-state introspection (Spark 4 State Data Source):
read a checkpoint's state store as a DataFrame — the ops tool for
"what is this query remembering?" without touching the running query.

Beyond-reference capability. The reference's only state is its
in-process dimension atom (wbdb.clj) — inspectable from a REPL; Spark
state lives in checkpoint files, and this module is the equivalent
REPL affordance: debug watermark-stuck sessions, audit dedup state
size, verify a rate limiter's buckets, all from a batch session.

All reads are OFFLINE and read-only — safe against a live query's
checkpoint (the state source reads committed snapshots, never the
in-flight delta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state(
    spark: SparkSession,
    checkpoint: str,
    batch_id: int | None = None,
    operator_id: int = 0,
    store_name: str | None = None,
) -> DataFrame:
    """State rows (key struct, value struct, partition_id) of a
    checkpointed stateful operator; latest committed batch unless
    ``batch_id`` pins one."""
    r = spark.read.format("statestore")
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if operator_id:
        r = r.option("operatorId", operator_id)
    if store_name:
        r = r.option("storeName", store_name)
    return r.load(checkpoint)


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator metadata of the checkpoint: operator ids/names, state
    store names, batch id range — the map you need before read_state
    on a multi-operator query."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_summary(spark: SparkSession, checkpoint: str, **kw) -> DataFrame:
    """Per-partition key counts — the skew/size audit: a hot state
    partition here is a hot key upstream."""
    return (
        read_state(spark, checkpoint, **kw)
        .groupBy("partition_id")
        .agg(F.count("*").alias("n_keys"))
        .orderBy("partition_id")
    )
