"""Dead-letter routing for streaming ingest: one checkpointed query,
two destinations — rows that pass the gate go to the main table, rows
that fail go to a quarantine table WITH the names of the rules they
broke.

Beyond-reference sink (project brief: pipeline ops). The reference
drops malformed lines on the floor (access_log.clj:55-60 silently
skips non-matching lines); a 100 TB ingest cannot — quarantined rows
are the debugging artifact AND the replay source once the rule (or the
upstream) is fixed.

Design:
- The gate is a list of (name, violation Column) pairs — the same
  predicate vocabulary as operators/expectations.py, evaluated ROW-wise
  here (expectations aggregates them corpus-wise): one projection
  computes every rule, `violated` collects the failing names per row.
- ONE foreachBatch writes both destinations from one cached batch —
  a single source offset range covers both writes, so main and
  quarantine can never disagree about which batch a row came from.
- Both writes go through the batch-id ledger (sinks/fact_sink.py
  ``idempotent``), closing foreachBatch's replay gap for BOTH paths:
  the marker is written only after the second write, so a crash
  between the two replays the whole batch, and a replayed batch is
  skipped whole.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .fact_sink import idempotent


def with_violations(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Adds ``violated``: sorted array of the rule names each row
    breaks (empty array = clean). Pure projection, map-only.

    NULL-valued predicates count as VIOLATED (fail-closed): a rule
    like ``length(lemma) > 128`` evaluates to NULL on a NULL lemma,
    and three-valued logic would otherwise wave exactly the rows a
    dead-letter gate exists to catch straight into the good table."""
    marks = [
        F.when(F.coalesce(pred, F.lit(True)), F.lit(name))
        for name, pred in rules
    ]
    return df.withColumn(
        "violated",
        F.array_sort(
            F.filter(F.array(*marks), lambda x: x.isNotNull())
        ),
    )


def quarantine_writer(
    good_path: str,
    bad_path: str,
    rules: list[tuple[str, Column]],
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: route the batch by the rule gate. Clean rows
    land in ``good_path`` without the bookkeeping column; violating
    rows land in ``bad_path`` with ``violated`` and the batch id."""

    def write(batch: DataFrame, batch_id: int) -> None:
        already = "violated" in batch.columns  # pre-marked by the sink
        marked = (batch if already else with_violations(batch, rules)).persist()
        try:
            clean = F.size("violated") == 0
            (
                marked.where(clean)
                .drop("violated")
                .write.mode("append")
                .parquet(good_path)
            )
            (
                marked.where(~clean)
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(bad_path)
            )
        finally:
            marked.unpersist()

    return write


def start_quarantine_sink(
    stream: DataFrame,
    rules: list[tuple[str, Column]],
    good_path: str,
    bad_path: str,
    checkpoint: str,
    ledger: str | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    writer = quarantine_writer(good_path, bad_path, rules)
    if ledger is not None:
        writer = idempotent(writer, ledger)
    # rule marking happens ON THE STREAM so df.observe can report the
    # gate per micro-batch (rows_bad shows up in each progress event's
    # observedMetrics — captured by metrics.ThroughputListener)
    marked = with_violations(stream, rules).observe(
        "gate",
        F.count(F.lit(1)).alias("rows_total"),
        F.count_if(F.size("violated") > 0).alias("rows_bad"),
    )
    q = (
        marked.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint)
    )
    return q.trigger(**(trigger or {"availableNow": True})).start()
