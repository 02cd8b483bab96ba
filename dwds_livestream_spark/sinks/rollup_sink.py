"""Exactly-once incremental maintenance of the quantile-histogram
rollup table (operators/quantile_hist.py) from a stream.

The streaming twin (streaming/sketches.py::histogram_stream) keeps the
rollup as ENGINE state (complete/update output modes); this sink keeps
it as a TABLE — the shape a serving layer reads and the engine never
has to hold: each micro-batch appends its own day-bin increments, and
the reader sums increments per (day, bin).

Exactly-once WITHOUT a ledger: increments are written with dynamic
partition overwrite into ``day=D/__batch=N`` leaf partitions, so a
replayed micro-batch (restart between write and checkpoint commit)
OVERWRITES its own previous output instead of double-counting — the
same idempotence-by-addressing trick as the JDBC fact sink's batch
ledger (sinks/fact_sink.py), but expressed in the storage layout.
``day`` leads the layout so date-range readers still prune partitions.

At 100 TB: each batch writes |days-in-batch| x n_bins tiny rows; the
increment count grows with trigger count, so ``compact_rollup``
periodically folds a CLOSED day's increments into a single
``__batch=-1`` file (idempotent: re-compaction rewrites the same
partition). Readers are correct before, during, and after compaction
because they always sum increments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COMPACTED_BATCH = -1


def histogram_rollup_writer(
    path: str,
    value_col: str = "value",
    ts_col: str = "ts",
    lo: float = 0.0,
    hi: float = 512.0,
    n_bins: int = 64,
):
    """foreachBatch function maintaining the increment table at
    ``path``. Use:

        stream.writeStream.foreachBatch(
            histogram_rollup_writer(path)).start()
    """
    from ..operators.quantile_hist import histogram_rollup

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        inc = histogram_rollup(
            batch, value_col, ts_col, lo, hi, n_bins
        ).withColumn("__batch", F.lit(int(batch_id)))
        (
            inc.repartition(1)  # increments are days x n_bins rows
            # per-write option (SPARK-25313), NOT the session conf: a
            # session-global toggle races concurrent writers, and an
            # overwrite that lands under 'static' truncates the table
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("day", "__batch")
            .parquet(path)
        )

    return write_batch


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """The current rollup: (day, bin, cnt) summed over increments —
    feed this to range_quantiles. Day-range filters prune the
    partition layout before any file is opened."""
    return (
        spark.read.parquet(path)
        .groupBy("day", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def compact_rollup(
    spark: SparkSession,
    path: str,
    upto_day: str,
    max_batch: int | None = None,
) -> None:
    """Fold every CLOSED day's increments (day <= upto_day) into one
    ``__batch=-1`` partition per day. Readers stay correct before and
    after because they always sum increments; days still receiving
    batches must stay un-compacted (a concurrent writer's increment
    would be folded twice).

    ``max_batch`` guards against WRITER RESTARTS racing compaction: a
    micro-batch written but not yet checkpoint-committed at crash time
    is REPLAYED after restart — if compaction folded its leaf in the
    meantime, the replayed overwrite would land in a fresh leaf and
    double-count. Pass the stream's last COMMITTED batch id (from the
    checkpoint's commit log); only leaves with ``__batch <= max_batch``
    (plus earlier folds) are folded and deleted, so an uncommitted
    leaf survives as an increment for its replay to overwrite. The
    boundary is staged alongside the fold (``_FOLDED_MAX_BATCH``) so a
    crash-recovered swap deletes exactly what was folded. Default
    ``None`` folds everything — only safe when the stream is stopped.

    Crash safety on plain parquet (no table format's atomic commit):
    the folded result is STAGED to ``<path>.compacting`` on storage
    first, old leaves are deleted only after the stage is fully
    written, then staged directories move into place. A crash mid-swap
    loses nothing — the staged day dirs still hold the folded data;
    re-running compact_rollup finishes the move (it treats a leftover
    stage as recovery input before folding anything new).

    Two documented limits of the plain-parquet protocol:
    - the per-day delete-then-move window is NOT atomic for concurrent
      readers: a query listing day D mid-swap sees zero files for that
      day (undercount). DATA is never lost, but run compaction in a
      maintenance window, or serve from a snapshot, if readers race it
      — a table format (Iceberg/Delta) is the answer where that
      matters.
    - the swap uses local-FS calls (same stance as
      sinks/compaction.py): on HDFS/S3 the identical rename/delete
      protocol goes through the Hadoop FileSystem API."""
    import os
    import shutil

    stage = path.rstrip("/") + ".compacting"
    # fold-boundary sidecar: written BEFORE the stage parquet (Spark's
    # overwrite would wipe a file inside the stage dir, and writing it
    # after _SUCCESS would leave a crash window where recovery can't
    # know the boundary). If _SUCCESS exists, the sidecar predates it.
    sidecar = stage + ".maxbatch"

    def _swap_in(folded_max: int | None) -> None:
        def superseded(bdir: str) -> bool:
            bid = int(bdir.split("=", 1)[1])
            if folded_max is None:
                return True  # boundless fold consumed every leaf
            return bid == COMPACTED_BATCH or bid <= folded_max

        for day_dir in sorted(os.listdir(stage)):
            if not day_dir.startswith("day="):
                continue
            src = os.path.join(stage, day_dir, f"__batch={COMPACTED_BATCH}")
            if not os.path.isdir(src):
                continue
            dst_day = os.path.join(path, day_dir)
            os.makedirs(dst_day, exist_ok=True)
            # delete ONLY the leaves the fold consumed, then move the
            # folded leaf in — per-day, so a crash affects at most one
            # day, whose folded data still sits in the stage
            for bdir in os.listdir(dst_day):
                if bdir.startswith("__batch=") and superseded(bdir):
                    shutil.rmtree(os.path.join(dst_day, bdir))
            shutil.move(src, os.path.join(dst_day, f"__batch={COMPACTED_BATCH}"))
        shutil.rmtree(stage)
        if os.path.exists(sidecar):
            os.remove(sidecar)

    if os.path.isdir(stage):
        if os.path.exists(os.path.join(stage, "_SUCCESS")):
            # recovery: finish an interrupted swap with ITS boundary
            staged_max: int | None = None
            if os.path.exists(sidecar):
                with open(sidecar) as fh:
                    staged_max = int(fh.read().strip())
            _swap_in(staged_max)
            return
        shutil.rmtree(stage)  # stage write itself crashed — redo
    if os.path.exists(sidecar):
        os.remove(sidecar)  # stale sidecar from a pre-stage crash

    if max_batch is not None:
        with open(sidecar, "w") as fh:
            fh.write(str(int(max_batch)))
    cur = spark.read.parquet(path).where(F.col("day") <= F.lit(upto_day))
    if max_batch is not None:
        cur = cur.where(
            (F.col("__batch") <= F.lit(int(max_batch)))
            | (F.col("__batch") == F.lit(COMPACTED_BATCH))
        )
    (
        cur.groupBy("day", "bin")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("__batch", F.lit(COMPACTED_BATCH))
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("day", "__batch")
        .parquet(stage)
    )
    _swap_in(max_batch)
