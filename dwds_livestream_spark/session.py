"""SparkSession factory.

Reference behavior being mirrored: the Clojure engine pins all timestamp
handling to UTC instants (access_log.clj:49-54 parses the Apache
``dd/MMM/yyyy:HH:mm:ss Z`` offset and renders ISO-8601 instants), so the
session timezone is pinned to UTC. Everything else is Spark-native
tuning for the target deployment: a large cluster scanning ~100 TB, with
AQE doing runtime re-planning (skew joins, partition coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "dwds-livestream-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the engine SparkSession.

    Defaults are sized for the local test harness (``local[N]``); on a
    real cluster the same factory is used with ``master=None`` (resource
    manager decides) and ``shuffle_partitions`` sized to ~2-3x total
    cores, or left to AQE coalescing from a high initial value.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    # local[N] keeps everything in the driver JVM, whose default 1g heap
    # starves 32 concurrent tasks (window sorts OOM ~20M rows). Size it
    # like the executor it actually is; harness override via env.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        # Determinism: the reference serializes UTC instants everywhere.
        .config("spark.sql.session.timeZone", "UTC")
        # Runtime re-planning: coalesce post-shuffle partitions, split
        # skewed partitions (the 100 TB story: skewed lemma/user keys).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for the (rare) pandas_udf paths — vectorized transfer.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Timestamp parsing of English month abbreviations (dd/MMM/yyyy)
        # must not depend on JVM default locale (SURVEY.md §7 risk list).
        .config(
            "spark.driver.extraJavaOptions",
            "-Duser.language=en -Duser.country=US -Duser.timezone=UTC",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-Duser.language=en -Duser.country=US -Duser.timezone=UTC",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
        # InferFiltersFromGenerate turns explode(f(x)) into a pushed
        # Filter(size(f(x)) > 0) with f(x) fully inlined — the whole
        # array pipeline (tokenize -> shingle -> distinct) then runs
        # TWICE per row, the second copy in an interpreted Filter node
        # (measured 14x on the decontamination scan: 0.4s -> 6.9s at
        # sf0.1). Skipping empty-array rows before Generate is worth
        # far less than one extra full evaluation of the generator arg.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Driver testdata stores events.ts as TIMESTAMP(NANOS), which
        # Spark has no native type for; read as epoch-nanos long and
        # convert in the loader (plans/io.py) — same ns->µs truncation
        # DuckDB applies internally.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if master.startswith("local"):
        # Single-JVM local mode has no data locality to wait for, but
        # the scheduler still honors spark.locality.wait when a task's
        # preferred locations can't be matched — measured as a flat
        # ~3 s stall on every coalesce(1) write of a parallelized
        # local relation (16-row centroid table: 4.2 s -> 0.5 s).
        # Cluster deployments keep the Spark default (or tune via
        # extra_conf); this only fires for local[N] masters.
        builder = builder.config("spark.locality.wait", "0s")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def drop_leftover_state(spark: SparkSession) -> int:
    """Free per-query engine state between measured runs: the catalog
    cache AND leftover persisted RDD blocks. ``clearCache()`` alone
    misses ``localCheckpoint`` blocks (they are RDD-level, not catalog
    entries), so long measurement sessions accumulate them — measured
    (r6): dedup_clusters_ann, which checkpoints its edge/label frames,
    swings 5.5-70 s across identical sf1 runs as blocks pile up, and
    is a stable 4-5 s once they are dropped per run. Returns the
    number of RDDs unpersisted.
    """
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for jrdd in jmap.values():
        jrdd.unpersist()
        n += 1
    return n
