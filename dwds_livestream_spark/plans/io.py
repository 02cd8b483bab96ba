"""Table loader for the driver testdata (TESTDATA.md).

The only wrinkle: ``events.ts`` is stored as parquet TIMESTAMP(NANOS),
a type Spark does not support natively. With
``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as
epoch-nanos LongType; we truncate to microseconds — exactly what DuckDB
does internally (µs timestamps), so oracle comparisons agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# table -> columns stored as TIMESTAMP(NANOS)
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        dtype = dict(df.dtypes).get(col)
        if dtype == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif dtype == "timestamp_ntz":
            # parquet timestamp[us] without timezone: interpret as UTC
            # instant (session timezone is pinned UTC), matching DuckDB's
            # naive-µs semantics so oracle value hashes agree.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, suffix: str = ""
) -> list[str]:
    """Register every testdata table as a temp view (``region``,
    ``nation``, … + optional suffix) so the whole engine is reachable
    from plain ``spark.sql`` — the same surface the DuckDB oracle gets.
    Returns the view names. Views are lazy: no data moves until a
    query runs, and each carries the nanos-timestamp normalization
    from :func:`load_table`.
    """
    from .registry import TABLES  # noqa: PLC0415 — avoid cycle at import

    names = []
    for t in TABLES:
        name = f"{t}{suffix}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names
