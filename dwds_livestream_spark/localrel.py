"""Small driver-side tables as JVM-local relations.

``spark.createDataFrame(list_of_tuples)`` ships the rows as a PICKLED
RDD: every later scan of that frame launches a Python worker per
partition just to deserialize them. The default 32 slices make this
actively hostile to the tiny-dimension pattern — ``coalesce(1)`` on
such a frame chains 32 sequential worker round-trips into one task
(measured: a 16-row centroid table took 4.7 s to write; 0.2 s via
Arrow). Routing the same rows through a pandas DataFrame takes the
Arrow conversion path instead: the data becomes a JVM LocalRelation,
scans never touch Python, and broadcast/coalesce behave like they
would for any built-in relation.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession


def local_df(
    spark: SparkSession, rows: Sequence[tuple] | list[Any], schema: str
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` minus the pickled-RDD
    scan tax: positional tuples -> pandas -> Arrow -> LocalRelation.

    Falls back to the plain path for empty input (pandas loses the
    column count) or if the Arrow conversion rejects the data.
    """
    if not rows:
        return spark.createDataFrame(rows, schema)
    try:
        import pandas as pd  # noqa: PLC0415

        pdf = pd.DataFrame(list(rows))
        return spark.createDataFrame(pdf, schema)
    except Exception as exc:
        # The fallback exists for data Arrow/pandas can't represent
        # (e.g. mixed None patterns in nested types), but it silently
        # reintroduces the multi-second pickled-RDD scan tax the
        # callers were specifically moved off of — and it would also
        # mask genuine schema/data bugs behind a working-but-slow path.
        # Surface it: warn with the cause, then fall back.
        import warnings  # noqa: PLC0415

        warnings.warn(
            "localrel.local_df: Arrow LocalRelation conversion failed; "
            "falling back to the pickled-RDD createDataFrame path "
            f"(slow at scan time). schema={schema!r} "
            f"cause={type(exc).__name__}: {exc}",
            RuntimeWarning,
            stacklevel=2,
        )
        return spark.createDataFrame(rows, schema)
