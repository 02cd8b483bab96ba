"""Runtime shuffle-volume measurement from the SQL metrics store.

Complements the plan-shape gates (tests/test_plan_sweep.py): a plan can
BE a BroadcastHashJoin and still move more than intended elsewhere —
these helpers read what every Exchange actually wrote after execution,
so scale claims ("the fact scan never shuffles", "partial agg folds the
scan to group rows") are assertable numbers, not prose. Used by
scripts/shuffle_audit.py (the SHUFFLE.md report) and
tests/test_shuffle_volume.py (the regression gates).

Reads the JVM SQLAppStatusStore via py4j — works with the UI disabled
and in local mode; the same store backs the Spark UI's SQL tab on a
real cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_SIZES = {"B": 1, "KiB": 1 << 10, "MiB": 1 << 20, "GiB": 1 << 30, "TiB": 1 << 40}


def _value_line(metric_value: str) -> str:
    """The store may prefix a header line ('total (min, med, max ...)');
    the value itself is the last non-empty line. Empty input -> ''."""
    lines = metric_value.strip().splitlines()
    return lines[-1].split("(")[0].strip() if lines else ""


def parse_metric_bytes(metric_value: str) -> int:
    """SQL size metrics render as 'total (min, med, max (...))' with
    humanized units; take the leading total."""
    m = re.match(r"([\d.]+)\s*(B|KiB|MiB|GiB|TiB)", _value_line(metric_value))
    if not m:
        return 0
    return int(float(m.group(1)) * _SIZES[m.group(2)])


def parse_metric_count(metric_value: str) -> int:
    m = re.match(r"([\d,.]+)", _value_line(metric_value))
    return int(m.group(1).replace(",", "").split(".")[0]) if m else 0


def last_execution_id(spark: SparkSession) -> int:
    """Highest execution id currently in the store (-1 when empty).
    IDs, not list indices: the store trims old entries past
    spark.sql.ui.retainedExecutions, so index arithmetic against
    executionsCount() silently reads an empty window in long sessions
    (the full test suite crosses the limit)."""
    st = spark._jsparkSession.sharedState().statusStore()
    exes = st.executionsList()
    mx = -1
    for e in range(exes.size()):
        mx = max(mx, exes.apply(e).executionId())
    return mx


def metrics_since(spark: SparkSession, after_ex_id: int) -> list[tuple]:
    """(node_name, metric_name, value) across EVERY SQL execution with
    id greater than ``after_ex_id`` — iterative queries (k-means seeds,
    rank bounds, pagerank loops) run actions while the plan is being
    BUILT, so a single-execution read would miss their shuffles."""
    st = spark._jsparkSession.sharedState().statusStore()
    exes = st.executionsList()
    out: list[tuple] = []
    for e in range(exes.size()):
        ex_id = exes.apply(e).executionId()
        if ex_id <= after_ex_id:
            continue
        mv = st.executionMetrics(ex_id)
        g = st.planGraph(ex_id)
        nodes = g.allNodes()
        for i in range(nodes.size()):
            node = nodes.apply(i)
            ms = node.metrics()
            for j in range(ms.size()):
                m = ms.apply(j)
                val = mv.get(m.accumulatorId())
                if val.isDefined():
                    out.append((node.name(), m.name(), val.get()))
    return out


def summarize(metrics: list[tuple]) -> dict:
    return {
        "scan_rows": sum(
            parse_metric_count(v)
            for n, m, v in metrics
            if n.startswith("Scan") and m == "number of output rows"
        ),
        "shuffle_records": sum(
            parse_metric_count(v)
            for n, m, v in metrics
            if m == "shuffle records written"
        ),
        "shuffle_bytes": sum(
            parse_metric_bytes(v)
            for n, m, v in metrics
            if m == "shuffle bytes written"
        ),
        "broadcast_bytes": sum(
            parse_metric_bytes(v)
            for n, m, v in metrics
            if n == "BroadcastExchange" and m == "data size"
        ),
        # any aggregate/sort/join that outgrew its memory reports here;
        # a well-sized plan spills nothing at its working scale
        "spill_bytes": sum(
            parse_metric_bytes(v) for n, m, v in metrics if m == "spill size"
        ),
    }


def measure_execution(spark: SparkSession, build_df) -> dict:
    """Build a DataFrame via ``build_df()``, execute it through a noop
    sink (full plan, no driver-side result transfer), and return the
    summed shuffle/scan/broadcast volumes of every execution involved."""
    before = last_execution_id(spark)
    df: DataFrame = build_df()
    df.write.format("noop").mode("overwrite").save()
    # metric updates post through the async listener bus; drain it so
    # the read is deterministic (same call Spark's own tests use)
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10000)
    except Exception:
        pass  # private API moved — metrics are best-effort then
    return summarize(metrics_since(spark, before))
