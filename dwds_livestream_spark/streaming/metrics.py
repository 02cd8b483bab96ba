"""A3/A4/K7 — operational metrics.

Reference: Dropwizard meters for access-log lines / page requests /
broadcasts and a timer around each sink transaction, reported every
minute (metrics.clj:1-31).

Spark-native: a StreamingQueryListener reading each progress event's
``inputRowsPerSecond`` / ``processedRowsPerSecond`` (the meters) and
``durationMs`` (the timer). Rates are engine-measured — no per-row
bookkeeping on the hot path.
"""

from __future__ import annotations

import json
import logging

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger("dwds_livestream_spark.metrics")


class ThroughputListener(StreamingQueryListener):
    """Collects per-query progress: rates, batch durations, row counts.

    ``snapshots`` keeps the latest progress per query id;
    ``totals`` accumulates processed rows (≙ meter counts).
    """

    def __init__(self) -> None:
        self.snapshots: dict[str, dict] = {}
        self.totals: dict[str, int] = {}

    # -- listener callbacks -------------------------------------------
    def onQueryStarted(self, event) -> None:
        log.info("query started: %s", event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        payload = json.loads(p.json) if hasattr(p, "json") else {}
        qid = str(p.id)
        self.snapshots[qid] = {
            "name": payload.get("name"),
            "input_rows_per_sec": payload.get("inputRowsPerSecond"),
            "processed_rows_per_sec": payload.get("processedRowsPerSecond"),
            "num_input_rows": payload.get("numInputRows", 0),
            "batch_duration_ms": (payload.get("durationMs") or {}).get(
                "triggerExecution"
            ),
            "observed": payload.get("observedMetrics") or {},
        }
        self.totals[qid] = self.totals.get(qid, 0) + (
            payload.get("numInputRows") or 0
        )
        observed = payload.get("observedMetrics") or {}
        parse = observed.get("parse") or {}
        if parse.get("n_malformed"):
            self.totals["malformed"] = self.totals.get("malformed", 0) + int(
                parse["n_malformed"]
            )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        log.info("query terminated: %s", event.id)
