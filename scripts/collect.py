"""Collector entry point — the reference's ``collector/start!`` CLI
(reference: src/dwds/livestream/collector.clj:133-140, SURVEY.md §3.2):
ingest JSONL event lines from a log-shipping directory, apply the
collector transforms (from_json -> lemma#hidx encode -> type casts ->
length guard), and persist to a date-partitioned parquet fact table
with exactly-once micro-batches (checkpointed; Structured Streaming
upgrades the reference's at-least-once JDBC path).

Composition of tested parts: streaming.pipeline.collector_stream +
sinks.fact_sink.{parquet_writer, jdbc_writer, idempotent,
start_fact_sink}.

Usage:
  python scripts/collect.py JSONL_DIR OUT_PATH \
      [--jdbc-url URL --jdbc-table T] [--once] [--trigger "1 second"] \
      [--http-url http://host/api/jsonl]

With --http-url the reference's live long-poll transport is bridged in:
an HttpLinePoller sidecar (sources/http_poll.py; reconnect with 3->60 s
backoff, collector.clj:39-74 parity) spools received lines into
JSONL_DIR, and the stream consumes them as usual.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwds_livestream_spark.session import build_session  # noqa: E402
from dwds_livestream_spark.sinks.fact_sink import (  # noqa: E402
    jdbc_writer,
    parquet_writer,
    start_fact_sink,
)
from dwds_livestream_spark.streaming.pipeline import collector_stream  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl_dir", help="directory of JSONL event files to watch")
    ap.add_argument("out", help="parquet fact-table path")
    ap.add_argument("--jdbc-url", default=None, help="optional JDBC sink URL")
    ap.add_argument("--jdbc-table", default="wb_page_request")
    ap.add_argument("--batchsize", type=int, default=128,
                    help="JDBC rows/tx (reference: 128)")
    ap.add_argument("--once", action="store_true",
                    help="drain available input and exit (availableNow)")
    ap.add_argument("--trigger", default="1 second")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--http-url", default=None,
                    help="long-poll JSONL endpoint to spool into jsonl_dir")
    args = ap.parse_args()

    spark = build_session(app_name="dwds-livestream-collect")
    spark.sparkContext.setLogLevel("WARN")

    poller = None
    if args.http_url:
        from dwds_livestream_spark.sources.http_poll import HttpLinePoller
        poller = HttpLinePoller(args.http_url, args.jsonl_dir).start()

    enriched = collector_stream(spark, args.jsonl_dir)
    if args.jdbc_url:
        writer = jdbc_writer(
            args.jdbc_url,
            args.jdbc_table,
            properties={"batchsize": str(args.batchsize)},
        )
    else:
        writer = parquet_writer(args.out)
    checkpoint = args.checkpoint or tempfile.mkdtemp(prefix="dwds-collect-ckpt-")
    trigger = {"availableNow": True} if args.once else {
        "processingTime": args.trigger
    }
    query = start_fact_sink(enriched, writer, checkpoint, trigger=trigger)
    print(f"collecting {args.jsonl_dir} -> "
          f"{args.jdbc_url or args.out}; checkpoint={checkpoint}", flush=True)
    try:
        query.awaitTermination()
    finally:
        if poller is not None:
            poller.stop()


if __name__ == "__main__":
    main()
