"""Live-server entry point — the reference's ``server/start!`` CLI
(reference: src/dwds/livestream/server.clj:25-35, SURVEY.md §3.1):
watch an access-log directory, run the streaming parse/filter/enrich
pipeline, and serve the enriched JSON event stream to HTTP subscribers
at ``/api/events`` (SSE) and ``/api/jsonl``, with optional per-client
``?epm=N`` sampling.

Composition of tested parts: streaming.pipeline.start_live_server
(parse -> broadcast-left-join enrich -> JSON wire, dimension snapshot
re-resolved every micro-batch) + streaming.hub.BroadcastHub (per-client
drop-oldest conflation) + sinks.serving.LivestreamHTTPServer.

Usage:
  python scripts/serve.py LOG_DIR DIMENSION_PARQUET \
      [--port 8080] [--refresh-hours 12] [--trigger "1 second"]
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwds_livestream_spark.session import build_session  # noqa: E402
from dwds_livestream_spark.sinks.serving import LivestreamHTTPServer  # noqa: E402
from dwds_livestream_spark.sources.dimension import (  # noqa: E402
    DimensionSnapshot,
    load_dimension_parquet,
)
from dwds_livestream_spark.streaming.hub import BroadcastHub  # noqa: E402
from dwds_livestream_spark.streaming.pipeline import start_live_server  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir", help="directory of access-log files to watch")
    ap.add_argument("dimension", help="dimension parquet (lemma metadata)")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument(
        "--refresh-hours",
        type=float,
        default=12.0,
        help="dimension re-snapshot period (reference: 12 h)",
    )
    ap.add_argument("--trigger", default="1 second")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tail-file", default=None,
                    help="tail ONE live access.log (reference Tailer "
                         "parity, 1 s poll, rotation reopen) into "
                         "log_dir via sources/tail.FileTailShim")
    args = ap.parse_args()

    spark = build_session(app_name="dwds-livestream-serve")
    spark.sparkContext.setLogLevel("WARN")

    tail = None
    if args.tail_file:
        from dwds_livestream_spark.sources.tail import FileTailShim
        tail = FileTailShim(args.tail_file, args.log_dir).start()

    snapshot = DimensionSnapshot(
        lambda: load_dimension_parquet(spark, args.dimension),
        refresh_seconds=args.refresh_hours * 3600,
    )
    snapshot.start()

    hub = BroadcastHub()
    server = LivestreamHTTPServer(hub, host=args.host, port=args.port).start()
    checkpoint = args.checkpoint or tempfile.mkdtemp(prefix="dwds-serve-ckpt-")
    query = start_live_server(
        spark,
        args.log_dir,
        snapshot.current,
        checkpoint=checkpoint,
        publish=hub.publish,
        trigger={"processingTime": args.trigger},
    )
    print(
        f"serving http://{args.host}:{server.port}/api/events and /api/jsonl "
        f"(epm=N to sample); checkpoint={checkpoint}",
        flush=True,
    )

    def shutdown(*_):
        if tail is not None:
            tail.stop()
        query.stop()
        server.stop()
        snapshot.stop()
        spark.stop()
        sys.exit(0)

    signal.signal(signal.SIGINT, shutdown)
    signal.signal(signal.SIGTERM, shutdown)
    query.awaitTermination()


if __name__ == "__main__":
    main()
