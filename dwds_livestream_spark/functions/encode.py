"""Wire-format / sink-row encodings (SURVEY.md §2.3 P8-P12).

Reference: the collector re-encodes enriched events for the Postgres
fact table (src/dwds/livestream/collector.clj:82-88) — homograph lemmas
become ``lemma#<hidx>``, ISO strings become typed timestamp/date, and
over-long lemmas are dropped (VARCHAR(128) cap). The live stream wire
format is one JSON object per event (src/dwds/livestream/server.clj:19-20).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG
from ..schemas import ENRICHED_EVENT_WIRE


def encode_lemma_hidx(lemma: Column, hidx: Column) -> Column:
    """P8 — ``lemma`` or ``lemma#<hidx>`` for homographs
    (collector.clj:82-84)."""
    return F.when(hidx.isNotNull(), F.concat_ws("#", lemma, hidx)).otherwise(lemma)


def to_json_events(df: DataFrame) -> Column | DataFrame:
    """P10 — enriched event rows -> JSON strings (server.clj:19-20).

    ``ignoreNullFields`` keeps parity with Clojure's ``merge``: unknown
    lemmata serialize without the metadata keys at all. The timestamp
    format matches ``java.time.Instant#toString`` (second resolution,
    ``Z`` suffix — access_log.clj:49-54).
    """
    return df.select(
        F.to_json(
            F.struct(*df.columns),
            {
                "ignoreNullFields": "true",
                "timestampFormat": "yyyy-MM-dd'T'HH:mm:ssXXX",
            },
        ).alias("value")
    )


def from_json_events(
    df: DataFrame,
    column: str = "value",
    drop_malformed: bool = True,
    observe: bool = False,
) -> DataFrame:
    """P11 — JSONL lines -> typed enriched-event rows
    (collector.clj:32-34, 65) with the P9 casts applied.

    ``drop_malformed`` extends the reference's F7 malformed-line guard
    (access_log.clj:80,92-93) to the JSONL path: unparseable lines
    (``from_json`` -> null struct) and records missing the required
    timestamp/lemma are dropped instead of flowing on as all-null rows
    — at 100 TB one poisoned upstream file must not null-pollute the
    fact table or crash the collector (the reference would hit the
    exception-retry loop, collector.clj:48-53)."""
    parsed = df.select(F.from_json(F.col(column), ENRICHED_EVENT_WIRE).alias("e"))
    if observe:
        # named observation surfaced in every progress event
        # (observedMetrics.parse) — the drop is counted, never silent;
        # ThroughputListener accumulates it (streaming/metrics.py)
        bad = (
            F.col("e").isNull()
            | F.col("e.timestamp").isNull()
            | F.col("e.lemma").isNull()
        )
        parsed = parsed.observe(
            "parse",
            F.count(F.when(bad, 1)).alias("n_malformed"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    if drop_malformed:
        parsed = parsed.where(
            F.col("e").isNotNull()
            & F.col("e.timestamp").isNotNull()
            & F.col("e.lemma").isNotNull()
        )
    return parsed.select(
        F.to_timestamp("e.timestamp").alias("timestamp"),
        F.col("e.lemma").alias("lemma"),
        F.col("e.hidx").alias("hidx"),
        F.col("e.lemma_type").alias("lemma_type"),
        F.col("e.form_type").alias("form_type"),
        F.col("e.article_type").alias("article_type"),
        F.col("e.source").alias("source"),
        F.to_date("e.date").alias("date"),
    )


def events_to_sink_rows(
    df: DataFrame, max_lemma_len: int = DEFAULT_CONFIG.max_lemma_len
) -> DataFrame:
    """P8+P9+F6 — enriched events -> persisted fact rows
    (event->db, collector.clj:82-88)."""
    encoded = encode_lemma_hidx(F.col("lemma"), F.col("hidx"))
    return (
        df.select(
            F.col("timestamp").alias("ts"),
            encoded.alias("lemma"),
            F.col("article_type"),
            F.col("source").alias("article_source"),
            F.col("date").alias("article_date"),
        )
        .where(F.length("lemma") < max_lemma_len)  # F6
    )


def sse_frame(json_col: Column) -> Column:
    """P12 — SSE framing ``data: <json>\\n\\n`` (http.clj:96-97)."""
    return F.concat(F.lit("data: "), json_col, F.lit("\n\n"))


def forwarded_client(header: Column) -> Column:
    """P14 — first element of a comma-separated X-Forwarded-For, trimmed
    (http.clj:26-36)."""
    return F.trim(F.split(header, ",").getItem(0))
