"""Property-based P5/P3/P4 parity: any browser-encoded lemma must
round-trip through the full pipeline (prefilter -> regex parse -> strip
-> split -> percent-decode) back to itself.

The generator percent-encodes with urllib.parse.quote(safe='') — the
strictest browser-style encoding: every byte of the lemma's UTF-8 form
becomes %XX except unreserved ASCII. That exercises the split-BEFORE-
decode order the reference uses (access_log.clj:84-86): a lemma
containing '/' arrives as %2F, so it must survive as ONE segment, and
'+' must stay literal (lambdaisland percent-decode, not URLDecoder).
Each hypothesis example is one Spark job over a batch of lemmas.
"""

from __future__ import annotations

import datetime as dt
from urllib.parse import quote

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

from dwds_livestream_spark.config import DEFAULT_CONFIG
from dwds_livestream_spark.functions.access_log import access_log_to_events

import pytest
# Slow tier (pytest.ini): full-registry sweep / hypothesis suite —
# deselected from the default driver-budget run, in the release gate.
pytestmark = pytest.mark.slow


TS = dt.datetime(2024, 12, 8, 23, 0, 18)
UA = "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101"

lemma_st = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cc", "Cs"),  # no controls/surrogates
    ),
    min_size=1,
    max_size=40,
)


def _line(uri: str) -> str:
    return (
        f'94.134.88.1 - - [08/Dec/2024:23:00:18 +0000] "GET {uri} '
        f'HTTP/1.1" 200 35932 "https://www.google.com/" "{UA}"'
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(lemma_st, min_size=1, max_size=10))
def test_encoded_lemma_roundtrips(spark, lemmas):
    kept = []
    for lem in lemmas:
        # drop cases other predicates legitimately reject: bracket
        # lemmas (F3), legacy sub-dictionaries (F4), and lemmas whose
        # ENCODED form starts with 'typeahead' (F1 substring prefilter)
        if lem.startswith("["):
            continue
        if lem in DEFAULT_CONFIG.sub_dictionaries:
            continue
        if quote(lem, safe="").startswith("typeahead"):
            continue
        kept.append(lem)
    assume(kept)
    df = spark.createDataFrame(
        [Row(value=_line(f"/wb/{quote(lem, safe='')}")) for lem in kept]
    )
    got = sorted(
        (r.timestamp, r.lemma) for r in access_log_to_events(df).collect()
    )
    assert got == sorted((TS, lem) for lem in kept)
