"""S3 + W2 — dimension loading and periodic refresh.

Reference: full JDBC scan of ``lemma ⋈ article`` pushed down into MySQL
(fetch-size 1024), folded into an argmin-deduped map, swapped into an
atom every 12 h (src/dwds/livestream/wbdb.clj:12-15, 30-37, 61-67).

Spark shape: ``spark.read.jdbc`` with the join kept in the pushed-down
subquery (Spark does not push joins into JDBC sources itself), then the
same argmin dedup as a hash aggregate, then ``cache()``. Stream-static
joins re-resolve the static side every micro-batch, so a refresh is
"load new snapshot, swap the reference" — the atom-swap semantic, made
atomic by versioned snapshot paths.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import DataFrame, SparkSession

from ..config import DEFAULT_CONFIG, EngineConfig
from ..operators.dedup_dim import dedup_dimension

# The reference's dimension query (wbdb.clj:12-15) — stays pushed down.
LEMMA_ARTICLE_QUERY = (
    "SELECT l.lemma, l.hidx, l.type as lemma_type, l.form_type, "
    "a.type as article_type, a.status, a.source, a.date "
    "FROM lemma l JOIN article a ON l.article_id = a.id"
)


def load_dimension_jdbc(
    spark: SparkSession,
    url: str,
    properties: dict[str, str] | None = None,
    config: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """S3 — JDBC dimension scan with the inner join pushed down."""
    props = dict(properties or {})
    props.setdefault("fetchsize", str(config.jdbc_fetch_size))
    raw = spark.read.jdbc(url, f"({LEMMA_ARTICLE_QUERY}) dim", properties=props)
    # dialect case-normalization: engines that canonicalize unquoted
    # identifiers to UPPER (Derby, Oracle, H2) hand back uppercase
    # result columns for the same query MySQL answers in lowercase
    return dedup_dimension(raw.toDF(*[c.lower() for c in raw.columns]))


def load_dimension_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Fixture-backed dimension for tests/replay: same dedup applied."""
    return dedup_dimension(spark.read.parquet(path))


class DimensionSnapshot:
    """Atomically-swappable dimension snapshot (W2).

    ``current()`` always returns a fully-built, cached DataFrame; a
    refresher thread rebuilds on a period and swaps the reference —
    mirroring the reference's atom swap (wbdb.clj:46). A streaming
    pipeline using ``lambda: snapshot.current()`` inside foreachBatch
    picks up the new snapshot on the next micro-batch.
    """

    def __init__(self, loader, refresh_seconds: float | None = None):
        self._loader = loader
        self._lock = threading.Lock()
        self._df: DataFrame | None = None
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.refresh_seconds = refresh_seconds
        self.refresh()

    def refresh(self) -> None:
        new = self._loader().cache()
        new.count()  # materialize before swap: no half-built snapshot
        with self._lock:
            old, self._df = self._df, new
        if old is not None:
            old.unpersist()

    def current(self) -> DataFrame:
        with self._lock:
            assert self._df is not None
            return self._df

    def start(self) -> None:
        if self.refresh_seconds is None or self._thread is not None:
            return

        def loop():
            while not self._stop.wait(self.refresh_seconds):
                try:
                    self.refresh()
                except Exception:  # noqa: BLE001 — keep serving old snapshot
                    pass

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
