from __future__ import annotations

import pytest

from dwds_livestream_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="dwds-livestream-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.files.openCostInBytes": "0"},
    )
    yield spark
    spark.stop()
