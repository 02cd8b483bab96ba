"""Z-order layout (sinks/zorder.py): per-file min/max envelopes must be
tight in BOTH z dimensions, unlike a lexicographic sort which only
tightens its first column. Measured from real parquet footer stats."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from dwds_livestream_spark.sinks.zorder import morton_key, zorder_write

N = 100_000
SPAN = 1024  # x and y each uniform in [0, SPAN)


def _data(spark):
    # x and y must be INDEPENDENT dimensions (a correlated pair is a 1-D
    # curve — nothing for the Z-curve to tile)
    return spark.range(N).select(
        (F.col("id") % SPAN).alias("x"),
        (F.abs(F.hash(F.col("id"))) % SPAN).alias("y"),
        F.col("id").alias("payload"),
    )


def _file_envelopes(path: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def test_morton_key_locality(spark):
    """Neighboring buckets differ in low bits -> close Morton keys."""
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (255, 255)], ["a", "b"])
    keys = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", morton_key([F.col("a"), F.col("b")], 8).alias("z")
        ).collect()
    }
    assert keys[(0, 0)] == 0
    assert keys[(1, 0)] == 2  # a gets the higher bit of each pair
    assert keys[(0, 1)] == 1
    assert keys[(255, 255)] == (1 << 16) - 1


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    zpath = str(tmp_path / "z")
    lexpath = str(tmp_path / "lex")
    df = _data(spark)
    zorder_write(df, zpath, cols=["x", "y"], bits=8, num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x", "y")
        .write.mode("overwrite")
        .parquet(lexpath)
    )

    # data skipping, measured the way a reader would: what fraction of
    # files does a point predicate on each dimension have to open?
    points = range(0, SPAN, 97)

    def hit_frac(path, col):
        envs = _file_envelopes(path, col)
        hits = [
            sum(1 for lo, hi in envs if lo <= p <= hi) / len(envs)
            for p in points
        ]
        return sum(hits) / len(hits)

    # lexicographic: x skips almost everything, y predicates open ~ALL
    # files — the second sort column gets no skipping at all
    assert hit_frac(lexpath, "x") < 0.2
    assert hit_frac(lexpath, "y") > 0.9
    # z-order: BOTH dimensions skip the majority of files
    assert hit_frac(zpath, "x") < 0.5
    assert hit_frac(zpath, "y") < 0.5

    # layout only — content identical
    back = spark.read.parquet(zpath)
    assert back.count() == N
    assert back.agg(F.sum("payload")).collect()[0][0] == N * (N - 1) // 2
