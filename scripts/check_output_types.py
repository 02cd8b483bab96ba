"""Output-type canon sweep: the driver's correctness gate renders cell
values through engine-specific fetches, so a final output column whose
*type* renders differently across engines (Spark DECIMAL fixed scale vs
DuckDB numeric, DuckDB HUGEINT sums, date_trunc DATE-vs-TIMESTAMP) hash-
mismatches even when the values are bit-identical. This sweep asserts the
canon: no DecimalType in any Spark output schema, no DECIMAL/HUGEINT in
any DuckDB oracle result type, and no DATE-vs-TIMESTAMP disagreement for
same-named columns.

Usage: python scripts/check_output_types.py [query ...]
Exit 1 on any violation. Cheap: Spark analysis only (no execution),
DuckDB LIMIT 0.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
from pyspark.sql import types as ST  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

BANNED_DUCK = ("DECIMAL", "HUGEINT", "INT128", "UHUGEINT")


def spark_type_class(dt) -> str:
    """Coarse render-class of a Spark type for cross-engine comparison."""
    if isinstance(dt, ST.DecimalType):
        return "DECIMAL"
    if isinstance(dt, ST.DateType):
        return "DATE"
    if isinstance(dt, ST.TimestampType | ST.TimestampNTZType):
        return "TIMESTAMP"
    if isinstance(dt, ST.DoubleType | ST.FloatType):
        return "FLOAT"
    if isinstance(dt, ST.ByteType | ST.ShortType | ST.IntegerType | ST.LongType):
        return "INT"
    return dt.simpleString().upper()


def duck_type_class(t: str) -> str:
    t = t.upper()
    if "DECIMAL" in t or "HUGEINT" in t:
        return "DECIMAL"
    if t == "DATE":
        return "DATE"
    if "TIMESTAMP" in t:
        return "TIMESTAMP"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "FLOAT"
    if "INT" in t:
        return "INT"
    return t


def main() -> int:
    import __spark_entry__ as entry
    from dwds_livestream_spark.session import build_session

    spark = build_session(master="local[2]", shuffle_partitions=2)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sys.argv[1:] or list(qs)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    bad = 0
    for name in names:
        problems = []
        try:
            schema = qs[name](spark, SF_DIR).schema
        except Exception as e:  # noqa: BLE001
            problems.append(f"spark analysis error: {e}")
            schema = None
        sclass: dict[str, str] = {}
        if schema is not None:
            for f in schema.fields:
                sclass[f.name] = spark_type_class(f.dataType)
                if isinstance(f.dataType, ST.DecimalType):
                    problems.append(f"spark col {f.name}: {f.dataType.simpleString()}")
        if name in oracles:
            try:
                rel = con.sql(f"SELECT * FROM ({oracles[name]}) LIMIT 0")
                for col, t in zip(rel.columns, rel.types, strict=True):
                    ts = str(t).upper()
                    if any(b in ts for b in BANNED_DUCK):
                        problems.append(f"duck col {col}: {ts}")
                    dc = duck_type_class(ts)
                    sc = sclass.get(col)
                    if sc is not None and {sc, dc} == {"DATE", "TIMESTAMP"}:
                        problems.append(f"col {col}: spark {sc} vs duck {dc}")
            except Exception as e:  # noqa: BLE001
                problems.append(f"duck analysis error: {e}")
        if problems:
            bad += 1
            print(f"{name}:")
            for p in problems:
                print(f"   {p}")
    print(f"\n{len(names) - bad}/{len(names)} queries type-clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
