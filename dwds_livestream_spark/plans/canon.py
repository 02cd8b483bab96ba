"""Output-type canonicalization contract for the query registry.

The correctness gate compares Spark results against DuckDB oracles
through engine-specific fetches. Even when values are bit-identical, a
final output column whose TYPE renders differently across engines
hash-mismatches: Spark DECIMAL carries a fixed trailing-zero scale
('212576.00' vs '212576'), DuckDB SUM(BIGINT) yields HUGEINT which a
pandas fetch coerces to float ('…0.0' vs '…0'), and date_trunc is DATE
on one engine and midnight TIMESTAMP on the other. Round 2 shipped 7
such mismatches twice because the local replica normalized them away.

The contract, enforced here and in tests/test_output_type_canon.py:
exact DECIMAL math stays INTERNAL to a query; every final output column
must be a type both engines render identically — DOUBLE, BIGINT/INT,
STRING, BOOLEAN, DATE-or-TIMESTAMP (consistently), arrays/structs
thereof. Concretely: no DecimalType in a Spark result schema, no
DECIMAL/HUGEINT in a DuckDB oracle result, no DATE-vs-TIMESTAMP
disagreement on same-named columns.
"""

from __future__ import annotations

BANNED_DUCK_TYPES = ("DECIMAL", "HUGEINT", "INT128", "UHUGEINT")


def spark_schema_problems(schema) -> list[str]:
    """DecimalType anywhere in the (possibly nested) result schema."""
    from pyspark.sql import types as ST

    problems: list[str] = []

    def walk(name: str, dt) -> None:
        if isinstance(dt, ST.DecimalType):
            problems.append(f"spark output col {name} is {dt.simpleString()}")
        elif isinstance(dt, ST.ArrayType):
            walk(f"{name}[]", dt.elementType)
        elif isinstance(dt, ST.MapType):
            walk(f"{name}{{k}}", dt.keyType)
            walk(f"{name}{{v}}", dt.valueType)
        elif isinstance(dt, ST.StructType):
            for f in dt.fields:
                walk(f"{name}.{f.name}", f.dataType)

    for f in schema.fields:
        walk(f.name, f.dataType)
    return problems


def duck_type_problems(columns, types) -> list[str]:
    problems = []
    for col, t in zip(columns, types, strict=True):
        ts = str(t).upper()
        if any(b in ts for b in BANNED_DUCK_TYPES):
            problems.append(f"duckdb output col {col} is {ts}")
    return problems


def temporal_mismatch_problems(schema, duck_columns, duck_types) -> list[str]:
    """Same-named column DATE on one engine, TIMESTAMP on the other."""
    from pyspark.sql import types as ST

    sclass = {}
    for f in schema.fields:
        if isinstance(f.dataType, ST.DateType):
            sclass[f.name] = "DATE"
        elif isinstance(f.dataType, ST.TimestampType | ST.TimestampNTZType):
            sclass[f.name] = "TIMESTAMP"
    problems = []
    for col, t in zip(duck_columns, duck_types, strict=True):
        ts = str(t).upper()
        dclass = "DATE" if ts == "DATE" else (
            "TIMESTAMP" if "TIMESTAMP" in ts else None
        )
        sc = sclass.get(col)
        if sc and dclass and sc != dclass:
            problems.append(f"col {col}: spark {sc} vs duckdb {dclass}")
    return problems


def all_problems(sdf, duck_columns, duck_types) -> list[str]:
    return (
        spark_schema_problems(sdf.schema)
        + duck_type_problems(duck_columns, duck_types)
        + temporal_mismatch_problems(sdf.schema, duck_columns, duck_types)
    )
