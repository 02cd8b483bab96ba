"""Output-type canonicalization contract for the query registry.

The correctness gate compares Spark results against DuckDB oracles
through engine-specific fetches. Even when values are bit-identical, a
final output column whose TYPE renders differently across engines
hash-mismatches: Spark DECIMAL carries a fixed trailing-zero scale
('212576.00' vs '212576'), DuckDB SUM(BIGINT) yields HUGEINT which a
pandas fetch coerces to float ('…0.0' vs '…0'), and date_trunc is DATE
on one engine and midnight TIMESTAMP on the other. Round 2 shipped 7
such mismatches twice because the local replica normalized them away.

Round 5 added a harsher failure class: an ARRAY-typed output column
doesn't merely hash-mismatch — the driver canonicalizes through
``pandas.DataFrame.sort_values`` over RAW cells, which raises
``TypeError: unhashable type: 'list'`` and kills the check before it
can even record a rows-only result (embedding_quantize / embedding_pca
/ snapshot_diff, CORRECTNESS_r05). Complex types are therefore banned
at the TOP LEVEL of every registry output, oracled or not.

The contract, enforced here and in tests/test_output_type_canon.py:
exact DECIMAL math stays INTERNAL to a query; every final output column
must be a SCALAR type both engines render identically — DOUBLE,
BIGINT/INT, STRING, BOOLEAN, DATE-or-TIMESTAMP (consistently).
Concretely: no DecimalType and no Array/Map/StructType in a Spark
result schema, no DECIMAL/HUGEINT/LIST/STRUCT/MAP in a DuckDB oracle
result, no DATE-vs-TIMESTAMP disagreement on same-named columns.
Arrays stay first-class INSIDE operators (quantize_embeddings et al.
still return arrays to library callers); registry views posexplode or
concat_ws them at the boundary.
"""

from __future__ import annotations

BANNED_DUCK_TYPES = ("DECIMAL", "HUGEINT", "INT128", "UHUGEINT")
# pandas sort_values over raw cells dies on any unhashable cell value
BANNED_DUCK_COMPLEX = ("[]", "LIST", "STRUCT", "MAP", "UNION")


def spark_schema_problems(schema) -> list[str]:
    """DecimalType anywhere, or any complex type at the top level, of
    the result schema."""
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
        if isinstance(f.dataType, ST.ArrayType | ST.MapType | ST.StructType):
            problems.append(
                f"spark output col {f.name} is "
                f"{f.dataType.simpleString()} — complex output columns "
                "crash the driver canonicalizer (posexplode/concat_ws "
                "at the registry boundary)"
            )
        walk(f.name, f.dataType)
    return problems


def duck_type_problems(columns, types) -> list[str]:
    problems = []
    for col, t in zip(columns, types, strict=True):
        ts = str(t).upper()
        if any(b in ts for b in BANNED_DUCK_TYPES):
            problems.append(f"duckdb output col {col} is {ts}")
        if any(b in ts for b in BANNED_DUCK_COMPLEX):
            problems.append(
                f"duckdb output col {col} is {ts} — complex output "
                "columns crash the driver canonicalizer"
            )
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
