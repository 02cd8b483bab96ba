"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same parquet tables, compare row count, column names, and an
order-insensitive value hash.

Usage: python scripts/check_oracle.py [query ...] [--sf 0.01]
"""

from __future__ import annotations

import argparse
import decimal
import hashlib
import math
import sys
from datetime import date, datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402


def norm_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def norm_cell_coerced(v) -> str:
    """Float-coercing rendering: how a driver that fetches through
    pandas/Arrow sees the cell. A Decimal with trailing-zero scale or a
    DATE column rendered as midnight TIMESTAMP diverges HERE even when
    norm_cell agrees — the exact class of mismatch the round-2 driver
    flagged on 7 queries whose values were bit-identical. Both
    renderings must match for a query to count as green."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, decimal.Decimal):
        # Same >=2**52 integral cutoff as the int branch: a huge value
        # typed BIGINT on one engine and DECIMAL on the other must
        # render identically (float repr loses integer precision there).
        if v == v.to_integral_value() and abs(v) >= 2**52:
            return str(int(v))
        return repr(round(float(v), 9))
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return repr(round(float(v), 9)) if abs(v) < 2**52 else str(v)
    if isinstance(v, datetime):
        return str(v)  # space-separated, as pandas renders it
    if isinstance(v, date):
        return str(v) + " 00:00:00"  # a date fetched as datetime64
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell_coerced(x) for x in v) + "]"
    return str(v)


def value_hash(rows: list[tuple], col_order: list[int], norm=norm_cell) -> str:
    lines = sorted("|".join(norm(r[i]) for i in col_order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def driver_canon_ok(rows, cols, name: str, side: str) -> bool:
    """Replicate the driver's canonicalization step FAITHFULLY: the
    driver sorts RAW cells via pandas ``sort_values`` before hashing,
    which raises on unhashable cells (lists/dicts from array- or
    map-typed output columns). Round 5 lost three driver slots to
    queries that were 'replica-green' only because norm_cell
    stringifies list cells BEFORE sorting (VERDICT r5 gap #1). Runs on
    rows-only entries too — the driver's weaker rows-only path dies on
    the same cells (embedding_pca, r5)."""
    import pandas as pd

    try:
        pdf = pd.DataFrame(rows, columns=list(cols))
        pdf.sort_values(by=sorted(cols), kind="mergesort")
        return True
    except Exception as e:  # noqa: BLE001 — any raise here kills the driver
        print(f"{name:28s} DRIVER-CANON [{side}]: {type(e).__name__}: {e}")
        return False


def type_canon_problems(sdf, drel) -> list[str]:
    """Output-type canon gate (stricter than any plausible driver): no
    DECIMAL in the Spark schema, no DECIMAL/HUGEINT in the DuckDB
    result, no DATE-vs-TIMESTAMP disagreement on same-named columns.
    Keeps exact decimal math INTERNAL — only the final select types are
    constrained, because those are what engine-specific fetches
    render. See dwds_livestream_spark/plans/canon.py."""
    from dwds_livestream_spark.plans.canon import all_problems

    return all_problems(sdf, drel.columns, drel.types)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="0.01")
    args = ap.parse_args()
    sf_dir = f"/root/testdata/sf{args.sf}"

    import __spark_entry__ as entry
    from dwds_livestream_spark.session import build_session, drop_leftover_state

    spark = build_session(master="local[8]", shuffle_partitions=8)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.queries or list(qs)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in names:
        # one-shot operators pin multi-consumer frames (cache + count)
        # and cannot unpersist them before their lazy result is
        # consumed; the sweep harness releases that state per query
        # (ADVICE r12) exactly as bench.py does, so a 236-entry sweep
        # doesn't accumulate cached signature/index frames into LRU
        # eviction churn
        drop_leftover_state(spark)
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            if driver_canon_ok(srows, scols, name, "spark"):
                print(f"{name:28s} rows-only: {len(srows)} rows")
            else:
                failures += 1
            continue
        drel = con.sql(oracles[name])
        drows = drel.fetchall()
        dcols = drel.columns
        ok = True
        if not driver_canon_ok(srows, scols, name, "spark"):
            ok = False
        if not driver_canon_ok(drows, dcols, name, "duck"):
            ok = False
        for p in type_canon_problems(sdf, drel):
            print(f"{name:28s} TYPE-CANON: {p}")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"{name:28s} SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        if len(srows) != len(drows):
            print(f"{name:28s} ROWCOUNT MISMATCH spark={len(srows)} duck={len(drows)}")
            ok = False
        if ok:
            sorder = [scols.index(c) for c in sorted(scols)]
            dorder = [dcols.index(c) for c in sorted(dcols)]
            for norm in (norm_cell, norm_cell_coerced):
                sh = value_hash(srows, sorder, norm)
                dh = value_hash(drows, dorder, norm)
                if sh != dh:
                    ok = False
                    print(
                        f"{name:28s} VALUE-HASH MISMATCH"
                        f" [{norm.__name__}] ({len(srows)} rows)"
                    )
                    sset = {tuple(norm(r[i]) for i in sorder) for r in srows}
                    dset = {tuple(norm(r[i]) for i in dorder) for r in drows}
                    for r in list(sset - dset)[:3]:
                        print("   spark-only:", r)
                    for r in list(dset - sset)[:3]:
                        print("   duck-only: ", r)
        if ok:
            print(f"{name:28s} OK ({len(srows)} rows)")
        else:
            failures += 1
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
