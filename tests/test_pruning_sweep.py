"""Fleet-wide column-pruning sweep: no registry query may scan ALL
columns of a wide table — projection pushdown must reach the parquet
scan (ReadSchema ⊊ table schema), or the query is whitelisted with the
reason it genuinely consumes every column.

Complements test_plan_sweep.py (shuffle hygiene) and the per-query
PushedFilters gates in test_plan_quality.py: at 100 TB an unpruned
lineitem scan reads ~3x the bytes of a typical 5-column projection.
"""

from __future__ import annotations

import re

import pytest

from dwds_livestream_spark.plans.registry import QUERIES

# Slow tier (pytest.ini): full-registry sweep / hypothesis suite —
# deselected from the default driver-budget run, in the release gate.
pytestmark = pytest.mark.slow


SF_DIR = "/root/testdata/sf0.001"

# full column counts of the wide tables (narrow tables are exempt:
# region/nation are 3-4 cols and often legitimately read whole)
WIDE = {
    "lineitem": 16,
    "orders": 9,
    "customer": 8,
    "part": 9,
    "supplier": 7,
}

FULL_SCAN_OK = {
    "lineitem_unpivot": "unpivot measures every numeric column",
    "events_profile": "profile summarises every column by design",
    "snapshot_diff": "diff must compare every column of both snapshots",
}

_SCAN = re.compile(r"FileScan parquet \[([^\]]*)\].*?Location.*?/(\w+)\.parquet",
                   re.DOTALL)


def _scans(plan: str):
    """(table, n_cols_read) per parquet scan; plan text truncates long
    lines, so parse the bracketed column list conservatively."""
    out = []
    for line in plan.splitlines():
        m = re.search(r"FileScan parquet \[([^\]]*)\]", line)
        if not m:
            continue
        cols = [c for c in m.group(1).split(",") if c.strip()]
        tbl = None
        pm = re.search(r"/(\w+)\.parquet", line)
        if pm:
            tbl = pm.group(1)
        else:
            # column names are prefixed (l_, o_, c_, p_, s_) — infer
            prefixes = {c.strip().split("#")[0].split("_")[0] for c in cols}
            tbl = {
                "l": "lineitem", "o": "orders", "c": "customer",
                "p": "part", "s": "supplier",
            }.get(next(iter(prefixes)), None) if len(prefixes) == 1 else None
        out.append((tbl, len(cols)))
    return out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_column_pruning(spark, name):
    if name in FULL_SCAN_OK:
        pytest.skip(FULL_SCAN_OK[name])
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for tbl, n in _scans(plan):
        if tbl in WIDE:
            assert n < WIDE[tbl], (
                f"{name}: unpruned {tbl} scan reads all {n} columns — "
                f"push the projection down or whitelist with a reason"
            )
