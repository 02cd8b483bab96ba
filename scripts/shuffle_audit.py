"""Measured shuffle audit: execute headline queries and report what
each Exchange ACTUALLY moved (records + bytes from the SQL metrics
store), next to the table sizes scanned.

The plan gates (tests/test_plan_sweep.py, PLANS.md) pin plan SHAPE;
this script pins plan VOLUME — the difference between "the join is a
BroadcastHashJoin" and "the 6M-row fact scan shuffled 0 bytes". Each
audited query carries a docstring claim about its shuffle behavior
(map-side combine, keys-only shuffle, broadcast, pair-fold); the
numbers here are those claims measured, written to SHUFFLE.md.

Usage: python scripts/shuffle_audit.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dwds_livestream_spark.session import build_session  # noqa: E402
from dwds_livestream_spark.plans.registry import QUERIES  # noqa: E402

# query -> the scale claim being measured (kept next to the numbers in
# the generated report so each row is an auditable statement)
AUDITS: dict[str, str] = {
    "events_enrich": (
        "stream-static broadcast LEFT join: the events scan must "
        "shuffle ZERO rows (dimension broadcast, no Exchange on the "
        "fact side)"
    ),
    "q1_pricing_summary": (
        "map-side partial aggregation: shuffle records ~= groups x "
        "map partitions, thousands of times smaller than the lineitem "
        "scan"
    ),
    "events_per_hour": (
        "hour-bucket counts: partial agg folds the events scan to "
        "bucket rows before the exchange"
    ),
    "q21_sole_returner": (
        "pair-fold rewrite: lineitem folds to distinct (order,supp) "
        "pairs before any multi-supplier logic, so the SUM across all "
        "exchanges (pairs + order/supplier joins + final agg) stays "
        "~1.7x the fact scan where the countDistinct Expand "
        "formulation shuffled 2-3x the fact rows"
    ),
    "dedup_minhash_lsh": (
        "banded LSH: only (id, band, key) bucket rows ever feed the "
        "self-join - the 128-long signatures never cross an exchange; "
        "at this sf the bucket frame is small enough that AQE "
        "broadcasts it outright (0-row shuffle)"
    ),
    "dedup_simhash": (
        "simhash banding: signatures are a pure projection; what "
        "shuffles is bucket rows plus the pigeonhole candidate pairs "
        "(collision-bounded by the 16-bit block keys), never the "
        "corpus text"
    ),
    "decontaminate": (
        "broadcast bench-shingle probe: the corpus scan is map-only; "
        "the only exchanges aggregate the (small) benchmark shingle "
        "set and per-doc overlap counts"
    ),
    "spend_gini": (
        "distributed exact rank: equi-depth bucketing shuffles each "
        "row once to a bounded bucket - no single-partition global "
        "sort"
    ),
    "pagerank_trade": (
        "iterative rank: shuffled rows / iterations ~= node count - "
        "per iteration only the node-sized rank table moves; the "
        "cached adjacency is hash-partitioned once"
    ),
    "triangle_count": (
        "degree-oriented wedges: edges shuffle as (lo, hi) pairs; "
        "orientation caps wedge fan-out before the join"
    ),
}

_SIZES = {"B": 1, "KiB": 1 << 10, "MiB": 1 << 20, "GiB": 1 << 30, "TiB": 1 << 40}


def _parse_bytes(metric_value: str) -> int:
    """SQL metric strings render as 'total (min, med, max (...))' with
    humanized units; take the leading total."""
    head = metric_value.strip().splitlines()[-1].split("(")[0].strip()
    m = re.match(r"([\d.]+)\s*(B|KiB|MiB|GiB|TiB)", head)
    if not m:
        return 0
    return int(float(m.group(1)) * _SIZES[m.group(2)])


def _parse_count(metric_value: str) -> int:
    head = metric_value.strip().splitlines()[-1].split("(")[0].strip()
    m = re.match(r"([\d,.]+)", head)
    return int(m.group(1).replace(",", "").split(".")[0]) if m else 0


def _execution_count(spark) -> int:
    return (
        spark._jsparkSession.sharedState().statusStore().executionsCount()
    )


def _metrics_since(spark, first_ex_idx: int):
    """Collect (node_name, metric_name, value) across EVERY SQL
    execution from index first_ex_idx on — iterative queries (k-means
    seeds, rank bounds, pagerank loops) run actions while the plan is
    being BUILT, so a single-execution read would miss their shuffles."""
    st = spark._jsparkSession.sharedState().statusStore()
    exes = st.executionsList()
    out = []
    for e in range(first_ex_idx, exes.size()):
        ex_id = exes.apply(e).executionId()
        mv = st.executionMetrics(ex_id)
        g = st.planGraph(ex_id)
        nodes = g.allNodes()
        for i in range(nodes.size()):
            node = nodes.apply(i)
            ms = node.metrics()
            for j in range(ms.size()):
                m = ms.apply(j)
                val = mv.get(m.accumulatorId())
                if val.isDefined():
                    out.append((node.name(), m.name(), val.get()))
    return out


def audit_one(spark, name: str, sf_dir: str) -> dict:
    before = _execution_count(spark)
    df = QUERIES[name](spark, sf_dir)
    # noop write executes the FULL plan with no driver-side result
    # transfer (collect would add fetch cost; count folds the plan)
    df.write.format("noop").mode("overwrite").save()
    metrics = _metrics_since(spark, before)
    shuffle_recs = sum(
        _parse_count(v)
        for n, m, v in metrics
        if m == "shuffle records written"
    )
    shuffle_bytes = sum(
        _parse_bytes(v) for n, m, v in metrics if m == "shuffle bytes written"
    )
    scan_rows = sum(
        _parse_count(v)
        for n, m, v in metrics
        if n.startswith("Scan") and m == "number of output rows"
    )
    bcast_bytes = sum(
        _parse_bytes(v)
        for n, m, v in metrics
        if n == "BroadcastExchange" and m == "data size"
    )
    return {
        "query": name,
        "scan_rows": scan_rows,
        "shuffle_records": shuffle_recs,
        "shuffle_bytes": shuffle_bytes,
        "broadcast_bytes": bcast_bytes,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None, help="write SHUFFLE.md here")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    names = args.queries or list(AUDITS)

    spark = build_session(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in names:
        spark.catalog.clearCache()
        r = audit_one(spark, name, args.sf_dir)
        rows.append(r)
        print(
            f"{name:22s} scan={r['scan_rows']:>10,}  "
            f"shuffled={r['shuffle_records']:>10,} rows "
            f"/ {r['shuffle_bytes']/1e6:8.2f} MB  "
            f"bcast={r['broadcast_bytes']/1e6:6.2f} MB"
        )
    spark.stop()

    if args.out:
        with open(args.out, "w") as fh:
            fh.write(
                "# SHUFFLE — measured exchange volumes (sf0.1, "
                "local[32])\n\n"
                "Generated by `python scripts/shuffle_audit.py --out "
                "SHUFFLE.md`.\nPlan-shape gates pin WHAT the plan does; "
                "these are runtime SQL metrics\n(`shuffle records/bytes "
                "written` summed over every Exchange in the\nexecuted "
                "plan) pinning HOW MUCH it moved — the ground truth "
                "behind each\noperator's scale claim.\n\n"
                "| query | rows scanned | rows shuffled | MB shuffled | "
                "MB broadcast | claim measured |\n"
                "|---|---|---|---|---|---|\n"
            )
            for r in rows:
                fh.write(
                    f"| {r['query']} | {r['scan_rows']:,} | "
                    f"{r['shuffle_records']:,} | "
                    f"{r['shuffle_bytes']/1e6:.2f} | "
                    f"{r['broadcast_bytes']/1e6:.2f} | "
                    f"{AUDITS.get(r['query'], '')} |\n"
                )
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
