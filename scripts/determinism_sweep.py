"""Shuffle-order determinism sweep over the whole query inventory.

The external correctness gate hash-compares exact values, so a query
whose doubles depend on SHUFFLE ORDER (a groupBy SUM/AVG over doubles
whose true value sits on a ROUND(·, 6) boundary) is a latent
intermittent failure: it passes most runs and flakes the one that
matters. seasonal_decompose did exactly that (the per-dow seasonal
mean of 'purchase' sat on ….9085715; fixed with exact-decimal sums).

This sweep forces different summation orders by running every query
under two different shuffle-partition counts (and therefore different
partial-aggregation groupings) and diffing the same canonicalized
rendering the oracle gate uses. A diff means the query's OUTPUT is a
function of physical execution — a class of bug no single-run oracle
compare can catch.

Usage: python scripts/determinism_sweep.py [query ...] [--sf 0.01]
Exit 1 if any query's rows differ between the two runs.
"""

from __future__ import annotations

import argparse
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from check_oracle import norm_cell  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--partitions", default="7,32")
    args = ap.parse_args()
    sf_dir = f"/root/testdata/sf{args.sf}"
    parts = [int(p) for p in args.partitions.split(",")]

    import __spark_entry__ as entry
    from dwds_livestream_spark.session import build_session, drop_leftover_state

    spark = build_session(master="local[8]", shuffle_partitions=parts[0])
    qs = entry.queries()
    names = args.queries or list(qs)

    failures = 0
    for name in names:
        renders = []
        for n_part in parts:
            spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
            drop_leftover_state(spark)
            rows = qs[name](spark, sf_dir).collect()
            renders.append(
                Counter(tuple(norm_cell(v) for v in r) for r in rows)
            )
        if renders[0] == renders[1]:
            print(f"{name:28s} deterministic ({sum(renders[0].values())} rows)")
        else:
            failures += 1
            print(f"{name:28s} ORDER-DEPENDENT OUTPUT")
            only_a = list((renders[0] - renders[1]).elements())[:3]
            only_b = list((renders[1] - renders[0]).elements())[:3]
            for r in only_a:
                print(f"   parts={parts[0]} only:", r)
            for r in only_b:
                print(f"   parts={parts[1]} only:", r)

    print(f"\n{len(names) - failures}/{len(names)} deterministic")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
