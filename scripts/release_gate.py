"""End-of-round release gate: ONE exit-0-gated command bundling every
pre-commit evidence sweep (VERDICT r4 #5), so "did we run the sweeps?"
is a build step, not a memory question.

Steps (each a subprocess — the scripts spawn their own Spark JVM, and
two 32-thread JVMs must never run concurrently on this box):

  1. full-suite pytest        (tests/ — includes the canon sweep over
                               the whole registry, the shuffle-volume
                               + no-spill gates, and the registry
                               rows-only pin)
  2. oracle replica           (scripts/check_oracle.py — every oracled
                               query vs DuckDB at sf0.01, the same
                               comparison the external driver runs)
  3. determinism sweep        (scripts/determinism_sweep.py — every
                               query under two shuffle-partition
                               counts; catches shuffle-order-dependent
                               FP rounding, the seasonal_decompose
                               flake class)
  4. sf1 scale smoke          (scripts/scale_smoke_sf1.py — only for
                               --changed queries, or --smoke-all;
                               skipped when neither is given)

Usage:
  python scripts/release_gate.py                      # 1-3
  python scripts/release_gate.py --changed q1,q2      # 1-3 + smoke q1,q2
  python scripts/release_gate.py --smoke-all          # 1-3 + smoke all
  python scripts/release_gate.py --skip pytest        # drop a step

Exit code 0 iff every selected step exits 0. Step output streams
through; a summary table prints at the end.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--changed",
        default="",
        help="comma-separated query names to sf1-smoke (the round's "
        "plan/oracle changes)",
    )
    ap.add_argument(
        "--smoke-all",
        action="store_true",
        help="sf1-smoke the entire registry (slow; use after broad "
        "refactors)",
    )
    ap.add_argument(
        "--skip",
        default="",
        help="comma-separated step names to drop: pytest, oracle, "
        "determinism, smoke",
    )
    ap.add_argument("--sf", default="0.01", help="oracle/determinism sf")
    args = ap.parse_args()
    skip = {s for s in args.skip.split(",") if s}

    steps: list[tuple[str, list[str]]] = []
    if "pytest" not in skip:
        # the release gate runs the FULL suite, including the `slow`
        # tier pytest.ini deselects from the driver-budget default run
        steps.append((
            "pytest",
            [sys.executable, "-m", "pytest", "tests/", "-q",
             "-m", "slow or not slow"],
        ))
    if "oracle" not in skip:
        steps.append(
            ("oracle", [sys.executable, "scripts/check_oracle.py", "--sf", args.sf])
        )
    if "determinism" not in skip:
        steps.append(
            (
                "determinism",
                [sys.executable, "scripts/determinism_sweep.py", "--sf", args.sf],
            )
        )
    if "smoke" not in skip and (args.changed or args.smoke_all):
        q = "all" if args.smoke_all else args.changed
        steps.append(
            ("smoke", [sys.executable, "scripts/scale_smoke_sf1.py", "--queries", q])
        )

    results: list[tuple[str, int, float]] = []
    for name, cmd in steps:
        print(f"\n=== release_gate: {name}: {' '.join(cmd)} ===", flush=True)
        t0 = time.monotonic()
        rc = subprocess.run(cmd, cwd=REPO).returncode
        results.append((name, rc, time.monotonic() - t0))
        if rc != 0:
            # fail fast: later sweeps on a broken tree waste half an
            # hour of JVM time and bury the first failure
            break

    print("\n=== release_gate summary ===")
    for name, rc, sec in results:
        print(f"{name:<12} {'PASS' if rc == 0 else f'FAIL (rc={rc})':<12} {sec:7.1f}s")
    ran = {n for n, _, _ in results}
    for name, _ in steps:
        if name not in ran:
            print(f"{name:<12} {'SKIPPED (fail-fast)':<12}")
    worst = max((rc for _, rc, _ in results), default=0)
    print("release_gate:", "PASS" if worst == 0 else "FAIL")
    return worst


if __name__ == "__main__":
    sys.exit(main())
