"""Compute the next DRIVER_WINDOW rotation.

The external correctness gate checks the FIRST 50 entries of
``queries()`` each round, so registry order is the coverage lever
(plans/registry.py DRIVER_WINDOW). This script makes the rotation
mechanical: it reads every CORRECTNESS_r*.json in the repo root, takes
the union of query names they contain (= independently verified at
least once), and prints

- the permanent parity slots (PARITY_SLOTS below — the 7 SURVEY §2
  reference-parity queries that stay in every window),
- the never-verified remainder in registry order (fill the window with
  these), and
- the suggested 50-entry window when the remainder fits.

Read-only: prints the suggestion; editing plans/registry.py stays a
reviewed change. Run after a round's CORRECTNESS file lands.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from dwds_livestream_spark.plans.registry import (  # noqa: E402
    _ALL_QUERIES,
    DRIVER_WINDOW,
)

PARITY_SLOTS = [
    "access_log_parse",
    "events_filter_project",
    "events_enrich",
    "argmin_dedup",
    "key_encode",
    "json_extract",
    "events_per_hour",
]


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verified: set[str] = set()
    last_seen: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(
            os.path.basename(f).removeprefix("CORRECTNESS_r").split(".")[0]
        )
        with open(f) as fh:
            data = json.load(fh)
        names = data.get("queries", data)
        seen = set(names) & set(_ALL_QUERIES)
        verified |= seen
        for q in seen:
            last_seen[q] = max(last_seen.get(q, 0), rnd)
        print(f"{os.path.basename(f)}: {len(seen)} entries")
    remainder = [q for q in _ALL_QUERIES if q not in verified]
    print(f"\nregistry: {len(_ALL_QUERIES)}  verified so far: {len(verified)}")
    print(f"never-verified remainder ({len(remainder)}):")
    for q in remainder:
        print(f"  {q}")
    free = 50 - len(PARITY_SLOTS)
    if len(remainder) <= free:
        window = PARITY_SLOTS + remainder
        # pad policy since r7 (VERDICT r6 #3): round-robin the
        # previously-verified non-window queries, LEAST-recently
        # driver-seen first (ties in registry order), so the full
        # registry re-verifies on a bounded cadence (~3 rounds)
        # instead of only at first landing
        pad = sorted(
            (
                q
                for q in _ALL_QUERIES
                if q not in window and q in verified
            ),
            key=lambda q: (
                last_seen.get(q, 0),
                list(_ALL_QUERIES).index(q),
            ),
        )[: 50 - len(window)]
        print(f"\nsuggested DRIVER_WINDOW ({len(window + pad)}):")
        for q in window + pad:
            print(f'    "{q}",')
    else:
        print(
            f"\nremainder ({len(remainder)}) exceeds the {free} free "
            "slots: fill with the first "
            f"{free} and rotate again next round."
        )
    stale = [q for q in DRIVER_WINDOW if q not in _ALL_QUERIES]
    if stale:
        print(f"\nWARNING: current window names not in registry: {stale}")


if __name__ == "__main__":
    main()
