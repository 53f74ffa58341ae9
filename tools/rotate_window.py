"""Compute the next driver correctness window.

The external driver hash-checks the FIRST 50 registry entries each
round (CORRECTNESS_r{N}.json). This tool unions every committed
CORRECTNESS_*.json, subtracts the already-verified keys, and prints a
ready-to-paste ``_DRIVER_HEAD`` tuple holding the configured sentinels
plus the next batch of never-driver-verified oracle-bearing keys in
registry order — so each round's rotation (VERDICT r3 follow-up #1) is
one command instead of a hand audit:

    python tools/rotate_window.py            # print next head + stats
    python tools/rotate_window.py --check    # exit 1 if current head
                                             # wastes slots on verified
                                             # non-sentinel keys

Oracle-bearing unverified keys fill first (the hash-compared rows are
the strong check). Any slots left over go to rows-only keys that have
NEVER executed under the driver — an execution crash should be caught
by the driver, not only by the local suite (VERDICT r5 item 6). Only
then is the window padded with already-verified keys so it never runs
short.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50
# cross-round regression anchors, kept at the head of every window
SENTINELS = ("q1_pricing_summary", "q9_product_profit", "salted_join")


def verified_keys() -> tuple[set[str], set[str], set[str]]:
    """(hash/rows-verified keys, keys that ever EXECUTED under the driver,
    keys that ever produced a CLEAN row — ``err`` null).

    The r1/r2 driver recorded rows-only keys with ``err: "no_oracle"``;
    those read as failures to anyone grepping ``err != null`` (VERDICT r6
    item 6), so a key only counts as *clean* once some round recorded it
    with a null err.
    """
    seen: set[str] = set()
    executed: set[str] = set()
    clean: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            rows = json.load(fh)
        for key, row in rows.items():
            executed.add(key)
            if row.get("err") is None:
                clean.add(key)
            if row.get("rows_match") and row.get("err") is None:
                seen.add(key)
    return seen, executed, clean


def next_head() -> tuple[list[str], dict]:
    from spotify_podcasts_airflow_batch_spark.plans.registry import (
        _REGISTRY,
        all_queries,
    )

    queries = all_queries()
    seen, executed, clean = verified_keys()
    oracle_bearing = [n for n, q in _REGISTRY.items() if q.oracle is not None]
    rows_only = [n for n, q in _REGISTRY.items() if q.oracle is None]
    unverified = [n for n in oracle_bearing if n not in seen]
    never_ran = [n for n in rows_only if n not in executed]
    never_clean = [
        n for n in rows_only if n in executed and n not in clean
    ]

    head = [s for s in SENTINELS if s in queries]
    head += [n for n in unverified if n not in head][: WINDOW - len(head)]
    if len(head) < WINDOW:  # fill with rows-only keys the driver never ran
        head += [n for n in never_ran if n not in head][: WINDOW - len(head)]
    if len(head) < WINDOW:  # then rows-only keys whose rows all carry an err
        head += [n for n in never_clean if n not in head][: WINDOW - len(head)]
    if len(head) < WINDOW:  # rotation exhausted: refill with verified keys
        head += [
            n for n in oracle_bearing if n not in head
        ][: WINDOW - len(head)]
    stats = {
        "registered": len(queries),
        "oracle_bearing": len(oracle_bearing),
        "driver_verified": len(seen & set(queries)),
        "unverified_oracle_bearing": len(unverified),
        "never_executed_rows_only": len(never_ran),
        "never_clean_rows_only": len(never_clean),
        "first_time_in_head": len([n for n in head if n not in seen]),
        "unverified_keys": sorted(unverified),
        "never_executed_rows_only_keys": sorted(never_ran),
        "never_clean_rows_only_keys": sorted(never_clean),
    }
    return head, stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    head, stats = next_head()
    from spotify_podcasts_airflow_batch_spark.plans.registry import (
        _DRIVER_HEAD,
    )

    if args.check:
        seen, _, _ = verified_keys()
        # refill slots only WASTE the window when some unverified
        # oracle-bearing key is still outside the head
        outside = [n for n in stats["unverified_keys"] if n not in _DRIVER_HEAD]
        wasted = [
            n
            for n in _DRIVER_HEAD
            if n in seen and n not in SENTINELS
        ]
        print(
            json.dumps(
                {
                    "stats": stats,
                    "unverified_outside_head": outside,
                    "refill_slots": wasted,
                }
            )
        )
        return 1 if wasted and outside else 0

    print(f"# {json.dumps(stats)}")
    print("_DRIVER_HEAD = (")
    for name in head:
        marker = "  # sentinel" if name in SENTINELS else ""
        print(f'    "{name}",{marker}')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
