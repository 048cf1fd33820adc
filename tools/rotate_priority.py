"""Compute the next round's driver-gate rotation.

The driver's correctness gate runs the FIRST 50 entries of
``__spark_entry__.queries()``; the catalog is >2x that, so entries rotate
through the slots and the invariant is "no query's newest driver row is
older than two rounds". This tool derives the rotation mechanically from
the CORRECTNESS_r*.json history instead of by hand:

    python tools/rotate_priority.py [--slots 50] [--changed q1,q2,...]

Output (stdout):
  1. queries with NO driver row ever (new this round)  — always first
  2. --changed queries (code touched this round)        — re-row
  3. every other query, oldest newest-row first (ties in catalog order)
  4. a staleness report: anything whose newest row would fall >2 rounds
     behind if it misses this round's slots, and whether it fits.

Paste section 1-3 (up to the slot count; the remainder keeps catalog
order automatically) into ``_PRIORITY`` in __spark_entry__.py.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def newest_rows() -> tuple[dict[str, int], int]:
    """query -> latest round with a driver row; plus the latest round seen."""
    latest: dict[str, int] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=50)
    ap.add_argument(
        "--changed",
        default="",
        help="comma-separated queries whose code changed this round",
    )
    ap.add_argument(
        "--apply",
        action="store_true",
        help="splice the generated list into __spark_entry__.py's"
        " _PRIORITY block (the comment stays mechanical, per the r9"
        " verdict) instead of printing for manual paste",
    )
    args = ap.parse_args()

    from redpanda_spark.plans.queries import QUERIES

    catalog = list(QUERIES)
    order = {q: i for i, q in enumerate(catalog)}
    latest, max_round = newest_rows()
    this_round = max_round + 1

    changed = [q for q in args.changed.split(",") if q]
    unknown = [q for q in changed if q not in order]
    if unknown:
        print(f"error: --changed queries not in catalog: {unknown}", file=sys.stderr)
        return 2

    new = [q for q in catalog if q not in latest]
    rest = sorted(
        (q for q in catalog if q in latest and q not in changed),
        key=lambda q: (latest[q], order[q]),
    )
    rotation = new + [q for q in changed if q not in new] + rest

    body_lines = []
    for i, q in enumerate(rotation):
        tag = "new" if q not in latest else (
            "changed" if q in changed else f"r{latest[q]}"
        )
        if i == args.slots:
            body_lines.append("  # ---- slot cutoff ----")
        body_lines.append(f'    "{q}",  # {tag}')

    if args.apply:
        entry_path = os.path.join(REPO, "__spark_entry__.py")
        src = open(entry_path).read()
        m = re.search(r"_PRIORITY = \[\n.*?\n\]", src, re.S)
        if not m:
            print("error: _PRIORITY block not found", file=sys.stderr)
            return 2
        block = "_PRIORITY = [\n" + "\n".join(
            l for l in body_lines if "slot cutoff" not in l
        ) + "\n]"
        open(entry_path, "w").write(src.replace(m.group(0), block))
        print(f"applied: {len(rotation)} entries written to _PRIORITY "
              f"(round {this_round}, slots {args.slots})")
    else:
        print(f"# rotation for round {this_round} (catalog {len(catalog)}, "
              f"slots {args.slots})")
        print("_PRIORITY = [")
        for l in body_lines:
            print(l)
        print("]")

    missed = rotation[args.slots:]
    stale = [q for q in missed if q in latest and this_round - latest[q] >= 2]
    print(f"\n# {len(rotation[:args.slots])} queries get rows this round; "
          f"{len(missed)} wait.")
    if stale:
        print(f"# STALENESS WARNING: {len(stale)} queries would exceed the "
              f"2-round invariant if they miss this round:")
        for q in stale:
            print(f"#   {q} (newest row r{latest[q]})")
    else:
        print("# staleness invariant holds: every query missing this round's "
              "slots has a row <=1 round old.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
