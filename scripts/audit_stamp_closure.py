#!/usr/bin/env python
"""Cross-round stamp-closure audit.

Replicates the judge's check: the union of driver green hash-matches
over all CORRECTNESS_r*.json files, plus the CURRENT first-50 registry
window (the entries the driver will stamp at this round's end), must
cover every oracle-backed registry query.  Reports:

- never-stamped oracle-backed queries (the failure mode to avoid:
  a query registered but never hash-verified by the driver),
- rows-only twins found inside the window (policy: twins ride on
  their oracle-green exact sibling + agreement pytest; they may hold
  a window slot only deliberately),
- staleness histogram of non-window entries (how many rounds ago the
  tail was last stamped — informs the next window rotation).

Run before finalizing a round's window:  python scripts/audit_stamp_closure.py
Exits non-zero if any oracle-backed query would end the round
never-stamped.
"""

from __future__ import annotations

import glob
import json
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from honors_p1_mapreduce_spark import registry  # noqa: E402

WINDOW = 50


def main() -> int:
    from plan_next_window import round_of  # the one shared parse

    stamped: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = round_of(path)
        if rnd is None:  # suffixed artifacts (e.g. *_r12_builder.json)
            continue
        with open(path) as f:
            data = json.load(f)
        queries = data.get("queries", data)
        for name, rec in queries.items():
            # DELIBERATELY stricter than plan_next_window.is_valid_stamp
            # (r12 advisor asked which consumer is right: both are).
            # The planner's predicate also accepts sanctioned
            # `no_oracle` twin EXECUTIONS, because rotation cadence
            # tracks "did the driver run it recently". This audit
            # tracks ORACLE CLOSURE — "has every oracle-backed query
            # ever been hash-verified" — so a rows-only execution
            # must not count as a stamp here; twins are out of scope
            # (they ride on their oracle-green exact sibling + the
            # agreement pytest, see the registry rows-only policy).
            if isinstance(rec, dict) and (
                rec.get("hash_match") or rec.get("match")
            ):
                # numeric max, not last-glob-wins: CORRECTNESS_r100
                # sorts lexicographically BETWEEN r10 and r11 (r12
                # reviewer — latent >=r100 ordering bug)
                stamped[name] = max(rnd, stamped.get(name, 0))

    names = list(registry.QUERIES)
    oracles = set(registry.ORACLES)
    window = names[:WINDOW]
    oracle_backed = [q for q in names if q in oracles]
    covered = set(stamped) | set(window)

    never = [q for q in oracle_backed if q not in covered]
    twins_in_window = [q for q in window if q not in oracles]
    tail_staleness = Counter(
        stamped.get(q, 0) for q in names[WINDOW:] if q in oracles
    )

    print(f"registry: {len(names)} queries / {len(oracles)} oracle-backed")
    print(f"driver stamp union: {len(stamped)} queries")
    print(f"window (first {WINDOW}): {len(window)} entries")
    print(f"never-stamped after this window: {never or 'NONE'}")
    print(f"rows-only twins in window: {twins_in_window or 'NONE'}")
    print(f"tail last-stamped-round histogram: {dict(sorted(tail_staleness.items()))}")
    return 1 if never else 0


if __name__ == "__main__":
    raise SystemExit(main())
