#!/usr/bin/env python
"""Feasibility simulation for the r18/r19/r20 registration schedule
(r16 verdict #5, updated r17): replay plan_next_window.plan_window
over the committed stamp history with each future window assumed
green, and assert the 3-round freshness bound at every round close
through r21.

Schedule under test (the registry docstring's ROUND-18/19/20 plans;
the r17 pair is ALREADY registered in this tree and appears to the
r17 window as never-stamped-mandatory):
  r18: +decontaminate_bloom_prefilter, +dedup_containment,
       +contamination_stored                              (173 -> 176)
  r19: +corpus_snapshot_diff, +winnow_index_refresh,
       +winnow_index_refresh_stored                       (176 -> 179)
  r20: +pq_index_refresh                                  (179 -> 180)

Usage: python scripts/simulate_rotation_r17.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import plan_next_window as P  # noqa: E402

from honors_p1_mapreduce_spark import registry  # noqa: E402

REGS = {
    18: [
        "decontaminate_bloom_prefilter",
        "dedup_containment",
        "contamination_stored",
    ],
    19: [
        "corpus_snapshot_diff",
        "winnow_index_refresh",
        "winnow_index_refresh_stored",
    ],
    20: ["pq_index_refresh"],
}
HORIZON = 21


def main() -> None:
    newest, latest = P.newest_stamps(Path(__file__).resolve().parent.parent)
    sim_newest = dict(newest)
    sim_names = list(registry.QUERIES)
    for rnd in range(latest + 1, HORIZON + 1):
        reg = REGS.get(rnd, [])
        if reg:
            sim_names = sim_names + reg
            plan = P.plan_window(
                [n for n in sim_names if n not in reg],
                sim_newest,
                rnd,
                register=reg,
            )
        else:
            plan = P.plan_window(sim_names, sim_newest, rnd)
        n_deadline = sum(1 for _, r in plan if r.startswith("deadline"))
        for n, _ in plan:
            sim_newest[n] = rnd
        stale = [n for n in sim_names if rnd - sim_newest.get(n, -99) > P.BOUND]
        ages: dict[int, int] = {}
        for n in sim_names:
            a = rnd - sim_newest[n]
            ages[a] = ages.get(a, 0) + 1
        print(
            f"r{rnd}: registry={len(sim_names)} deadline={n_deadline} "
            f"regs={len(reg)} free_slots={50 - n_deadline - len(reg)} "
            f"ages_at_close={dict(sorted(ages.items()))} stale={len(stale)}"
        )
        if stale:
            raise SystemExit(f"BOUND VIOLATED at r{rnd}: {stale}")
    print(f"BOUND HOLDS through r{HORIZON}; registry ends at", len(sim_names))


if __name__ == "__main__":
    main()
