#!/usr/bin/env python
"""Feasibility simulation for the r17/r18 registration schedule
(r15 verdict #3): replay plan_next_window.plan_window over the
committed stamp history with each future window assumed green, and
assert the 3-round freshness bound at every round close through r20.

Schedule under test (the registry docstring's ROUND-17/18 PLAN):
  r17: +dedup_substring_cut, +dedup_substring_cut_stored  (171 -> 173)
  r18: +decontaminate_bloom_prefilter, +dedup_containment,
       +contamination_stored                              (173 -> 176)

Output (run at r16 build time, CORRECTNESS_r01..r15 committed):
  r16: deadline=34 free_slots=16 ages_at_close={0:50, 1:50, 2:45, 3:26}
  r17: deadline=26 free_slots=22 ages_at_close={0:50, 1:50, 2:50, 3:23}
  r18: deadline=23 free_slots=24 ages_at_close={0:50, 1:50, 2:50, 3:26}
  r19: deadline=26 free_slots=24 ages_at_close={0:50, 1:50, 2:50, 3:26}
  r20: deadline=26 free_slots=24 ages_at_close={0:50, 1:50, 2:50, 3:26}
Both registration sets fit without displacing a deadline entry; the
bound holds every round with >=16 free slots.

Usage: python scripts/simulate_rotation_r16.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import plan_next_window as P  # noqa: E402

from honors_p1_mapreduce_spark import registry  # noqa: E402

REGS = {
    17: ["dedup_substring_cut", "dedup_substring_cut_stored"],
    18: [
        "decontaminate_bloom_prefilter",
        "dedup_containment",
        "contamination_stored",
    ],
}


def main() -> None:
    newest, latest = P.newest_stamps(Path(__file__).resolve().parent.parent)
    sim_newest = dict(newest)
    sim_names = list(registry.QUERIES)
    for rnd in range(latest + 1, 21):
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
    print("BOUND HOLDS through r20; registry ends at", len(sim_names))


if __name__ == "__main__":
    main()
