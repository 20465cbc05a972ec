#!/usr/bin/env python
"""Compute the NEXT round's driver window mechanically from the
committed CORRECTNESS history + the registry — the rotation
arithmetic as executable code instead of a comment (r12; the r11
verdict #2 ruling's 3-round bound).

Rule implemented (the registry ordering note's invariants):
1. DEADLINE entries first: any entry whose newest stamp would be
   older than 3 rounds at the close of the round being built MUST be
   in the window (never-stamped registered entries count as deadline).
2. NEW registrations (passed via --register, in priority order) take
   the next slots — a query only counts as shipped when the driver
   stamps it, so it registers into the window of its first round.
   CHANGED-code-path entries (builder knowledge the history cannot
   derive; the media_image_neardup precedent) are passed via --force
   and take slots with the same priority.
3. Remaining slots fill oldest-stamp-first (ties: current registry
   order), pulling restamps forward so no future round overflows.

Prints the planned 50 names with their reasons, plus the resulting
stamp-age distribution at the built round's close. The r13 builder
reorders QUERIES to match and registers the --register names. The
pytest pin is tests/test_cli.py::test_window_covers_planner_mandatory:
every HISTORY-DERIVED mandatory entry (deadline / never-stamped) must
hold a window slot — a SUBSET guarantee, deliberately not equality,
because --register/--force are builder inputs the history cannot
reconstruct.

STAMP/REORDER PAIRING (r12 advisor): the rotation tests compute the
building round from the NEWEST committed CORRECTNESS_r*.json, so the
moment a driver stamp file lands, THIS planner's output becomes the
mandatory window and the tests fail until registry.QUERIES is
reordered to match. That one-commit gap is deliberate — the failing
test IS the next round's work order — but it means every round's
FIRST commit must be the rotation commit, and a new stamp file must
never sit in a tree whose registry still carries the previous window
for longer than that. (Same note in the registry ordering comment.)

Usage:
    python scripts/plan_next_window.py            # plan from history
    python scripts/plan_next_window.py --register media_clean_funnel ... \
        --force <entries whose code paths changed this round>
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WINDOW = 50
BOUND = 3  # newest stamp >= close - BOUND (r11 verdict #2 ruling)


def round_of(path: str) -> int | None:
    """Round number of a strict driver file ``CORRECTNESS_r<N>.json``,
    or None for suffixed artifacts (the ``*_r12_builder.json`` naming
    convention) — the ONE parse every consumer of the history shares
    (this module, the rotation tests, the closure audit; r12 reviewer:
    three near-copies of the parse had crept in and a suffixed file
    would have crashed int("12_builder"))."""
    import re

    m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", Path(path).name)
    return int(m.group(1)) if m else None


def is_valid_stamp(rec) -> bool:
    """True iff a CORRECTNESS record is usable freshness EVIDENCE: an
    oracle full-pass (hash_match/match true) or a sanctioned rows-only
    twin execution (err == "no_oracle" with spark_rows recorded).
    Failed compares and errored runs do NOT count (r12 reviewer: the
    first cut counted every key's presence, so a committed MISMATCH —
    the r03 media_decode_features shape — would have satisfied the
    3-round bound for 3 more rounds)."""
    if not isinstance(rec, dict):
        return False
    if rec.get("hash_match") or rec.get("match"):
        return True
    return rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None


def newest_stamps(repo: Path) -> tuple[dict[str, int], int]:
    """Newest VALID driver-stamp round per query name (see
    :func:`is_valid_stamp`), plus the latest round on record (numeric
    max, NOT lexicographic glob order — file r100 sorts between r10
    and r11)."""
    newest: dict[str, int] = {}
    latest = 0
    for path in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        rnd = round_of(path)
        if rnd is None:
            continue
        latest = max(latest, rnd)
        with open(path) as f:
            for name, rec in json.load(f).items():
                if is_valid_stamp(rec):
                    newest[name] = max(rnd, newest.get(name, 0))
    return newest, latest


def plan_window(
    names: list[str],
    newest: dict[str, int],
    building: int,
    register: list[str] = (),
    force: list[str] = (),
) -> list[tuple[str, str]]:
    """(name, reason) for the planned window of round ``building``.
    ``names`` is the registry order EXCLUDING the new registrations;
    ``register`` are the new names, highest priority first; ``force``
    are existing entries whose implementing code paths changed since
    their newest stamp (must restamp next window regardless of age —
    the retained r11-verdict #2 condition)."""
    plan: list[tuple[str, str]] = []
    for name in names:
        last = newest.get(name)
        if last is None or building - last > BOUND:
            plan.append((name, f"deadline (newest stamp {last})"))
    for name in register:
        plan.append((name, "new registration"))
    taken = {n for n, _ in plan}
    for name in force:
        if name not in taken:
            plan.append((name, "forced (code path changed)"))
    if len(plan) > WINDOW:
        raise SystemExit(
            f"window overflow: {len(plan)} mandatory entries > {WINDOW} — "
            "the bound cannot be met; retire entries or split registrations"
        )
    taken = {n for n, _ in plan}
    # oldest-first fill keeps every FUTURE round feasible too
    rest = sorted(
        (n for n in names if n not in taken),
        key=lambda n: (newest.get(n, 0), names.index(n)),
    )
    for name in rest[: WINDOW - len(plan)]:
        plan.append((name, f"pulled forward (newest stamp {newest.get(name)})"))
    return plan


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--register", nargs="*", default=[])
    ap.add_argument("--force", nargs="*", default=[])
    args = ap.parse_args()

    from honors_p1_mapreduce_spark import registry

    # validate builder inputs — a typo'd name must fail loudly, not
    # silently occupy a window slot and displace a real restamp
    known = set(registry.QUERIES)
    bad_force = [n for n in args.force if n not in known]
    if bad_force:
        raise SystemExit(f"--force names not in the registry: {bad_force}")
    already = [n for n in args.register if n in known]
    if already:
        raise SystemExit(
            f"--register names already registered (use --force for "
            f"changed-path restamps): {already}"
        )
    overlap = set(args.register) & set(args.force)
    if overlap:
        raise SystemExit(f"names in both --register and --force: {sorted(overlap)}")

    repo = Path(__file__).resolve().parent.parent
    newest, latest = newest_stamps(repo)
    building = latest + 1
    names = [n for n in registry.QUERIES if n not in set(args.register)]
    plan = plan_window(names, newest, building, args.register, args.force)

    print(f"# planned window for round {building} ({len(plan)} entries)")
    for i, (name, reason) in enumerate(plan, 1):
        print(f"{i:3d}  {name:40s} {reason}")
    planned = {n for n, _ in plan}
    ages = Counter(
        building - newest.get(n, building)
        for n in list(registry.QUERIES) + list(args.register)
        if n not in planned and n in newest
    )
    print(f"# stamp-age distribution OUTSIDE the window at r{building} close:")
    print("  " + ", ".join(f"age {a}: {c}" for a, c in sorted(ages.items())))
    worst = max(ages) if ages else 0
    print(f"# bound check: max outside age {worst} <= {BOUND}: {worst <= BOUND}")


if __name__ == "__main__":
    main()
