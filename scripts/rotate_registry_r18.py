#!/usr/bin/env python
"""One-off r18 rotation: regenerate registry.QUERIES in the order
``plan_next_window.py --register decontaminate_bloom_prefilter
dedup_containment contamination_stored --force lm_interp_score
lm_score_stored lm_model_retract`` mandates (the failing tripwire
test's work order), registering the r15-built curation trio
(registry 173 -> 176) and force-restamping the lm_* trio whose code
path moved through _lm_count_frames_from in r17.

Mechanics identical to rotate_registry_r17.py: parse registry.py with
ast, pull each QUERIES entry's value source verbatim, re-emit the dict
with the planned 50-entry window first, then the tail
oldest-stamp-first grouped by stamp round. ORACLES gains the trio's
three entries."""

from __future__ import annotations

import ast
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import plan_next_window as planner  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
REG = REPO / "honors_p1_mapreduce_spark" / "registry.py"

REGISTER = [
    "decontaminate_bloom_prefilter",
    "dedup_containment",
    "contamination_stored",
]
FORCE = ["lm_interp_score", "lm_score_stored", "lm_model_retract"]
NEW_QUERY_VALUES = {
    "decontaminate_bloom_prefilter": "_cu.decontaminate_bloom_prefilter",
    "dedup_containment": "_dd.containment_pairs",
    "contamination_stored": "_cu.contamination_stored",
}
NEW_ORACLE_VALUES = {
    "decontaminate_bloom_prefilter": (
        "_cu.DECONTAMINATE_BLOOM_PREFILTER_ORACLE"
    ),
    "dedup_containment": "_dd.CONTAINMENT_ORACLE",
    "contamination_stored": "_cu.CONTAMINATION_STORED_ORACLE",
}


def dict_entries(src: str, tree: ast.Module, name: str):
    """(key, value_source, dict_node) for assignment ``name = {...}``."""
    for node in tree.body:
        targets = []
        if isinstance(node, ast.Assign):
            targets = node.targets
            value = node.value
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            targets = [node.target]
            value = node.value
        else:
            continue
        for t in targets:
            if isinstance(t, ast.Name) and t.id == name:
                assert isinstance(value, ast.Dict)
                out = []
                for k, v in zip(value.keys, value.values):
                    assert isinstance(k, ast.Constant)
                    out.append((k.value, ast.get_source_segment(src, v)))
                return out, node
    raise KeyError(name)


def fmt_entry(name: str, value: str) -> str:
    line = f'    "{name}": {value},'
    if len(line) <= 79:
        return line + "\n"
    return f'    "{name}": (\n        {value}\n    ),\n'


def main() -> None:
    src = REG.read_text()
    tree = ast.parse(src)
    queries, qnode = dict_entries(src, tree, "QUERIES")
    oracles, onode = dict_entries(src, tree, "ORACLES")

    newest, latest = planner.newest_stamps(REPO)
    building = latest + 1
    assert building == 18, f"expected to build r18, history says r{building}"

    names = [n for n, _ in queries]
    plan = planner.plan_window(
        names, newest, building, register=REGISTER, force=FORCE
    )
    window = [n for n, _ in plan]
    assert len(window) == 50 and len(set(window)) == 50

    values = dict(queries)
    for n, v in NEW_QUERY_VALUES.items():
        assert n not in values
        values[n] = v
    index = {n: i for i, (n, _) in enumerate(queries)}
    tail = [n for n in values if n not in set(window)]
    tail.sort(key=lambda n: (newest.get(n, 0), index.get(n, 1 << 30)))

    reasons = dict(plan)
    lines = ["QUERIES: dict[str, QueryFn] = {\n"]
    lines.append(
        "    # --- [r18 window, 1-23] the 23 r14-stamped deadline entries\n"
        "    # (age 4 at r18 close otherwise — the hard deadline; they\n"
        "    # lead by planner rule).\n"
    )
    emitted_new = emitted_force = emitted_fill = False
    for pos, n in enumerate(window, 1):
        if reasons[n] == "new registration" and not emitted_new:
            lines.append(
                "    # --- [r18 window, 24-26] the r15-built curation trio\n"
                "    # REGISTERS (registry 173 -> 176, r15 verdict #3\n"
                "    # schedule / r17 verdict #8): Bloom-prefiltered exact\n"
                "    # decontamination (constant-size runtime filter, false\n"
                "    # positives cancel in the shared exact tail, so\n"
                "    # CONTAMINATION_ORACLE gates it), asymmetric n-gram\n"
                "    # containment (doc-in-doc mode Jaccard misses; own SQL\n"
                "    # oracle), and the exact tier's stored cycle\n"
                "    # (roundtrip-bit-identical, shared oracle). Parity\n"
                "    # green at sf0.001+sf0.01 at build time and re-verified\n"
                "    # on the final r16 tree (R15_QUEUED_PREVERIFY.json,\n"
                "    # R16_QUEUED_PREVERIFY.json); any driver red is\n"
                "    # regression, not design.\n"
            )
            emitted_new = True
        if reasons[n].startswith("forced") and not emitted_force:
            lines.append(
                "    # --- [r18 window, 27-29] FORCED RESTAMPS (the\n"
                "    # media_image_neardup precedent): the lm_* trio's code\n"
                "    # path moved when _lm_count_frames factored through\n"
                "    # _lm_count_frames_from (r17 snapshot-refresh delta\n"
                "    # passes, lm_quality.py). Behavior-identical\n"
                "    # (delegation only; pinned by the suite), but the\n"
                "    # freshness rule restamps on any code path move.\n"
            )
            emitted_force = True
        if reasons[n].startswith("pulled forward") and not emitted_fill:
            lines.append(
                "    # --- [r18 window, 30-50] oldest-stamp-first fill: 21\n"
                "    # of the r15-stamped block (CORRECTNESS_r15 order).\n"
            )
            emitted_fill = True
        lines.append(fmt_entry(n, values[n]))
    lines.append(
        "    # ================ position 51+ — outside the r18 driver"
        " window =====\n"
        "    # Tail ordered oldest-stamp-first (the planner's fill rule),\n"
        "    # grouped by newest-stamp round. The leading r15-stamped\n"
        "    # block is the r19 deadline and LEADS the r19 window together\n"
        "    # with the r19 registrations (see the ROUND-19 queue in the\n"
        "    # module docstring).\n"
    )
    last_stamp = None
    for n in tail:
        s = newest.get(n, 0)
        if s != last_stamp:
            lines.append(f"    # --- newest stamp r{s}:\n")
            last_stamp = s
        lines.append(fmt_entry(n, values[n]))
    lines.append("}")
    new_queries = "".join(lines)

    # ORACLES: keep current order, insert the trio after
    # contamination_check (its family neighbour).
    olines = ["ORACLES: dict[str, str] = {\n"]
    for n, v in oracles:
        olines.append(fmt_entry(n, v))
        if n == "contamination_check":
            olines.append(
                "    # r18 registrations — the curation trio (bloom\n"
                "    # prefilter + stored cycle share the exact tier's\n"
                "    # oracle; containment has its own):\n"
            )
            for m in REGISTER:
                olines.append(fmt_entry(m, NEW_ORACLE_VALUES[m]))
    olines.append("}")
    new_oracles = "".join(olines)

    src_lines = src.splitlines(keepends=True)

    def splice(text, node, replacement):
        start = sum(len(line) for line in src_lines[: node.lineno - 1])
        end = sum(len(line) for line in src_lines[: node.end_lineno - 1])
        end += node.end_col_offset
        return text[:start] + replacement + text[end:]

    # Splice bottom-up so offsets stay valid.
    first, second = sorted([qnode, onode], key=lambda n: n.lineno)
    repl = {id(qnode): new_queries, id(onode): new_oracles}
    out = splice(src, second, repl[id(second)])
    out = splice(out, first, repl[id(first)])
    ast.parse(out)  # syntax check before writing
    REG.write_text(out)
    print(f"rotated: window={len(window)}, tail={len(tail)}, "
          f"total={len(values)}, oracles={len(oracles) + len(REGISTER)}")


if __name__ == "__main__":
    main()
