#!/usr/bin/env python
"""One-off r17 rotation: regenerate registry.QUERIES in the order
``plan_next_window.py --register dedup_substring_cut
dedup_substring_cut_stored`` mandates (the two failing tripwire tests'
work order), registering the substring-cut pair (registry 171 -> 173).

Mechanics: parse registry.py with ast, pull each QUERIES entry's value
source verbatim, re-emit the dict with the planned 50-entry window
first (section comments regenerated — the r15 ADVICE convention),
then the tail oldest-stamp-first grouped by stamp round. ORACLES gains
the pair's two entries (one oracle each; the stored twin shares the
cut family's roundtrip-equality gate)."""

from __future__ import annotations

import ast
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import plan_next_window as planner  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
REG = REPO / "honors_p1_mapreduce_spark" / "registry.py"

REGISTER = ["dedup_substring_cut", "dedup_substring_cut_stored"]
NEW_QUERY_VALUES = {
    "dedup_substring_cut": "_ss.dedup_substring_cut",
    "dedup_substring_cut_stored": "_ss.dedup_substring_cut_stored",
}
NEW_ORACLE_VALUES = {
    "dedup_substring_cut": "_ss.DEDUP_SUBSTRING_CUT_ORACLE",
    "dedup_substring_cut_stored": "_ss.DEDUP_SUBSTRING_CUT_STORED_ORACLE",
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
    assert building == 17, f"expected to build r17, history says r{building}"

    names = [n for n, _ in queries]
    plan = planner.plan_window(names, newest, building, register=REGISTER)
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
        "    # --- [r17 window, 1-26] the 26 r13-stamped deadline entries\n"
        "    # (age 4 at r17 close otherwise — the hard deadline; they\n"
        "    # lead by planner rule, ``plan_next_window.py`` positions\n"
        "    # 1-26).\n"
    )
    emitted_new = emitted_fill = False
    for pos, n in enumerate(window, 1):
        if reasons[n] == "new registration" and not emitted_new:
            lines.append(
                "    # --- [r17 window, 27-28] the r14-built substring-cut\n"
                "    # pair REGISTERS (registry 171 -> 173, r16 verdict #1):\n"
                "    # the corpus REWRITE of the Lee et al. exact-substring\n"
                "    # span family (substring_dedup.py), online + stored\n"
                "    # cycle, roundtrip bit-identical so ONE oracle shape\n"
                "    # gates both. Judge-verified green 4/4 at\n"
                "    # sf0.001+sf0.01 in the r14 AND r15 sessions and again\n"
                "    # on the final r16 tree (R16_QUEUED_PREVERIFY.json);\n"
                "    # any driver red is regression, not design.\n"
            )
            emitted_new = True
        if reasons[n].startswith("pulled forward") and not emitted_fill:
            lines.append(
                "    # --- [r17 window, 29-50] oldest-stamp-first fill: 22\n"
                "    # of the r14-stamped block (CORRECTNESS_r14 order). No\n"
                "    # forced restamps: no code path under a stamped query\n"
                "    # changed between the r16 snapshot and this rotation.\n"
            )
            emitted_fill = True
        lines.append(fmt_entry(n, values[n]))
    lines.append(
        "    # ================ position 51+ — outside the r17 driver"
        " window =====\n"
        "    # Tail ordered oldest-stamp-first (the planner's fill rule),\n"
        "    # grouped by newest-stamp round. The leading r14-stamped\n"
        "    # block is the r18 deadline and LEADS the r18 window together\n"
        "    # with the r18 registrations (see the ROUND-18 plan in the\n"
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

    # ORACLES: keep current order, insert the pair after
    # dedup_substring_spans (its family neighbour).
    olines = ["ORACLES: dict[str, str] = {\n"]
    for n, v in oracles:
        olines.append(fmt_entry(n, v))
        if n == "dedup_substring_spans":
            olines.append(
                "    # r17 registrations — the cut pair (stored twin is\n"
                "    # roundtrip-bit-identical; separate oracle constants,\n"
                "    # same derivation):\n"
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
