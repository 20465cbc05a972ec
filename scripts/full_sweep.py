#!/usr/bin/env python
"""Full-registry sweep: the driver-style compare (rows + schema +
order-insensitive value hash vs DuckDB at sf0.01) for EVERY registry
entry, not just the current 50-entry driver window — proves the
rotation blocks outside the window carry no latent reds before a
round closes. Produced R12_FULL_SWEEP.json ad hoc in r12; this is the
committed runner (r13).

Output (stdout): {name: {"status": "green"|"no_oracle"|"red"|"error",
"sec": t}, ...} in registry order. "no_oracle" = the sanctioned
rows-only twins, EXECUTED (count()) but not hash-compared — the same
weaker check the driver records for them. Exit code 1 if any red or
error.

Usage: python scripts/full_sweep.py > R13_FULL_SWEEP.json
       FULL_SWEEP_SF=/root/testdata/sf0.001 python scripts/full_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("FULL_SWEEP_SF", "/root/testdata/sf0.01")


def main() -> int:
    from tests.oracle import compare_query

    spark = get_spark(app_name="full_sweep")
    out: dict[str, dict] = {}
    bad = 0
    for name, fn in registry.QUERIES.items():
        spark.catalog.clearCache()
        registry.reset_memos()
        oracle = registry.ORACLES.get(name)
        t0 = time.perf_counter()
        try:
            if oracle is None:
                fn(spark, SF).count()
                status = "no_oracle"
            else:
                compare_query(spark, SF, fn, oracle)
                status = "green"
        except AssertionError:
            status = "red"
            bad += 1
        except Exception as ex:  # noqa: BLE001 — a sweep must finish
            status = f"error: {type(ex).__name__}"
            bad += 1
        sec = round(time.perf_counter() - t0, 1)
        out[name] = {"status": status, "sec": sec}
        print(f"{status:>10}  {sec:>7.1f}s  {name}", file=sys.stderr)
    print(json.dumps(out, indent=1))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
