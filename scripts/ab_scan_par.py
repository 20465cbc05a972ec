#!/usr/bin/env python
"""Interleaved A/B of the scan-parallelize trigger (SPARK_GRAFT_SCAN_PAR)
within ONE JVM: alternating on/off samples per query (bench .count()
protocol, memo reset + clearCache between samples, min-of-N per arm).
The env flag is read at plan-build time, so toggling os.environ between
samples flips the arm without a session restart.

Usage: python scripts/ab_scan_par.py QUERY [QUERY...] [--n 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_scan_par")
    registry.QUERIES[args.queries[0]](spark, sf_dir).count()  # warm JVM
    spark.catalog.clearCache()
    registry.reset_memos()

    def sample(name: str, arm: str) -> float:
        os.environ["SPARK_GRAFT_SCAN_PAR"] = "1" if arm == "on" else "0"
        spark.sparkContext.setJobDescription(f"ab:{name}:{arm}")
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).count()
        secs = time.perf_counter() - t0
        spark.catalog.clearCache()
        registry.reset_memos()
        return round(secs, 3)

    for name in args.queries:
        res: dict[str, list[float]] = {"on": [], "off": []}
        order = ["on", "off"]
        for i in range(args.n):
            for arm in (order if i % 2 == 0 else order[::-1]):
                res[arm].append(sample(name, arm))
        print(
            f"RESULT {name}: on_min={min(res['on'])} off_min={min(res['off'])} "
            f"on={res['on']} off={res['off']}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
