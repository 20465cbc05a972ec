#!/usr/bin/env python
"""Interleaved A/B of ADDING the wide_scan repartition at a candidate
call-site module, within ONE JVM. The 'on' arm monkeypatches that
module's ``load_table`` so its documents reads pass wide_scan=True;
the 'off' arm restores the original. Existing wide_scan winners keep
their repartition in BOTH arms (SPARK_GRAFT_SCAN_PAR stays 1), so the
comparison isolates the candidate site.

Usage: python scripts/ab_wide_site.py MODULE QUERY [QUERY...] [--n 3]
  MODULE: pipeline | text_analysis | curation | dedup
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("module")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    mod = importlib.import_module(
        f"honors_p1_mapreduce_spark.operators.{args.module}"
    )
    orig = mod.load_table

    def wide(spark, sf_dir, name, wide_scan=False):
        return orig(
            spark, sf_dir, name, wide_scan=wide_scan or name == "documents"
        )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_wide_site")
    registry.QUERIES[args.queries[0]](spark, sf_dir).count()  # warm JVM
    spark.catalog.clearCache()
    registry.reset_memos()

    def sample(name: str, arm: str) -> float:
        mod.load_table = wide if arm == "on" else orig
        spark.sparkContext.setJobDescription(f"abw:{name}:{arm}")
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).count()
        secs = time.perf_counter() - t0
        spark.catalog.clearCache()
        registry.reset_memos()
        return round(secs, 3)

    try:
        for name in args.queries:
            res: dict[str, list[float]] = {"on": [], "off": []}
            order = ["on", "off"]
            for i in range(args.n):
                for arm in (order if i % 2 == 0 else order[::-1]):
                    res[arm].append(sample(name, arm))
            print(
                f"RESULT {args.module}/{name}: on_min={min(res['on'])} "
                f"off_min={min(res['off'])} on={res['on']} off={res['off']}",
                flush=True,
            )
    finally:
        mod.load_table = orig
    spark.stop()


if __name__ == "__main__":
    main()
