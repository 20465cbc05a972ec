#!/usr/bin/env python
"""r18: interleaved A/B of runtime-settable parallelism confs within
ONE JVM — the r17 protocol (alternating arms per query, bench .count()
protocol, memo reset + clearCache between samples, min-of-N per arm).

Arms are named sets of runtime SQL confs (set before each sample,
restored after), so both arms share host conditions and the JVM.

Usage:
  python scripts/ab_conf_r18.py QUERY [QUERY...] [--n 3] \
      [--arms base,aqe_size,sp8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

ARMS: dict[str, dict[str, str]] = {
    # current defaults (explicit, so switching back is deterministic)
    "base": {},
    # guide §2.2: let AQE size post-shuffle partitions by bytes
    # instead of core count (parallelismFirst=true is the default,
    # which targets defaultParallelism partitions regardless of size)
    "aqe_size": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    },
    # diagnostic: raw shuffle-partition count at the low-core value
    "sp8": {"spark.sql.shuffle.partitions": "8"},
    # diagnostic: AQE re-optimization overhead at bench scale
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "sp8_aqe": {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    },
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--arms", default="base,aqe_size")
    args = ap.parse_args()
    arm_names = args.arms.split(",")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_conf_r18")
    defaults = {
        k: spark.conf.get(k, None)
        for arm in arm_names
        for k in ARMS[arm]
    }
    registry.QUERIES[args.queries[0]](spark, sf_dir).count()  # warm JVM
    spark.catalog.clearCache()
    registry.reset_memos()

    def set_arm(arm: str) -> None:
        for k, v in defaults.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        for k, v in ARMS[arm].items():
            spark.conf.set(k, v)

    def sample(name: str, arm: str) -> float:
        set_arm(arm)
        spark.sparkContext.setJobDescription(f"ab:{name}:{arm}")
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).count()
        secs = time.perf_counter() - t0
        spark.catalog.clearCache()
        registry.reset_memos()
        return round(secs, 3)

    out: dict[str, dict] = {}
    for name in args.queries:
        res: dict[str, list[float]] = {a: [] for a in arm_names}
        for i in range(args.n):
            order = arm_names if i % 2 == 0 else arm_names[::-1]
            for arm in order:
                res[arm].append(sample(name, arm))
        mins = {a: min(v) for a, v in res.items()}
        best = min(mins, key=mins.get)
        out[name] = {"samples": res, "min": mins, "best": best}
        print(
            f"{name}: "
            + "  ".join(f"{a}={mins[a]:.2f}" for a in arm_names)
            + f"  -> {best}",
            flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
