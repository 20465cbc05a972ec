#!/usr/bin/env python
"""r17 optimization harness: time individual queries cold (memo reset,
min-of-N) with the noop sink, and dump .explain('formatted') plans.

Usage:
  python scripts/opt_measure.py time QUERY [QUERY...] [--n 2] [--count]
  python scripts/opt_measure.py plan QUERY [QUERY...] [--out DIR]

The bench's timed action is .count() on the reduced result; --count
reproduces that. Default is the noop sink (guide §1.4) so the timed
work includes materializing every column — for the tiny reduced
results both are within noise, but noop is the honest default for
isolating computation.
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
    ap.add_argument("mode", choices=["time", "plan"])
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--count", action="store_true")
    ap.add_argument("--out", default="plans/r17")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="opt_measure")
    names = list(registry.QUERIES) if args.queries == ["ALL"] else args.queries

    # warm the JVM + parquet footers once (same as bench.py)
    registry.QUERIES[names[0]](spark, sf_dir).count()
    spark.catalog.clearCache()
    registry.reset_memos()

    if args.mode == "plan":
        out = Path(args.out)
        out.mkdir(parents=True, exist_ok=True)
        suffix = os.environ.get("OPT_PLAN_SUFFIX", "before")
        for name in names:
            df = registry.QUERIES[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            p = out / f"{name}_{suffix}.txt"
            p.write_text(txt)
            n_ex = txt.count("Exchange")
            print(f"{name}: {n_ex} Exchange -> {p}")
            spark.catalog.clearCache()
            registry.reset_memos()
    else:
        for name in names:
            samples = []
            for _ in range(args.n):
                spark.sparkContext.setJobDescription(f"opt:{name}")
                t0 = time.perf_counter()
                df = registry.QUERIES[name](spark, sf_dir)
                if args.count:
                    df.count()
                else:
                    df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
                registry.reset_memos()
            print(f"{name}: min={min(samples)} samples={samples}")
    spark.stop()


if __name__ == "__main__":
    main()
