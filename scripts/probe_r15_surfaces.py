#!/usr/bin/env python
"""10x scale probe for the r15-built library surfaces (registration
evidence for the r18 plan, the build-then-register rhythm's
probe-at-build-time discipline):

- decontaminate_bloom_prefilter vs contamination_check at 1x and 10x:
  the bloom path's claim is CONSTANT broadcast memory (16 kB bitmap at
  any eval size) with the same map-side train reduction — wall time
  should track the exact path (both are one corpus scan + eval-sized
  tails), and the row sets must stay equal at both scales.
- containment_pairs at 1x and 10x: the df-cap bounds per-shingle join
  fanout exactly as in ngram_jaccard (same skeleton), so wall time
  should grow ~linearly in corpus size, not quadratically in copies.

Corpus enlargement mirrors probe_r9..r15: string-rotated copies.

Usage: python scripts/probe_r15_surfaces.py  (writes JSON to stdout)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.operators.curation import (  # noqa: E402
    contamination_check,
    decontaminate_bloom_prefilter,
)
from honors_p1_mapreduce_spark.operators.dedup import (  # noqa: E402
    containment_pairs,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
COPIES = 10


def main() -> None:
    spark = get_spark(app_name="probe_r15_surfaces")
    work = Path(tempfile.mkdtemp(prefix="r15_surf_"))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    big = docs
    for i in range(1, COPIES):
        off = 7 * i + 1
        big = big.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
            .withColumn(
                "text",
                F.concat(
                    F.expr(f"substring(text, {off + 1})"),
                    F.expr(f"substring(text, 1, {off})"),
                ),
            )
        )
    big.repartition(32).write.parquet(str(work / "documents.parquet"))

    def timed(fn, sf_dir):
        spark.catalog.clearCache()
        registry.reset_memos()
        t0 = time.perf_counter()
        rows = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        return round(time.perf_counter() - t0, 2), rows

    out: dict = {"copies": COPIES, "sf": SF}
    # warm codegen once per operator shape, untimed
    for fn in (contamination_check, decontaminate_bloom_prefilter,
               containment_pairs):
        timed(fn, SF)

    for name, fn in (
        ("contamination_check", contamination_check),
        ("decontaminate_bloom_prefilter", decontaminate_bloom_prefilter),
        ("containment_pairs", containment_pairs),
    ):
        t1, r1 = timed(fn, SF)
        tn, rn = timed(fn, str(work))
        out[name] = {
            "t_1x_s": t1,
            f"t_{COPIES}x_s": tn,
            "time_ratio": round(tn / t1, 2),
            "rows_1x": len(r1),
            f"rows_{COPIES}x": len(rn),
        }
        print(f"{name}: 1x {t1}s -> {COPIES}x {tn}s", file=sys.stderr)
        if name == "contamination_check":
            exact_rows = (r1, rn)
        if name == "decontaminate_bloom_prefilter":
            out[name]["equals_exact_1x"] = r1 == exact_rows[0]
            out[name][f"equals_exact_{COPIES}x"] = rn == exact_rows[1]

    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
