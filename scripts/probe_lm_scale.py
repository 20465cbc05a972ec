#!/usr/bin/env python
"""Round-7 scale probe for the LM-scoring / boilerplate family — the
one round-6 family without a recorded probe (verdict #8).

Builds a shifted-id 10x union of sf0.1 documents in a temp sf-shaped
dir and times lm_bigram_score, lm_interp_score and chunk_boilerplate
at 1x and 10x. After the round-7 single-scan fix (persisted
tokenized/occurrence projections) all three should be scan-bound:
time ratio ~ data ratio, never superlinear — the model build
aggregates the cached occurrence frame on vocab-sized keys and the
scoring join is O(occurrences), so nothing grows faster than the
corpus itself.

Usage: python scripts/probe_lm_scale.py
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

from honors_p1_mapreduce_spark.operators.lm_quality import (  # noqa: E402
    lm_bigram_score,
    lm_interp_score,
)
from honors_p1_mapreduce_spark.operators.text_analysis import (  # noqa: E402
    chunk_boilerplate,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
DOC_COPIES = 10


def main() -> None:
    spark = get_spark(app_name="probe_lm_scale")
    work = Path(tempfile.mkdtemp(prefix="lm_scale_"))
    out: dict = {"doc_copies": DOC_COPIES}

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    big = docs
    for i in range(1, DOC_COPIES):
        big = big.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
        )
    big.repartition(32).write.parquet(str(work / "documents.parquet"))

    def timed(fn, sf_dir: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        secs = time.perf_counter() - t0
        spark.catalog.clearCache()
        return round(secs, 2), n

    for name, fn in [
        ("lm_bigram_score", lm_bigram_score),
        ("lm_interp_score", lm_interp_score),
        ("chunk_boilerplate", chunk_boilerplate),
    ]:
        t1, n1 = timed(fn, SF)
        tn, nn = timed(fn, str(work))
        out[name] = {
            "t_1x_s": t1,
            f"t_{DOC_COPIES}x_s": tn,
            "rows_1x": n1,
            f"rows_{DOC_COPIES}x": nn,
            "time_ratio": round(tn / t1, 2),
            "data_ratio": DOC_COPIES,
        }
        print(
            f"{name}: 1x {t1}s -> {DOC_COPIES}x {tn}s (ratio {tn/t1:.1f})",
            file=sys.stderr,
        )

    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
