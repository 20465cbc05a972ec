#!/usr/bin/env python
"""Round-6 scale probe for the session's new operators.

Builds enlarged copies of the driver tables (shifted-id unions of
sf0.1 — same text distribution, denser realistic structure) in a temp
dir shaped like an sf dir, then times each new operator at 1x and Nx:

- token_budget_select at 20x documents (100k docs): the claim is that
  only the tiny ppm-bucket histogram and the ONE boundary bucket pay
  anything beyond the feature scan — time should scale ~linearly with
  the scan, never like a global sort.
- events_value_outliers at 10x events (1M rows): two scans + a
  5-row broadcast — should be purely scan-bound.
- bpe_encode_stats at 20x documents: the vocabulary is IDENTICAL
  across copies (same words), so the vocab-side merge training and
  encode cost is CONSTANT and only the corpus-side stream join grows
  — the operator's central scale claim.

Usage: python scripts/probe_r6_scale.py
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

from honors_p1_mapreduce_spark.operators.bpe_encode import bpe_encode_stats  # noqa: E402
from honors_p1_mapreduce_spark.operators.curation_ext import (  # noqa: E402
    events_value_outliers,
    token_budget_select,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
DOC_COPIES = 20
EV_COPIES = 10


def main() -> None:
    spark = get_spark(app_name="probe_r6_scale")
    work = Path(tempfile.mkdtemp(prefix="r6_scale_"))
    out: dict = {"doc_copies": DOC_COPIES, "ev_copies": EV_COPIES}

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    big_docs = docs
    for i in range(1, DOC_COPIES):
        big_docs = big_docs.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
        )
    big_docs.repartition(32).write.parquet(str(work / "documents.parquet"))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_ev = ev.count()
    big_ev = ev
    for i in range(1, EV_COPIES):
        big_ev = big_ev.unionByName(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * n_ev))
        )
    big_ev.repartition(32).write.parquet(str(work / "events.parquet"))

    def timed(fn, sf_dir: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        secs = time.perf_counter() - t0
        spark.catalog.clearCache()
        return round(secs, 2), n

    for name, fn, copies in [
        ("token_budget_select", token_budget_select, DOC_COPIES),
        ("events_value_outliers", events_value_outliers, EV_COPIES),
        ("bpe_encode_stats", bpe_encode_stats, DOC_COPIES),
    ]:
        t1, n1 = timed(fn, SF)
        tn, nn = timed(fn, str(work))
        out[name] = {
            "t_1x_s": t1,
            f"t_{copies}x_s": tn,
            "rows_1x": n1,
            f"rows_{copies}x": nn,
            "time_ratio": round(tn / t1, 2),
            "data_ratio": copies,
        }
        print(f"{name}: 1x {t1}s -> {copies}x {tn}s (ratio {tn/t1:.1f})",
              file=sys.stderr)

    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
