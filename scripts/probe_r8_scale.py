#!/usr/bin/env python
"""Round-8 scale probe for the session's new operators.

Builds an enlarged documents table (shifted-id union of sf0.1 — same
text distribution, 10x rows) in a temp dir shaped like an sf dir,
then times each new operator at 1x and 10x with cold memos:

- dedup_incremental: batch fingerprints broadcast + one fp_hash
  equi-join against the index side — should scale with the
  fingerprint scan (~linear), never like a self-join. Its enlarged
  corpus uses LETTER-ROTATED copies (translate), not verbatim ones:
  verbatim 10x duplication makes every fingerprint's document
  frequency cross the df-cap (each doc's shingles become
  "boilerplate" by definition), collapsing the output to 0 — a real
  property of the cap, not an operator bug. Rotation keeps each copy
  a distinct corpus slice with the same near-dup structure, so the
  1x pair set reappears per copy.
- media_avi_decode: container synth is pure Catalyst, the decode +
  frame sampling is an embarrassingly parallel mapInPandas —
  expected ~linear (scan-bound).
- decontaminate_stored: write-index + read-back + broadcast-join
  drop-list — the index write is the dominant new cost and is itself
  one map-only extraction pass, so ~linear.

Usage: python scripts/probe_r8_scale.py
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
from honors_p1_mapreduce_spark.operators.multimodal import (  # noqa: E402
    media_avi_decode,
)
from honors_p1_mapreduce_spark.operators.winnow import (  # noqa: E402
    decontaminate_stored,
    dedup_incremental,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
DOC_COPIES = 10


def main() -> None:
    spark = get_spark(app_name="probe_r8_scale")
    work = Path(tempfile.mkdtemp(prefix="r8_scale_"))
    out: dict = {"doc_copies": DOC_COPIES}

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    big_docs = docs
    rotalpha = "etaoinshrd"
    for i in range(1, DOC_COPIES):
        rot = rotalpha[i:] + rotalpha[:i]
        big_docs = big_docs.unionByName(
            docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * n_docs)
            ).withColumn("text", F.translate("text", rotalpha, rot))
        )
    big_docs.repartition(32).write.parquet(str(work / "documents.parquet"))

    def timed(fn, sf_dir: str) -> tuple[float, int]:
        spark.catalog.clearCache()
        registry.reset_memos()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        secs = time.perf_counter() - t0
        return round(secs, 2), n

    for name, fn in [
        ("dedup_incremental", dedup_incremental),
        ("media_avi_decode", media_avi_decode),
        ("decontaminate_stored", decontaminate_stored),
    ]:
        timed(fn, SF)  # warm codegen/JVM once per operator shape
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
