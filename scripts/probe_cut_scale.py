#!/usr/bin/env python
"""Substring-cut scale probe (r14): the registration evidence the
r17 backlog entries will carry, gathered at build time like every
prior family (R10_AUDIO_PROBE / R13_VIDEO_PROBE precedent):

- dedup_substring_cut at 1x vs 10x rotated corpus — the pipeline is
  the span family's shuffles plus one doc_id join and a map-only
  rewrite, so wall time should scale near-linearly with the corpus
  (nothing pairwise anywhere);
- the stored-serve path (substring_cut_from_index against a
  pre-built gram index) at both scales — the per-batch serve cost
  once the corpus-wide duplication aggregate is an artifact;
- cut volume (docs with cuts, tokens cut) per scale, so the probe
  is visibly non-vacuous.

Corpus enlargement mirrors probe_r9..r14_scale.py: documents are
STRING-ROTATED per copy so every copy is a distinct corpus slice
(rotation shifts token boundaries -> new grams AND preserves each
copy's internal duplicates).

Usage: python scripts/probe_cut_scale.py  (writes JSON to stdout)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.operators.substring_dedup import (  # noqa: E402
    dedup_substring_cut,
    substring_cut_from_index,
    substring_write_index,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PROBE_SF", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("PROBE_COPIES", "10"))


def main() -> None:
    spark = get_spark(app_name="probe_cut_scale")
    work = Path(tempfile.mkdtemp(prefix="cut_scale_"))
    out: dict = {"copies": COPIES}

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

    def run(sf_dir: str, label: str) -> dict:
        spark.catalog.clearCache()
        registry.reset_memos()
        t0 = time.perf_counter()
        agg = (
            dedup_substring_cut(spark, sf_dir)
            .agg(
                F.count("*").alias("n_docs"),
                F.sum((F.col("n_cut") > 0).cast("int")).alias(
                    "docs_with_cuts"
                ),
                F.sum("n_cut").alias("tokens_cut"),
                F.sum("n_tokens").alias("tokens_total"),
            )
            .collect()[0]
        )
        t_online = round(time.perf_counter() - t0, 2)
        # stored serve: index built untimed, serve timed — the
        # recurring per-batch cost the artifact exists to expose
        d = str(work / f"idx_{label}")
        substring_write_index(spark, sf_dir, d)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        substring_cut_from_index(spark, sf_dir, d).agg(
            F.sum("n_cut")
        ).collect()
        t_serve = round(time.perf_counter() - t0, 2)
        res = {
            "t_online_s": t_online,
            "t_serve_s": t_serve,
            "n_docs": agg["n_docs"],
            "docs_with_cuts": agg["docs_with_cuts"],
            "tokens_cut": int(agg["tokens_cut"]),
            "tokens_total": int(agg["tokens_total"]),
        }
        print(f"{label}: {res}", file=sys.stderr)
        return res

    run(SF, "warm")  # warm codegen/JVM once
    out["1x"] = run(SF, "1x")
    out[f"{COPIES}x"] = run(str(work), f"{COPIES}x")
    out["time_ratio_online"] = round(
        out[f"{COPIES}x"]["t_online_s"] / out["1x"]["t_online_s"], 2
    )
    out["time_ratio_serve"] = round(
        out[f"{COPIES}x"]["t_serve_s"] / out["1x"]["t_serve_s"], 2
    )
    out["data_ratio"] = COPIES
    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
