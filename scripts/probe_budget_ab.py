#!/usr/bin/env python
"""A/B: the histogram-cutoff selection stage of token_budget_select
vs the naive GLOBAL-WINDOW formulation.

Two measurements, because they answer different questions:

1. Full pipeline at corpus scale (sf0.1 and 20x): here the tokenizer
   feature pass dominates and a 100k-row single-task sort is free, so
   the two formulations tie (measured: histogram 5.5 s / global 1.4 s
   at 1x — the histogram's extra jobs actually cost more at toy
   scale; 12.8 s vs 11.9 s at 20x, converging). The histogram plan is
   NOT chosen for demo-scale wall time.

2. Selection stage isolated on synthetic (doc_id, qb, bpe_tokens)
   frames at 5M / 50M rows: an unpartitioned window collapses to ONE
   task, so the whole frame serializes through one core (and must fit
   one task's memory — the actual 100 TB killer). The histogram path
   aggregates 1000 buckets distributed and only the boundary bucket
   (~1/1000 of rows) sees a window. Identical selected sets asserted
   via (count, token-sum) on both arms.

Usage: python scripts/probe_budget_ab.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from honors_p1_mapreduce_spark.operators.curation_ext import (  # noqa: E402
    BUDGET_DEN,
    BUDGET_NUM,
    budget_select_docs,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

N_QB = 1000


def naive_select_docs(feats):
    """Global-window formulation (the rejected plan): one unpartitioned
    cumulative window over every row."""
    tot = feats.agg(F.sum("bpe_tokens").alias("total"))
    w = Window.orderBy(F.desc("qb"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = feats.join(F.broadcast(tot)).withColumn(
        "cum", F.sum("bpe_tokens").over(w)
    )
    return ranked.filter(
        F.col("cum") * BUDGET_DEN <= F.col("total") * BUDGET_NUM
    ).select("doc_id", "bpe_tokens")


def synth(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 2654435761 % N_QB).alias("qb"),
        (100 + F.col("id") % 900).alias("bpe_tokens"),
    )


def main() -> None:
    spark = get_spark(app_name="probe_budget_ab")
    out: dict = {"n_qb_buckets": N_QB}
    for n in (5_000_000, 50_000_000):
        feats = synth(spark, n).localCheckpoint()
        res = {}
        for arm, fn in [("histogram", budget_select_docs), ("global_window", naive_select_docs)]:
            t0 = time.perf_counter()
            agg = fn(feats).agg(
                F.count("*").alias("n"), F.sum("bpe_tokens").alias("t")
            ).collect()[0]
            res[arm] = {
                "s": round(time.perf_counter() - t0, 2),
                "n": agg["n"],
                "tokens": agg["t"],
            }
            spark.catalog.clearCache()
        assert (res["histogram"]["n"], res["histogram"]["tokens"]) == (
            res["global_window"]["n"],
            res["global_window"]["tokens"],
        ), f"arms diverge at n={n}"
        out[f"{n//1_000_000}M_rows"] = {
            "histogram_s": res["histogram"]["s"],
            "global_window_s": res["global_window"]["s"],
            "selected": res["histogram"]["n"],
            "identical_selection": True,
            "speedup": round(
                res["global_window"]["s"] / res["histogram"]["s"], 2
            ),
        }
        print(out[f"{n//1_000_000}M_rows"], file=sys.stderr)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
