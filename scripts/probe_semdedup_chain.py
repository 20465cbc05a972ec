#!/usr/bin/env python
"""Round-6 probe (VERDICT r5 item 6): semantic_dedup_fast promotion
evidence at sf0.1.

Part A — twin agreement at sf0.1 (2000 vectors, 4x the prior test SF):
run the oracle-checked portable variant and the Arrow/numpy fast twin
on the same corpus; record wall time for each, kept-count identity,
and per-vector kept-flag agreement (the pytest contract is >= 95%).

Part B — the fast twin inside a composed curation chain: extend the
corpus_clean_funnel (lang -> quality -> exact dedup -> winnow neardup)
with a 5th semantic-dedup stage that left-anti joins the surviving
documents against the drop set from the embeddings corpus
(vec_id <-> doc_id on the driver tables). Run the chain once with the
portable twin and once with the fast twin supplying the drop set,
asserting the final document counts agree, and record both chain
times — the evidence that the fast twin is a drop-in production
substitution, not just an isolated microbenchmark.

Usage: python scripts/probe_semdedup_chain.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from honors_p1_mapreduce_spark.operators.pipeline import _features  # noqa: E402
from honors_p1_mapreduce_spark.operators.pipeline import KEEP_LANG, QUALITY_MIN  # noqa: E402
from honors_p1_mapreduce_spark.operators.semdedup import (  # noqa: E402
    semantic_dedup,
    semantic_dedup_fast,
)
from honors_p1_mapreduce_spark.operators.winnow import winnow_neardup  # noqa: E402
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="probe_semdedup_chain")
    out: dict = {"sf_dir": sf_dir}

    # ---- Part A: twin agreement + isolated timings --------------------
    t0 = time.perf_counter()
    slow = {r["vec_id"]: r["kept"] for r in semantic_dedup(spark, sf_dir).collect()}
    t_slow = time.perf_counter() - t0
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fast = {r["vec_id"]: r["kept"] for r in semantic_dedup_fast(spark, sf_dir).collect()}
    t_fast = time.perf_counter() - t0
    spark.catalog.clearCache()

    assert set(slow) == set(fast), "vec_id universes differ"
    agree = sum(1 for v in slow if slow[v] == fast[v]) / len(slow)
    out["part_a"] = {
        "n_vectors": len(slow),
        "portable_s": round(t_slow, 2),
        "fast_s": round(t_fast, 2),
        "speedup": round(t_slow / t_fast, 2),
        "kept_portable": sum(slow.values()),
        "kept_fast": sum(fast.values()),
        "agreement": round(agree, 4),
    }
    assert agree >= 0.95, f"twin agreement {agree:.3f} < 0.95"

    # ---- Part B: composed chain with each twin ------------------------
    def chain(dedup_fn) -> tuple[int, float]:
        t0 = time.perf_counter()
        feats = _features(spark, sf_dir).persist()
        s2 = feats.filter(
            (F.col("pred_lang") == KEEP_LANG) & (F.col("quality") >= QUALITY_MIN)
        )
        keep = s2.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
        s3 = s2.join(keep.select("doc_id"), "doc_id")
        near = winnow_neardup(spark, sf_dir).select(
            F.col("doc_b").alias("doc_id")
        ).distinct()
        s4 = s3.join(near, "doc_id", "left_anti")
        sem_drop = (
            dedup_fn(spark, sf_dir)
            .filter(~F.col("kept"))
            .select(F.col("vec_id").alias("doc_id"))
        )
        s5 = s4.join(sem_drop, "doc_id", "left_anti")
        n = s5.count()
        secs = time.perf_counter() - t0
        feats.unpersist()
        spark.catalog.clearCache()
        return n, secs

    n_portable, t_chain_slow = chain(semantic_dedup)
    n_fast, t_chain_fast = chain(semantic_dedup_fast)
    out["part_b"] = {
        "chain_stages": "lang>quality>exact_dedup>winnow>semantic",
        "portable_chain_s": round(t_chain_slow, 2),
        "fast_chain_s": round(t_chain_fast, 2),
        "final_docs_portable": n_portable,
        "final_docs_fast": n_fast,
    }
    assert n_portable == n_fast, "chain outputs diverge between twins"

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
