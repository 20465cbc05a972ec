#!/usr/bin/env python
"""Probe: merges/second of the three BPE training strategies — the
round-6 verdict #4 measurement ("record a merges/second probe at a
production-ish merge count, and if the per-round job launch
dominates, add the driver-local finishing phase").

Sequential greedy BPE is inherently one argmax per merge; in the
distributed loop that argmax is a Spark job (1-row collect), so
rounds/second is bounded by job-launch latency no matter how small
delta maintenance makes each round's data. This probe measures, on a
synthetic 30 K-distinct-word zipf corpus (big enough that per-round
data cost is real, small enough to finish):

1. distributed delta-maintained rounds/second over N_DIST merges
   (extrapolated to a 32 K-merge production run);
2. the driver-local finishing loop (heap + inverted index,
   operators/bpe.py:_local_bpe) over N_LOCAL merges — the auto
   default below BPE_LOCAL_FINISH_MAX_VOCAB;
3. trajectory identity of the two on the first N_DIST merges.

Prints one JSON line; the round's PROGRESS/SURVEY notes record it.
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from honors_p1_mapreduce_spark.operators.bpe import (  # noqa: E402
    _local_bpe,
    _wrap_chars,
    bpe_train_merges_from,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

N_DIST = 30
N_LOCAL = 2000
N_WORDS = 30_000


def main() -> None:
    spark = get_spark(app_name="probe-bpe-merges-per-sec", cpus=8)
    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 12)))
        for _ in range(N_WORDS)
    }
    vocab_rows = [(w, max(1, int(1000 / (i + 1) ** 0.7))) for i, w in enumerate(sorted(words))]
    text_parts = [w for w, c in vocab_rows for _ in range(min(c, 3))]
    docs = spark.createDataFrame(
        [(i, " ".join(text_parts[i::64])) for i in range(64)], ["doc_id", "text"]
    )

    t0 = time.perf_counter()
    dist = [
        tuple(r)
        for r in bpe_train_merges_from(
            spark, docs, n_merges=N_DIST, incremental=True
        ).collect()
    ]
    dist_s = time.perf_counter() - t0
    dist_rate = N_DIST / dist_s

    # local loop over the SAME vocab (built once distributed, as the
    # auto path does)
    from pyspark.sql import functions as F

    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .select(_wrap_chars(F.col("word")).alias("w"), "cnt")
    )
    rows = [(r["w"], r["cnt"]) for r in vocab.collect()]
    t0 = time.perf_counter()
    local = _local_bpe(rows, N_LOCAL)
    local_s = time.perf_counter() - t0
    local_rate = len(local) / local_s

    assert [m[:3] for m in local[:N_DIST]] == [m[:3] for m in dist[:N_DIST]], (
        "trajectory divergence between local and distributed loops"
    )

    print(
        json.dumps(
            {
                "probe": "bpe_merges_per_sec",
                "vocab_words": len(rows),
                "dist_merges": N_DIST,
                "dist_seconds": round(dist_s, 1),
                "dist_merges_per_sec": round(dist_rate, 2),
                "dist_32k_extrapolation_hours": round(32_000 / dist_rate / 3600, 1),
                "local_merges": len(local),
                "local_seconds": round(local_s, 1),
                "local_merges_per_sec": round(local_rate, 0),
                "local_speedup": round(local_rate / dist_rate, 0),
                "trajectory_identical_first_n": N_DIST,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
