#!/usr/bin/env python
"""Isolated nprobe 4 vs 8 A/B for the IVF similarity queries.

Round-7 context: the full-suite bench showed similarity_ivf_kmeans_topk
2.04 -> 2.85 s across the rounds where the nprobe default moved 4 -> 8,
contradicting the SURVEY note that the bump was latency-free; the r7
verdict ("What's wrong" #2) asked for an isolated re-measure on a quiet
host. This probe times each arm 3x with cold memos, writes
IVF_NPROBE_AB.json at the repo root, and prints one JSON line.

Result (2026-08-14, local[32], sf0.1): the arms are indistinguishable —
mins 1.73 vs 1.63 s (flat IVF) and 2.36 vs 2.39 s (k-means IVF); the
bench delta was host noise, consistent with bench.py's documented
110-136 s band. Probing 8 of 16 cells scans ~2x the candidate slice,
but at bench SF the per-query fixed cost (codebook build + plan
overhead) dominates the candidate scan, so the knob is latency-neutral
HERE; at 100 TB the candidate scan dominates and nprobe is the real
recall/latency dial (SURVEY §8.5 sweep).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from honors_p1_mapreduce_spark import registry
from honors_p1_mapreduce_spark.operators import similarity as sim
from honors_p1_mapreduce_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="probe_ivf_nprobe_ab")
    sf = "/root/testdata/sf0.1"
    sim.similarity_ivf_topk(spark, sf).count()  # JVM/codegen warm-up
    spark.catalog.clearCache()
    registry.reset_memos()
    out: dict[str, list[float]] = {}
    arms = (
        ("similarity_ivf_topk", sim.similarity_ivf_topk),
        ("similarity_ivf_kmeans_topk", sim.similarity_ivf_kmeans_topk),
    )
    for fn_name, fn in arms:
        for nprobe in (4, 8):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf, nprobe=nprobe).count()
                ts.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
                registry.reset_memos()
            out[f"{fn_name}_nprobe{nprobe}"] = ts
    line = json.dumps({"probe": "ivf_nprobe_ab", "sf": 0.1, "arms": out})
    Path(__file__).resolve().parent.parent.joinpath(
        "IVF_NPROBE_AB.json"
    ).write_text(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
