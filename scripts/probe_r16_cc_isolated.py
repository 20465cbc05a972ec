#!/usr/bin/env python
"""Round-16 FINAL arbiter for the CC timing anomaly: fresh JVM per
measurement, so no arm ever runs against another arm's session state.

Why this design: three in-session probes contradicted each other on
the SAME frames — R15_SCALE_PROBE read old 6.19 s / new 14.83 s,
probe_r16_scale read 8.0 / 11.15 / 7.58 (repartition fastest),
probe_r16_cc_repeat's latin-square passes read the repartition arm
slowest in every pass while within-arm spread across passes hit 2.3x
(old_distinct: 7.53..17.18 s on one frame). A delta that flips
direction across probes and is smaller than the within-arm spread is
session state (cached-block eviction under storage pressure,
ContextCleaner races on the loop's localCheckpoint blocks, GC
epochs), not plan structure. The only way to measure the frames
themselves is one JVM per sample.

Protocol: the parent grows the 10x corpus once, then spawns
REPS subprocesses per arm (each: fresh get_spark, build ONLY that
arm's edge frame, persist+count, time ONE connected_components run,
print the time, exit). Decision rule: if per-arm min-of-REPS agree
within ~15 %, the r15 anomaly is measurement noise and fp_clusters
keeps its shuffle-free first-band emission (no repartition fix, no
restamp churn); a reproducible >= 1.5x gap justifies the fix.

Usage: python scripts/probe_r16_cc_isolated.py          (parent)
       python scripts/probe_r16_cc_isolated.py --arm X --corpus D
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

SF = os.environ.get("PROBE_SF", "/root/testdata/sf0.1")
ARMS = ("old_distinct", "new_firstband", "new_repartitioned")
REPS = 3


def run_arm(arm: str, corpus: str) -> None:
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from probe_r13_scale import rep_edges
    from probe_r16_scale import new_edges

    from honors_p1_mapreduce_spark.operators.dedup import (
        connected_components,
    )
    from honors_p1_mapreduce_spark.operators.multimodal import (
        IMAGE_MEDIA_TYPES,
        image_fingerprints,
        media_real_table,
    )
    from honors_p1_mapreduce_spark.session import get_spark

    spark = get_spark(app_name=f"cc_iso_{arm}")
    media = media_real_table(spark, corpus).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ifp = image_fingerprints(
        media.filter(F.col("media_type").isin(*IMAGE_MEDIA_TYPES))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ifp.count()
    para = spark.sparkContext.defaultParallelism
    if arm == "old_distinct":
        e = rep_edges(ifp)[1]
    elif arm == "new_firstband":
        e = new_edges(ifp)[1]
    else:
        e = new_edges(ifp)[1].repartition(para, "u", "v")
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    n = e.count()
    t0 = time.perf_counter()
    connected_components(e).count()
    t = round(time.perf_counter() - t0, 2)
    print(f"RESULT {arm} {n} {t}")
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=ARMS)
    ap.add_argument("--corpus")
    args = ap.parse_args()
    if args.arm:
        run_arm(args.arm, args.corpus)
        return

    from probe_r15_scale import _grow

    from honors_p1_mapreduce_spark.session import get_spark

    work = Path(tempfile.mkdtemp(prefix="r16_cci_"))
    spark = get_spark(app_name="cc_iso_parent")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    d10 = work / "x10"
    d10.mkdir()
    _grow(spark, docs, n_docs, 10, d10)
    spark.stop()

    samples: dict[str, list[float]] = {a: [] for a in ARMS}
    n_edges: dict[str, int] = {}
    # interleave arms across reps so slow host drift hits all equally
    for rep in range(REPS):
        for arm in ARMS:
            p = subprocess.run(
                [sys.executable, __file__, "--arm", arm, "--corpus", str(d10)],
                capture_output=True,
                text=True,
                timeout=900,
            )
            m = re.search(
                rf"RESULT {arm} (\d+) ([0-9.]+)", p.stdout
            )
            if not m:
                print(p.stdout[-2000:], file=sys.stderr)
                print(p.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"arm {arm} rep {rep} failed")
            n_edges[arm] = int(m.group(1))
            samples[arm].append(float(m.group(2)))
            print(f"rep {rep + 1} {arm}: {m.group(2)}s", file=sys.stderr)

    mins = {a: min(v) for a, v in samples.items()}
    out = {
        "protocol": "fresh JVM per sample, arms interleaved",
        "n_edges": n_edges,
        "t_cc_samples": samples,
        "t_cc_min": mins,
        "min_spread_ratio": round(max(mins.values()) / min(mins.values()), 2),
    }
    out["verdict_noise_not_structural"] = out["min_spread_ratio"] <= 1.15
    print(json.dumps(out, indent=1))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
