#!/usr/bin/env python
"""Round-16 arbiter for the CC timing anomaly: the single-shot A/Bs
disagree with each other (R15_SCALE_PROBE edge_ab_10x read t_cc
old 6.19 s / new 14.83 s; probe_r16_scale read 8.0 / 11.15 / 7.58
with the repartition arm fastest; probe_r16_cc_mechanism's ROUND-1
decomposition then read new FASTEST, 3.9 s vs old 4.83 s vs
repartitioned 5.39 s — opposite direction, same frames). Partition
counts, row skew, labels, and round counts are pinned equal across
arms, so if the layout story were structural the direction could not
flip between probes. Hypothesis: the deltas are JVM/run-state noise
(GC epochs, code-cache warmup, shuffle-file page cache) that
single-shot sequential arms cannot cancel.

Protocol: all three edge frames built and persisted up front, then
connected_components timed in THREE LATIN-SQUARE passes (each arm
once per pass, a different position each pass), min and median per
arm reported. Min-of-3 across positions defeats the GC-epoch
confound the same way the bench's min-of-two defeats its spike
windows. Decision rule stated up front: if min-of-3 spread across
arms is within ~15 %, the r15 anomaly is declared measurement noise
and fp_clusters keeps its current (shuffle-free) edge emission; a
reproducible >= 1.5x structural gap would instead justify the
repartition fix.

Also records the 30x image EDGE COUNT so the cluster-stage 30x
superlinearity (33.5x time for 23.9x distinct fps,
R16_SCALE_PROBE.json) can be attributed: if edges grow ~50x+ while
the stage grows 33x, the stage is sublinear in the work that
actually exists (edges), and 'distinct fps' was the wrong x-axis.

Usage: python scripts/probe_r16_cc_repeat.py  (JSON to stdout)
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
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from probe_r13_scale import rep_edges  # noqa: E402
from probe_r15_scale import _grow  # noqa: E402
from probe_r16_scale import new_edges  # noqa: E402

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.operators.dedup import (  # noqa: E402
    connected_components,
)
from honors_p1_mapreduce_spark.operators.multimodal import (  # noqa: E402
    IMAGE_MEDIA_TYPES,
    image_fingerprints,
    media_real_table,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PROBE_SF", "/root/testdata/sf0.1")

# three passes, each arm in a different position (latin square)
ORDERS = [
    ["old_distinct", "new_firstband", "new_repartitioned"],
    ["new_repartitioned", "old_distinct", "new_firstband"],
    ["new_firstband", "new_repartitioned", "old_distinct"],
]


def main() -> None:
    spark = get_spark(app_name="probe_r16_cc_repeat")
    work = Path(tempfile.mkdtemp(prefix="r16_ccr_"))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    d10 = work / "x10"
    d10.mkdir()
    _grow(spark, docs, n_docs, 10, d10)

    registry.reset_memos()
    media = media_real_table(spark, str(d10)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ifp = image_fingerprints(
        media.filter(F.col("media_type").isin(*IMAGE_MEDIA_TYPES))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ifp.count()
    para = spark.sparkContext.defaultParallelism

    frames: dict[str, object] = {}
    for name, build in (
        ("old_distinct", lambda: rep_edges(ifp)[1]),
        ("new_firstband", lambda: new_edges(ifp)[1]),
        (
            "new_repartitioned",
            lambda: new_edges(ifp)[1].repartition(para, "u", "v"),
        ),
    ):
        e = build().persist(StorageLevel.MEMORY_AND_DISK)
        e.count()
        frames[name] = e

    samples: dict[str, list[float]] = {n: [] for n in frames}
    for i, order in enumerate(ORDERS):
        for name in order:
            t0 = time.perf_counter()
            connected_components(frames[name]).count()
            t = round(time.perf_counter() - t0, 2)
            samples[name].append(t)
            print(f"pass {i + 1} {name}: {t}s", file=sys.stderr)

    def med(xs):
        s = sorted(xs)
        return s[len(s) // 2]

    out = {
        "t_cc_samples": samples,
        "t_cc_min": {n: min(v) for n, v in samples.items()},
        "t_cc_median": {n: med(v) for n, v in samples.items()},
    }
    mins = out["t_cc_min"]
    out["min_spread_ratio"] = round(max(mins.values()) / min(mins.values()), 2)
    out["verdict_noise_not_structural"] = out["min_spread_ratio"] <= 1.15

    for e in frames.values():
        e.unpersist()

    # 30x edge count for the cluster-stage attribution
    d30 = work / "x30"
    d30.mkdir()
    _grow(spark, docs, n_docs, 30, d30)
    registry.reset_memos()
    media30 = media_real_table(spark, str(d30)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ifp30 = image_fingerprints(
        media30.filter(F.col("media_type").isin(*IMAGE_MEDIA_TYPES))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_fp30 = ifp30.count()
    _, e30 = new_edges(ifp30)
    out["image_30x"] = {
        "n_fps": n_fp30,
        "n_edges": e30.count(),
        "n_edges_10x": 8108496,
        "n_edges_1x": 160182,
    }
    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
