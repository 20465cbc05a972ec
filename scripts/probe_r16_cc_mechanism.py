#!/usr/bin/env python
"""Round-16 follow-up: WHERE inside connected_components does the
join-emitted (bucket-clustered) edge frame lose its 3-4 s vs the
distinct-emitted one? probe_r16_scale showed partition counts and row
skew identical across arms, labels equal, and repartition(N, u, v)
recovering the loss — so the cost must sit in ROUND 1's consumption
of the differently-ORDERED input (every later round sees
identically-partitioned, identically-ordered data by construction).

This probe times, per arm, on the same persisted 10x image edge set:
  t_round1      — _small_star(_large_star(edges)) fully materialized
                  (the exact first loop iteration, checkpoint included)
  t_large_star  — _large_star(edges) alone (window + filter + distinct)
  t_window_only — the large-star window/filter WITHOUT the trailing
                  distinct (isolates exchange+sort+window from the
                  partial-agg distinct)
The arm whose delta survives into t_window_only indicts the window
exchange's map side (shuffle write of clustered keys); a delta that
only appears with the distinct indicts the partial aggregate (hash
map behavior under key-run input).

Usage: python scripts/probe_r16_cc_mechanism.py  (JSON to stdout)
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

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from probe_r13_scale import rep_edges  # noqa: E402
from probe_r15_scale import _grow  # noqa: E402
from probe_r16_scale import new_edges  # noqa: E402

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.operators.dedup import (  # noqa: E402
    _large_star,
    _small_star,
)
from honors_p1_mapreduce_spark.operators.multimodal import (  # noqa: E402
    IMAGE_MEDIA_TYPES,
    image_fingerprints,
    media_real_table,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PROBE_SF", "/root/testdata/sf0.1")


def _timed(label: str, thunk) -> float:
    t0 = time.perf_counter()
    thunk()
    t = round(time.perf_counter() - t0, 2)
    print(f"  {label}: {t}s", file=sys.stderr)
    return t


def main() -> None:
    spark = get_spark(app_name="probe_r16_cc_mechanism")
    work = Path(tempfile.mkdtemp(prefix="r16_ccm_"))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    dest = work / "x10"
    dest.mkdir()
    _grow(spark, docs, n_docs, 10, dest)

    registry.reset_memos()
    media = media_real_table(spark, str(dest)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ifp = image_fingerprints(
        media.filter(F.col("media_type").isin(*IMAGE_MEDIA_TYPES))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ifp.count()
    para = spark.sparkContext.defaultParallelism

    out: dict = {"arms": {}}
    frames = []
    for name, build in (
        ("old_distinct", lambda: rep_edges(ifp)[1]),
        ("new_firstband", lambda: new_edges(ifp)[1]),
        (
            "new_repartitioned",
            lambda: new_edges(ifp)[1].repartition(para, "u", "v"),
        ),
    ):
        print(f"arm {name}", file=sys.stderr)
        e = build().persist(StorageLevel.MEMORY_AND_DISK)
        e.count()
        frames.append(e)
        ck = e.select("u", "v").localCheckpoint()
        sym = ck.unionByName(
            ck.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
        window_only = (
            sym.withColumn("m", m)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        out["arms"][name] = {
            "t_window_only": _timed(
                "window_only", lambda: window_only.count()
            ),
            "t_large_star": _timed(
                "large_star", lambda: _large_star(ck).count()
            ),
            "t_round1": _timed(
                "round1",
                lambda: _small_star(_large_star(ck))
                .localCheckpoint(eager=False)
                .count(),
            ),
        }
        ck.unpersist()
    for e in frames:
        e.unpersist()
    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
