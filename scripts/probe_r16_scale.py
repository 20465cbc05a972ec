#!/usr/bin/env python
"""Round-16 scale probe — answers r15 verdict #4.

Part 1 — the CC timing anomaly inside the r15 edge A/B
(R15_SCALE_PROBE.json edge_ab_10x: t_cc 6.19 s old vs 14.83 s new on
an IDENTICAL 8.1 M edge set, labels pinned equal). Hypothesis under
test: the frames differ only in PARTITION LAYOUT. The old
construction ends in .distinct() — a shuffle whose READ side is the
~8x-inflated pre-distinct edge set, so AQE sizes its output
partitioning from ~1 GB of shuffle data and leaves a healthy
partition count; the new construction emits edges straight out of
the band self-join, whose shuffle READ side is only the tiny banded
reps frame (~285 K rows), so AQE coalesces toward ONE partition and
the 8.1 M OUTPUT rows land in very few, bucket-clustered partitions.
connected_components then pays for it serially: the entry
localCheckpoint materializes one giant partition on one core, and
round 1's window-shuffle map side reads it with one task.

The probe measures, per arm (old / new / new+repartition fix):
  n_partitions and the per-partition row histogram of the persisted
  edge frame, the CC entry-checkpoint time in isolation, and the full
  CC time. The fix arm applies
  ``repartition(defaultParallelism, "u", "v")`` — an explicit-N
  repartition AQE must not re-coalesce — before CC.

Part 2 — the video rounds-vs-fixpoint curve, extended one point
rightward to 30x (r15 read 3/4/5 at 1x/3x/10x over 183/1,145/12,050
edges — consistent with O(log |E|); 30x decides it), plus the
image-funnel cluster-stage net total at 30x so the first-band win is
confirmed at the next scale step (the verdict's "or" arm).

Corpus enlargement mirrors probe_r9..r15: string-rotated copies.

Usage: python scripts/probe_r16_scale.py  (writes JSON to stdout)
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

from probe_r13_scale import rep_edges  # noqa: E402  (OLD construction mirror)
from probe_r15_scale import _cluster_stage, _grow  # noqa: E402

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.operators.dedup import (  # noqa: E402
    connected_components,
)
from honors_p1_mapreduce_spark.operators.multimodal import (  # noqa: E402
    IMAGE_MEDIA_TYPES,
    IMG_NEARDUP_BAND_BITS,
    IMG_NEARDUP_BANDS,
    IMG_NEARDUP_HAMMING_MAX,
    image_fingerprints,
    media_avi_table,
    media_real_table,
    video_fingerprints,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PROBE_SF", "/root/testdata/sf0.1")


def new_edges(fp):
    """The r15+ first-matching-band edge construction (local mirror of
    fp_clusters' internals, same as probe_r15_scale's A/B arm)."""
    reps = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("rep"))
    mask = (1 << IMG_NEARDUP_BAND_BITS) - 1

    def _slice(col, b):
        return F.shiftright(F.col(col), b * IMG_NEARDUP_BAND_BITS).bitwiseAND(
            F.lit(mask)
        )

    banded = reps.select(
        "rep",
        "fingerprint",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _slice("fingerprint", b).alias("bucket"),
                    )
                    for b in range(IMG_NEARDUP_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("rep", "fingerprint", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    lowest = (
        F.array_position(
            F.array(
                *[
                    _slice("a.fingerprint", i) == _slice("b.fingerprint", i)
                    for i in range(IMG_NEARDUP_BANDS)
                ]
            ),
            F.lit(True),
        )
        - 1
    )
    return reps, (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.fingerprint") < F.col("b.fingerprint")),
        )
        .filter(
            F.bit_count(
                F.col("a.fingerprint").bitwiseXOR(F.col("b.fingerprint"))
            )
            <= IMG_NEARDUP_HAMMING_MAX
        )
        .filter(F.col("a.band") == lowest)
        .select(F.col("a.rep").alias("u"), F.col("b.rep").alias("v"))
    )


def _layout(edges) -> dict:
    """Partition diagnostics of a persisted frame: count + row skew."""
    hist = [
        r["c"]
        for r in edges.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    total = sum(hist)
    return {
        "n_partitions": edges.rdd.getNumPartitions(),
        "n_nonempty": len(hist),
        "rows_max": max(hist) if hist else 0,
        "rows_mean": round(total / len(hist), 1) if hist else 0.0,
        "skew_max_over_mean": (
            round(max(hist) * len(hist) / total, 2) if total else None
        ),
    }


def _timed_cc(edges) -> dict:
    """Entry-checkpoint time in isolation, then the full CC time (the
    checkpoint inside CC re-runs — its cost is part of t_cc, exactly
    as the r15 A/B measured it)."""
    t0 = time.perf_counter()
    ck = edges.select("u", "v").localCheckpoint()
    t_ckpt = round(time.perf_counter() - t0, 2)
    ck.unpersist()
    t0 = time.perf_counter()
    labels = frozenset(
        (r["node"], r["label"])
        for r in connected_components(edges).collect()
    )
    t_cc = round(time.perf_counter() - t0, 2)
    return {"t_entry_checkpoint_s": t_ckpt, "t_cc_s": t_cc, "labels": labels}


def cc_anatomy(spark, sf_dir: str) -> dict:
    spark.catalog.clearCache()
    registry.reset_memos()
    media = media_real_table(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ifp = image_fingerprints(
        media.filter(F.col("media_type").isin(*IMAGE_MEDIA_TYPES))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ifp.count()
    para = spark.sparkContext.defaultParallelism

    arms: dict[str, dict] = {}
    frames = []
    labels = {}
    for name, build in (
        ("old_distinct", lambda: rep_edges(ifp)[1]),
        ("new_firstband", lambda: new_edges(ifp)[1]),
        (
            "new_repartitioned",
            lambda: new_edges(ifp)[1].repartition(para, "u", "v"),
        ),
    ):
        t0 = time.perf_counter()
        e = build().persist(StorageLevel.MEMORY_AND_DISK)
        n = e.count()
        t_build = round(time.perf_counter() - t0, 2)
        frames.append(e)
        res = _timed_cc(e)
        labels[name] = res.pop("labels")
        arms[name] = {
            "n_edges": n,
            "t_build_s": t_build,
            **_layout(e),
            **res,
        }
        print(f"{name}: {arms[name]}", file=sys.stderr)
    for e in frames:
        e.unpersist()
    for f in (ifp, media):
        f.unpersist()
    return {
        "arms": arms,
        "labels_equal_all_arms": len(set(labels.values())) == 1,
        "default_parallelism": para,
    }


def video_rounds(spark, sf_dir: str) -> dict:
    spark.catalog.clearCache()
    registry.reset_memos()
    media = media_avi_table(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    media.count()
    fp = video_fingerprints(media)
    reps, edges = new_edges(fp)
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = edges.count()

    def labels(max_iter: int | None) -> frozenset:
        kw = {} if max_iter is None else {"max_iter": max_iter}
        return frozenset(
            (r["node"], r["label"])
            for r in connected_components(edges, **kw).collect()
        )

    full = labels(None)
    smallest = None
    for k in (1, 2, 3, 4, 5, 6, 7, 8, 10):
        if smallest is None and labels(k) == full:
            smallest = k
    edges.unpersist()
    media.unpersist()
    return {
        "n_edges": n_edges,
        "n_labels": len(full),
        "rounds_to_fixpoint": smallest,
    }


def main() -> None:
    spark = get_spark(app_name="probe_r16_scale")
    work = Path(tempfile.mkdtemp(prefix="r16_scale_"))
    out: dict = {}

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    dirs: dict[int, str] = {1: SF}
    for c in (10, 30):
        dest = work / f"x{c}"
        dest.mkdir()
        _grow(spark, docs, n_docs, c, dest)
        dirs[c] = str(dest)

    # ---- Part 1: CC anatomy A/B/B' at 10x (same corpus scale as the
    # r15 A/B whose t_cc anomaly this explains)
    out["cc_anatomy_10x"] = cc_anatomy(spark, dirs[10])

    # ---- Part 2a: video rounds-vs-scale, one point rightward
    out["video_rounds_30x"] = video_rounds(spark, dirs[30])
    print(f"video 30x: {out['video_rounds_30x']}", file=sys.stderr)

    # ---- Part 2b: image cluster-stage net total at 30x (the r15
    # sublinearity claim re-checked one scale step further)
    _cluster_stage(spark, dirs[1])  # warm codegen once, untimed
    s1 = _cluster_stage(spark, dirs[1])
    s30 = _cluster_stage(spark, dirs[30])
    fp_ratio = s30["n_distinct_fps"] / s1["n_distinct_fps"]
    t_ratio = s30["t_cluster_s"] / s1["t_cluster_s"]
    out["cluster_stage_30x"] = {
        "stages_1x": s1,
        "stages_30x": s30,
        "distinct_fp_ratio": round(fp_ratio, 2),
        "t_cluster_ratio": round(t_ratio, 2),
        "grows_at_most_linearly_in_distinct_fps": t_ratio <= fp_ratio * 1.15,
    }
    print(f"cluster stage 30x: {out['cluster_stage_30x']}", file=sys.stderr)

    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
