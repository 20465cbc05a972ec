#!/usr/bin/env python
"""Round-15 scale probe — answers r14 verdict #3 and #4.

#3 (image funnel cluster stage): r14 measured the cluster stage at
94.8 % of funnel wall time and 8.5x the 1x time at 10x data (8.1 M
edges on the dense probe corpus). The r15 fp_clusters change emits
each edge ONCE, at the lowest agreeing band (an inline bitwise filter
on the join output), instead of emitting per agreeing band and paying
a full distinct shuffle over the inflated set. This probe measures:
  (a) the funnel cluster stage at 1x and 10x with the NEW code — the
      acceptance is growth <= ~linear in DISTINCT-fp count;
  (b) an old-vs-new A/B on the SAME persisted 10x fingerprint frame:
      the old (per-band emit + distinct) construction against the new
      (first-band emit) one — edge sets and CC labels must be
      IDENTICAL (the equivalence claim, measured, not argued) with
      the timing delta recorded.

#4 (video graph convergence): r14 read rounds-to-fixpoint 5 at 10x
(watch bound 2). This probe records the rounds-vs-data-scale curve at
1x/3x/10x for the video AND image graphs so the next verdict can see
whether convergence grows ~O(log n) with component depth (fine — the
alternating-star algorithm's bound) or linearly (needs a different
arbiter). The keep-set A/B re-runs for any graph past 2 rounds (the
r13 NO-CAP ruling's revisit condition), reusing probe_r14_scale's
measured machinery.

Corpus enlargement mirrors probe_r9..r14: string-rotated copies, so
every copy is a distinct corpus slice with perturbed payload bytes.

Usage: python scripts/probe_r15_scale.py  (writes JSON to stdout)
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
from probe_r14_scale import _grown_graph_frames, _keep_ab  # noqa: E402

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.operators.dedup import (  # noqa: E402
    connected_components,
)
from honors_p1_mapreduce_spark.operators.multimodal import (  # noqa: E402
    IMAGE_MEDIA_TYPES,
    fp_clusters,
    image_fingerprints,
    media_avi_table,
    media_real_table,
    video_fingerprints,
    wav_fp_peak,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PROBE_SF", "/root/testdata/sf0.1")
SCALES = (1, 3, 10)


def _grow(spark, docs, n_docs: int, copies: int, dest: Path) -> None:
    big = docs
    for i in range(1, copies):
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
    big.repartition(32).write.parquet(str(dest / "documents.parquet"))


def _cluster_stage(spark, sf_dir: str) -> dict:
    """The image funnel's cluster stage, isolated exactly as
    probe_r14_scale's media_funnel_stages isolates it (fps persisted
    and forced first, the cluster timer covering distinct-count +
    fp_clusters for both modalities)."""
    spark.catalog.clearCache()
    registry.reset_memos()
    media = media_real_table(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    media.count()
    afp = wav_fp_peak(media).persist(StorageLevel.MEMORY_AND_DISK)
    ifp = image_fingerprints(
        media.filter(F.col("media_type").isin(*IMAGE_MEDIA_TYPES))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_fps = afp.count() + ifp.count()
    t0 = time.perf_counter()
    n_distinct = (
        afp.select("fingerprint")
        .union(ifp.select("fingerprint"))
        .distinct()
        .count()
    )
    clusters = fp_clusters(ifp).unionByName(
        fp_clusters(afp.select("doc_id", "fingerprint"))
    )
    n_clusters = clusters.select("cluster").distinct().count()
    t_cluster = round(time.perf_counter() - t0, 2)
    for f in (afp, ifp, media):
        f.unpersist()
    return {
        "n_fps": n_fps,
        "n_distinct_fps": n_distinct,
        "n_clusters": n_clusters,
        "t_cluster_s": t_cluster,
    }


def _old_vs_new_ab(spark, sf_dir: str) -> dict:
    """Old (per-band emit + distinct) vs new (first-band emit) edge
    construction over the SAME persisted image fingerprint frame:
    edge-set equality, CC-label equality, and the timing split."""
    spark.catalog.clearCache()
    registry.reset_memos()
    media = media_real_table(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ifp = image_fingerprints(
        media.filter(F.col("media_type").isin(*IMAGE_MEDIA_TYPES))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ifp.count()

    # OLD construction: probe_r13_scale.rep_edges is the deliberate
    # mirror of the pre-r15 fp_clusters edge join (per-band emission
    # + .distinct()) kept exactly for A/Bs like this one.
    def timed_edges(build):
        t0 = time.perf_counter()
        reps, edges = build(ifp)
        edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
        n = edges.count()
        t_build = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        labels = frozenset(
            (r["node"], r["label"])
            for r in connected_components(edges).collect()
        )
        t_cc = round(time.perf_counter() - t0, 2)
        pairs = frozenset(
            (min(r["u"], r["v"]), max(r["u"], r["v"]))
            for r in edges.collect()
        )
        edges.unpersist()
        return n, t_build, t_cc, labels, pairs

    def new_edges(fp):
        # reuse fp_clusters' internals via its public output is not
        # possible (it returns clusters), so re-derive the NEW edge
        # frame the same way tests do: call the registered path for
        # labels below, and build the new edge set through rep_edges'
        # reps + the first-band filter inline
        from honors_p1_mapreduce_spark.operators.multimodal import (
            IMG_NEARDUP_BAND_BITS,
            IMG_NEARDUP_BANDS,
            IMG_NEARDUP_HAMMING_MAX,
        )

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
        edges = (
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
        return reps, edges

    n_old, tb_old, tcc_old, labels_old, pairs_old = timed_edges(rep_edges)
    n_new, tb_new, tcc_new, labels_new, pairs_new = timed_edges(new_edges)
    res = {
        "n_edges_old": n_old,
        "n_edges_new": n_new,
        "edge_sets_equal": pairs_old == pairs_new,
        "cc_labels_equal": labels_old == labels_new,
        "t_edges_old_s": tb_old,
        "t_edges_new_s": tb_new,
        "t_cc_old_s": tcc_old,
        "t_cc_new_s": tcc_new,
        "edge_build_speedup": round(tb_old / tb_new, 2) if tb_new else None,
    }
    for f in (ifp, media):
        f.unpersist()
    return res


def main() -> None:
    spark = get_spark(app_name="probe_r15_scale")
    work = Path(tempfile.mkdtemp(prefix="r15_scale_"))
    out: dict = {"scales": list(SCALES)}

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    dirs: dict[int, str] = {1: SF}
    for c in SCALES[1:]:
        dest = work / f"x{c}"
        dest.mkdir()
        _grow(spark, docs, n_docs, c, dest)
        dirs[c] = str(dest)

    # ---- verdict #3: cluster stage vs distinct-fp growth (new code)
    _cluster_stage(spark, dirs[1])  # warm codegen once, untimed
    stages = {c: _cluster_stage(spark, dirs[c]) for c in (1, 10)}
    fp_ratio = stages[10]["n_distinct_fps"] / stages[1]["n_distinct_fps"]
    t_ratio = stages[10]["t_cluster_s"] / stages[1]["t_cluster_s"]
    out["cluster_stage"] = {
        "stages_1x": stages[1],
        "stages_10x": stages[10],
        "distinct_fp_ratio": round(fp_ratio, 2),
        "t_cluster_ratio": round(t_ratio, 2),
        "grows_at_most_linearly_in_distinct_fps": t_ratio <= fp_ratio * 1.15,
    }
    print(
        f"cluster stage: 1x {stages[1]['t_cluster_s']}s -> 10x "
        f"{stages[10]['t_cluster_s']}s (time {t_ratio:.2f}x, "
        f"distinct fps {fp_ratio:.2f}x)",
        file=sys.stderr,
    )

    # ---- verdict #3: old-vs-new edge construction A/B at 10x
    out["edge_ab_10x"] = _old_vs_new_ab(spark, dirs[10])
    print(f"edge A/B: {out['edge_ab_10x']}", file=sys.stderr)

    # ---- verdict #4: rounds-to-fixpoint vs data scale (video + image)
    def rounds_to_fixpoint(fp) -> dict:
        reps, edges = rep_edges(fp)
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
        for k in (1, 2, 3, 4, 5, 6, 8):
            if smallest is None and labels(k) == full:
                smallest = k
        edges.unpersist()
        return {
            "n_edges": n_edges,
            "n_labels": len(full),
            "rounds_to_fixpoint": smallest,
        }

    curve: dict = {"video": {}, "image": {}}
    for c in SCALES:
        spark.catalog.clearCache()
        registry.reset_memos()
        v = media_avi_table(spark, dirs[c]).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        v.count()
        curve["video"][f"{c}x"] = rounds_to_fixpoint(video_fingerprints(v))
        v.unpersist()
        m = media_real_table(spark, dirs[c]).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        m.count()
        curve["image"][f"{c}x"] = rounds_to_fixpoint(
            image_fingerprints(
                m.filter(F.col("media_type").isin(*IMAGE_MEDIA_TYPES))
            )
        )
        m.unpersist()
    out["rounds_vs_scale"] = curve
    print(f"rounds-vs-scale: {curve}", file=sys.stderr)

    # the r13 NO-CAP ruling's revisit condition: keep-set A/B for any
    # graph past 2 rounds at 10x (same machinery as r14)
    grew = [
        g
        for g in ("video", "image")
        if (curve[g]["10x"]["rounds_to_fixpoint"] or 99) > 2
    ]
    if grew:
        out["keep_ab_10x"] = {}
        for g in grew:
            frames, fp, s1 = _grown_graph_frames(spark, dirs[10], g)
            out["keep_ab_10x"][g] = _keep_ab(
                spark, fp, s1, curve[g]["10x"]["rounds_to_fixpoint"]
            )
            for f in frames:
                f.unpersist()
    out["decision"] = {
        "no_cap_stands": all(
            not ab["cap_admissible_and_faster"]
            for ab in out.get("keep_ab_10x", {}).values()
        ),
        "watch_graphs_past_2": grew,
    }
    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
