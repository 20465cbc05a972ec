#!/usr/bin/env python
"""Round-12 scale probe (r11 verdict #6): the multimodal funnel at 1x
vs 10x corpus WITH the per-stage split recorded inside the funnel's
own probe entry — so the cluster stage's share of total funnel time is
tracked round over round (r11 read 7.3x total with the cluster stage
~5.9x on 9x distinct fps; any fingerprint or guard change must
re-probe). Also re-probes the two surfaces whose code paths changed or
registered in r12:

- media_audio_dedup — REGISTERED r12 (the reserved window slot);
  expectation from R10_AUDIO_PROBE stands: ~10x rows, near
  output-linear time (pair-free CC over distinct fps).
- media_decontaminate — the r11-advisor one-decode fix (the eval/train
  split now filters the raw image rows BEFORE the mapInPandas
  fingerprint barrier, so each branch decodes only its own rows; the
  r11 plan decoded the full corpus twice). Time at both scales should
  be <= the r11 probe's (2.10 s / 2.82 s), with identical output.
- media_audio_decontaminate — the r12-NEW audio tier: map-only decode
  per split + broadcast eval join, so time should track the training
  clip count (~linear); rows are legitimately 0 at BOTH scales (the
  corpora carry no natural audio contamination — the operator
  docstring documents this; the seeded golden is the semantic gate,
  this probe pins the SHAPE's cost).

Corpus enlargement mirrors probe_r9/r10/r11_scale.py: documents are
STRING-ROTATED per copy so every copy is a distinct corpus slice
(rotation changes the pixel/PCM bytes, so fingerprints differ across
copies — the honest enlargement for perceptual operators).

Usage: python scripts/probe_r12_scale.py  (writes JSON to stdout)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.operators.multimodal import (  # noqa: E402
    fp_clusters,
    image_fingerprints,
    media_audio_decontaminate,
    media_audio_dedup,
    media_decontaminate,
    media_real_table,
    wav_fp_peak,
)
from honors_p1_mapreduce_spark.operators.pipeline import (  # noqa: E402
    media_clean_funnel,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
COPIES = 10


def main() -> None:
    spark = get_spark(app_name="probe_r12_scale")
    work = Path(tempfile.mkdtemp(prefix="r12_scale_"))
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

    def timed(fn, sf_dir: str) -> tuple[float, int]:
        spark.catalog.clearCache()
        registry.reset_memos()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        return round(time.perf_counter() - t0, 2), n

    def funnel_stages(sf_dir: str) -> dict:
        """The funnel's own stage decomposition, cold, in funnel
        order — decode+fingerprint (map-only, ~items), then the
        cluster stage (bounded by DISTINCT-fp diversity). The media
        and fingerprint frames are PERSISTED exactly as the real
        media_clean_funnel persists them (r12 reviewer: without the
        persists, every cluster-stage job re-paid full decode passes
        and cluster_share_pct attributed decode cost to the cluster
        stage — the r11 probe's components() had the same flaw, so
        compare shares only from r12 on). Shares are of the summed
        stage time, so the fraction is comparable across rounds even
        when host speed moves."""
        from pyspark.storagelevel import StorageLevel

        spark.catalog.clearCache()
        registry.reset_memos()
        st: dict = {}
        t0 = time.perf_counter()
        media = media_real_table(spark, sf_dir).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        st["n_items"] = media.count()
        st["t_scan_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        afp = wav_fp_peak(media).persist(StorageLevel.MEMORY_AND_DISK)
        ifp = image_fingerprints(
            media.filter("media_type <> 'audio/wav'")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        st["n_fps"] = afp.count() + ifp.count()
        st["t_decode_fp_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        st["n_distinct_fps"] = (
            afp.select("fingerprint")
            .union(ifp.select("fingerprint"))
            .distinct()
            .count()
        )
        clusters = fp_clusters(ifp).unionByName(
            fp_clusters(afp.select("doc_id", "fingerprint"))
        )
        st["n_clusters"] = clusters.select("cluster").distinct().count()
        st["t_cluster_s"] = round(time.perf_counter() - t0, 2)
        total = st["t_scan_s"] + st["t_decode_fp_s"] + st["t_cluster_s"]
        st["cluster_share_pct"] = round(100.0 * st["t_cluster_s"] / total, 1)
        for f in (afp, ifp, media):
            f.unpersist()
        return st

    for name, fn in [
        ("media_clean_funnel", media_clean_funnel),
        ("media_audio_dedup", media_audio_dedup),
        ("media_decontaminate", media_decontaminate),
        ("media_audio_decontaminate", media_audio_decontaminate),
    ]:
        timed(fn, SF)  # warm codegen/JVM once per operator shape
        t1, n1 = timed(fn, SF)
        tn, nn = timed(fn, str(work))
        out[name] = {
            "t_1x_s": t1,
            f"t_{COPIES}x_s": tn,
            "rows_1x": n1,
            f"rows_{COPIES}x": nn,
            "time_ratio": round(tn / t1, 2),
            "rows_ratio": round(nn / max(n1, 1), 2),
            "data_ratio": COPIES,
        }
        print(
            f"{name}: 1x {t1}s/{n1} rows -> {COPIES}x {tn}s/{nn} rows "
            f"(time {tn/t1:.1f}x, rows {nn/max(n1,1):.1f}x)",
            file=sys.stderr,
        )

    # r11 verdict #6 Done criterion: the stage split lives INSIDE the
    # funnel's probe entry, with the cluster stage's share tracked
    out["media_clean_funnel"]["stages_1x"] = funnel_stages(SF)
    out["media_clean_funnel"][f"stages_{COPIES}x"] = funnel_stages(str(work))
    out["notes"] = {
        "media_clean_funnel": (
            "stage costs must track their own inputs: decode/fp passes"
            " ~items (map-only), cluster stage ~distinct fps —"
            " output-bound, so its share GROWS with fp diversity; watch"
            " cluster_share_pct round over round"
        ),
        "media_audio_dedup": (
            "registered r12; pair-free CC over distinct audio fps —"
            " rows ~items (every wav gets a cluster row), time bounded"
            " by distinct-fp diversity"
        ),
        "media_decontaminate": (
            "post one-decode fix: each split decodes only its own rows;"
            " compare t_1x/t_10x against R11_SCALE_PROBE (2.10/2.82 s)"
        ),
        "media_audio_decontaminate": (
            "r12 audio tier: the REAL corpora carry 0 rows (sf0.01 and"
            " sf0.1 — docstring); the 10x STRING-ROTATED enlargement can"
            " plant chance envelope collisions (2 here), which only"
            " confirms the join fires; the probe pins the map-only +"
            " broadcast shape's cost"
        ),
    }
    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
