#!/usr/bin/env python
"""Round-13 scale probe (r12 verdict #5): track media_clean_funnel's
cluster-stage share now that stage splits are recorded honestly
(R12_SCALE_PROBE read 82.2 % at 1x -> 95.5 % at 10x), and run the
prescribed A/B: IF the share holds >= 95 % at 10x, evaluate capping
the connected-components rounds for the funnel's min-rep-per-cluster
use — the funnel only needs the KEEP DECISION (min doc_id per
cluster), not stable full labels, so a fixed-round prefix may already
converge on its graphs.

The A/B measures, per corpus scale and per modality graph:
- rounds-to-fixpoint: the smallest max_iter k whose label frame
  equals the uncapped run's (connected_components already early-stops
  the round the star-forest fixpoint is REACHED, so the uncapped run
  pays exactly rounds_to_fixpoint rounds — if that is already 1-2, a
  cap cannot save anything and the decision is "no change");
- keep-decision equality: whether the funnel's keep set (min s1-doc
  per cluster) under each capped run matches the uncapped keep set —
  a cap is only admissible where this holds;
- wall time per capped run vs uncapped.

The rep-node/banded-edge construction is a deliberate local mirror of
fp_clusters (multimodal.py:1780-1817) — the probe must drive
connected_components directly with a max_iter knob WITHOUT changing
fp_clusters' signature, because touching that code path would force
changed-path restamps of every fingerprint consumer (registry
ordering note). If the A/B ever motivates a real cap, wire it as an
explicit fp_clusters parameter in a round with restamp budget.

Also re-probes media_image_neardup (its image_fingerprints path
gained the skip accumulator in r13 — time must track R12_SCALE_PROBE
within noise, and the accumulator must read 0 on the well-formed
corpora) and media_clean_funnel end-to-end.

Corpus enlargement mirrors probe_r9..r12_scale.py: documents are
STRING-ROTATED per copy so every copy is a distinct corpus slice.

Usage: python scripts/probe_r13_scale.py  (writes JSON to stdout)
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
from pyspark.storagelevel import StorageLevel  # noqa: E402

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.operators.dedup import (  # noqa: E402
    connected_components,
)
from honors_p1_mapreduce_spark.operators.multimodal import (  # noqa: E402
    IMG_NEARDUP_BAND_BITS,
    IMG_NEARDUP_BANDS,
    IMG_NEARDUP_HAMMING_MAX,
    fp_clusters,
    image_fingerprint_skip_count,
    image_fingerprints,
    media_image_neardup,
    media_real_table,
    wav_fp_peak,
)
from honors_p1_mapreduce_spark.operators.pipeline import (  # noqa: E402
    MEDIA_AUDIO_CLIP_PEAK,
    MEDIA_IMG_MIN_GRADIENTS,
    media_clean_funnel,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

import os  # noqa: E402

SF = os.environ.get("PROBE_SF", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("PROBE_COPIES", "10"))
CAPS = (1, 2, 3)


def rep_edges(fp):
    """Distinct-fp rep nodes + banded hamming edges — LOCAL MIRROR of
    fp_clusters' construction (multimodal.py:1780-1817; see module
    docstring for why this is not a refactor of the operator).

    r15 note: this mirrors the PRE-r15 construction (per-band
    emission + .distinct()); fp_clusters itself now emits each edge
    once at its lowest agreeing band. The edge SET is identical, so
    fixpoint/keep measurements through this mirror stay valid, and
    probe_r15_scale.py uses the mirror as the OLD arm of its A/B."""
    reps = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("rep"))
    mask = (1 << IMG_NEARDUP_BAND_BITS) - 1
    banded = reps.select(
        "rep",
        "fingerprint",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("fingerprint", b * IMG_NEARDUP_BAND_BITS)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for b in range(IMG_NEARDUP_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("rep", "fingerprint", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
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
        .select(F.col("a.rep").alias("u"), F.col("b.rep").alias("v"))
        .distinct()
    )
    return reps, edges


def main() -> None:
    spark = get_spark(app_name="probe_r13_scale")
    work = Path(tempfile.mkdtemp(prefix="r13_scale_"))
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
        """Same decomposition + persist discipline as
        probe_r12_scale.py (persisted frames so cluster-stage cost is
        attributed honestly; comparable from r12 on)."""
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

    def cc_ab(sf_dir: str) -> dict:
        """The verdict-#5 A/B over BOTH modality graphs the funnel
        clusters: uncapped CC (early-stops at the fixpoint) vs
        max_iter in CAPS, with the funnel's keep decision re-derived
        under each label frame."""
        spark.catalog.clearCache()
        registry.reset_memos()
        media = media_real_table(spark, sf_dir).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        media.count()
        afp = wav_fp_peak(media).persist(StorageLevel.MEMORY_AND_DISK)
        ifp = image_fingerprints(
            media.filter("media_type <> 'audio/wav'")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        # the funnel's quality-pass doc set (s1) — the keep decision
        # is min doc_id per cluster AMONG these docs
        s1 = (
            afp.filter(F.col("peak_abs") < MEDIA_AUDIO_CLIP_PEAK)
            .select("doc_id")
            .unionByName(
                ifp.filter(
                    F.bit_count("fingerprint") >= MEDIA_IMG_MIN_GRADIENTS
                ).select("doc_id")
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        s1.count()

        def run(max_iter: int | None) -> tuple[float, frozenset, frozenset]:
            """(wall s, keep set, full label relation) for one CC
            configuration. max_iter=None means connected_components'
            DEFAULT budget (max_iter=12) — the 'uncapped' baseline is
            that budget with early-stop, not an unbounded loop."""
            t0 = time.perf_counter()
            parts, labelled = [], []
            for fp in (ifp, afp.select("doc_id", "fingerprint")):
                reps, edges = rep_edges(fp)
                kw = {} if max_iter is None else {"max_iter": max_iter}
                labels = connected_components(edges, **kw).select(
                    F.col("node").alias("rep"), "label"
                )
                labelled.append(labels)
                parts.append(
                    fp.join(reps, "fingerprint")
                    .join(labels, "rep", "left")
                    .select(
                        "doc_id",
                        F.coalesce("label", F.col("rep")).alias("cluster"),
                    )
                )
            clusters = parts[0].unionByName(parts[1])
            keep = (
                s1.join(clusters, "doc_id")
                .groupBy("cluster")
                .agg(F.min("doc_id").alias("doc_id"))
            )
            got = frozenset(r["doc_id"] for r in keep.collect())
            t = round(time.perf_counter() - t0, 2)
            # label relation collected OUTSIDE the timed window: it is
            # the convergence diagnostic, not part of the funnel's work
            # (bounded by distinct fps, well under collect limits here)
            rel = frozenset(
                (i, r["rep"], r["label"])
                for i, lab in enumerate(labelled)
                for r in lab.collect()
            )
            return t, got, rel

        t_full, keep_full, labels_full = run(None)
        res: dict = {
            "t_uncapped_s": t_full,
            "n_keep_uncapped": len(keep_full),
            "caps": {},
        }
        smallest_label_equal = None
        smallest_keep_equal = None
        for k in CAPS:
            t_k, keep_k, labels_k = run(k)
            keep_eq = keep_k == keep_full
            label_eq = labels_k == labels_full
            res["caps"][str(k)] = {
                "t_s": t_k,
                "keep_equal": keep_eq,
                "label_equal": label_eq,
                "n_keep": len(keep_k),
            }
            if label_eq and smallest_label_equal is None:
                smallest_label_equal = k
            if keep_eq and smallest_keep_equal is None:
                smallest_keep_equal = k
        # label equality vs the max_iter-12 early-stopped baseline is
        # the honest rounds-to-fixpoint measure; keep equality can
        # coincide EARLIER by luck (min-doc keeps matching before the
        # label relation converges), so it is only the admissibility
        # test for a funnel-specific cap (r13 review finding)
        res["smallest_label_equal_cap"] = smallest_label_equal
        res["smallest_keep_equal_cap"] = smallest_keep_equal
        for f in (s1, afp, ifp, media):
            f.unpersist()
        return res

    for name, fn in [
        ("media_clean_funnel", media_clean_funnel),
        ("media_image_neardup", media_image_neardup),
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
    # the r13 skip accumulator must read 0 on the well-formed corpora
    out["image_fingerprint_skips_10x"] = image_fingerprint_skip_count()

    out["media_clean_funnel"]["stages_1x"] = funnel_stages(SF)
    out["media_clean_funnel"][f"stages_{COPIES}x"] = funnel_stages(str(work))
    out["cc_round_cap_ab"] = {
        "1x": cc_ab(SF),
        f"{COPIES}x": cc_ab(str(work)),
    }

    ab10 = out["cc_round_cap_ab"][f"{COPIES}x"]
    share10 = out["media_clean_funnel"][f"stages_{COPIES}x"][
        "cluster_share_pct"
    ]
    out["decision"] = {
        "cluster_share_10x_pct": share10,
        "note": (
            "r12 verdict #5 decision input: connected_components"
            " early-stops the round the star-forest fixpoint is reached"
            " (within its default max_iter=12 budget, the 'uncapped'"
            " baseline here), so the uncapped funnel pays about"
            " smallest_label_equal_cap"
            f" (= {ab10['smallest_label_equal_cap']} at 10x) CC rounds."
            " keep_equal marks which caps preserve the funnel's keep"
            " decision (it can hold before labels converge, so it is"
            " the admissibility test, not the convergence measure)."
            " A cap can only save time if label convergence took many"
            " rounds; see caps timings. If no admissible cap beats"
            " uncapped by more than noise, the cluster-stage share is"
            " output-bound cost (distinct-fp diversity), not iteration"
            " overhead, and the right decision is NO CAP."
        ),
    }
    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
