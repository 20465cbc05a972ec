#!/usr/bin/env python
"""Multi-executor validation of the round-15 surfaces on a REAL
standalone cluster (the r10..r14 harness: master on 127.0.0.1, 4
workers each bound to its own loopback address => distinct hosts to
the scheduler). Pins that every surface NEW or CHANGED in r15
produces EXACTLY the same rows on the 4-worker cluster as in local
mode at sf0.01:

- the 8 VIDEO-tier registrations (media_video_neardup/_dedup/
  _decontaminate(_stored), the frame trio, media_video_clean_funnel)
  — first cluster exposure as REGISTERED names (underlying paths were
  pinned in R13_VIDEO_CLUSTER_CHECK; the registered compositions and
  the r15 fp_clusters change were not)
- decontaminate_audit — recomposed to 6 tiers this round
- the fp_clusters callers (media_clean_funnel, media_image_dedup,
  media_audio_dedup) — the first-matching-band edge emission under a
  real multi-process scheduler (the distinct-shuffle removal must not
  depend on single-JVM partitioning)
- contamination_check — prefilter/tail refactor
- decontaminate_bloom_prefilter — the driver-collected 16 kB bitmap
  shipping to REAL executor processes as a literal array (the
  cluster-relevant risk for this surface), plus exact row equality
  with contamination_check ON the cluster
- containment_pairs — the r15 doc-in-doc surface

Usage (PYTHONPATH required — python UDF workers are separate
processes that do not inherit the driver's sys.path):

    PYTHONPATH=/root/repo \
        python scripts/verify_r15_cluster.py > R15_CLUSTER_CHECK.json
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import SparkSession  # noqa: E402

from cluster_harness import (  # noqa: E402
    package_zip,
    stop_cluster,
)
from perf_straggler_cluster import (  # noqa: E402
    MASTER_URL,
    start_cluster,
)

SF = "/root/testdata/sf0.01"


def _ops():
    from honors_p1_mapreduce_spark.operators.curation import (
        contamination_check,
        decontaminate_bloom_prefilter,
    )
    from honors_p1_mapreduce_spark.operators.dedup import containment_pairs
    from honors_p1_mapreduce_spark.operators.multimodal import (
        media_audio_dedup,
        media_image_dedup,
        media_video_decontaminate,
        media_video_decontaminate_stored,
        media_video_dedup,
        media_video_frame_decontaminate,
        media_video_frame_decontaminate_stored,
        media_video_frame_overlap,
        media_video_neardup,
    )
    from honors_p1_mapreduce_spark.operators.pipeline import (
        decontaminate_audit,
        media_clean_funnel,
        media_video_clean_funnel,
    )

    return [
        ("media_video_neardup", media_video_neardup),
        ("media_video_dedup", media_video_dedup),
        ("media_video_decontaminate", media_video_decontaminate),
        ("media_video_decontaminate_stored", media_video_decontaminate_stored),
        ("media_video_frame_overlap", media_video_frame_overlap),
        ("media_video_frame_decontaminate", media_video_frame_decontaminate),
        (
            "media_video_frame_decontaminate_stored",
            media_video_frame_decontaminate_stored,
        ),
        ("media_video_clean_funnel", media_video_clean_funnel),
        ("decontaminate_audit", decontaminate_audit),
        ("media_clean_funnel", media_clean_funnel),
        ("media_image_dedup", media_image_dedup),
        ("media_audio_dedup", media_audio_dedup),
        ("contamination_check", contamination_check),
        ("decontaminate_bloom_prefilter", decontaminate_bloom_prefilter),
        ("containment_pairs", containment_pairs),
    ]


def _run_all(spark: SparkSession) -> dict:
    from honors_p1_mapreduce_spark import registry

    out: dict = {}
    for name, fn in _ops():
        out[name] = sorted(tuple(r) for r in fn(spark, SF).collect())
        spark.catalog.clearCache()
        registry.reset_memos()
    return out


def main() -> None:
    local = (
        SparkSession.builder.master("local[8]")
        .appName("r15-cluster-check-local")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    want = _run_all(local)
    local.stop()

    log_dir = tempfile.mkdtemp(prefix="r15_cluster_")
    procs = start_cluster(log_dir)
    try:
        spark = (
            SparkSession.builder.master(MASTER_URL)
            .appName("r15-cluster-check")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.executor.memory", "1400m")
            .getOrCreate()
        )
        spark.sparkContext.addPyFile(package_zip("r15_pkg_"))
        got = _run_all(spark)
        spark.stop()
    finally:
        stop_cluster(procs)

    ops = {
        name: {
            "rows_local": len(want[name]),
            "rows_cluster": len(got[name]),
            "match": want[name] == got[name],
        }
        for name, _ in _ops()
    }
    # the bloom path must equal the exact tier ON the cluster too —
    # not just locally (the filter-cancels-out claim under real
    # executor-shipped bitmap literals)
    ops["bloom_equals_exact_on_cluster"] = {
        "match": got["decontaminate_bloom_prefilter"]
        == got["contamination_check"]
    }
    report = {
        "sf": SF,
        "workers": 4,
        "ops": ops,
        "all_match": all(o["match"] for o in ops.values()),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
