#!/usr/bin/env python
"""Multi-executor validation of the round-14 surfaces on a REAL
standalone cluster (the r10..r13 harness: master on 127.0.0.1, 4
workers each bound to its own loopback address => distinct hosts to
the scheduler). Pins that every surface NEW or CHANGED in r14
produces EXACTLY the same rows on the 4-worker cluster as in local
mode at sf0.01:

- media_audio_decontaminate / media_audio_decontaminate_stored — the
  r14 registrations' first cluster exposure as REGISTERED names (the
  underlying paths were pinned in R12_CLUSTER_CHECK; the registered
  stored cycle composition was not)
- decontaminate_audit — recomposed to 5 tiers this round
- media_decontaminate / media_decontaminate_stored /
  media_clean_funnel / media_resize / media_image_neardup /
  media_image_dedup — every image-tier split now routes through the
  shared IMAGE_MEDIA_TYPES predicate (r13 advisor + the r14 review
  pass that closed the funnel/inline sites)
- media_avi_decode — the r14 _avi_frames_parse declared-geometry
  bound on its parse path
- avi_geometry_bomb_skip — the NEW bound's skip semantics under a
  real multi-process scheduler: a corpus with planted
  declared-height-2^31 AVIs spread across partitions must yield (a)
  exactly the local run's fingerprints for the valid clips and (b) a
  video skip count equal to the planted bomb count, aggregated across
  DISTINCT executor processes (the r13 corrupt_payload_skip pattern
  applied to the r13-advisor bug class).

Usage (PYTHONPATH required — python UDF workers are separate
processes that do not inherit the driver's sys.path):

    PYTHONPATH=/root/repo \
        python scripts/verify_r14_cluster.py > R14_CLUSTER_CHECK.json
"""

from __future__ import annotations

import json
import struct
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
N_BOMBS = 24  # planted declared-geometry-bomb AVIs


def _ops():
    from honors_p1_mapreduce_spark.operators.multimodal import (
        media_audio_decontaminate,
        media_audio_decontaminate_stored,
        media_avi_decode,
        media_decontaminate,
        media_decontaminate_stored,
        media_image_dedup,
        media_image_neardup,
        media_resize,
    )
    from honors_p1_mapreduce_spark.operators.pipeline import (
        decontaminate_audit,
        media_clean_funnel,
    )

    return [
        ("media_audio_decontaminate", media_audio_decontaminate),
        ("media_audio_decontaminate_stored", media_audio_decontaminate_stored),
        ("decontaminate_audit", decontaminate_audit),
        ("media_decontaminate", media_decontaminate),
        ("media_decontaminate_stored", media_decontaminate_stored),
        ("media_avi_decode", media_avi_decode),
        ("media_clean_funnel", media_clean_funnel),
        ("media_resize", media_resize),
        ("media_image_neardup", media_image_neardup),
        ("media_image_dedup", media_image_dedup),
    ]


def _bomb_avi() -> bytes:
    """A tiny AVI whose strf declares height 2^31-1 over one 16-byte
    frame chunk — the r13-advisor memory bomb, now an
    UnsupportedMediaError skip (multimodal._avi_frames_parse)."""
    strf = struct.pack(
        "<IiiHHIIiiII", 40, 4, 2**31 - 1, 1, 8, 0, 0, 0, 0, 0, 0
    )
    hdrl = b"hdrl" + b"strf" + struct.pack("<I", len(strf)) + strf
    movi = b"movi" + b"00db" + struct.pack("<I", 16) + b"\x00" * 16
    body = (
        b"AVI "
        + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        + b"LIST" + struct.pack("<I", len(movi)) + movi
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _bomb_skip_check(spark: SparkSession) -> dict:
    """Planted-bomb run: N_BOMBS declared-geometry bombs mixed into a
    valid synth-AVI corpus across 8 partitions. Returns the valid
    fingerprints (sorted) and the video accumulator's skip count."""
    from pyspark.sql import functions as F

    from honors_p1_mapreduce_spark.operators import multimodal as mm

    # deterministic subset (limit() is partition-order dependent and
    # could pick different rows local vs cluster)
    valid = (
        mm.media_avi_table(spark, SF)
        .filter("doc_id < 300")
        .select("doc_id", "content")
    )
    bombs = spark.createDataFrame(
        [(10_000_000 + j, bytearray(_bomb_avi())) for j in range(N_BOMBS)],
        "doc_id bigint, content binary",
    )
    media = (
        valid.unionByName(bombs)
        .withColumn("media_type", F.lit("video/avi"))
        .repartition(8)
    )
    mm.reset_media_skip_counts()
    got = sorted(
        (r["doc_id"], r["fingerprint"])
        for r in mm.video_fingerprints(media).collect()
    )
    return {"fps": got, "skips": mm.media_skip_count("video")}


def _run_all(spark: SparkSession) -> dict:
    from honors_p1_mapreduce_spark import registry

    out: dict = {}
    for name, fn in _ops():
        out[name] = sorted(tuple(r) for r in fn(spark, SF).collect())
        spark.catalog.clearCache()
        registry.reset_memos()
    out["avi_geometry_bomb_skip"] = _bomb_skip_check(spark)
    return out


def main() -> None:
    local = (
        SparkSession.builder.master("local[8]")
        .appName("r14-cluster-check-local")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    want = _run_all(local)
    local.stop()

    log_dir = tempfile.mkdtemp(prefix="r14_cluster_")
    procs = start_cluster(log_dir)
    try:
        spark = (
            SparkSession.builder.master(MASTER_URL)
            .appName("r14-cluster-check")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.executor.memory", "1400m")
            .getOrCreate()
        )
        spark.sparkContext.addPyFile(package_zip("r14_pkg_"))
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
    ops["avi_geometry_bomb_skip"] = {
        "valid_fps_match": want["avi_geometry_bomb_skip"]["fps"]
        == got["avi_geometry_bomb_skip"]["fps"],
        "skips_local": want["avi_geometry_bomb_skip"]["skips"],
        "skips_cluster": got["avi_geometry_bomb_skip"]["skips"],
        "match": (
            want["avi_geometry_bomb_skip"]["fps"]
            == got["avi_geometry_bomb_skip"]["fps"]
            and want["avi_geometry_bomb_skip"]["skips"] == N_BOMBS
            and got["avi_geometry_bomb_skip"]["skips"] == N_BOMBS
        ),
    }
    report = {
        "sf": SF,
        "workers": 4,
        "n_bombs_planted": N_BOMBS,
        "ops": ops,
        "all_match": all(o["match"] for o in ops.values()),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
