#!/usr/bin/env python
"""Multi-executor validation of the r13 media-tier additions (the
video tier + the audio-snippet / image-tile sub-item granularity) on a REAL
standalone cluster (the r10..r13 harness: master on 127.0.0.1, 4
workers each bound to its own loopback address => distinct hosts to
the scheduler). Pins that every video surface produces EXACTLY the
same rows on the 4-worker cluster as in local mode at sf0.01:

- media_video_neardup / media_video_dedup /
  media_video_decontaminate_stored, the frame-granular pair
  media_video_frame_overlap / media_video_frame_decontaminate_stored,
  media_video_clean_funnel, and the audio-snippet / image-tile
  sub-item ops (overlap + stored decontamination cycles) — the
  registrable batch surfaces (each stored cycle covers its online
  path transitively: the roundtrip is bit-identical by construction
  and pinned in pytest);
- video corrupt-payload skip — the media_skip_count('video')
  accumulator under a real multi-process scheduler (planted
  undecodable AVIs across 8 partitions; worker->driver accumulator
  protocol, not the in-process path local mode exercises);
- streaming_media_video_decontaminate AND
  streaming_media_video_frame_decontaminate — full streaming drains
  of the seeded clip-leak and sub-clip-leak corpora (2 part files =
  2 real micro-batches each) through the shared _drain_decontam;
  between them the two twins exercise every hook of the drain
  (media_fn AVI synth, banded vs exact-match flags_fn, eval_fps vs
  frame_fps registry layout) on the cluster scheduler.

Usage (PYTHONPATH required — python UDF workers are separate
processes that do not inherit the driver's sys.path):

    PYTHONPATH=/root/repo \
        python scripts/verify_video_cluster.py > R13_VIDEO_CLUSTER_CHECK.json
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import SparkSession  # noqa: E402

from cluster_harness import package_zip, stop_cluster  # noqa: E402
from perf_straggler_cluster import (  # noqa: E402
    MASTER_URL,
    start_cluster,
)

SF = "/root/testdata/sf0.01"
N_CORRUPT = 24


def _ops():
    from honors_p1_mapreduce_spark.operators.multimodal import (
        media_audio_snippet_decontaminate_stored,
        media_audio_snippet_overlap,
        media_image_tile_decontaminate_stored,
        media_image_tile_overlap,
        media_video_dedup,
        media_video_decontaminate_stored,
        media_video_frame_decontaminate_stored,
        media_video_frame_overlap,
        media_video_neardup,
    )
    from honors_p1_mapreduce_spark.operators.pipeline import (
        media_video_clean_funnel,
    )

    return [
        ("media_video_neardup", media_video_neardup),
        ("media_video_dedup", media_video_dedup),
        ("media_video_decontaminate_stored", media_video_decontaminate_stored),
        ("media_video_frame_overlap", media_video_frame_overlap),
        (
            "media_video_frame_decontaminate_stored",
            media_video_frame_decontaminate_stored,
        ),
        ("media_video_clean_funnel", media_video_clean_funnel),
        ("media_audio_snippet_overlap", media_audio_snippet_overlap),
        (
            "media_audio_snippet_decontaminate_stored",
            media_audio_snippet_decontaminate_stored,
        ),
        ("media_image_tile_overlap", media_image_tile_overlap),
        (
            "media_image_tile_decontaminate_stored",
            media_image_tile_decontaminate_stored,
        ),
    ]


def _corrupt_skip_check(spark: SparkSession) -> dict:
    """Planted-corruption run: N_CORRUPT undecodable payloads mixed
    into a valid AVI corpus across 8 partitions."""
    from pyspark.sql import functions as F

    from honors_p1_mapreduce_spark.operators import multimodal as mm
    from tests.test_multimodal import _avi_from_payload, _video_payload

    rows = [
        (
            i,
            bytearray(
                _avi_from_payload(
                    _video_payload(
                        [10 + ((k * 37 + i) % 53) for k in range(64)]
                    )
                )
            ),
        )
        for i in range(64)
    ]
    corrupt = [
        (1000 + j, bytearray(b"not a riff container"))  # foreign magic
        if j % 3 == 0
        else (1000 + j, bytearray(rows[0][1][:40]))  # truncated header
        if j % 3 == 1
        else (1000 + j, None)  # NULL payload
        for j in range(N_CORRUPT)
    ]
    media = (
        spark.createDataFrame(rows + corrupt, "doc_id bigint, content binary")
        .withColumn("media_type", F.lit("video/avi"))
        .repartition(8)
    )
    mm.reset_media_skip_counts()
    got = sorted(
        (r["doc_id"], r["fingerprint"])
        for r in mm.video_fingerprints(media).collect()
    )
    return {"fps": got, "skips": mm.media_skip_count("video")}


def _streaming_drain(spark: SparkSession) -> list[tuple]:
    """Drain the seeded video-leak corpus (planted gain-twin /
    retouch / control, 2 part files = 2 real micro-batches) through
    the streaming video decontamination twin and return the drained
    store rows."""
    from honors_p1_mapreduce_spark.operators.multimodal import (
        media_video_eval_write_index,
    )
    from honors_p1_mapreduce_spark.streaming.curation import (
        read_media_flags_from_store,
        streaming_media_video_decontaminate,
    )
    from tests.test_multimodal import seeded_video_leak_corpus

    d = tempfile.mkdtemp(prefix="video_streamchk_")
    seeded_video_leak_corpus(spark, f"{d}/sf", n_files=2)
    media_video_eval_write_index(spark, f"{d}/sf", f"{d}/idx")
    streaming_media_video_decontaminate(
        spark,
        f"{d}/sf/documents.parquet",
        f"{d}/idx",
        f"{d}/store",
        f"{d}/ckpt",
        glob="part-*",
    )
    return sorted(
        tuple(r)
        for r in read_media_flags_from_store(spark, f"{d}/store").collect()
    )


def _streaming_frame_drain(spark: SparkSession) -> list[tuple]:
    """Drain the seeded SUB-CLIP leak corpus through the
    frame-granular streaming twin — this path exercises BOTH hooks of
    the shared drain (AVI synth media_fn + exact-match flags_fn +
    the frame_fps registry layout) on whatever scheduler ``spark``
    runs."""
    from honors_p1_mapreduce_spark.operators.multimodal import (
        media_video_frame_eval_write_index,
    )
    from honors_p1_mapreduce_spark.streaming.curation import (
        read_frame_flags_from_store,
        streaming_media_video_frame_decontaminate,
    )
    from tests.test_multimodal import seeded_frame_leak_corpus

    d = tempfile.mkdtemp(prefix="video_framechk_")
    seeded_frame_leak_corpus(spark, f"{d}/sf", n_files=2)
    media_video_frame_eval_write_index(spark, f"{d}/sf", f"{d}/idx")
    streaming_media_video_frame_decontaminate(
        spark,
        f"{d}/sf/documents.parquet",
        f"{d}/idx",
        f"{d}/store",
        f"{d}/ckpt",
        glob="part-*",
    )
    return sorted(
        tuple(r)
        for r in read_frame_flags_from_store(spark, f"{d}/store").collect()
    )


def _run_all(spark: SparkSession) -> dict:
    from honors_p1_mapreduce_spark import registry

    out: dict = {}
    for name, fn in _ops():
        out[name] = sorted(tuple(r) for r in fn(spark, SF).collect())
        spark.catalog.clearCache()
        registry.reset_memos()
    out["corrupt_payload_skip"] = _corrupt_skip_check(spark)
    out["streaming_media_video_decontaminate"] = _streaming_drain(spark)
    out["streaming_media_video_frame_decontaminate"] = (
        _streaming_frame_drain(spark)
    )
    return out


def main() -> None:
    local = (
        SparkSession.builder.master("local[8]")
        .appName("video-cluster-check-local")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    want = _run_all(local)
    local.stop()

    log_dir = tempfile.mkdtemp(prefix="video_cluster_")
    procs = start_cluster(log_dir)
    try:
        spark = (
            SparkSession.builder.master(MASTER_URL)
            .appName("video-cluster-check")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.executor.memory", "1400m")
            .getOrCreate()
        )
        spark.sparkContext.addPyFile(package_zip("video_pkg_"))
        got = _run_all(spark)
        spark.stop()
    finally:
        stop_cluster(procs)

    names = [n for n, _ in _ops()] + [
        "streaming_media_video_decontaminate",
        "streaming_media_video_frame_decontaminate",
    ]
    ops = {
        name: {
            "rows_local": len(want[name]),
            "rows_cluster": len(got[name]),
            "match": want[name] == got[name],
        }
        for name in names
    }
    ops["corrupt_payload_skip"] = {
        "valid_fps_match": want["corrupt_payload_skip"]["fps"]
        == got["corrupt_payload_skip"]["fps"],
        "skips_local": want["corrupt_payload_skip"]["skips"],
        "skips_cluster": got["corrupt_payload_skip"]["skips"],
        "match": (
            want["corrupt_payload_skip"]["fps"]
            == got["corrupt_payload_skip"]["fps"]
            and want["corrupt_payload_skip"]["skips"] == N_CORRUPT
            and got["corrupt_payload_skip"]["skips"] == N_CORRUPT
        ),
    }
    report = {
        "sf": SF,
        "workers": 4,
        "n_corrupt_planted": N_CORRUPT,
        "ops": ops,
        "all_match": all(o["match"] for o in ops.values()),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
