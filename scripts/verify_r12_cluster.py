#!/usr/bin/env python
"""Multi-executor validation of the round-12 surfaces on a REAL
standalone cluster (the r10/r11 harness: master on 127.0.0.1, 4
workers each bound to its own loopback address => distinct hosts to
the scheduler). Pins that every surface NEW or CHANGED in r12
produces EXACTLY the same rows on the 4-worker cluster as in local
mode at sf0.01:

- media_audio_dedup       — registered r12 (the reserved window slot)
- media_audio_decontaminate — NEW r12 library surface (audio tier of
  the contamination family)
- media_decontaminate     — r11-advisor one-decode fix (the split now
  filters raw rows before the mapInPandas barrier)
- lm_interp_score / lm_bigram_score — read paths now enroll their
  persisted frames for reset_memos release (plan-identical; this
  check rules out any cross-executor effect of the enrollment)
- streaming_media_audio_decontaminate — a FULL STREAMING DRAIN on the
  cluster (first round to cluster-check the streaming path at all):
  the seeded audio-leak corpus drained as 2 real micro-batches
  through foreachBatch + the persisted registry snapshot, compared
  against the known planted answer — covers the checkpoint dir, the
  stream-static broadcast, and the idempotent batch_id sink across
  distinct executor processes

Determinism across schedulers is the property under test: shuffle
partition placement, broadcast joins, and the mapInPandas seam must
not perturb a single value.

Usage (PYTHONPATH required — python UDF workers are separate
processes that do not inherit the driver's sys.path):

    PYTHONPATH=/root/repo \
        python scripts/verify_r12_cluster.py > R12_CLUSTER_CHECK.json
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import SparkSession  # noqa: E402

from perf_straggler_cluster import (  # noqa: E402
    MASTER_URL,
    start_cluster,
)

SF = "/root/testdata/sf0.01"


def stop_cluster(procs) -> None:
    for p in procs:
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=10)
        except Exception:
            p.kill()


def _package_zip() -> str:
    """Zip the engine package for sc.addPyFile distribution."""
    import shutil

    repo = Path(__file__).resolve().parent.parent
    base = tempfile.mkdtemp(prefix="r12_pkg_")
    return shutil.make_archive(
        f"{base}/honors_p1_mapreduce_spark",
        "zip",
        root_dir=str(repo),
        base_dir="honors_p1_mapreduce_spark",
    )


def _ops():
    from honors_p1_mapreduce_spark.operators.lm_quality import (
        lm_bigram_score,
        lm_interp_score,
    )
    from honors_p1_mapreduce_spark.operators.multimodal import (
        media_audio_decontaminate,
        media_audio_dedup,
        media_decontaminate,
    )

    return [
        ("media_audio_dedup", media_audio_dedup),
        ("media_audio_decontaminate", media_audio_decontaminate),
        ("media_decontaminate", media_decontaminate),
        ("lm_interp_score", lm_interp_score),
        ("lm_bigram_score", lm_bigram_score),
    ]


def _run_all(spark: SparkSession) -> dict[str, list[tuple]]:
    from honors_p1_mapreduce_spark import registry

    out = {}
    for name, fn in _ops():
        out[name] = sorted(tuple(r) for r in fn(spark, SF).collect())
        spark.catalog.clearCache()
        registry.reset_memos()
    out["streaming_media_audio_decontaminate"] = _streaming_drain(spark)
    return out


def _streaming_drain(spark: SparkSession) -> list[tuple]:
    """Drain the seeded audio-leak corpus (tests/test_multimodal's
    planted gain-twin/retouch/control, split into 2 part files = 2
    real micro-batches) through the streaming audio decontamination
    twin and return the drained store rows — exercises foreachBatch,
    the persisted registry snapshot, the checkpoint dir, and the
    idempotent batch_id sink on whatever scheduler ``spark`` runs."""
    import tempfile

    from honors_p1_mapreduce_spark.operators.multimodal import (
        media_audio_eval_write_index,
    )
    from honors_p1_mapreduce_spark.streaming.curation import (
        read_media_flags_from_store,
        streaming_media_audio_decontaminate,
    )
    from tests.test_multimodal import seeded_audio_leak_corpus

    d = tempfile.mkdtemp(prefix="r12_streamchk_")
    seeded_audio_leak_corpus(spark, f"{d}/sf", n_files=2)
    media_audio_eval_write_index(spark, f"{d}/sf", f"{d}/idx")
    streaming_media_audio_decontaminate(
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


def main() -> None:
    # local reference first (its own session, torn down before the
    # cluster session starts)
    local = (
        SparkSession.builder.master("local[8]")
        .appName("r12-cluster-check-local")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    want = _run_all(local)
    local.stop()

    log_dir = tempfile.mkdtemp(prefix="r12_cluster_")
    procs = start_cluster(log_dir)
    try:
        spark = (
            SparkSession.builder.master(MASTER_URL)
            .appName("r12-cluster-check")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.executor.memory", "1400m")
            .getOrCreate()
        )
        spark.sparkContext.addPyFile(_package_zip())
        got = _run_all(spark)
        spark.stop()
    finally:
        stop_cluster(procs)

    report = {
        "sf": SF,
        "workers": 4,
        "ops": {
            name: {
                "rows_local": len(want[name]),
                "rows_cluster": len(got[name]),
                "match": want[name] == got[name],
            }
            for name in want
        },
    }
    report["all_match"] = all(o["match"] for o in report["ops"].values())
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
