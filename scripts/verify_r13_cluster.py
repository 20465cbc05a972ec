#!/usr/bin/env python
"""Multi-executor validation of the round-13 surfaces on a REAL
standalone cluster (the r10..r12 harness: master on 127.0.0.1, 4
workers each bound to its own loopback address => distinct hosts to
the scheduler). Pins that every surface NEW or CHANGED in r13
produces EXACTLY the same rows on the 4-worker cluster as in local
mode at sf0.01:

- media_clean_funnel / decontaminate_audit / media_decontaminate_stored
  / embedding_decontaminate — the r13 registrations (media_decontaminate
  itself was cluster-checked in R12_CLUSTER_CHECK; the stored cycle and
  the composing audit were not)
- media_image_neardup / media_image_dedup — consumers of the r13
  image_fingerprints change (narrowed corrupt-payload except + skip
  accumulator)
- corrupt_payload_skip — the NEW accumulator semantics under a real
  multi-process scheduler: a corpus with planted corrupt payloads
  spread across partitions must yield (a) exactly the local run's
  fingerprints for the valid rows and (b) a skip count equal to the
  planted corrupt count, aggregated across DISTINCT executor
  processes (local mode exercises only the in-process accumulator
  path; the cluster exercises the worker->driver accumulator
  protocol).

Usage (PYTHONPATH required — python UDF workers are separate
processes that do not inherit the driver's sys.path):

    PYTHONPATH=/root/repo \
        python scripts/verify_r13_cluster.py > R13_CLUSTER_CHECK.json
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
N_CORRUPT = 24  # planted undecodable payloads in the accumulator check


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
    base = tempfile.mkdtemp(prefix="r13_pkg_")
    return shutil.make_archive(
        f"{base}/honors_p1_mapreduce_spark",
        "zip",
        root_dir=str(repo),
        base_dir="honors_p1_mapreduce_spark",
    )


def _ops():
    from honors_p1_mapreduce_spark.operators.multimodal import (
        media_decontaminate_stored,
        media_image_dedup,
        media_image_neardup,
    )
    from honors_p1_mapreduce_spark.operators.pipeline import (
        decontaminate_audit,
        media_clean_funnel,
    )
    from honors_p1_mapreduce_spark.operators.similarity import (
        embedding_decontaminate,
    )

    return [
        ("media_clean_funnel", media_clean_funnel),
        ("decontaminate_audit", decontaminate_audit),
        ("media_decontaminate_stored", media_decontaminate_stored),
        ("embedding_decontaminate", embedding_decontaminate),
        ("media_image_neardup", media_image_neardup),
        ("media_image_dedup", media_image_dedup),
    ]


def _corrupt_skip_check(spark: SparkSession) -> dict:
    """Planted-corruption run: N_CORRUPT undecodable payloads mixed
    into a valid BMP corpus across 8 partitions. Returns the valid
    fingerprints (sorted) and the accumulator's skip count."""
    from pyspark.sql import functions as F

    from honors_p1_mapreduce_spark.operators import multimodal as mm

    def grid_text(seed: int) -> str:
        out = []
        for y in range(mm.IMG_H):
            for x in range(mm.IMG_W):
                out.append(chr(32 + (x * 20 + y + seed) % 94) * 3)
        return "".join(out)

    rows = [
        (i, bytearray(mm.BMP_HEADER + grid_text(i).encode()))
        for i in range(64)
    ]
    corrupt = [
        (1000 + j, bytearray(b"BM\x01\x02"))  # struct.error
        if j % 3 == 0
        else (1000 + j, bytearray(b"P6"))  # ValueError
        if j % 3 == 1
        else (1000 + j, bytearray(b"no container"))  # UnsupportedMediaError
        for j in range(N_CORRUPT)
    ]
    media = (
        spark.createDataFrame(rows + corrupt, "doc_id bigint, content binary")
        .withColumn("media_type", F.lit("image/bmp"))
        .repartition(8)
    )
    got = sorted(
        (r["doc_id"], r["fingerprint"])
        for r in mm.image_fingerprints(media).collect()
    )
    return {"fps": got, "skips": mm.image_fingerprint_skip_count()}


def _run_all(spark: SparkSession) -> dict:
    from honors_p1_mapreduce_spark import registry

    out: dict = {}
    for name, fn in _ops():
        out[name] = sorted(tuple(r) for r in fn(spark, SF).collect())
        spark.catalog.clearCache()
        registry.reset_memos()
    out["corrupt_payload_skip"] = _corrupt_skip_check(spark)
    return out


def main() -> None:
    local = (
        SparkSession.builder.master("local[8]")
        .appName("r13-cluster-check-local")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    want = _run_all(local)
    local.stop()

    log_dir = tempfile.mkdtemp(prefix="r13_cluster_")
    procs = start_cluster(log_dir)
    try:
        spark = (
            SparkSession.builder.master(MASTER_URL)
            .appName("r13-cluster-check")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.executor.memory", "1400m")
            .getOrCreate()
        )
        spark.sparkContext.addPyFile(_package_zip())
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
