#!/usr/bin/env python
"""Multi-executor validation of the round-11 surfaces on a REAL
standalone cluster.

local[32] runs every operator inside one JVM — real exchanges,
broadcasts, and Arrow worker traffic between DISTINCT executor
processes on DISTINCT hosts never happen. This script reuses the
r6 straggler harness's cluster builder (perf_straggler_cluster.py:
master on 127.0.0.1, 4 workers each bound to its own loopback
address => distinct hosts to the scheduler) and pins that each new
r11 surface — the registered audio near-dup, the r12-planned audio
dedup, the multimodal funnel, and the image eval decontamination —
produces EXACTLY the same rows on the 4-worker cluster as in local mode at sf0.01.
Determinism across schedulers is the property under test: shuffle
partition placement, broadcast anti-joins, and the mapInPandas seam
must not perturb a single value.

Prints one JSON report (row counts + match booleans per operator);
manages the master/worker processes itself.

Usage (PYTHONPATH is required: python UDF workers — local AND
standalone — are separate processes that do not inherit the driver's
sys.path, only its environment):

    PYTHONPATH=/root/repo \
        python scripts/verify_r11_cluster.py > R11_CLUSTER_CHECK.json
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402

from perf_straggler_cluster import (  # noqa: E402
    MASTER_URL,
    start_cluster,
)


def stop_cluster(procs) -> None:
    for p in procs:
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=10)
        except Exception:
            p.kill()

SF = "/root/testdata/sf0.01"


def _package_zip() -> str:
    """Zip the engine package for sc.addPyFile distribution."""
    import shutil

    repo = Path(__file__).resolve().parent.parent
    base = tempfile.mkdtemp(prefix="r11_pkg_")
    return shutil.make_archive(
        f"{base}/honors_p1_mapreduce_spark",
        "zip",
        root_dir=str(repo),
        base_dir="honors_p1_mapreduce_spark",
    )


def _ops():
    from honors_p1_mapreduce_spark.operators.multimodal import (
        media_audio_dedup,
        media_audio_neardup,
        media_decontaminate,
    )
    from honors_p1_mapreduce_spark.operators.pipeline import (
        media_clean_funnel,
    )

    return [
        ("media_audio_neardup", media_audio_neardup),
        ("media_audio_dedup", media_audio_dedup),
        ("media_clean_funnel", media_clean_funnel),
        ("media_decontaminate", media_decontaminate),
    ]


def _run_all(spark: SparkSession) -> dict[str, list[tuple]]:
    out = {}
    for name, fn in _ops():
        out[name] = sorted(tuple(r) for r in fn(spark, SF).collect())
        spark.catalog.clearCache()
    return out


def main() -> None:
    # local reference first (its own session, torn down before the
    # cluster session starts)
    local = (
        SparkSession.builder.master("local[8]")
        .appName("r11-cluster-check-local")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    want = _run_all(local)
    local.stop()

    log_dir = tempfile.mkdtemp(prefix="r11_cluster_")
    procs = start_cluster(log_dir)
    try:
        spark = (
            SparkSession.builder.master(MASTER_URL)
            .appName("r11-cluster-check")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.executor.memory", "1400m")
            .getOrCreate()
        )
        # executor python workers unpickle mapInPandas closures that
        # reference the package — distinct-process executors need it on
        # THEIR path (local mode inherits the driver's; standalone
        # workers ignore executorEnv.PYTHONPATH, so ship a py-files zip)
        spark.sparkContext.addPyFile(_package_zip())
        got = _run_all(spark)
        spark.stop()
    finally:
        stop_cluster(procs)

    report = {
        name: {
            "rows": len(want[name]),
            "cluster_rows": len(got[name]),
            "match": got[name] == want[name],
        }
        for name in want
    }
    report["all_match"] = all(v["match"] for v in report.values())
    print(json.dumps(report, indent=1))
    if not report["all_match"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
