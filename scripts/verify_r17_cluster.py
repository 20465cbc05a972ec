#!/usr/bin/env python
"""Multi-executor validation of the round-17 surfaces on a REAL
standalone cluster (the r10..r16 harness: master on 127.0.0.1, 4
workers each bound to its own loopback address => distinct hosts to
the scheduler). Pins that every surface NEW in r17 produces EXACTLY
the same rows on the 4-worker cluster as in local mode at sf0.01:

- dedup_substring_cut(+_stored) — first cluster exposure as
  REGISTERED names (the r17 registrations)
- winnow_index_refresh_stored — the merge-on-read refresh twin: the
  cluster-relevant risk is the layered read (base parquet ANTI
  tombstones UNION delta) reconciling identically regardless of
  which executor wrote/reads which partition, plus the
  build-if-absent base artifact behaving under multi-process
  executors (the artifact lives on the driver-visible FS; only the
  driver writes it)
- pq_index_refresh — retract + frozen-codebook encode + two-stage
  serve across executor processes

Usage (PYTHONPATH required — python UDF workers are separate
processes that do not inherit the driver's sys.path):

    PYTHONPATH=/root/repo \
        python scripts/verify_r17_cluster.py > R17_CLUSTER_CHECK.json
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
    from honors_p1_mapreduce_spark.operators.curation_ext import (
        winnow_index_refresh_stored,
    )
    from honors_p1_mapreduce_spark.operators.pq import pq_index_refresh
    from honors_p1_mapreduce_spark.operators.substring_dedup import (
        dedup_substring_cut,
        dedup_substring_cut_stored,
    )

    return [
        ("dedup_substring_cut", dedup_substring_cut),
        ("dedup_substring_cut_stored", dedup_substring_cut_stored),
        ("winnow_index_refresh_stored", winnow_index_refresh_stored),
        ("pq_index_refresh", pq_index_refresh),
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
        .appName("r17-cluster-check-local")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    want = _run_all(local)
    local.stop()

    log_dir = tempfile.mkdtemp(prefix="r17_cluster_")
    procs = start_cluster(log_dir)
    try:
        spark = (
            SparkSession.builder.master(MASTER_URL)
            .appName("r17-cluster-check")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.executor.memory", "1400m")
            .getOrCreate()
        )
        spark.sparkContext.addPyFile(package_zip("r17_pkg_"))
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
    report = {
        "sf": SF,
        "workers": 4,
        "ops": ops,
        "all_match": all(o["match"] for o in ops.values()),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
