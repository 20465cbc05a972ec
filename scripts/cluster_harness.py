"""Shared helpers for the per-round 4-worker cluster-check scripts
(r13 review: stop_cluster/_package_zip had been copied verbatim into
each round's verify_r*_cluster.py — a teardown or packaging fix had
to land in three places. The committed r10..r13 scripts stay as-is
because they are round-stamped evidence artifacts; NEW checks import
from here). start_cluster/MASTER_URL continue to live in
perf_straggler_cluster, the harness that originated them."""

from __future__ import annotations

import tempfile
from pathlib import Path


def stop_cluster(procs) -> None:
    for p in procs:
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=10)
        except Exception:
            p.kill()


def package_zip(prefix: str = "pkg_") -> str:
    """Zip the engine package for sc.addPyFile distribution to the
    cluster's separate worker processes."""
    import shutil

    repo = Path(__file__).resolve().parent.parent
    base = tempfile.mkdtemp(prefix=prefix)
    return shutil.make_archive(
        f"{base}/honors_p1_mapreduce_spark",
        "zip",
        root_dir=str(repo),
        base_dir="honors_p1_mapreduce_spark",
    )
