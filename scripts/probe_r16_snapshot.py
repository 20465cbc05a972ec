#!/usr/bin/env python
"""Round-16 snapshot-surface scale probe: the delta-refresh claim is
O(churn) maintenance vs O(corpus) rebuild — measure it instead of
arguing it. At sf0.1, the OLD snapshot is the whole documents table
and the NEW snapshot rotates the text of a churn fraction f of docs
(doc_id % M == 0 for M in {50, 10, 3} -> f in {2%, 10%, 33%}).
For each f:
  t_rebuild  — full fingerprint extraction over the NEW snapshot
               written to parquet (what a non-incremental pipeline
               pays every recrawl, independent of f)
  t_refresh  — diff -> anti-join deletion of changed rows from the
               STORED index -> extraction over the churn docs only ->
               union -> write (what winnow_index_refresh pays)
  equal      — refreshed index row-set == rebuilt index row-set
Acceptance: t_rebuild ~ flat in f; t_refresh falls with f and sits
well under t_rebuild at production-like churn (2%).

Usage: python scripts/probe_r16_snapshot.py  (JSON to stdout)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from honors_p1_mapreduce_spark.operators.curation_ext import (  # noqa: E402
    SNAP_ROT,
    snapshot_diff,
)
from honors_p1_mapreduce_spark.operators.winnow import (  # noqa: E402
    winnow_fingerprints_chunked_from,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PROBE_SF", "/root/testdata/sf0.1")
MODS = (50, 10, 3)  # churn fractions 2%, 10%, 33%


def main() -> None:
    spark = get_spark(app_name="probe_r16_snapshot")
    work = Path(tempfile.mkdtemp(prefix="r16_snap_"))
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .persist()
    )
    n_docs = docs.count()

    rotated = F.concat(
        F.expr(f"substring(text, {SNAP_ROT + 1})"),
        F.expr(f"substring(text, 1, {SNAP_ROT})"),
    )

    # the pre-existing artifact: the OLD snapshot's stored index
    d_old = work / "idx_old"
    t0 = time.perf_counter()
    winnow_fingerprints_chunked_from(docs).write.parquet(
        f"{d_old}/fingerprints"
    )
    t_build_old = round(time.perf_counter() - t0, 2)

    out: dict = {
        "sf": SF,
        "n_docs": n_docs,
        "t_build_old_index_s": t_build_old,
        "churn": {},
    }
    for mod in MODS:
        new_docs = docs.select(
            "doc_id",
            F.when(F.col("doc_id") % mod == 0, rotated)
            .otherwise(F.col("text"))
            .alias("text"),
        )
        n_churn = docs.filter(F.col("doc_id") % mod == 0).count()

        d_rb = work / f"idx_rebuild_{mod}"
        t0 = time.perf_counter()
        winnow_fingerprints_chunked_from(new_docs).write.parquet(
            f"{d_rb}/fingerprints"
        )
        t_rebuild = round(time.perf_counter() - t0, 2)

        d_rf = work / f"idx_refresh_{mod}"
        t0 = time.perf_counter()
        old_h = docs.select("doc_id", F.md5("text").alias("h"))
        new_h = new_docs.select("doc_id", F.md5("text").alias("h"))
        diff = snapshot_diff(old_h, new_h)
        churn_ids = diff.filter(F.col("status") != "added").select("doc_id")
        kept = spark.read.parquet(f"{d_old}/fingerprints").join(
            churn_ids, "doc_id", "left_anti"
        )
        fresh = winnow_fingerprints_chunked_from(
            new_docs.join(
                diff.filter(F.col("status") != "removed").select("doc_id"),
                "doc_id",
            )
        )
        kept.unionByName(fresh).write.parquet(f"{d_rf}/fingerprints")
        t_refresh = round(time.perf_counter() - t0, 2)

        a = spark.read.parquet(f"{d_rb}/fingerprints")
        b = spark.read.parquet(f"{d_rf}/fingerprints")
        equal = (
            a.count() == b.count()
            and a.exceptAll(b).limit(1).count() == 0
        )
        out["churn"][f"mod{mod}"] = {
            "churn_docs": n_churn,
            "churn_pct": round(100.0 * n_churn / n_docs, 1),
            "t_rebuild_s": t_rebuild,
            "t_refresh_s": t_refresh,
            "refresh_over_rebuild": round(t_refresh / t_rebuild, 2),
            "index_equal": equal,
        }
        print(f"mod{mod}: {out['churn'][f'mod{mod}']}", file=sys.stderr)

    docs.unpersist()
    rb = out["churn"]
    out["acceptance"] = {
        "rebuild_flat_in_churn": max(
            c["t_rebuild_s"] for c in rb.values()
        ) <= 1.3 * min(c["t_rebuild_s"] for c in rb.values()),
        "refresh_beats_rebuild_at_2pct": rb["mod50"]["refresh_over_rebuild"] < 0.7,
        "all_equal": all(c["index_equal"] for c in rb.values()),
    }
    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
