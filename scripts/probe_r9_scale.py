#!/usr/bin/env python
"""Round-9 scale probe for the session's new operators.

Times each new operator at 1x and 10x data with cold memos, using
shifted-id enlarged copies of the sf0.1 tables in a temp dir shaped
like an sf dir:

- media_image_neardup: the decode+dHash pass is map-only mapInPandas
  (expected ~linear); the band join runs over 8-byte fingerprints.
  Enlarged documents are STRING-ROTATED by a per-copy offset
  (substring cycle), which shifts every pixel position: verbatim OR
  letter-translated copies keep their gradient ORDER and stay
  perceptual duplicates across copies (measured: letter rotation
  gave 101x pair output = copies^2 cliques — dHash is invariant to
  order-preserving byte maps, which is its JOB), so positional
  rotation is what makes each copy a distinct corpus slice with the
  same intra-copy near-dup structure. Pair OUTPUT still grows
  super-linearly when popular fingerprints form cliques (a real
  corpus property); the DECISION operator media_image_dedup is the
  scale path — CC over DISTINCT fingerprints, so same-fp megacliques
  collapse to one node and its probe must stay near-linear.
- quantile_daily_merge: one map-side-combined pass to the daily
  grids; the merge/window/probe stages run on dashboard-sized frames
  regardless of data size — expected ~linear in the scan.
- trade_kcore / trade_pagerank: the only big-data stage is the fact
  join deriving the <= 300-row edge frame (lineitem+orders enlarged
  10x with shifted keys; customer/supplier reused); the peel loop and
  the 8 PageRank rounds never touch facts.
- lm_score_stored: model build = two corpus aggregations, scoring =
  one tokenize pass + a vocab-sized join — ~linear in the scan.
- pq_search_appended: codebook training on the base split dominates
  (Lloyd over 10x vectors); the append itself is one per-vector
  assignment pass.

Usage: python scripts/probe_r9_scale.py
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

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.operators.graph import (  # noqa: E402
    trade_kcore,
    trade_pagerank,
)
from honors_p1_mapreduce_spark.operators.lm_quality import (  # noqa: E402
    lm_score_stored,
)
from honors_p1_mapreduce_spark.operators.pq import (  # noqa: E402
    pq_search_appended,
)
from honors_p1_mapreduce_spark.operators.multimodal import (  # noqa: E402
    media_image_dedup,
    media_image_neardup,
)
from honors_p1_mapreduce_spark.operators.sketch import (  # noqa: E402
    quantile_daily_merge,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
COPIES = 10


def main() -> None:
    spark = get_spark(app_name="probe_r9_scale")
    work = Path(tempfile.mkdtemp(prefix="r9_scale_"))
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

    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_ev = ev.count()
    big_ev = ev
    for i in range(1, COPIES):
        big_ev = big_ev.unionByName(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * n_ev))
        )
    big_ev.repartition(32).write.parquet(str(work / "events.parquet"))

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    shift = (orders.agg(F.max("o_orderkey")).collect()[0][0] or 0) + 1
    big_o, big_l = orders, li
    for i in range(1, COPIES):
        big_o = big_o.unionByName(
            orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * shift))
        )
        big_l = big_l.unionByName(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * shift))
        )
    big_o.repartition(32).write.parquet(str(work / "orders.parquet"))
    big_l.repartition(32).write.parquet(str(work / "lineitem.parquet"))

    embx = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_emb = embx.count()
    big_e = embx
    for i in range(1, COPIES):
        big_e = big_e.unionByName(
            embx.withColumn("vec_id", F.col("vec_id") + F.lit(i * n_emb))
        )
    big_e.repartition(32).write.parquet(str(work / "embeddings.parquet"))
    for t in ("customer", "supplier", "nation", "region", "part"):
        spark.read.parquet(f"{SF}/{t}.parquet").write.parquet(
            str(work / f"{t}.parquet")
        )

    def timed(fn, sf_dir: str) -> tuple[float, int]:
        spark.catalog.clearCache()
        registry.reset_memos()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        return round(time.perf_counter() - t0, 2), n

    for name, fn in [
        ("media_image_neardup", media_image_neardup),
        ("media_image_dedup", media_image_dedup),
        ("quantile_daily_merge", quantile_daily_merge),
        ("trade_kcore", trade_kcore),
        ("trade_pagerank", trade_pagerank),
        ("lm_score_stored", lm_score_stored),
        ("pq_search_appended", pq_search_appended),
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
            "data_ratio": COPIES,
        }
        print(
            f"{name}: 1x {t1}s -> {COPIES}x {tn}s (ratio {tn/t1:.1f})",
            file=sys.stderr,
        )

    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
