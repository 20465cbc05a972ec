#!/usr/bin/env python
"""Round-10 scale probe: the hot-fingerprint cap under the r9 blowup
corpus, plus 1x vs 10x timings for the session's new operators.

Corpus enlargement mirrors probe_r9_scale.py: documents are
STRING-ROTATED per copy (distinct corpus slices), orders/lineitem get
shifted keys, dimension tables are reused. The r9 probe measured the
UNCAPPED image pair query emitting 81x output at 10x data. The first
r10 guard attempt (fp-occurrence cap alone) barely helped — 78x — and
THAT measurement is what surfaced the real mechanism: the fanout is
hot (band, bucket) groups of NEAR-equal fingerprints (one 14-bit band
pattern covers 742 of 2812 sf0.1 images), not same-fp cliques. The
shipped guards are therefore IMG_NEARDUP_FP_CAP (16, winnow-style
anti-join on exact fingerprints) plus IMG_NEARDUP_BUCKET_CAP (1024,
the oversized-bucket skip: non-discriminative band patterns stop
generating candidates). Both are no-ops at 1x (max multiplicity 11,
max bucket 742 at sf0.1), so the guarded pair output must come back
to ~linear at 10x while the fully-uncapped twin still blows up
(measured: 9.87x rows / 6 s guarded vs 81.16x rows / 66 s uncapped).

New-operator expectations:
- trade_labelprop: facts reduce to the <= 300-row edge frame before
  the 4 LPA rounds — ~1x loop cost, scan-bound edge derivation.
- media_audio_features: map-only Arrow pass — ~linear.
- winnow_index_retract: extraction dominates (corpus-linear);
  retraction itself is an anti-join over the index rows.
- lm_model_retract: train/write (corpus aggregations) + the removed
  split's delta pass + kept-corpus scoring — ~linear in the scan.

Usage: python scripts/probe_r10_scale.py
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
    trade_labelprop,
)
from honors_p1_mapreduce_spark.operators.lm_quality import (  # noqa: E402
    lm_model_retract,
)
from honors_p1_mapreduce_spark.operators.multimodal import (  # noqa: E402
    media_audio_features,
    media_image_neardup,
)
from honors_p1_mapreduce_spark.operators.winnow import (  # noqa: E402
    winnow_index_retract,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
COPIES = 10


def main() -> None:
    spark = get_spark(app_name="probe_r10_scale")
    work = Path(tempfile.mkdtemp(prefix="r10_scale_"))
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
    for t in ("customer", "supplier", "nation", "region", "part", "events",
              "embeddings"):
        spark.read.parquet(f"{SF}/{t}.parquet").write.parquet(
            str(work / f"{t}.parquet")
        )

    def timed(fn, sf_dir: str) -> tuple[float, int]:
        spark.catalog.clearCache()
        registry.reset_memos()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        return round(time.perf_counter() - t0, 2), n

    # ---- the cap under the r9 blowup corpus: capped vs uncapped twin
    def neardup_uncapped(s, d):
        return media_image_neardup(s, d, fp_cap=None, bucket_cap=None)

    for name, fn in [
        ("media_image_neardup_capped", media_image_neardup),
        ("media_image_neardup_uncapped", neardup_uncapped),
        ("trade_labelprop", trade_labelprop),
        ("media_audio_features", media_audio_features),
        ("winnow_index_retract", winnow_index_retract),
        ("lm_model_retract", lm_model_retract),
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
            "rows_ratio": round(nn / max(n1, 1), 2),
            "data_ratio": COPIES,
        }
        print(
            f"{name}: 1x {t1}s/{n1} rows -> {COPIES}x {tn}s/{nn} rows "
            f"(time {tn/t1:.1f}x, rows {nn/max(n1,1):.1f}x)",
            file=sys.stderr,
        )

    print(json.dumps(out, indent=1))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
