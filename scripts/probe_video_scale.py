#!/usr/bin/env python
"""Video-tier scale probe (r13): the registrable video surfaces
(clip-level neardup/dedup/decontaminate + the frame-granular
overlap/decontaminate pair)
at 1x vs 10x corpus, the same evidence the image/audio tiers carried
into their registrations (R10/R12_SCALE_PROBE):

- near-dup pair output and wall time should scale near the OUTPUT
  ratio, not quadratically (the dual clique guards' claim);
- dedup wall time is bounded by distinct-fp diversity (the pair-free
  CC claim — rows scale ~linearly because every clip gets a label);
- decontamination is a broadcast join against the benchmark-sized
  eval side (never a corpus self-join), so its time should track the
  one fingerprint scan;
- media_skip_count('video') must read 0 on the well-formed synth
  corpora at both scales (the accumulator is a corruption monitor,
  not a row counter).

Corpus enlargement mirrors probe_r9..r13_scale.py: documents are
STRING-ROTATED per copy so every copy is a distinct corpus slice
(rotation changes leading bytes -> distinct AVI frames -> distinct
fingerprints; a plain union of identical copies would only test the
same-fp collapse path).

Usage: python scripts/probe_video_scale.py  (writes JSON to stdout)
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

from pyspark.sql import functions as F  # noqa: E402

from honors_p1_mapreduce_spark import registry  # noqa: E402
from honors_p1_mapreduce_spark.operators.multimodal import (  # noqa: E402
    media_audio_snippet_overlap,
    media_image_tile_overlap,
    media_skip_count,
    media_video_dedup,
    media_video_decontaminate,
    media_video_frame_decontaminate,
    media_video_frame_overlap,
    media_video_neardup,
    reset_media_skip_counts,
)
from honors_p1_mapreduce_spark.operators.pipeline import (  # noqa: E402
    media_video_clean_funnel,
)
from honors_p1_mapreduce_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PROBE_SF", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("PROBE_COPIES", "10"))


def main() -> None:
    spark = get_spark(app_name="probe_video_scale")
    work = Path(tempfile.mkdtemp(prefix="video_scale_"))
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

    def timed(fn, sf_dir: str) -> tuple[float, int]:
        spark.catalog.clearCache()
        registry.reset_memos()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        return round(time.perf_counter() - t0, 2), n

    # skip counts are reset and read PER SCALE (review finding: one
    # reset before all six runs aggregated both scales into a single
    # number, so a nonzero reading could not be attributed and the
    # "0 at both scales" claim was only checkable because 0 has no
    # parts) — the accumulator is cumulative per context by design,
    # so per-scale attribution must bracket the runs explicitly
    skips = {}
    for sf_label, sf_dir in (("1x", SF), ("10x", str(work))):
        reset_media_skip_counts()
        for name, fn in (
            ("media_video_neardup", media_video_neardup),
            ("media_video_dedup", media_video_dedup),
            ("media_video_decontaminate", media_video_decontaminate),
            ("media_video_frame_overlap", media_video_frame_overlap),
            (
                "media_video_frame_decontaminate",
                media_video_frame_decontaminate,
            ),
            ("media_video_clean_funnel", media_video_clean_funnel),
            ("media_audio_snippet_overlap", media_audio_snippet_overlap),
            ("media_image_tile_overlap", media_image_tile_overlap),
        ):
            t, n = timed(fn, sf_dir)
            out.setdefault(name, {})[f"t_{sf_label}_s"] = t
            out[name][f"rows_{sf_label}"] = n
        skips[sf_label] = media_skip_count("video")
    for name in (
        "media_video_neardup",
        "media_video_dedup",
        "media_video_decontaminate",
        "media_video_frame_overlap",
        "media_video_frame_decontaminate",
        "media_video_clean_funnel",
        "media_audio_snippet_overlap",
        "media_image_tile_overlap",
    ):
        d = out[name]
        d["time_ratio"] = (
            round(d["t_10x_s"] / d["t_1x_s"], 2) if d["t_1x_s"] else None
        )
        d["rows_ratio"] = (
            round(d["rows_10x"] / d["rows_1x"], 2) if d["rows_1x"] else None
        )
        d["data_ratio"] = COPIES
    out["video_fingerprint_skips_1x"] = skips["1x"]
    out["video_fingerprint_skips_10x"] = skips["10x"]

    print(json.dumps(out, indent=1))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
