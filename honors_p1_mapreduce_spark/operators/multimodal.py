"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata (north-star surface; no reference counterpart).

Model: media is an opaque ``binary`` column alongside typed metadata
(``media_type``, byte size, checksums). All Spark-side plumbing —
schema, partitioning, Arrow batch shapes, UDF signatures — is real
and tested; the actual codec step is STUBBED because image/audio
libraries are not in this container:

- ``use_real_codecs=True`` raises ``NotImplementedError`` (the marked
  integration point where PIL/librosa/ffmpeg decoding would plug in);
- the default fake decoder derives deterministic "dimensions" and a
  feature vector from the payload's md5, so the full pipeline —
  binary in, per-item features out, frame sampling — runs and is
  reproducible in tests.

The demo media table derives its payloads from ``documents.text``
(UTF-8 bytes) so ``media_stats`` stays fully oracle-checkable: DuckDB
has no binary md5, but for UTF-8-derived payloads ``md5(text)`` is
byte-identical to Spark's ``md5(binary)``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

MEDIA_TYPES = ("image/png", "audio/wav", "video/mp4")

DECODE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, "
    "width int, height int, n_frames int, feature array<float>"
)
FEATURE_DIM = 8


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic demo media frame: (doc_id, media_type, content:
    binary, n_bytes). Payload = UTF-8 bytes of the document text;
    media_type assigned round-robin by doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
    )
    content = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        content.alias("content"),
        F.length(content).alias("n_bytes"),
    )


def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media-type stats over the binary column: item count, total/
    max payload bytes, distinct payload checksums. One pruned scan +
    one 3-group aggregate (map-only until the tiny final shuffle)."""
    m = media_table(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").cast("long").alias("max_bytes"),
        F.countDistinct(F.md5("content")).alias("n_distinct_payloads"),
    )


MEDIA_STATS_ORACLE = """
SELECT ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 + 1 AS INT)]
         AS media_type,
       count(*) AS n_items,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       max(octet_length(encode(text))) AS max_bytes,
       count(DISTINCT md5(text)) AS n_distinct_payloads
FROM documents
GROUP BY 1
"""


# The codec seam: any callable (payload bytes, media_type) ->
# (width, height, n_frames, feature list of FEATURE_DIM floats).
# A real decoder (PIL/librosa/ffmpeg) plugs in as ``codec=`` without
# touching the operator; tests/test_multimodal.py holds the contract
# test that any conforming codec yields the registered DECODE_SCHEMA.
Codec = Callable[[bytes, str], tuple[int, int, int, list[float]]]


def _fake_decode(content: bytes, media_type: str) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a codec: dimensions + an 8-dim
    feature vector derived from the payload digest. Replaced wholesale
    by a real decoder where codecs exist."""
    d = hashlib.md5(content).digest()
    width = 16 + d[0] % 240
    height = 16 + d[1] % 240
    n_frames = 1 if not media_type.startswith("video/") else 1 + d[2] % 120
    feature = [round(b / 255.0, 6) for b in d[:FEATURE_DIM]]
    return width, height, n_frames, feature


def decode_media_features(
    media: DataFrame,
    use_real_codecs: bool = False,
    codec: Codec | None = None,
) -> DataFrame:
    """Decode/feature-extract over binary payloads via ``mapInPandas``.

    Arrow streams each partition as pandas batches — payloads arrive
    as Python ``bytes`` / ``bytearray``, exactly what a real codec
    takes — and the operator stays embarrassingly parallel: no
    shuffle, output partitioning inherits the input's.

    ``codec`` is the injection point: any callable matching the seam
    contract (bytes, media_type) -> (width, height, n_frames, feature)
    is shipped to executors inside the pandas iterator closure. The
    default is the deterministic md5 fake.
    """
    if use_real_codecs and codec is None:
        raise NotImplementedError(
            "real image/audio/video codecs are not available in this "
            "environment; pass codec=<PIL/librosa/ffmpeg adapter> here"
        )
    decode_one = codec or _fake_decode

    def _decode(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "media_type": [], "n_bytes": [],
                "width": [], "height": [], "n_frames": [], "feature": [],
            }
            for doc_id, mt, content in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                blob = bytes(content)
                w, h, nf, feat = decode_one(blob, mt)
                out["doc_id"].append(doc_id)
                out["media_type"].append(mt)
                out["n_bytes"].append(len(blob))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return media.mapInPandas(_decode, schema=DECODE_SCHEMA)


def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: decode the demo media table with the
    deterministic fake codec.

    The library-level ``decode_media_features`` keeps the raw
    ``array<float>`` feature; the registered query replaces it with a
    canon-safe scalar ``feature_digest`` (the driver's canonicalizer
    sorts rows with pandas, which cannot hash list cells). The digest
    inverts each feature float back to its source md5 byte
    (``round(x*255)`` is exact: the 6-decimal rounding error is
    ~5e-7 << 1/510) and md5s the comma-joined byte list — so the
    digest deterministically covers every feature value, and, because
    the fake codec is pure md5-of-payload arithmetic over UTF-8
    payloads, DuckDB reproduces it byte-for-byte from ``md5(text)``.
    """
    decoded = decode_media_features(media_table(spark, sf_dir))
    byte_strs = F.transform(
        F.col("feature"), lambda x: F.round(x * 255).cast("int").cast("string")
    )
    return decoded.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "width",
        "height",
        "n_frames",
        F.md5(F.concat_ws(",", byte_strs)).alias("feature_digest"),
    )


def _md5_byte_sql(i: int) -> str:
    """DuckDB expression for byte ``i`` of md5(text): two hex chars ->
    bigint via the same '0x' cast used by the simhash oracles."""
    return f"CAST(concat('0x', substr(md5(text), {2 * i + 1}, 2)) AS BIGINT)"


MEDIA_DECODE_FEATURES_ORACLE = f"""
WITH b AS (
  SELECT doc_id,
         ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 + 1 AS INT)]
           AS media_type,
         CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         {", ".join(f"{_md5_byte_sql(i)} AS d{i}" for i in range(FEATURE_DIM))}
  FROM documents
)
SELECT doc_id, media_type, n_bytes,
       CAST(16 + d0 % 240 AS INT) AS width,
       CAST(16 + d1 % 240 AS INT) AS height,
       CAST(CASE WHEN media_type LIKE 'video/%' THEN 1 + d2 % 120 ELSE 1 END
            AS INT) AS n_frames,
       md5(concat_ws(',', {", ".join(f"d{i}" for i in range(FEATURE_DIM))}))
         AS feature_digest
FROM b
"""


def frame_sample(
    decoded: DataFrame, every_k: int = 10
) -> DataFrame:
    """Sample every ``every_k``-th frame index per video item — pure
    Catalyst over the decoded ``n_frames`` (sequence + explode), no
    Python; one row per sampled frame."""
    vids = decoded.filter(F.col("media_type").startswith("video/"))
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
    return vids.select(
        "doc_id", "n_frames", F.explode(idx).alias("frame_idx")
    )


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: sampled frame indices for videos. Oracle-
    checkable because ``n_frames`` is md5-byte arithmetic (see
    ``media_decode_features``) and the sampling itself is a pure
    ``sequence``/``explode`` with no Python."""
    return frame_sample(decode_media_features(media_table(spark, sf_dir)))


MEDIA_FRAME_SAMPLE_ORACLE = f"""
WITH b AS (
  SELECT doc_id,
         ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 + 1 AS INT)]
           AS media_type,
         {_md5_byte_sql(2)} AS d2
  FROM documents
), v AS (
  SELECT doc_id, CAST(1 + d2 % 120 AS INT) AS n_frames
  FROM b
  WHERE media_type LIKE 'video/%'
)
SELECT doc_id, n_frames, CAST(f AS INT) AS frame_idx
FROM v, unnest(generate_series(0, n_frames - 1, 10)) AS t(f)
"""
