"""Multimodal plumbing tests: oracle parity for the binary stats,
Arrow batch shapes + determinism for the stubbed decode path."""

from __future__ import annotations

import pytest

from honors_p1_mapreduce_spark import registry
from honors_p1_mapreduce_spark.operators import multimodal as mm

from .oracle import compare_query


def test_media_stats_oracle(spark, sf_dir):
    compare_query(
        spark, sf_dir, registry.QUERIES["media_stats"],
        registry.ORACLES["media_stats"],
    )


def test_media_decode_oracle(spark, sf_dir):
    compare_query(
        spark, sf_dir, registry.QUERIES["media_decode_features"],
        registry.ORACLES["media_decode_features"],
    )
    compare_query(
        spark, sf_dir, registry.QUERIES["media_frame_sample"],
        registry.ORACLES["media_frame_sample"],
    )


def test_registered_decode_is_canon_safe(spark, sf_dir):
    # the registered query must not carry list-typed cells (the driver's
    # pandas canonicalizer cannot sort them); the raw feature array stays
    # on the library-level decode_media_features
    out = registry.QUERIES["media_decode_features"](spark, sf_dir)
    assert out.columns == [
        "doc_id", "media_type", "n_bytes", "width", "height", "n_frames",
        "feature_digest",
    ]


def test_decode_shapes_and_determinism(spark, sf_dir):
    out = mm.decode_media_features(mm.media_table(spark, sf_dir))
    assert out.columns == [
        "doc_id", "media_type", "n_bytes", "width", "height", "n_frames",
        "feature",
    ]
    rows = out.collect()
    n_docs = mm.media_table(spark, sf_dir).count()
    assert len(rows) == n_docs  # 1:1, no rows lost in the UDF
    for r in rows[:20]:
        assert len(r.feature) == mm.FEATURE_DIM
        assert 16 <= r.width <= 255 and 16 <= r.height <= 255
        if r.media_type.startswith("video/"):
            assert r.n_frames >= 1
        else:
            assert r.n_frames == 1
    again = {r.doc_id: tuple(r.feature) for r in out.collect()}
    first = {r.doc_id: tuple(r.feature) for r in rows}
    assert again == first  # fake codec is deterministic


def test_real_codecs_stub_raises(spark, sf_dir):
    media = mm.media_table(spark, sf_dir)
    with pytest.raises(NotImplementedError):
        mm.decode_media_features(media, use_real_codecs=True)


def test_frame_sample_only_videos(spark, sf_dir):
    sampled = registry.QUERIES["media_frame_sample"](spark, sf_dir)
    rows = sampled.collect()
    assert rows, "expected sampled frames for video items"
    decoded = {
        r.doc_id: r.n_frames
        for r in mm.decode_media_features(mm.media_table(spark, sf_dir)).collect()
        if r.media_type.startswith("video/")
    }
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert set(by_doc) == set(decoded)  # every video sampled, only videos
    for doc_id, idxs in by_doc.items():
        assert idxs == sorted(idxs)
        assert all(0 <= i < decoded[doc_id] for i in idxs)
        assert idxs == list(range(0, decoded[doc_id], 10))


def _sha_codec(content: bytes, media_type: str):
    """Second, distinct fake codec (sha1-derived, different value space
    than the md5 default) used to prove the seam contract: ANY callable
    matching (bytes, media_type) -> (w, h, frames, features) slots in."""
    import hashlib

    d = hashlib.sha1(content).digest()
    width = 32 + d[0] % 100
    height = 32 + d[1] % 100
    n_frames = 5 if media_type.startswith("video/") else 1
    feature = [float(b) for b in d[: mm.FEATURE_DIM]]
    return width, height, n_frames, feature


def test_codec_seam_contract(spark, sf_dir):
    """A conforming injected codec must produce the registered schema,
    1:1 rows, and its own (not the default's) values — so a real
    PIL/ffmpeg adapter drops in without touching the operator."""
    media = mm.media_table(spark, sf_dir)
    out = mm.decode_media_features(media, codec=_sha_codec)
    assert out.schema == mm.decode_media_features(media).schema
    rows = out.collect()
    assert len(rows) == media.count()
    default = {r.doc_id: r for r in mm.decode_media_features(media).collect()}
    for r in rows:
        assert len(r.feature) == mm.FEATURE_DIM
        assert 32 <= r.width <= 131 and 32 <= r.height <= 131
        assert r.n_frames == (5 if r.media_type.startswith("video/") else 1)
        # sha1 codec's features live in [0, 255], md5 default's in [0, 1]:
        # the injected codec's output is genuinely its own
        assert tuple(r.feature) != tuple(default[r.doc_id].feature)
    # frame sampling composes with any codec output
    sampled = mm.frame_sample(out, every_k=2).collect()
    vids = [r for r in rows if r.media_type.startswith("video/")]
    assert len(sampled) == 3 * len(vids)  # range(0, 5, 2) per video


def test_codec_seam_injected_overrides_real_flag(spark, sf_dir):
    """use_real_codecs=True with an injected codec must NOT raise: the
    flag only guards the no-codec default."""
    media = mm.media_table(spark, sf_dir)
    out = mm.decode_media_features(media, use_real_codecs=True, codec=_sha_codec)
    assert out.count() == media.count()
