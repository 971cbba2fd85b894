"""Multimodal plumbing: Arrow-batched decode→featurize over binary-ish
payloads; the decode itself is a documented stub (no codecs in this
environment), the Spark plumbing is real."""

from __future__ import annotations

import pytest

from entangledb_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    _decode_stub,
    extract_features,
    media_from_documents,
)


def test_decode_stub_deterministic():
    a = _decode_stub("hello world", "image")
    b = _decode_stub("hello world", "image")
    assert a == b and len(a) == 8
    assert _decode_stub("other", "image") != a
    with pytest.raises(NotImplementedError):
        _decode_stub(None, "image")


def test_extract_features_schema_and_batching(spark, sf_dir):
    m = media_from_documents(spark, sf_dir).limit(50)
    feats = extract_features(m)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.feat_dim == 8 and len(r.features) == 8
        assert all(0.0 <= v < 1.0 for v in r.features)
    kinds = {r.kind for r in rows}
    assert kinds <= {"image", "audio", "video"}


def test_sample_frames_plumbing(spark, sf_dir):
    from entangledb_spark.operators.multimodal import (
        FRAME_SCHEMA,
        _decode_stub,
        _duration_ms_stub,
        sample_frames,
    )

    m = media_from_documents(spark, sf_dir).limit(60)
    frames = sample_frames(m, max_frames=5)
    assert frames.schema == FRAME_SCHEMA
    rows = frames.collect()
    assert len(rows) > 0
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    videos = {r.media_id: r for r in m.filter("kind = 'video'").collect()}
    # only video rows expand, never beyond the max_frames skew cap
    assert set(by_media) <= set(videos)
    for mid, fr in by_media.items():
        fr.sort(key=lambda r: r.frame_idx)
        expected = min(_duration_ms_stub(videos[mid].payload) // 1000, 5)
        assert [r.frame_idx for r in fr] == list(range(expected))
        assert all(r.frame_ts_ms == r.frame_idx * 1000 for r in fr)
        # per-frame features are deterministic stub output at that ts
        r0 = fr[0]
        assert r0.frame_features == _decode_stub(
            f"0:{videos[mid].payload}", "video"
        )


def test_resize_images_plumbing(spark, sf_dir):
    from entangledb_spark.operators.multimodal import media_from_documents, resize_images

    media = media_from_documents(spark, sf_dir)
    out = resize_images(media, width=32, height=32).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images > 0
    target = 32 * 32 // 16
    for r in out:
        assert (r.width, r.height) == (32, 32)
        assert r.n_bytes == target and len(r.payload) == target
    # determinism
    again = resize_images(media, width=32, height=32).collect()
    assert sorted(r.media_id for r in again) == sorted(r.media_id for r in out)


def test_sample_audio_windows_plumbing(spark, sf_dir):
    from entangledb_spark.operators.multimodal import (
        AUDIO_WINDOW_MS,
        media_from_documents,
        sample_audio_windows,
    )

    media = media_from_documents(spark, sf_dir)
    rows = sample_audio_windows(media, max_windows=7).collect()
    assert rows
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rs in by_media.items():
        idxs = sorted(r.frame_idx for r in rs)
        assert idxs == list(range(len(idxs)))  # dense window indexes
        assert len(rs) <= 7  # skew cap
        for r in rs:
            assert r.frame_ts_ms == r.frame_idx * AUDIO_WINDOW_MS
            assert len(r.frame_features) == 8
