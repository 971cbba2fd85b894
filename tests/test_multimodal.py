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


# --- real BMP / WAV decode paths (no codec libs needed) ---------------------


def _bmp_fixture():
    """Deterministic 8x6 RGB gradient as (array, bmp_bytes)."""
    import numpy as np

    from entangledb_spark.operators.multimodal import encode_bmp

    h, w = 6, 8
    arr = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            arr[y, x] = (x * 30 % 256, y * 40 % 256, (x + y) * 10 % 256)
    return arr, encode_bmp(arr)


def _wav_fixture(rate=8000, seconds=2.0, freq=440.0):
    """16-bit mono PCM sine as (float_samples, wav_bytes)."""
    import io
    import wave

    import numpy as np

    t = np.arange(int(rate * seconds)) / rate
    samples = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return samples.astype(np.float64) / 32768.0, buf.getvalue()


def test_bmp_roundtrip_and_wav_decode():
    import numpy as np

    from entangledb_spark.operators.multimodal import decode_bmp, decode_wav

    arr, bmp = _bmp_fixture()
    got = decode_bmp(bmp)
    assert got is not None and np.array_equal(got, arr)
    # non-BMP bytes reject cleanly
    assert decode_bmp(b"BMnot really a bitmap header" * 4) is None

    samples, wav = _wav_fixture()
    dec = decode_wav(wav)
    assert dec is not None
    got_s, rate = dec
    assert rate == 8000 and len(got_s) == len(samples)
    assert np.allclose(got_s, samples, atol=1e-9)
    assert decode_wav(b"RIFFxxxxWAVEjunk") is None
    # stdlib wave accepts a fmt chunk with sample rate 0; decode_wav must
    # reject it (downstream window math divides by the rate) so the row
    # takes the stub fallback instead of killing the job
    zero_rate = bytearray(wav)
    zero_rate[24:28] = b"\x00\x00\x00\x00"  # fmt nSamplesPerSec
    zero_rate[28:32] = b"\x00\x00\x00\x00"  # fmt nAvgBytesPerSec
    assert decode_wav(bytes(zero_rate)) is None


def test_resize_images_real_pixels(spark):
    """A BMP payload must come back as a BMP of REAL resampled pixels —
    verified against the payload bytes decoded independently."""
    import numpy as np

    from entangledb_spark.operators.multimodal import decode_bmp, resize_images

    arr, bmp = _bmp_fixture()
    df = spark.createDataFrame(
        [(1, "image", bmp.decode("latin-1"), len(bmp)),
         (2, "image", "just text, not an image", 23)],
        "media_id long, kind string, payload string, n_bytes long",
    )
    out = {r.media_id: r for r in resize_images(df, width=4, height=3).collect()}
    r1 = out[1]
    assert (r1.width, r1.height) == (4, 3)
    img = decode_bmp(r1.payload.encode("latin-1"))
    assert img is not None and img.shape == (3, 4, 3)
    # nearest-neighbor spec: out[y, x] = src[y*6//3, x*8//4]
    exp = arr[(np.arange(3) * 6 // 3)][:, (np.arange(4) * 8 // 4)]
    assert np.array_equal(img, exp)
    # undecodable payload keeps the stub path (still total)
    assert out[2].payload is not None and out[2].width == 4


def test_sample_audio_windows_real_samples(spark):
    """A WAV payload must produce windows from its TRUE duration with
    features computed from the actual samples."""
    import numpy as np

    from entangledb_spark.operators.multimodal import sample_audio_windows

    samples, wav = _wav_fixture(rate=8000, seconds=2.0)  # 2000 ms
    df = spark.createDataFrame(
        [(7, "audio", wav.decode("latin-1"), len(wav))],
        "media_id long, kind string, payload string, n_bytes long",
    )
    rows = sorted(
        sample_audio_windows(df, window_ms=500, dim=8).collect(),
        key=lambda r: r.frame_idx,
    )
    assert len(rows) == 4  # 2000ms / 500ms
    assert [r.frame_ts_ms for r in rows] == [0, 500, 1000, 1500]
    step = 8000 * 500 // 1000
    for r in rows:
        win = samples[r.frame_idx * step : (r.frame_idx + 1) * step]
        assert abs(r.frame_features[0] - float(np.sqrt(np.mean(win**2)))) < 1e-9
        assert abs(r.frame_features[2] - float(np.abs(win).max())) < 1e-9
        assert abs(r.frame_features[5] - 0.5) < 1e-9  # window seconds


def test_extract_features_real_paths(spark):
    import numpy as np

    from entangledb_spark.operators.multimodal import extract_features

    arr, bmp = _bmp_fixture()
    _, wav = _wav_fixture()
    df = spark.createDataFrame(
        [
            (1, "image", bmp.decode("latin-1"), len(bmp)),
            (2, "audio", wav.decode("latin-1"), len(wav)),
            (3, "image", "plain text fallback", 19),
        ],
        "media_id long, kind string, payload string, n_bytes long",
    )
    out = {r.media_id: r for r in extract_features(df).collect()}
    # image: [w, h, meanR, meanG, meanB, ...] from REAL pixels
    assert out[1].features[0] == 8.0 and out[1].features[1] == 6.0
    assert abs(out[1].features[2] - float(arr[..., 0].mean() / 255.0)) < 1e-9
    # audio: real rms of a 0.5-amplitude sine ~ 0.3536
    assert abs(out[2].features[0] - 0.5 / np.sqrt(2)) < 1e-3
    # text payload falls back to the stub (values in [0, 1))
    assert out[3].features is not None and all(0 <= v < 1 for v in out[3].features)
