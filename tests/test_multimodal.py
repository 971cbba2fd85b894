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
