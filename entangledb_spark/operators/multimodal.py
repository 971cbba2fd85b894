"""Multimodal column handling (beyond parity): image/audio/video as opaque
binary columns with typed metadata, processed via Arrow-batched Pandas UDFs.

The container has no image/audio codecs, so the decode step is a clearly
marked stub (deterministic fake features derived from the bytes) — the
Spark-side plumbing is real and tested: schemas, mapInPandas batch
iteration, partition sizing, and the metadata projections are exactly what
a production decode would use; only `_decode_stub` would be swapped for a
real codec (PIL/torchaudio/ffmpeg).

Scale notes: binary payloads ride in the same Parquet row groups as their
metadata; mapInPandas streams Arrow batches so peak memory is
(batch size × payload), independent of partition row count. Feature
extraction is a narrow map — no shuffle. Repartitioning before decode
targets payload bytes per task, not row counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from entangledb_spark.functions.numeric import r4
from entangledb_spark.registry import query, table

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", StringType(), True),  # binary in production
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feat_dim", LongType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def _decode_stub(payload: bytes | str, kind: str, dim: int = 8) -> list[float]:
    """STUB — stands in for a real image/audio/video decoder.

    Deterministic fake feature vector derived from payload bytes so tests
    are stable. A production deployment replaces ONLY this function with
    e.g. PIL decode → resize → CNN features; the Spark plumbing around it
    (Arrow batches, schema, partitioning) is unchanged.
    """
    if payload is None:
        raise NotImplementedError("real media decode requires codec libraries")
    data = payload.encode() if isinstance(payload, str) else bytes(payload)
    acc = [0] * dim
    for i, byte in enumerate(data):
        acc[i % dim] = (acc[i % dim] + byte * (i + 1)) % 10007
    return [v / 10007.0 for v in acc]


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Decode + featurize media rows with mapInPandas (Arrow batching).

    Input must have columns (media_id, kind, payload, n_bytes); output
    follows FEATURE_SCHEMA. Batch-at-a-time so a 100 GB partition never
    materializes; per-batch peak memory is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch × payload size.
    """
    from entangledb_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(p, k, dim) if p is not None else None
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "feat_dim": [dim if f is not None else None for f in feats],
                    "features": feats,
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fabricate a media table from the documents fixture: the text bytes
    play the role of an opaque payload (kind assigned round-robin)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.col("text").alias("payload"),
        F.length("text").cast("long").alias("n_bytes"),
    )


@query(
    "q80_multimodal_metadata",
    oracle="""
    SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           count(*)                       AS n_media,
           CAST(sum(length(text)) AS BIGINT) AS total_bytes,
           CAST(max(length(text)) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY 1
    """,
)
def q80_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup over the media table (payloads untouched —
    column pruning means the scan never reads the payload bytes)."""
    m = media_from_documents(spark, sf_dir)
    return m.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.max("n_bytes").cast("long").alias("max_bytes"),
    )


def multimodal_features_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end decode→featurize pipeline over Arrow batches. The decode
    is the documented stub; schema/batching/partitioning are production
    shaped. Returns per-kind feature statistics.

    Not a gate entry: with the decode stubbed, a driver rows-only row
    proves nothing pytest doesn't already (tests/test_multimodal.py checks
    the stub features exactly and the mapInPandas plumbing end-to-end);
    the freed gate slot is spent on the oracle-backed
    q81_quality_repetition (operators/quality.py) instead."""
    feats = extract_features(media_from_documents(spark, sf_dir))
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        r4(F.avg(F.element_at("features", 1))).alias("avg_feat0"),
        F.max("feat_dim").alias("feat_dim"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("frame_features", ArrayType(DoubleType()), True),
    ]
)

FRAME_INTERVAL_MS = 1000  # sample one frame per second of fake "video"


def _duration_ms_stub(payload: bytes | str) -> int:
    """STUB — stands in for container-header duration probing (ffprobe).
    Deterministic: 1 'second' of video per 16 payload bytes, min 1."""
    data = payload.encode() if isinstance(payload, str) else bytes(payload)
    return max(1, len(data) // 16) * 1000


def sample_frames(
    df: DataFrame,
    interval_ms: int = FRAME_INTERVAL_MS,
    dim: int = 8,
    max_frames: int = 32,
) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    with a per-frame feature vector — the 1-fps-style sampling a
    multimodal training pipeline runs before captioning/embedding.

    mapInPandas flatMap shape: each input row expands to
    min(duration/interval, max_frames) rows INSIDE the Arrow batch loop,
    so expansion never materializes a partition — peak memory stays
    (batch rows × frames × dim). The decode/probe steps are the documented
    stubs (no codecs in this container); a production swap replaces
    `_duration_ms_stub` with ffprobe and the per-frame feature call with a
    real decoder, leaving schema/batching/partitioning untouched.

    `max_frames` is the skew guard: a 10-hour video cannot explode one
    task — the cap bounds per-row output exactly like the chunk caps in
    the text operators."""
    from entangledb_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)
    videos = df.filter(F.col("kind") == "video")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "frame_ts_ms": [],
                "frame_features": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                dur = _duration_ms_stub(payload)
                n = min(dur // interval_ms, max_frames)
                for i in range(int(n)):
                    ts = i * interval_ms
                    # per-frame stub features: decode(payload) at ts
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(ts)
                    out["frame_features"].append(
                        _decode_stub(f"{ts}:{payload}", "video", dim)
                    )
            yield pd.DataFrame(out)

    return videos.mapInPandas(batches, FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("payload", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def resize_images(df: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize for image rows — the thumbnail/normalize step before
    feature extraction. Same honest split as every decode path here: the
    pixel work is a deterministic STUB (no codecs in this container — a
    production swap is PIL `Image.open(payload).resize((w, h))` inside
    the same batch loop), while the Spark side is real: Arrow-batched
    mapInPandas, bounded per-batch memory, output schema carrying the new
    dimensions, one row in → one row out (no expansion, no skew)."""
    from entangledb_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)
    images = df.filter(F.col("kind") == "image")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_payload = []
            for p in pdf["payload"]:
                if p is None:
                    out_payload.append(None)
                    continue
                # stub "resize": deterministic truncation/padding to w*h/16
                # bytes so output size tracks the requested dimensions
                data = p.encode() if isinstance(p, str) else bytes(p)
                target = max(1, width * height // 16)
                resized = (data * (target // max(1, len(data)) + 1))[:target]
                out_payload.append(resized.decode("latin-1"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [None if p is None else width for p in pdf["payload"]],
                    "height": [None if p is None else height for p in pdf["payload"]],
                    "payload": out_payload,
                    "n_bytes": [
                        None if p is None else len(p) for p in out_payload
                    ],
                }
            )

    return images.mapInPandas(batches, RESIZED_SCHEMA)


AUDIO_WINDOW_MS = 500


def sample_audio_windows(
    df: DataFrame,
    window_ms: int = AUDIO_WINDOW_MS,
    dim: int = 8,
    max_windows: int = 64,
) -> DataFrame:
    """Audio window sampling — the audio analog of sample_frames: each
    audio row expands to min(duration/window, max_windows) rows with a
    per-window feature vector (production: mel-spectrogram slices).
    Identical Arrow flatMap shape and the same ``max_windows`` skew cap
    (a 10-hour recording cannot explode one task); reuses FRAME_SCHEMA
    with frame_* columns meaning window index / start ms."""
    from entangledb_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)
    audio = df.filter(F.col("kind") == "audio")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "frame_ts_ms": [],
                "frame_features": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                dur = _duration_ms_stub(payload)
                n = min(dur // window_ms, max_windows)
                for i in range(int(n)):
                    ts = i * window_ms
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(ts)
                    out["frame_features"].append(
                        _decode_stub(f"a{ts}:{payload}", "audio", dim)
                    )
            yield pd.DataFrame(out)

    return audio.mapInPandas(batches, FRAME_SCHEMA)
