"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages. The decode step itself is STUBBED in this
environment (no imaging/audio libraries in the container): by default
it raises NotImplementedError; tests use the deterministic fake
(`fake_decode=True`) which derives byte-level features, so the
Spark-side plumbing — schema, batching, partitioning, UDF signatures —
is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),      # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, sha256 string,"
    " feature array<float>"
)


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: a byte-histogram-based
    feature vector (stable across runs and machines)."""
    if payload is None:
        return [0.0] * dim
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def decode_and_featurize(
    media: DataFrame, fake_decode: bool = False, dim: int = 8
) -> DataFrame:
    """mapInPandas decode/feature stage. Partition-parallel, no shuffle;
    batch shape: one pandas frame per Arrow batch with binary payloads.

    Real decoders (PIL/ffmpeg/torchaudio) drop into `_decode_real`
    without touching the Spark plumbing.
    """

    def _decode_real(payload: bytes) -> list[float]:
        raise NotImplementedError(
            "media decoding requires imaging/audio libraries not present "
            "in this environment; run with fake_decode=True for the "
            "deterministic byte-level fake"
        )

    fn = _fake_features if fake_decode else (lambda p: _decode_real(p))

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "sha256": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _run, FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_ts_ms)
    rows for each sample point from metadata — the decode of the actual
    frame bytes is the stubbed step above."""
    from pyspark.sql import functions as F

    return (
        media.filter(F.col("kind") == "video")
        .filter(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
