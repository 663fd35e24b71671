"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages.

Decode support (round 3): UNCOMPRESSED formats decode for real with
numpy alone — PPM (P6) images and PCM16 WAV audio — including nearest-
neighbor resize and per-channel/signal features, all tested against
numpy references. COMPRESSED formats (JPEG/PNG/MP3/MP4) genuinely need
codec libraries absent from this container and raise
NotImplementedError with a clear message; `fake_decode=True` keeps the
deterministic byte-level fake for plumbing tests. Real codec decoders
drop into `_DECODERS` without touching the Spark plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
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


def synth_ppm(w: int, h: int, seed: int = 0) -> bytes:
    """Deterministic synthetic P6 PPM payload (seeded numpy bytes)."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def synth_wav(n: int, rate: int = 8000, channels: int = 1, seed: int = 0) -> bytes:
    """Deterministic synthetic RIFF/WAVE PCM16 payload."""
    rng = np.random.RandomState(seed)
    data = rng.randint(-20000, 20000, size=(n, channels)).astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * 2).to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval<=255) -> uint8 array (h, w, 3). Pure
    numpy; the header grammar is whitespace-separated tokens with
    '#' comments (Netpbm spec)."""
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4:
        # skip whitespace and comments
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    if tokens[0] != b"P6":
        raise ValueError(f"not a P6 PPM: magic {tokens[0]!r}")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    i += 1  # single whitespace after maxval
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM 16-bit -> (int16 samples [n, channels], rate).
    Pure numpy + chunk walking; compressed codecs rejected."""
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, n_channels), rate


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via index gathers — the standard
    library-free downsample for thumbnail/feature grids."""
    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def _image_features(img: np.ndarray, dim: int) -> list[float]:
    """Per-channel mean/std on a 4x4 nearest-resized grid + dims —
    deterministic, resolution-normalized."""
    small = resize_nearest(img, 4, 4).astype(np.float64) / 255.0
    chans = small.reshape(-1, small.shape[-1])
    feats = list(chans.mean(axis=0)) + list(chans.std(axis=0))
    feats += [img.shape[1] / 4096.0, img.shape[0] / 4096.0]
    return [float(x) for x in feats[:dim]] + [0.0] * max(0, dim - len(feats))


def _audio_features(samples: np.ndarray, rate: int, dim: int) -> list[float]:
    x = samples.astype(np.float64) / 32768.0
    mono = x.mean(axis=1)
    zc = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
    feats = [
        float(np.mean(np.abs(mono))),
        float(mono.std()),
        zc,
        len(mono) / max(rate, 1) / 3600.0,  # duration (hours scale)
        float(mono.max(initial=0.0)),
        float(mono.min(initial=0.0)),
    ]
    return [float(v) for v in feats[:dim]] + [0.0] * max(0, dim - len(feats))


def _decode_real(payload: bytes, mime: str | None, dim: int) -> list[float]:
    if mime == "image/x-portable-pixmap":
        return _image_features(decode_ppm(payload), dim)
    if mime in ("audio/wav", "audio/x-wav"):
        return _audio_features(*decode_wav_pcm16(payload), dim)
    raise NotImplementedError(
        f"decoding mime {mime!r} requires codec libraries not present in "
        "this environment (uncompressed PPM/WAV decode natively; run "
        "with fake_decode=True for the deterministic byte-level fake)"
    )


def decode_and_featurize(
    media: DataFrame, fake_decode: bool = False, dim: int = 8
) -> DataFrame:
    """mapInPandas decode/feature stage. Partition-parallel, no shuffle;
    batch shape: one pandas frame per Arrow batch with binary payloads.
    Uncompressed PPM/WAV decode for real (numpy-only); compressed
    formats raise until codec libraries are present."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake_decode:
                feats = [_fake_features(p, dim) for p in pdf["payload"]]
            else:
                feats = [
                    _decode_real(p, m, dim)
                    for p, m in zip(pdf["payload"], pdf["mime"])
                ]
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

    return media.select("media_id", "kind", "mime", "payload").mapInPandas(
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
