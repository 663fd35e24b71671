"""Real (numpy-only) multimodal decode: PPM images and PCM16 WAV audio
decode natively inside the mapInPandas stage; compressed formats still
raise. Decoders verified against hand-built payloads and numpy
references."""

import numpy as np
import pytest


def _ppm(w, h, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    header = f"P6\n# test comment\n{w} {h}\n255\n".encode()
    return header + img.tobytes(), img


def _wav(n, rate=8000, channels=1, seed=0):
    rng = np.random.RandomState(seed)
    samples = rng.randint(-20000, 20000, size=(n, channels)).astype("<i2")
    data = samples.tobytes()
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
    return b"RIFF" + len(body).to_bytes(4, "little") + body, samples


def test_decode_ppm_roundtrip():
    from serimi_rdf_interlinking_spark.multimodal import decode_ppm

    payload, img = _ppm(7, 5)
    got = decode_ppm(payload)
    assert got.shape == (5, 7, 3)
    assert np.array_equal(got, img)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")  # grayscale PGM rejected


def test_decode_wav_roundtrip():
    from serimi_rdf_interlinking_spark.multimodal import decode_wav_pcm16

    payload, samples = _wav(400, rate=8000, channels=2)
    got, rate = decode_wav_pcm16(payload)
    assert rate == 8000
    assert got.shape == (400, 2)
    assert np.array_equal(got, samples)
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"OggS" + b"\x00" * 40)


def test_resize_nearest_downsample():
    from serimi_rdf_interlinking_spark.multimodal import resize_nearest

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    small = resize_nearest(img, 4, 2)
    assert small.shape == (2, 4)
    # nearest-neighbor picks source pixels at floor(i*src/out)
    assert np.array_equal(small, img[[0, 4]][:, [0, 2, 4, 6]])


def test_real_decode_in_spark_stage(spark):
    from serimi_rdf_interlinking_spark.multimodal import (
        MEDIA_SCHEMA,
        _image_features,
        decode_and_featurize,
        decode_ppm,
    )

    ppm, img = _ppm(6, 4, seed=3)
    wav, _ = _wav(800, rate=8000)
    rows = [
        ("img1", "image", bytes(ppm), "image/x-portable-pixmap", 6, 4, None),
        ("aud1", "audio", bytes(wav), "audio/wav", None, None, 100),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: r for r in decode_and_featurize(media).collect()}
    assert feats["img1"].feature == pytest.approx(
        _image_features(decode_ppm(bytes(ppm)), 8)
    )
    assert len(feats["aud1"].feature) == 8
    assert feats["aud1"].feature[0] > 0  # mean |amplitude| of random noise
    # compressed formats still raise with a clear message
    bad = spark.createDataFrame(
        [("j", "image", b"\xff\xd8\xff", "image/jpeg", 1, 1, None)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="codec libraries"):
        decode_and_featurize(bad).collect()
