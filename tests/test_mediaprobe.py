"""Container-metadata probe: header-only parsing per format, the
never-raises contract, and the Spark operator.

The expected values here are the SYNTH PARAMETERS (ground truth known
before any decoder runs), so these tests are independent oracles for
the probe — not reflections of its own output.
"""

import numpy as np
import pytest

from serimi_rdf_interlinking_spark.jpeg import synth_jpeg
from serimi_rdf_interlinking_spark.mediaprobe import (
    probe_media,
    probe_payload,
    synth_mp4,
)
from serimi_rdf_interlinking_spark.multimodal import (
    MEDIA_SCHEMA,
    synth_animated_gif,
    synth_gif,
    synth_png,
    synth_ppm,
    synth_wav,
)


@pytest.mark.parametrize(
    "payload,want",
    [
        (
            synth_png(7, 5, seed=1, color_type=6, bit_depth=8),
            dict(container="png", variant="static", width=7, height=5,
                 n_frames=1, bit_depth=8, channels=4),
        ),
        (
            synth_png(7, 5, seed=1, color_type=3, bit_depth=4,
                      interlace=True),
            dict(container="png", variant="interlaced", bit_depth=4,
                 channels=1),
        ),
        (
            synth_gif(6, 4, seed=2),
            dict(container="gif", variant="static", width=6, height=4,
                 n_frames=1, duration_ms=None, bit_depth=8),
        ),
        (
            # synth delays are delay_cs + frame index = 5,6,7,8 cs
            synth_animated_gif(8, 6, n_frames=4, seed=3),
            dict(container="gif", variant="animated", width=8, height=6,
                 n_frames=4, duration_ms=260),
        ),
        (
            synth_jpeg(18, 12, seed=4),
            dict(container="jpeg", variant="baseline", width=18,
                 height=12, channels=3, bit_depth=8),
        ),
        (
            synth_jpeg(18, 12, seed=4, gray=True, progressive=True),
            dict(container="jpeg", variant="progressive", channels=1),
        ),
        (
            synth_wav(4000, seed=5),
            dict(container="wav", variant="pcm", sample_rate=8000,
                 channels=1, bit_depth=16, duration_ms=500),
        ),
        (
            synth_ppm(9, 3, seed=6),
            dict(container="ppm", variant="p6", width=9, height=3,
                 channels=3, bit_depth=8),
        ),
        (
            synth_mp4(640, 360, 12345),
            dict(container="mp4", variant="isom", width=640, height=360,
                 duration_ms=12345),
        ),
        (
            # version-1 (64-bit) boxes + non-ms timescale + other brand
            synth_mp4(320, 240, 7000, timescale=90000, version=1,
                      brand=b"mp42"),
            dict(container="mp4", variant="mp42", width=320, height=240,
                 duration_ms=7000),
        ),
        (b"\x00\x01\x02 garbage that matches no magic",
         dict(container="unknown", width=None, duration_ms=None)),
    ],
)
def test_probe_payload_formats(payload, want):
    got = probe_payload(payload)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)


def test_probe_never_raises_on_corrupt_headers():
    # valid magic, garbage body: must classify, not throw
    corrupt = [
        b"\x89PNG\r\n\x1a\n" + b"\x01",          # truncated PNG
        b"GIF89a\xff",                            # truncated GIF
        b"\xff\xd8\xff",                          # truncated JPEG
        b"RIFF\x00\x00\x00\x00WAVE",              # chunkless WAV
        b"P6 garbage",                            # unparsable PPM
        (5).to_bytes(4, "big") + b"ftypxxxx",     # bad box size
    ]
    for p in corrupt:
        got = probe_payload(p)
        assert got["container"] in (
            "corrupt", "unknown", "png", "gif", "jpeg", "wav", "mp4",
        )


def test_probe_media_operator(spark):
    rows = [
        ("a", "image", synth_png(5, 4, seed=1, color_type=2), "image/png",
         5, 4, None),
        ("b", "video", synth_mp4(640, 360, 2500), "video/mp4",
         640, 360, 2500),
        ("c", "audio", synth_wav(1600, seed=2), "audio/wav",
         None, None, 200),
        ("d", "image", None, "image/png", 1, 1, None),
        # declared mime LIES — the probe must sniff the payload
        ("e", "image", synth_gif(3, 3, seed=3), "image/png", 3, 3, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r.asDict() for r in probe_media(media).collect()}
    assert out["a"]["container"] == "png" and out["a"]["width"] == 5
    assert out["b"]["container"] == "mp4"
    assert out["b"]["duration_ms"] == 2500
    assert out["c"]["container"] == "wav"
    assert out["c"]["duration_ms"] == 200
    assert out["d"]["container"] == "unknown"
    assert out["e"]["container"] == "gif"  # sniffed, not declared


def test_probe_never_raises_property():
    """Fuzz the never-raises contract: arbitrary bytes, and arbitrary
    corruptions of valid payloads, must classify — never throw. A
    10^12-row probe stage cannot afford one bad blob killing a task."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    magics = [
        b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a", b"\xff\xd8",
        b"RIFF", b"P6", b"\x00\x00\x00\x18ftyp",
    ]

    @given(
        prefix=st.sampled_from(magics + [b""]),
        body=st.binary(min_size=0, max_size=600),
    )
    @settings(max_examples=300, deadline=None)
    def _run(prefix, body):
        got = probe_payload(prefix + body)
        assert isinstance(got, dict) and "container" in got

    _run()
