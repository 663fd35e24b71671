"""Animated GIF (GIF89a) decode + real frame sampling.

Codec-level tests build streams BY HAND (byte literals, not the synth
encoder) with hand-computed expected canvases, so the compositing
rules — sub-rect placement, transparency, disposal 1 (leave), 2
(restore background), 3 (restore previous) — are verified against the
spec, not against the encoder's own idea of them. The Spark operator
test then drives frame_sample_decode end-to-end over mapInPandas.
"""

import numpy as np
import pytest

from serimi_rdf_interlinking_spark.multimodal import (
    MEDIA_SCHEMA,
    _lzw_encode_gif,
    decode_gif_frames,
    frame_sample_decode,
    synth_animated_gif,
)

# 4-entry GCT: 0=black (background), 1=red, 2=green, 3=blue
GCT = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
BLACK, RED, GREEN, BLUE = (
    np.array(c, np.uint8)
    for c in ([0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255])
)


def _img_block(left, top, w, h, indices, interlace=False):
    lzw = _lzw_encode_gif(2, bytes(indices))
    out = bytearray(b"\x2c")
    out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0])
    out += bytes([2])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def _gce(delay_cs, disposal, tidx=None):
    packed = (disposal << 2) | (1 if tidx is not None else 0)
    return bytes(
        [0x21, 0xF9, 0x04, packed]
    ) + delay_cs.to_bytes(2, "little") + bytes([tidx or 0, 0])


def _gif(w, h, *blocks):
    return (
        b"GIF89a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0x81, 0, 0])  # GCT present, 4 entries, bg index 0
        + GCT
        + b"".join(blocks)
        + b"\x3b"
    )


def test_transparency_composites_over_previous_frame():
    # frame 0: 2x2 all red; frame 1: full-rect green with index 1
    # transparent where the source was red -> only (0,0) overdrawn
    f0 = _img_block(0, 0, 2, 2, [1, 1, 1, 1])
    f1 = _img_block(0, 0, 2, 2, [2, 1, 1, 1])
    frames = decode_gif_frames(
        _gif(2, 2, _gce(10, 1), f0, _gce(20, 1, tidx=1), f1)
    )
    assert [(t, d) for t, d, _ in frames] == [(0, 100), (100, 200)]
    expect0 = np.stack([np.stack([RED, RED]), np.stack([RED, RED])])
    expect1 = expect0.copy()
    expect1[0, 0] = GREEN
    assert (frames[0][2] == expect0).all()
    assert (frames[1][2] == expect1).all()


def test_subrect_frame_leaves_rest_of_canvas():
    # 3x2 screen; frame 0 all blue; frame 1 a 1x1 green rect at (2,1)
    f0 = _img_block(0, 0, 3, 2, [3] * 6)
    f1 = _img_block(2, 1, 1, 1, [2])
    frames = decode_gif_frames(
        _gif(3, 2, _gce(5, 1), f0, _gce(5, 1), f1)
    )
    expect = np.tile(BLUE, (2, 3, 1))
    assert (frames[0][2] == expect).all()
    expect[1, 2] = GREEN
    assert (frames[1][2] == expect).all()


def test_disposal_2_restores_background_before_next_frame():
    # frame 1 (disposal 2) paints a red 1x2 column; frame 2 is a
    # transparent-only no-op rect, so it shows frame 1's rect wiped
    # back to the BLACK background while the rest of frame 0 survives
    f0 = _img_block(0, 0, 2, 2, [3, 3, 3, 3])
    f1 = _img_block(0, 0, 1, 2, [1, 1])
    f2 = _img_block(0, 0, 2, 2, [0, 0, 0, 0])
    frames = decode_gif_frames(
        _gif(
            2, 2,
            _gce(5, 1), f0,
            _gce(5, 2), f1,
            _gce(5, 1, tidx=0), f2,
        )
    )
    assert (frames[1][2] == np.stack(
        [np.stack([RED, BLUE]), np.stack([RED, BLUE])]
    )).all()
    assert (frames[2][2] == np.stack(
        [np.stack([BLACK, BLUE]), np.stack([BLACK, BLUE])]
    )).all()


def test_disposal_3_restores_previous_canvas():
    # frame 1 (disposal 3) fully overpaints green; frame 2's
    # transparent no-op then shows the RESTORED frame-0 canvas
    f0 = _img_block(0, 0, 2, 1, [1, 3])
    f1 = _img_block(0, 0, 2, 1, [2, 2])
    f2 = _img_block(0, 0, 2, 1, [0, 0])
    frames = decode_gif_frames(
        _gif(
            2, 1,
            _gce(5, 1), f0,
            _gce(5, 3), f1,
            _gce(5, 1, tidx=0), f2,
        )
    )
    assert (frames[1][2] == np.stack([GREEN, GREEN])[None]).all()
    assert (frames[2][2] == np.stack([RED, BLUE])[None]).all()


def test_synth_roundtrip_and_first_frame_parity():
    from serimi_rdf_interlinking_spark.multimodal import decode_gif

    for seed in (0, 3, 9):
        p = synth_animated_gif(11, 8, n_frames=6, seed=seed)
        frames = decode_gif_frames(p)
        assert len(frames) == 6
        ts = [t for t, _, _ in frames]
        assert ts[0] == 0 and ts == sorted(ts)
        # single-frame decoder sees the animation's first frame
        assert (decode_gif(p) == frames[0][2]).all()
        # byte-determinism of the synth
        assert synth_animated_gif(11, 8, n_frames=6, seed=seed) == p


def test_frame_sample_decode_operator(spark):
    rows = [
        (
            f"vid{i}",
            "video",
            synth_animated_gif(8, 6, n_frames=3 + i, seed=40 + i),
            "image/gif",
            8,
            6,
            None,
        )
        for i in range(3)
    ] + [("img0", "image", b"\x00", "image/png", 1, 1, None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = frame_sample_decode(media, every_ms=30).toPandas()
    # image rows filtered out; every clip sampled from t=0
    assert set(out["media_id"]) == {"vid0", "vid1", "vid2"}
    for mid, grp in out.groupby("media_id"):
        grp = grp.sort_values("sample_ms")
        assert grp["sample_ms"].iloc[0] == 0
        assert (np.diff(grp["sample_ms"]) == 30).all()
        # hold-previous: frame_idx is monotone, starts at 0, and the
        # sampler covers the whole timeline (last frame reached)
        fi = grp["frame_idx"].to_numpy()
        assert fi[0] == 0 and (np.diff(fi) >= 0).all()
        assert fi[-1] == grp["n_frames"].iloc[0] - 1
        assert all(len(f) == 8 for f in grp["feature"])
    # ticks reproduce the decode timeline exactly
    p = synth_animated_gif(8, 6, n_frames=3, seed=40)
    frames = decode_gif_frames(p)
    total = frames[-1][0] + frames[-1][1]
    ticks = list(range(0, total, 30))
    got = out[out["media_id"] == "vid0"]["sample_ms"].tolist()
    assert sorted(got) == ticks


def test_non_gif_video_raises(spark):
    media = spark.createDataFrame(
        [("v", "video", b"\x00\x01", "video/mp4", None, None, 1000)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="codec libraries"):
        frame_sample_decode(media).collect()
