"""Baseline JPEG codec (jpeg.py): spec anchors verified against
independent numpy references (zigzag sequence, DCT orthonormality,
IDCT basis functions, canonical Huffman code assignment), roundtrip
error bounds for every encoder mode (gray, 4:4:4, 4:2:0, restart
intervals), and the honest NotImplementedError boundary for
progressive streams."""

import numpy as np
import pytest

from serimi_rdf_interlinking_spark import jpeg as J


def _test_image(h=33, w=50, seed=9):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    base = 96 + 64 * np.sin(xx / 15) + 48 * np.cos(yy / 9)
    img = np.stack([base, np.roll(base, 10, axis=1), 255 - base], -1)
    return np.clip(img + rng.randn(h, w, 3) * 2, 0, 255).astype(np.uint8)


def test_zigzag_is_the_t81_sequence():
    # T.81 Figure 5, first 16 entries — independent golden
    want = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert list(J.ZIGZAG[:16]) == want
    assert sorted(J.ZIGZAG) == list(range(64))


def test_dct_matrix_is_orthonormal_and_matches_direct_formula():
    assert np.allclose(J.DCT_M @ J.DCT_M.T, np.eye(8), atol=1e-12)
    # IDCT of a single coefficient == the 2-D cosine basis function,
    # computed here from the textbook formula independently of DCT_M
    F = np.zeros((8, 8))
    u, v = 2, 3
    F[u, v] = 1.0
    got = J.DCT_M.T @ F @ J.DCT_M
    a = lambda k: np.sqrt(0.125) if k == 0 else np.sqrt(0.25)
    want = np.array(
        [
            [
                a(u) * a(v)
                * np.cos((2 * y + 1) * u * np.pi / 16)
                * np.cos((2 * x + 1) * v * np.pi / 16)
                for x in range(8)
            ]
            for y in range(8)
        ]
    )
    assert np.allclose(got, want, atol=1e-12)


def test_canonical_huffman_codes():
    # 12 symbols all at length 4: canonical codes are simply 0..11,
    # and the all-ones code 15 stays unused (spec-safe)
    codes = J._canonical_codes(J._DC_COUNTS, J._DC_SYMBOLS)
    assert {s: c for s, (c, l) in codes.items()} == {
        s: s for s in range(12)
    }
    assert all(l == 4 for _, l in codes.values())


@pytest.mark.parametrize(
    "kw,max_err",
    [
        ({}, 20),
        ({"subsample": True}, 30),
        ({"restart_interval": 2}, 20),
        ({"subsample": True, "restart_interval": 3}, 30),
    ],
)
def test_roundtrip_error_bounded(kw, max_err):
    img = _test_image()
    dec = J.decode_jpeg(J.encode_jpeg(img, **kw))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= max_err
    assert err.mean() <= 6.0


def test_restart_stream_decodes_identically_to_plain():
    img = _test_image(h=17, w=26, seed=4)
    plain = J.decode_jpeg(J.encode_jpeg(img))
    rst = J.decode_jpeg(J.encode_jpeg(img, restart_interval=1))
    assert np.array_equal(plain, rst)


def test_grayscale_roundtrip():
    rng = np.random.RandomState(3)
    img = np.clip(
        128
        + 60 * np.sin(np.arange(40) / 6.0)[None, :]
        + 30 * np.cos(np.arange(24) / 4.0)[:, None]
        + rng.randn(24, 40) * 2,
        0,
        255,
    ).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img))
    assert dec.shape == (24, 40, 1)
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 20


def test_progressive_and_non_jpeg_rejected():
    img = _test_image(h=9, w=9)
    payload = bytearray(J.encode_jpeg(img))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="SOF2"):
        J.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="not a JPEG"):
        J.decode_jpeg(b"GIF89a" + b"\x00" * 8)


def test_jpeg_decodes_in_spark_stage(spark):
    from serimi_rdf_interlinking_spark.jpeg import decode_jpeg, synth_jpeg
    from serimi_rdf_interlinking_spark.multimodal import (
        MEDIA_SCHEMA,
        _image_features,
        decode_and_featurize,
    )

    jpg = synth_jpeg(20, 14, seed=11)
    media = spark.createDataFrame(
        [("j1", "image", jpg, "image/jpeg", 20, 14, None)], MEDIA_SCHEMA
    )
    (row,) = decode_and_featurize(media).collect()
    assert row.feature == pytest.approx(_image_features(decode_jpeg(jpg), 8))
