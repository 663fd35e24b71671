"""JPEG codec (jpeg.py): spec anchors verified against independent
numpy references (zigzag sequence, DCT orthonormality, IDCT basis
functions, canonical Huffman code assignment), roundtrip error bounds
for every encoder mode (gray, 4:4:4, 4:2:0, restart intervals),
progressive (SOF2) streams decoding BIT-IDENTICALLY to their baseline
twins (same quantized coefficients — a closed oracle over the
spectral-selection + successive-approximation scan machinery incl.
EOB runs and AC correction bits), and the honest NotImplementedError
boundary for arithmetic coding."""

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


def test_arithmetic_and_non_jpeg_rejected():
    # progressive (SOF2) decodes natively since late r5; the remaining
    # honest boundary is arithmetic coding (SOF9) and friends
    img = _test_image(h=9, w=9)
    payload = bytearray(J.encode_jpeg(img))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic)
    with pytest.raises(NotImplementedError, match="SOF9"):
        J.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="not a JPEG"):
        J.decode_jpeg(b"GIF89a" + b"\x00" * 8)


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes to pad a
    marker; externally-produced streams use them (round-4 advice)."""
    img = _test_image(h=9, w=9)
    plain = J.encode_jpeg(img)
    want = J.decode_jpeg(plain)
    # pad EVERY marker in the header region with fill bytes (markers
    # before the SOS payload; scan data itself must stay untouched)
    sos = plain.index(b"\xff\xda")
    padded = bytearray(plain[:2])  # SOI itself is never padded
    i = 2
    while i < sos:
        if plain[i] == 0xFF and plain[i + 1] not in (0x00, 0xFF):
            padded.extend(b"\xff\xff\xff")  # three fill bytes
        padded.append(plain[i])
        i += 1
    padded.extend(plain[sos:])
    got = J.decode_jpeg(bytes(padded))
    assert np.array_equal(got, want)


def test_multiscan_baseline_decodes_bit_identical_to_interleaved():
    """A legal baseline JPEG may send per-component scans (ns < frame
    ncomp, T.81 A.2.2). The multiscan encoder writes the SAME
    quantized coefficients as the interleaved stream, so both decode
    bit-for-bit equal — a closed oracle over the scan layout
    (including restart intervals WITHIN a component scan)."""
    rng = np.random.RandomState(11)
    for (w, h, gray, sub, dri) in [
        (18, 12, False, False, 0),
        (17, 11, False, True, 0),
        (16, 16, True, False, 0),
        (24, 13, False, False, 2),
        (9, 7, False, True, 3),
    ]:
        shape = (h, w) if gray else (h, w, 3)
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        base = J.decode_jpeg(
            J.encode_jpeg(img, subsample=sub, restart_interval=dri)
        )
        multi = J.decode_jpeg(
            J.encode_jpeg(
                img, subsample=sub, restart_interval=dri, multiscan=True
            )
        )
        assert np.array_equal(base, multi), (w, h, gray, sub, dri)


def test_partially_interleaved_scan_rejected_clearly():
    """ns == 2 of a 3-component frame (partial interleave) is legal
    but unsupported — must refuse clearly, not KeyError/garbage."""
    sof = (
        b"\xff\xc0" + (2 + 6 + 9).to_bytes(2, "big")
        + bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + bytes([3])
        + bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    )
    sos = (
        b"\xff\xda" + (2 + 1 + 4 + 3).to_bytes(2, "big")
        + bytes([2]) + bytes([1, 0x00, 2, 0x11]) + bytes([0, 63, 0])
    )
    with pytest.raises(NotImplementedError, match="interleaved"):
        J.decode_jpeg(b"\xff\xd8" + sof + sos)


def test_single_component_scan_ignores_sampling_factors():
    """T.81 A.2.2: a non-interleaved (single-component) scan is one
    8x8 block per MCU — sampling factors in the SOF must not change
    the scan layout. A grayscale stream whose SOF claims 2x2 factors
    must decode identically to the 1x1 original (round-4 advice: the
    old loop applied the interleaved MCU layout and produced
    garbage)."""
    rng = np.random.RandomState(5)
    img = np.clip(
        120 + 50 * np.sin(np.arange(40) / 5.0)[None, :] + rng.randn(24, 40) * 2,
        0, 255,
    ).astype(np.uint8)
    plain = bytearray(J.encode_jpeg(img))
    want = J.decode_jpeg(bytes(plain))
    sof = plain.index(b"\xff\xc0")
    assert plain[sof + 11] == 0x11  # the gray component's h|v byte
    plain[sof + 11] = 0x22
    got = J.decode_jpeg(bytes(plain))
    assert np.array_equal(got, want)


def test_progressive_decodes_bit_identical_to_baseline():
    """decode(SOF2 stream) must equal decode(SOF0 stream) exactly:
    both carry the same quantized coefficients, so any divergence is a
    bug in the progressive scan machinery. Noise images make the
    refinement/correction-bit paths dense; odd sizes exercise the
    non-interleaved sub-grids (T.81 A.2.2)."""
    rng = np.random.RandomState(0)
    for (h, w) in ((8, 8), (9, 13), (20, 17), (33, 31)):
        for mode in ("gray", "color", "sub"):
            if mode == "gray":
                img = rng.randint(0, 256, (h, w)).astype(np.uint8)
            else:
                img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            sub = mode == "sub"
            base = J.decode_jpeg(J.encode_jpeg(img, subsample=sub))
            prog = J.decode_jpeg(
                J.encode_jpeg(img, subsample=sub, progressive=True)
            )
            assert np.array_equal(base, prog), (h, w, mode)


def test_progressive_eob_run_paths():
    """Flat / smooth / mixed content maximizes cross-block EOB runs
    (the (1<<r)+bits codes) and their interruption by content blocks —
    the paths a dense-noise image never exercises."""
    rng = np.random.RandomState(1)
    flat = np.full((64, 64, 3), 128, np.uint8)
    yy, xx = np.mgrid[0:40, 0:56]
    grad = np.clip(100 + xx + yy, 0, 255).astype(np.uint8)
    mixed = np.full((64, 64), 128, np.uint8)
    mixed[16:24, 16:24] = rng.randint(0, 256, (8, 8))
    mixed[48:56, 40:48] = rng.randint(0, 256, (8, 8))
    for img, sub in ((flat, True), (grad, False), (mixed, False)):
        base = J.decode_jpeg(J.encode_jpeg(img, subsample=sub))
        prog = J.decode_jpeg(
            J.encode_jpeg(img, subsample=sub, progressive=True)
        )
        assert np.array_equal(base, prog)


def test_progressive_stream_structure():
    """The SOF2 marker and the 14-scan script (2 DC + 4 AC-first +
    4 AC-refine per... — 2 + 4*ncomp scans for color) are really in
    the stream, and the reconstruction error bound matches baseline's."""
    img = _test_image(h=24, w=24)
    p = J.encode_jpeg(img, progressive=True)
    assert b"\xff\xc2" in p and b"\xff\xc0" not in p
    assert p.count(b"\xff\xda") == 2 + 4 * 3
    got = J.decode_jpeg(p).astype(float)
    assert np.abs(got - img.astype(float)).mean() < 12.0
    with pytest.raises(ValueError, match="DRI"):
        J.encode_jpeg(img, progressive=True, restart_interval=2)


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
