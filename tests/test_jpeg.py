"""Baseline JPEG codec vectors (VERDICT r1 missing #2): round-trip
PSNR ≥ 40 dB (the BASELINE.json lossy-format invariant), pHash
stability, sniff/dispatch integration, 4:2:0 MCU decode, restart
markers, and honest failure on non-baseline streams."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from imgray.codecs import (decode_image, encode_image, hamming64, phash64,
                           psnr, sniff_format)
from imgray.jpegcodec import jpeg_decode, jpeg_encode


def _gradient(h, w):
    # slope capped at ~8/px: steeper chroma ramps lose information to
    # 4:2:0 subsampling itself (any decoder), not to this codec
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([yy * 255 // max(h - 1, 32), xx * 255 // max(w - 1, 32),
                     (yy + xx) * 255 // max(h + w - 2, 64)],
                    axis=2).astype(np.uint8)


def _blocky(h, w, seed):
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, (-(-h // 8), -(-w // 8), 3))
    return np.kron(coarse, np.ones((8, 8, 1)))[:h, :w].astype(np.uint8)


@pytest.mark.parametrize("size", [(16, 16), (48, 64), (49, 62), (8, 120)])
@pytest.mark.parametrize("subsample", [False, True])
def test_roundtrip_psnr40(size, subsample):
    img = _gradient(*size)
    data = jpeg_encode(img, quality=92, subsample=subsample)
    assert sniff_format(data) == "jpg"
    dec = jpeg_decode(data)
    assert dec.shape == img.shape
    assert psnr(img, dec) >= 40.0


def test_phash_stable_under_jpeg():
    img = _blocky(64, 64, 7)
    dec = jpeg_decode(jpeg_encode(img, quality=92))
    assert psnr(img, dec) >= 40.0
    assert hamming64(phash64(img), phash64(dec)) <= 6


def test_grayscale_roundtrip():
    g = _gradient(40, 56)[:, :, 0]
    dec = jpeg_decode(jpeg_encode(g, quality=92))
    assert dec.shape == (40, 56, 3)
    assert psnr(np.repeat(g[:, :, None], 3, axis=2), dec) >= 45.0


def test_codec_dispatch():
    img = _gradient(24, 24)
    data = encode_image(img, "jpg")
    assert sniff_format(data) == "jpg"
    assert psnr(img, decode_image(data)) >= 40.0


def test_restart_markers():
    img = _gradient(64, 80)
    plain = jpeg_encode(img, quality=92)
    rst = jpeg_encode(img, quality=92, restart_interval=2)
    assert b"\xff\xdd" in rst  # DRI present
    assert any(bytes([0xFF, 0xD0 + k]) in rst for k in range(8))
    a, b = jpeg_decode(plain), jpeg_decode(rst)
    # restart segmentation must not change decoded pixels
    assert np.array_equal(a, b)
    assert psnr(img, b) >= 40.0


def test_flat_color_lossless():
    img = np.full((32, 32, 3), [200, 30, 90], np.uint8)
    assert np.array_equal(jpeg_decode(jpeg_encode(img, 90)), img)


def test_arithmetic_coding_rejected():
    data = bytearray(jpeg_encode(_gradient(16, 16), 90))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC9  # pretend SOF9 (arithmetic sequential)
    with pytest.raises(ValueError):
        jpeg_decode(bytes(data))


@pytest.mark.parametrize("shape,subsample,ri",
                         [((16, 16, 3), False, 0),
                          ((23, 17, 3), False, 0),   # odd dims
                          ((32, 24, 3), True, 0),    # 4:2:0
                          ((40, 40, 3), True, 3),    # restarts in scans
                          ((16, 16), False, 0)])     # grayscale
def test_progressive_decodes_identical_to_baseline(shape, subsample, ri):
    """jpeg_encode_progressive transmits the SAME quantized
    coefficients across its DC/AC first + refinement scans, so the
    progressive stream must decode bit-identical to the baseline one
    (VERDICT r2 #6)."""
    from imgray.jpegcodec import jpeg_encode_progressive

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    prog = jpeg_encode_progressive(img, 85, subsample=subsample,
                                   restart_interval=ri)
    assert b"\xff\xc2" in prog  # really SOF2
    base = jpeg_encode(img, 85, subsample=subsample, restart_interval=ri)
    assert np.array_equal(jpeg_decode(prog), jpeg_decode(base))


def test_progressive_smooth_eob_runs_psnr():
    """Smooth images produce sparse AC bands → multi-block EOBn runs in
    both first and refinement scans; decode must stay ≥40 dB vs the
    source (the BASELINE.json lossy invariant)."""
    from imgray.jpegcodec import jpeg_encode_progressive

    img = _gradient(48, 40)
    out = jpeg_decode(jpeg_encode_progressive(img, 90))
    assert psnr(out.astype(np.float64), img.astype(np.float64)) >= 40.0
    out2 = jpeg_decode(jpeg_encode_progressive(img, 90, subsample=True))
    assert psnr(out2.astype(np.float64), img.astype(np.float64)) >= 40.0


def test_progressive_sniffs_and_dispatches():
    from imgray.jpegcodec import jpeg_encode_progressive

    data = jpeg_encode_progressive(_blocky(24, 24, 5), 90)
    assert sniff_format(data) == "jpg"
    arr = decode_image(data)
    assert arr.shape == (24, 24, 3)


def test_truncated_header_rejected():
    with pytest.raises(ValueError):
        jpeg_decode(b"\xff\xd8\xff\xdb\x00\x04\x00\x00")


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 2 ** 31 - 1), st.integers(2, 6), st.integers(2, 6),
       st.booleans())
def test_roundtrip_property(seed, bh, bw, subsample):
    """Property: any 8×8-blocky image (random colors, odd crops)
    round-trips above the PSNR bar in 4:4:4; 4:2:0 halves chroma
    resolution BY DESIGN (any decoder), so there the bar applies to the
    luma plane."""
    h, w = bh * 8 - (seed % 3), bw * 8 - (seed % 5)
    img = _blocky(h, w, seed)
    dec = jpeg_decode(jpeg_encode(img, quality=93, subsample=subsample))
    assert dec.shape == img.shape
    if subsample:
        luma = np.array([0.299, 0.587, 0.114])
        assert psnr((img @ luma).astype(np.uint8),
                    (dec @ luma).astype(np.uint8)) >= 40.0
    else:
        assert psnr(img, dec) >= 40.0
