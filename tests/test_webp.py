"""Lossless WebP (VP8L) codec vectors (VERDICT r2 missing #2): exact
round trips across the transform/cache/LZ77 matrix, container parsing,
sniff/dispatch integration, and honest rejection of lossy VP8."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from imgray.codecs import decode_image, encode_image, sniff_format
from imgray.webpcodec import webp_decode, webp_encode


def _rand(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("mode", list(range(14)) + [None])
def test_predictor_modes_round_trip(mode):
    img = _rand(13, 17, 3)
    data = webp_encode(img, predictor_mode=mode)
    assert np.array_equal(webp_decode(data), img)


@pytest.mark.parametrize("sg,cache,lz", [
    (False, 0, False), (True, 0, False), (True, 6, False),
    (True, 0, True), (True, 4, True), (False, 8, True)])
def test_feature_matrix_round_trip(sg, cache, lz):
    img = _rand(9, 31, 7)
    img[3:6] = [10, 20, 30]  # runs for LZ77 / repeated cache hits
    data = webp_encode(img, use_subtract_green=sg, cache_bits=cache,
                       use_lz77=lz)
    assert np.array_equal(webp_decode(data), img)


def test_edge_sizes():
    for shape in [(1, 1, 3), (1, 40, 3), (40, 1, 3), (5, 33, 3)]:
        img = _rand(*shape[:2], seed=sum(shape))
        assert np.array_equal(webp_decode(webp_encode(img)), img)


def test_sniff_and_dispatch():
    img = _rand(12, 12, 3)
    data = encode_image(img, "webp")
    assert sniff_format(data) == "webp"
    assert np.array_equal(decode_image(data), img)


def test_lossy_vp8_rejected():
    fake = b"RIFF" + struct.pack("<I", 20) + b"WEBP" \
        + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(ValueError):
        webp_decode(fake)


def test_not_webp_rejected():
    with pytest.raises(ValueError):
        webp_decode(b"RIFF\x00\x00\x00\x00JUNK")
    with pytest.raises(ValueError):
        webp_decode(b"\x89PNG\r\n")


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**31),
       st.sampled_from([None, 2, 11, 13]), st.integers(0, 6))
def test_round_trip_property(h, w, seed, mode, cache):
    img = _rand(h, w, seed)
    data = webp_encode(img, predictor_mode=mode, cache_bits=cache)
    assert np.array_equal(webp_decode(data), img)


def test_phash_stable_through_webp():
    from imgray.codecs import phash64

    img = np.kron(np.arange(16).reshape(4, 4) * 17,
                  np.ones((8, 8))).astype(np.uint8)
    img = np.stack([img] * 3, axis=2)
    assert phash64(decode_image(webp_encode(img))) == phash64(img)


def test_long_uniform_run_splits_at_4096():
    """Code-review regression: runs longer than the VP8L length cap
    (4096) must split into multiple copy tokens, not overflow the
    24-code length space."""
    img = np.zeros((70, 70, 3), dtype=np.uint8)  # 4900-px run
    assert np.array_equal(webp_decode(webp_encode(img)), img)
    img2 = np.full((70, 71, 3), 7, dtype=np.uint8)
    assert np.array_equal(webp_decode(webp_encode(img2, cache_bits=5)),
                          img2)


def test_single_symbol_code_length_code():
    """Code-review regression: all-equal code lengths make the
    code-length code single-symbol, which consumes ZERO bits."""
    base = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img = np.stack([base, base[::-1], base.T], axis=2)
    data = webp_encode(img, use_subtract_green=False, use_lz77=False)
    assert np.array_equal(webp_decode(data), img)
