import numpy as np
import pytest

from imgray import codecs as C


def _img(h=40, w=56, seed=7):
    rng = np.random.default_rng(seed)
    # smooth-ish image (random low-freq) + noise, like a photo
    bh, bw = -(-h // 8), -(-w // 8)
    base = rng.integers(0, 255, (bh, bw, 3)).astype(np.float64)
    up = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
    img = np.clip(up + rng.normal(0, 8, (h, w, 3)), 0, 255)
    return img.astype(np.uint8)


def test_png_roundtrip():
    img = _img()
    data = C.png_encode(img)
    assert C.sniff_format(data) == "png"
    out = C.png_decode(data)
    assert np.array_equal(out, img)


def test_bmp_roundtrip():
    img = _img(33, 47)  # odd width → row padding exercised
    data = C.bmp_encode(img)
    assert C.sniff_format(data) == "bmp"
    out = C.bmp_decode(data)
    assert np.array_equal(out, img)


def test_lsy_lossy_psnr():
    img = _img(64, 80)
    data = C.lsy_encode(img)
    assert C.sniff_format(data) == "lsy"
    out = C.lsy_decode(data)
    assert out.shape == img.shape
    assert C.psnr(img, out) >= 40.0  # the BASELINE.json per-row invariant


def test_lsy_nonmultiple_of_8():
    img = _img(37, 41)
    out = C.lsy_decode(C.lsy_encode(img))
    assert out.shape == img.shape
    assert C.psnr(img, out) >= 40.0


def test_sniff_misc():
    assert C.sniff_format(b"\xff\xd8\xff\xe0hello") == "jpg"
    assert C.sniff_format(b"GIF89a....") == "gif"
    assert C.sniff_format(b"RIFF1234WEBPVP8 ") == "webp"
    assert C.sniff_format(b"\x00\x00\x00 ftypavif") == "avif"
    assert C.sniff_format(b"<?xml?><svg xmlns='x'></svg>") == "svg"
    assert C.sniff_format(b"garbage") == ""


def test_phash_properties():
    img = _img(64, 64, seed=1)
    h1 = C.phash64(img)
    assert isinstance(h1, int)
    assert -(2**63) <= h1 < 2**63
    # identical images → identical hash
    assert C.phash64(img.copy()) == h1
    # lossy round-trip → near hash (small hamming distance)
    h2 = C.phash64(C.lsy_decode(C.lsy_encode(img)))
    assert C.hamming64(h1, h2) <= 6
    # a very different image → far hash
    other = _img(64, 64, seed=99)
    assert C.hamming64(h1, C.phash64(other)) > 10


def test_decode_dispatch():
    img = _img()
    for fmt in ("png", "bmp", "lsy"):
        data = C.encode_image(img, fmt)
        out = C.decode_image(data)
        assert out.shape == img.shape
    with pytest.raises(ValueError):
        C.decode_image(b"not an image")
