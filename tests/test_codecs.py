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


# ---------------------------------------------------- full-surface PNG

def _make_png(samples, ctype, depth, interlace=0, plte=None, trns=None):
    """Independent forward PNG writer (filter 0 only) for decode
    ground truth: packs raw SAMPLES (palette indices / gray / rgb /
    +alpha) at any legal depth, optionally Adam7-interlaced."""
    import struct
    import zlib

    h, w, ch = samples.shape

    def pack_rows(sub):
        sh, sw, _ = sub.shape
        if depth == 8:
            rows = sub.reshape(sh, sw * ch).astype(np.uint8)
        elif depth == 16:
            rows = np.zeros((sh, sw * ch * 2), np.uint8)
            rows[:, 0::2] = sub.reshape(sh, sw * ch)  # high byte
        else:
            bits = ((sub.reshape(sh, sw)[:, :, None]
                     >> np.arange(depth - 1, -1, -1)) & 1) \
                .astype(np.uint8).reshape(sh, sw * depth)
            pad = (-bits.shape[1]) % 8
            bits = np.pad(bits, ((0, 0), (0, pad)))
            rows = np.packbits(bits, axis=1)
        return b"".join(b"\x00" + r.tobytes() for r in rows)

    if interlace == 0:
        body = pack_rows(samples)
    else:
        body = b""
        for x0, y0, dx, dy in C._ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                body += pack_rows(sub)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = C._PNG_SIG + C._chunk(b"IHDR", ihdr)
    if plte is not None:
        out += C._chunk(b"PLTE", np.asarray(plte, np.uint8).tobytes())
    if trns is not None:
        out += C._chunk(b"tRNS", bytes(trns))
    return out + C._chunk(b"IDAT", zlib.compress(body)) \
               + C._chunk(b"IEND", b"")


def _over_black(c, a):
    return ((c.astype(np.uint16) * a.astype(np.uint16) + 127)
            // 255).astype(np.uint8)


def test_png_rgba_composites_over_black():
    rng = np.random.default_rng(3)
    s = rng.integers(0, 256, (9, 7, 4)).astype(np.uint8)
    s[0, 0, 3] = 0    # fully transparent → black
    s[0, 1, 3] = 255  # fully opaque → original color
    got = C.png_decode(_make_png(s, 6, 8))
    want = _over_black(s[:, :, :3], s[:, :, 3:4])
    assert np.array_equal(got, want)
    assert (got[0, 0] == 0).all()
    assert np.array_equal(got[0, 1], s[0, 1, :3])


def test_png_palette_with_trns():
    rng = np.random.default_rng(4)
    plte = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (11, 5, 1)).astype(np.uint8)
    got = C.png_decode(_make_png(idx, 3, 8, plte=plte))
    assert np.array_equal(got, plte[idx[:, :, 0]])
    # depth-4 palette with tRNS alpha on the first two entries
    got4 = C.png_decode(_make_png(idx, 3, 4, plte=plte,
                                  trns=[0, 128]))
    alpha = np.full(256, 255, np.uint8)
    alpha[0], alpha[1] = 0, 128
    want = _over_black(plte[idx[:, :, 0]],
                       alpha[idx[:, :, 0]][:, :, None])
    assert np.array_equal(got4, want)


@pytest.mark.parametrize("depth", [1, 2, 4, 8, 16])
def test_png_grayscale_depths(depth):
    rng = np.random.default_rng(depth)
    maxv = (1 << min(depth, 8)) - 1
    g = rng.integers(0, maxv + 1, (6, 10, 1)).astype(np.uint8)
    got = C.png_decode(_make_png(g, 0, depth))
    scale = 255 // maxv if depth < 8 else 1
    want = np.repeat((g[:, :, 0] * scale).astype(np.uint8)[:, :, None],
                     3, axis=2)
    assert np.array_equal(got, want)


def test_png_gray_alpha():
    rng = np.random.default_rng(5)
    s = rng.integers(0, 256, (5, 8, 2)).astype(np.uint8)
    got = C.png_decode(_make_png(s, 4, 8))
    g = _over_black(s[:, :, 0:1], s[:, :, 1:2])[:, :, 0]
    assert np.array_equal(got, np.repeat(g[:, :, None], 3, axis=2))


def test_png_rgb16_high_byte():
    rng = np.random.default_rng(6)
    s = rng.integers(0, 256, (4, 6, 3)).astype(np.uint8)
    got = C.png_decode(_make_png(s, 2, 16))
    assert np.array_equal(got, s)


@pytest.mark.parametrize("shape", [(1, 1), (3, 3), (8, 8), (13, 21)])
def test_png_adam7_interlace_matches_progressive_none(shape):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    s = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
    plain = C.png_decode(_make_png(s, 2, 8, interlace=0))
    inter = C.png_decode(_make_png(s, 2, 8, interlace=1))
    assert np.array_equal(plain, s)
    assert np.array_equal(inter, s)


def test_png_interlaced_palette():
    rng = np.random.default_rng(8)
    plte = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    idx = rng.integers(0, 4, (10, 9, 1)).astype(np.uint8)
    got = C.png_decode(_make_png(idx, 3, 2, interlace=1, plte=plte))
    assert np.array_equal(got, plte[idx[:, :, 0]])


def test_png_illegal_combos_rejected():
    s = np.zeros((2, 2, 1), np.uint8)
    with pytest.raises(ValueError):
        C.png_decode(_make_png(s, 3, 16,
                               plte=np.zeros((2, 3), np.uint8)))
    rgb = np.zeros((2, 2, 3), np.uint8)
    with pytest.raises(ValueError):
        C.png_decode(_make_png(rgb, 2, 4))


def test_png_interlaced_encoder_roundtrip():
    img = _img(23, 37, seed=11)
    data = C.png_encode_interlaced(img)
    assert C.sniff_format(data) == "png"
    assert np.array_equal(C.png_decode(data), img)


def test_png_palette_encoder_roundtrip():
    img = _img(19, 29, seed=12)
    data = C.png_encode_palette(img)
    assert C.sniff_format(data) == "png"
    want = ((img // 52) * 52 + 26).astype(np.uint8)
    assert np.array_equal(C.png_decode(data), want)
