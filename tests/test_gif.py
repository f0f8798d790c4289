"""GIF codec vectors: lossless ≤256-color round trips, LZW width
boundaries (tables past 4096 entries with clears), interlaced frames,
local color tables, animation first-frame, and sniff/dispatch."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from imgray.codecs import decode_image, encode_image, phash64, psnr, \
    sniff_format
from imgray.gifcodec import _lzw_decode, _lzw_encode, gif_decode, gif_encode


def _paletted(h, w, ncolors, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncolors, 3)).astype(np.uint8)
    idx = rng.integers(0, ncolors, (h, w))
    return pal[idx]


def test_lossless_roundtrip():
    img = _paletted(40, 56, 100, 3)
    data = gif_encode(img)
    assert sniff_format(data) == "gif"
    assert np.array_equal(gif_decode(data), img)


def test_dispatch_and_phash():
    img = _paletted(32, 32, 64, 5)
    data = encode_image(img, "gif")
    dec = decode_image(data)
    assert np.array_equal(dec, img)
    assert phash64(dec) == phash64(img)


def test_quantized_fallback_many_colors():
    yy, xx = np.mgrid[0:48, 0:64]
    img = np.stack([yy * 5 % 256, xx * 3 % 256, (xx + yy) % 256],
                   axis=2).astype(np.uint8)
    dec = gif_decode(gif_encode(img))
    assert dec.shape == img.shape
    assert psnr(img, dec) > 20.0  # documented lossy quantization path


def test_interlaced_frame():
    """Hand-build an interlaced GIF (4-pass row order) — the decoder
    must un-interlace back to the original."""
    img = _paletted(37, 23, 40, 7)
    plain = gif_encode(img)
    # parse the plain file: header+LSD+GCT, descriptor, LZW payload
    flags = plain[10]
    n = 2 << (flags & 0x07)
    gct_end = 13 + 3 * n
    desc = plain[gct_end:gct_end + 10]
    assert desc[0] == 0x2C
    h, w = img.shape[0], img.shape[1]
    rows = np.r_[np.arange(0, h, 8), np.arange(4, h, 8),
                 np.arange(2, h, 4), np.arange(1, h, 2)]
    # recover the palette + index image from the ORIGINAL (lossless)
    pal = np.frombuffer(plain[13:gct_end], dtype=np.uint8).reshape(n, 3)
    lut = {tuple(c): i for i, c in enumerate(pal.tolist())}
    idx = np.array([[lut[tuple(px)] for px in row] for row in img.tolist()],
                   dtype=np.uint16)
    min_code = max(2, int(np.log2(n)))
    payload = _lzw_encode(idx[rows].reshape(-1), min_code)
    out = bytearray(plain[:gct_end])
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    out.append(min_code)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    assert np.array_equal(gif_decode(bytes(out)), img)


def test_extension_blocks_skipped():
    """GIF89a graphic-control / comment extensions before the frame."""
    img = _paletted(8, 8, 10, 11)
    data = gif_encode(img)
    # splice a graphic control extension + comment after the GCT
    flags = data[10]
    n = 2 << (flags & 0x07)
    cut = 13 + 3 * n
    ext = (b"\x21\xf9\x04\x00\x00\x00\x00\x00"      # graphic control
           b"\x21\xfe\x05hello\x00")                 # comment
    spliced = data[:cut] + ext + data[cut:]
    assert np.array_equal(gif_decode(spliced), img)


def test_truncated_rejected():
    with pytest.raises(ValueError):
        gif_decode(b"GIF89a" + b"\x00" * 7)


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 2**31 - 1), st.integers(2, 250), st.integers(1, 3000))
def test_lzw_property(seed, alphabet, n):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, alphabet, n).astype(np.uint16)
    mcs = max(2, int(np.ceil(np.log2(alphabet))))
    assert np.array_equal(
        _lzw_decode(_lzw_encode(idx, mcs), mcs, n).astype(np.uint16), idx)


def test_gif_gce_transparency_renders_black():
    """GIF89a graphic-control transparency: a transparent palette index
    renders as opaque black, not its palette color (ADVICE r2)."""
    import numpy as np
    from imgray.gifcodec import gif_decode, gif_encode

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[0, 0] = [7, 7, 7]
    img[1, 1] = [200, 10, 10]
    data = bytearray(gif_encode(img))
    depth = (data[10] & 0x07) + 1
    n = 1 << depth
    pal = np.frombuffer(bytes(data[13:13 + 3 * n]),
                        dtype=np.uint8).reshape(n, 3)
    ti = int(np.where((pal == [7, 7, 7]).all(axis=1))[0][0])
    gce = b"\x21\xf9\x04" + bytes([0x01, 0, 0, ti]) + b"\x00"
    with_gce = bytes(data[:13 + 3 * n]) + gce + bytes(data[13 + 3 * n:])
    out = gif_decode(with_gce)
    assert (out[0, 0] == [0, 0, 0]).all()
    assert (out[1, 1] == [200, 10, 10]).all()
    # without a GCE the palette color renders unchanged
    assert (gif_decode(bytes(data))[0, 0] == [7, 7, 7]).all()


def _anim_gif():
    """Hand-built 3-frame 4x4 animation: full first frame; offset 2x2
    patch with a transparent pixel (disposal 1 = leave); then a frame
    after a disposal-2 (restore-background) of frame 2's rect."""
    from imgray.gifcodec import _lzw_encode

    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                   dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 0x01, 0, 0)  # GCT 4 entries
    out += pal.tobytes()

    def frame(idx, x0, y0, w, h, transp=None, disposal=0):
        b = bytearray()
        flags = disposal << 2 | (0x01 if transp is not None else 0)
        b += b"\x21\xf9\x04" + bytes([flags, 0, 0, transp or 0]) + b"\x00"
        b += b"\x2c" + struct.pack("<HHHHB", x0, y0, w, h, 0)
        b.append(2)  # min code size
        payload = _lzw_encode(np.asarray(idx, dtype=np.uint16).reshape(-1), 2)
        for i in range(0, len(payload), 255):
            chunk = payload[i:i + 255]
            b.append(len(chunk))
            b += chunk
        b += b"\x00"
        return b

    out += frame(np.full((4, 4), 1), 0, 0, 4, 4)             # all red
    out += frame([[2, 3], [3, 2]], 1, 1, 2, 2, transp=3,     # green patch,
                 disposal=2)                                  # idx3=transp
    out += frame(np.full((1, 1), 2), 0, 0, 1, 1)             # green dot
    out += b"\x3b"
    return bytes(out)


def test_gif_animation_frames_composition():
    from imgray.gifcodec import gif_decode, gif_decode_frames

    frames = gif_decode_frames(_anim_gif())
    assert len(frames) == 3
    f1, f2, f3 = frames
    assert (f1 == [200, 0, 0]).all()  # full red canvas
    # frame 2: green at (1,1) and (2,2); transparent idx3 shows red
    assert (f2[1, 1] == [0, 200, 0]).all()
    assert (f2[2, 2] == [0, 200, 0]).all()
    assert (f2[1, 2] == [200, 0, 0]).all()  # transparent -> underlying
    assert (f2[2, 1] == [200, 0, 0]).all()
    assert (f2[0, 0] == [200, 0, 0]).all()  # outside the patch rect
    # frame 3: disposal-2 blacked frame 2's rect; new green dot at (0,0)
    assert (f3[0, 0] == [0, 200, 0]).all()
    assert (f3[1, 1] == [0, 0, 0]).all()    # restored background
    assert (f3[3, 3] == [200, 0, 0]).all()  # untouched canvas
    # gif_decode == first composed frame
    assert np.array_equal(gif_decode(_anim_gif()), f1)


def test_video_stage_real_gif_frames(ray_session):
    import pyarrow as pa
    from imgray.ops.media import VideoFrameSampleStage

    stage = VideoFrameSampleStage(n_frames=2)
    batch = pa.table({"media_id": ["a"], "bytes": [_anim_gif()]})
    out = stage(batch)
    assert out.num_rows == 2  # 3 frames sampled down to 2
    from imgray.codecs import png_decode
    first = png_decode(out.column("frame_png")[0].as_py())
    assert (first == [200, 0, 0]).all()


def test_video_stage_tolerates_corrupt_gif(ray_session):
    """Code-review regression: truncated GIF bytes fall back to the
    deterministic fake frames instead of crashing the stage."""
    import pyarrow as pa
    from imgray.ops.media import VideoFrameSampleStage

    stage = VideoFrameSampleStage(n_frames=2, fake=True)
    batch = pa.table({"media_id": ["bad"], "bytes": [b"GIF89a\x01\x02"]})
    out = stage(batch)
    assert out.num_rows == 2  # fake frames emitted
    with pytest.raises(Exception):
        VideoFrameSampleStage(n_frames=2, fake=False)(batch)
