"""Self-contained image codecs + perceptual hash (SURVEY.md §7 step 2).

No Pillow in this sandbox, so the codecs are written from scratch on
numpy + stdlib zlib:

  * PNG  — encode: 8-bit RGB, zlib/filter-0.  Decode: every legal
    IHDR combination — color types 0/2/3/4/6, bit depths 1/2/4/8/16
    (16-bit reduced to the high byte, the standard 8-bit reduction),
    PLTE palette, tRNS palette alpha, Adam7 interlace, filters 0..4.
    Alpha is composited over BLACK with round-half-up integer math
    ((c*a + 127) // 255) — the same opaque-black convention the GIF
    decoder uses for GCE transparency; tRNS color-key transparency on
    color types 0/2 is intentionally ignored (pixels stay opaque).
  * BMP  — 24-bit BI_RGB bottom-up.
  * LSY  — a small DCT-quantization lossy codec (stands in for JPEG so
    the PSNR≥40 dB per-row invariant of BASELINE.json input_hint is
    exercised for real).
  * magic-number format sniffing (reference: magic_number_type,
    /root/reference/src/main.rs:740-766, reimplemented over bytes).
  * pHash — 32×32 grayscale → 2-D DCT-II → top-left 8×8, median
    threshold (sans DC), packed to a signed int64.

All functions are pure and vectorized; they run inside map_batches
decode stages (actor pools) over Arrow binary columns.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """img: (h, w, 3) uint8 → PNG bytes (filter 0, RGB8)."""
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 2)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_encode_interlaced(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → Adam7-interlaced RGB8 PNG (filter 0): the
    seven passes' scanlines are concatenated in pass order per the
    spec, so progressive-capable decoders (ours included) can render
    incrementally."""
    h, w, _ = img.shape
    body = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            flat = sub.reshape(sub.shape[0], -1)
            body += b"".join(b"\x00" + r.tobytes() for r in flat)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(body, 2))
            + _chunk(b"IEND", b""))


def png_encode_palette(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → color-type-3 (palette) PNG.  Colors are
    quantized to 5 levels per channel (≤125 palette entries) with the
    deterministic midpoint map v -> (v // 52) * 52 + 26; decode
    returns exactly that quantized image."""
    h, w, _ = img.shape
    q = ((img // 52) * 52 + 26).astype(np.uint8)
    colors, inv = np.unique(q.reshape(-1, 3), axis=0,
                            return_inverse=True)
    idx = inv.reshape(h, w).astype(np.uint8)
    body = b"".join(b"\x00" + r.tobytes() for r in idx)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", colors.astype(np.uint8).tobytes())
            + _chunk(b"IDAT", zlib.compress(body, 2))
            + _chunk(b"IEND", b""))


def _png_unfilter_bytes(raw: np.ndarray, h: int, stride: int,
                        bpp: int) -> np.ndarray:
    """Undo PNG scanline filters over raw (filter-byte + stride) rows;
    returns (h, stride) bytes.  ``bpp`` is the filter's pixel advance
    in BYTES (max(1, channels*depth//8) per the spec — sub-byte depths
    filter with bpp=1)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:
            cur = (line + prev) & 0xFF
        else:
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:  # paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
    return out


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 pass origins/strides (x0, y0, dx, dy)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_decode_rect(raw: np.ndarray, w: int, h: int, channels: int,
                     depth: int) -> np.ndarray:
    """One (sub-)image of filtered scanlines → (h, w, channels) uint8
    SAMPLES (palette indices stay indices; 16-bit keeps the high
    byte; depths 1/2/4 stay unscaled — scaling is color-type work)."""
    bits_pp = channels * depth
    stride = (w * bits_pp + 7) // 8
    bpp = max(1, bits_pp // 8)
    rows = _png_unfilter_bytes(raw, h, stride, bpp)
    if depth == 8:
        return rows[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        return rows.reshape(h, stride)[:, : w * channels * 2] \
            .reshape(h, w * channels, 2)[:, :, 0].reshape(h, w, channels)
    # sub-byte depths (legal only for 1 channel): unpack bit groups
    bits = np.unpackbits(rows, axis=1)[:, : w * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    samples = (bits.reshape(h, w, depth) * weights).sum(
        axis=2).astype(np.uint8)
    return samples.reshape(h, w, 1)


def _png_nbytes(w: int, h: int, channels: int, depth: int) -> int:
    return h * ((w * channels * depth + 7) // 8 + 1)


def png_decode(data: bytes) -> np.ndarray:
    """Full-coverage PNG decode → (h, w, 3) uint8 RGB.  See module
    docstring for the supported surface and the opaque-black alpha
    convention."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    w = h = depth = ctype = interlace = None
    plte = trns = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13])
        elif typ == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {ctype}")
    if depth not in (1, 2, 4, 8, 16) or \
       (depth < 8 and ctype not in (0, 3)) or \
       (depth == 16 and ctype == 3):
        raise ValueError(f"illegal PNG depth/type {depth}/{ctype}")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")

    channels = _PNG_CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if interlace == 0:
        samples = _png_decode_rect(raw, w, h, channels, depth)
    elif interlace == 1:
        samples = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            sw = len(range(x0, w, dx))
            sh = len(range(y0, h, dy))
            if sw == 0 or sh == 0:
                continue
            nb = _png_nbytes(sw, sh, channels, depth)
            samples[y0::dy, x0::dx] = _png_decode_rect(
                raw[off : off + nb], sw, sh, channels, depth)
            off += nb
    else:
        raise ValueError(f"bad PNG interlace {interlace}")

    def over_black(c: np.ndarray, a: np.ndarray) -> np.ndarray:
        return ((c.astype(np.uint16) * a.astype(np.uint16) + 127)
                // 255).astype(np.uint8)

    if ctype == 2:
        return np.ascontiguousarray(samples)
    if ctype == 6:
        a = samples[:, :, 3:4]
        return over_black(samples[:, :, :3], a)
    if ctype == 3:
        idx = samples[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(256, 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            rgb = over_black(rgb, alpha[idx][:, :, None])
        return rgb
    # grayscale (0) / gray+alpha (4)
    g = samples[:, :, 0]
    if depth < 8:
        g = (g.astype(np.uint16) * (255 // ((1 << depth) - 1))) \
            .astype(np.uint8)
    if ctype == 4:
        g = over_black(g[:, :, None], samples[:, :, 1:2])[:, :, 0]
    return np.repeat(g[:, :, None], 3, axis=2)


# ------------------------------------------------------------------- BMP

def bmp_encode(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    size = 54 + (row + pad) * h
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, (row + pad) * h, 2835, 2835, 0, 0)
    body = np.zeros((h, row + pad), dtype=np.uint8)
    body[:, :row] = img[::-1, :, ::-1].reshape(h, row)  # bottom-up BGR
    return hdr + dib + body.tobytes()


def bmp_decode(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    w, h = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    if bpp != 24:
        raise ValueError("only 24-bit BMP supported")
    row = w * 3
    pad = (4 - row % 4) % 4
    buf = np.frombuffer(data, dtype=np.uint8, count=(row + pad) * abs(h), offset=off)
    buf = buf.reshape(abs(h), row + pad)[:, :row].reshape(abs(h), w, 3)
    img = buf[::-1] if h > 0 else buf
    return img[:, :, ::-1].copy()  # BGR → RGB


# ------------------------------------------------- LSY (lossy DCT codec)

def _dct_mat(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_D8 = _dct_mat(8).astype(np.float32)
_Q = 4.0  # flat quantizer step → PSNR ≳ 44 dB


def lsy_encode(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    pad = np.zeros((ph, pw, 3), dtype=np.float32)
    pad[:h, :w] = img
    pad[h:, :w] = img[h - 1 : h, :]
    pad[:, w:] = pad[:, w - 1 : w]
    # (nblocks, 8, 8) batched GEMM: D @ X @ D.T  (float32, cache-friendly)
    blocks = (pad.reshape(ph // 8, 8, pw // 8, 8, 3)
              .transpose(0, 2, 4, 1, 3)
              .reshape(-1, 8, 8)) - np.float32(128.0)
    coeff = _D8[None] @ blocks @ _D8.T[None]
    q = np.round(coeff / np.float32(_Q)).astype(np.int16)
    payload = zlib.compress(q.tobytes(), 3)
    return b"LSY1" + struct.pack("<HH", w, h) + payload


def lsy_decode(data: bytes) -> np.ndarray:
    if data[:4] != b"LSY1":
        raise ValueError("not LSY")
    w, h = struct.unpack("<HH", data[4:8])
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    nb, nc = ph // 8, pw // 8
    q = np.frombuffer(zlib.decompress(data[8:]), dtype=np.int16).reshape(
        -1, 8, 8
    )
    coeff = q.astype(np.float32) * np.float32(_Q)
    blocks = (_D8.T[None] @ coeff @ _D8[None]) + np.float32(128.0)
    img = (blocks.reshape(nb, nc, 3, 8, 8)
           .transpose(0, 3, 1, 4, 2)
           .reshape(ph, pw, 3))
    return np.clip(np.round(img), 0, 255).astype(np.uint8)[:h, :w]


# -------------------------------------------------------------- sniffing

def sniff_format(data: bytes) -> str:
    """Magic-number format detection (reference src/main.rs:740-766
    semantics: first-bytes signatures with an <svg sniff fallback)."""
    if data.startswith(_PNG_SIG):
        return "png"
    if data.startswith(b"\xff\xd8\xff"):
        return "jpg"
    if data.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if data.startswith(b"BM"):
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[4:12] in (b"ftypavif", b"ftypavis"):
        return "avif"
    if data.startswith(b"LSY1"):
        return "lsy"
    if b"<svg" in data[:1024]:
        return "svg"
    return ""


def decode_image(data: bytes) -> np.ndarray:
    fmt = sniff_format(data)
    if fmt == "png":
        return png_decode(data)
    if fmt == "bmp":
        return bmp_decode(data)
    if fmt == "lsy":
        return lsy_decode(data)
    if fmt == "jpg":
        from .jpegcodec import jpeg_decode

        return jpeg_decode(data)
    if fmt == "gif":
        from .gifcodec import gif_decode

        return gif_decode(data)
    if fmt == "webp":
        from .webpcodec import webp_decode  # lossless VP8L natively

        try:
            return webp_decode(data)
        except ValueError as e:
            if "unsupported" in str(e):
                # lossy VP8 / extended-without-VP8L (see
                # webpcodec.py:24-31): adapter-only
                return _adapter_decode(data, fmt)
            raise
    if fmt == "avif":
        return _adapter_decode(data, fmt)  # no native AVIF codec
    raise ValueError(f"cannot decode format {fmt or 'unknown'}")


def _adapter_decode(data: bytes, fmt: str) -> np.ndarray:
    """Optional-library fallback (VERDICT r4 #5): formats the
    from-scratch codecs deliberately exclude decode via Pillow when it
    is installed; otherwise the env-blocked NotImplementedError is
    raised so the gap stays explicit (the ``undecodable_formats``
    query counts these rows)."""
    from . import adapters

    if adapters.pillow_available():
        return adapters.pil_decode(data)
    raise NotImplementedError(
        f"decode for {fmt} requires Pillow/libwebp, not present in this "
        "container (imgray.adapters activates automatically when it is)")


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt == "bmp":
        return bmp_encode(img)
    if fmt == "lsy":
        return lsy_encode(img)
    if fmt == "jpg":
        from .jpegcodec import jpeg_encode

        return jpeg_encode(img)
    if fmt == "gif":
        from .gifcodec import gif_encode

        return gif_encode(img)
    if fmt == "webp":
        from .webpcodec import webp_encode  # lossless VP8L

        return webp_encode(img)
    raise ValueError(f"cannot encode format {fmt}")


# ----------------------------------------------------------------- pHash

_D32 = _dct_mat(32).astype(np.float32)
_LUMA = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash as a signed int64 (BASELINE.json input_hint).

    32×32 grayscale → 2-D DCT-II → top-left 8×8 coefficients; bits =
    coeff > median(coeffs sans DC).  Subsamples *before* the luma
    matmul so cost is O(32×32), independent of image size.
    """
    h, w = img.shape[:2]
    ys = (np.arange(32) * h // 32).clip(0, h - 1)
    xs = (np.arange(32) * w // 32).clip(0, w - 1)
    small_rgb = img[np.ix_(ys, xs)].astype(np.float32)
    small = small_rgb @ _LUMA
    coeff = _D32 @ small @ _D32.T
    block = coeff[:8, :8].flatten()
    med = np.median(block[1:])
    bits = block > med
    # MSB-first bit pack (identical to the former shift loop, ~15x faster)
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return int(np.uint64(val).view(np.int64))


def _phash64_fullgray(img: np.ndarray) -> int:  # pragma: no cover
    """Original full-resolution-luma variant (kept for reference)."""
    gray = img @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(32) * h // 32).clip(0, h - 1)
    xs = (np.arange(32) * w // 32).clip(0, w - 1)
    small = gray[np.ix_(ys, xs)]
    coeff = _D32 @ small @ _D32.T
    block = coeff[:8, :8].flatten()
    med = np.median(block[1:])
    bits = block > med
    val = np.uint64(0)
    for b in bits:
        val = np.uint64(val << np.uint64(1)) | np.uint64(bool(b))
    return int(val.view(np.int64))


def phash_batch(imgs: list[np.ndarray]) -> np.ndarray:
    return np.array([phash64(im) for im in imgs], dtype=np.int64)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
