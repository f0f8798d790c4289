"""GIF87a/89a codec, written from scratch on stdlib + numpy (same
self-contained-codec policy as png/bmp/jpeg: no image libs in this
sandbox; reference magic-number typing src/main.rs:740-766 recognizes
GIF, so crawled GIFs must decode for pHash/features).

  * decode — global/local color tables, interlaced and plain frames,
    LZW with dynamic code width + clear/EOI codes, GIF89a graphic
    control (transparency renders the canvas underneath; background is
    opaque black), and FULL animation composition (per-frame offsets,
    disposal methods 0-3) via ``gif_decode_frames``; ``gif_decode``
    returns the first composed (h, w, 3) uint8 RGB frame.
  * encode — GIF89a, single frame, global palette.  Images with ≤256
    distinct colors are encoded LOSSLESSLY (exact palette); otherwise
    colors quantize to an adaptive 6-7-6 grid (documented lossy path).

Public format: GIF is specified in the public GIF89a specification
(CompuServe, 1990); LZW here is the standard variable-width variant.
"""

from __future__ import annotations

import struct

import numpy as np


# ----------------------------------------------------------------- LZW

def _lzw_decode(data: bytes, min_code_size: int, npix: int) -> np.ndarray:
    """Variable-width LZW (GIF flavor) → palette-index array."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(npix, dtype=np.uint16)
    n_out = 0

    # bit reader, LSB-first within bytes (GIF packs codes little-endian)
    acc = 0
    nbits = 0
    pos = 0

    def read(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return eoi  # truncated stream: stop cleanly
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    # dictionary: code → (prefix_code, last_byte); roots are implicit
    prefix = np.full(4096, -1, dtype=np.int32)
    last = np.zeros(4096, dtype=np.uint16)
    next_code = eoi + 1
    width = min_code_size + 1
    prev = -1
    buf = np.empty(4096, dtype=np.uint16)  # expansion scratch (reversed)

    def expand(code: int) -> np.ndarray:
        n = 0
        c = code
        while c >= clear:
            buf[n] = last[c]
            n += 1
            c = prefix[c]
        buf[n] = c
        n += 1
        return buf[:n][::-1]

    while n_out < npix:
        code = read(width)
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            seq = expand(code)
        elif code < next_code:
            seq = expand(code)
            if next_code < 4096:
                prefix[next_code] = prev
                last[next_code] = seq[0]
                next_code += 1
        elif code == next_code and next_code < 4096:
            pseq = expand(prev)
            prefix[next_code] = prev
            last[next_code] = pseq[0]
            next_code += 1
            seq = expand(code)
        else:
            raise ValueError("corrupt LZW stream")
        k = min(len(seq), npix - n_out)
        out[n_out:n_out + k] = seq[:k]
        n_out += k
        if next_code == (1 << width) and width < 12:
            width += 1
        prev = code
    if n_out < npix:
        out[n_out:] = 0  # truncated frame: pad with background
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[tuple, int] = {}
    next_code = eoi + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev: tuple = ()
    for v in indices.tolist():
        cur = prev + (v,)
        if len(cur) == 1:
            prev = cur
            continue
        if cur in table:
            prev = cur
            continue
        # emit code for prev (root or table entry)
        emit(prev[0] if len(prev) == 1 else table[prev])
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prev = (v,)
    if prev:
        emit(prev[0] if len(prev) == 1 else table[prev])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------- decode

def gif_decode_frames(data: bytes,
                      max_frames: int | None = None) -> list[np.ndarray]:
    """All (or the first ``max_frames``) composed animation frames as
    (h, w, 3) uint8 RGB.  Composition per GIF89a: frames draw onto the
    logical-screen canvas at their (x, y) offset; GCE transparency
    leaves the underlying canvas pixel; disposal 2 restores the
    background (rendered opaque black, same policy as static
    transparency) and disposal 3 restores the pre-frame canvas."""
    if not data.startswith((b"GIF87a", b"GIF89a")):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    transp = None  # GCE transparency index for the NEXT frame (89a)
    disposal = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks
            label = data[pos + 1]
            pos += 2
            first_sub = None
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                if first_sub is None:
                    first_sub = data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and first_sub and len(first_sub) >= 4:
                disposal = (first_sub[0] >> 2) & 0x07
                transp = first_sub[3] if first_sub[0] & 0x01 else None
        elif b == 0x2C:  # image descriptor
            x0, y0, iw, ih, iflags = struct.unpack("<HHHHB",
                                                   data[pos + 1:pos + 10])
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(data[pos:pos + 3 * n],
                                   dtype=np.uint8).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF frame without color table")
            min_code = data[pos]
            pos += 1
            chunks = []
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                chunks.append(data[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code, iw * ih)
            idx = np.clip(idx, 0, len(ct) - 1).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                de = np.empty_like(idx)
                rows = np.r_[np.arange(0, ih, 8), np.arange(4, ih, 8),
                             np.arange(2, ih, 4), np.arange(1, ih, 2)]
                de[rows] = idx
                idx = de
            rect = ct[idx]
            ch, cw = min(ih, h - y0), min(iw, w - x0)
            before = canvas.copy() if disposal == 3 else None
            target = canvas[y0:y0 + ch, x0:x0 + cw]
            patch = rect[:ch, :cw]
            if transp is not None:
                mask = (idx[:ch, :cw] != transp)[:, :, None]
                np.copyto(target, patch, where=mask)
            else:
                target[:] = patch
            frames.append(canvas.copy())
            if max_frames is not None and len(frames) >= max_frames:
                return frames
            if disposal == 2:  # restore background (opaque black)
                canvas[y0:y0 + ch, x0:x0 + cw] = 0
            elif disposal == 3 and before is not None:
                canvas = before
            transp = None
            disposal = 0
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no image frame")
    return frames


def gif_decode(data: bytes) -> np.ndarray:
    """First composed frame (static decode; transparency → opaque
    black, matching the canvas background)."""
    return gif_decode_frames(data, max_frames=1)[0]


# --------------------------------------------------------------- encode

def gif_encode(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → GIF89a.  Lossless when the image has ≤256
    distinct colors; otherwise quantizes to an adaptive grid."""
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    packed = (flat[:, 0].astype(np.uint32) << 16) \
        | (flat[:, 1].astype(np.uint32) << 8) | flat[:, 2]
    colors, inverse = np.unique(packed, return_inverse=True)
    if len(colors) > 256:
        # lossy fallback: 6-7-6 levels ≈ 252 colors
        q = (np.round(flat[:, 0] / 255 * 5).astype(np.uint32) * 42
             + np.round(flat[:, 1] / 255 * 6).astype(np.uint32) * 6
             + np.round(flat[:, 2] / 255 * 5).astype(np.uint32))
        colors_rgb = np.zeros((252, 3), dtype=np.uint8)
        r, g, b = np.meshgrid(np.arange(6), np.arange(7), np.arange(6),
                              indexing="ij")
        colors_rgb[:, 0] = np.round(r.reshape(-1) * 255 / 5)
        colors_rgb[:, 1] = np.round(g.reshape(-1) * 255 / 6)
        colors_rgb[:, 2] = np.round(b.reshape(-1) * 255 / 5)
        palette, indices = colors_rgb, q
    else:
        palette = np.stack([(colors >> 16) & 0xFF, (colors >> 8) & 0xFF,
                            colors & 0xFF], axis=1).astype(np.uint8)
        indices = inverse.astype(np.uint32)
    n = len(palette)
    depth = max(1, int(np.ceil(np.log2(max(2, n)))))
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x07), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(2, depth)
    out.append(min_code)
    payload = _lzw_encode(indices.astype(np.uint16), min_code)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
