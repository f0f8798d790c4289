"""Baseline JPEG (JFIF) codec, written from scratch on numpy + stdlib
(VERDICT r1 missing #2: the dominant real-world crawled format had no
decoder here — no Pillow in this sandbox).

Scope (ITU-T T.81 sequential baseline + progressive annex G):
  * encode — 8-bit RGB (or grayscale), 4:4:4 or 4:2:0, quality-scaled
    Annex K quantization tables, standard Annex K Huffman tables, one
    interleaved scan; plus ``jpeg_encode_progressive`` (SOF2, DC/AC
    first + successive-approximation refinement scans) for first-party
    progressive vectors.
  * decode — baseline SOF0/1 AND progressive SOF2 (spectral selection,
    successive approximation, EOBn runs), 1 or 3 components, ARBITRARY
    sampling factors (4:4:4 / 4:2:2 / 4:2:0 … via MCU-interleaved
    decode + nearest upsampling), multi-scan streams, multiple DQT/DHT
    segments, DRI/RSTn restart markers, 0xFF byte-stuffing.
  * arithmetic coding, hierarchical, 12-bit precision: out of scope →
    ValueError (honest failure, the caller's strict/fake split handles
    it).

The tables in Annex K of the public JPEG specification (ITU-T T.81 /
ISO 10918-1) are example tables reproduced here verbatim from the spec.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------- spec constants

# zigzag scan order: index i of the i-th coefficient in row-major 8x8
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 example quantization tables (luminance, chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K.3 example Huffman tables: (bits[1..16] counts, symbol values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_mat(n: int = 8) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_D8 = _dct_mat(8)


def _scale_qt(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base table (public IJG rule)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int64)


# -------------------------------------------------------- huffman build

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """symbol → (code, length) canonical Huffman assignment (T.81 C.2)."""
    out: dict[int, tuple] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple, int]:
    """(length, code) → symbol lookup for the bit-serial decoder."""
    return {(ln, c): s for s, (c, ln) in _canonical_codes(bits, vals).items()}


# ------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_align(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad to byte with 1s

    def marker(self, b: bytes) -> None:
        """Emit a raw marker (RSTn) — byte-aligned, never stuffed."""
        self.pad_align()
        self.buf += b

    def flush(self) -> bytes:
        self.pad_align()
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + appended bits (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_blocks(writer: _BitWriter, blocks_z: np.ndarray, dc_tab, ac_tab,
                   pred: int) -> int:
    """Entropy-encode zigzagged quantized blocks of one component run."""
    for bz in blocks_z:
        dc = int(bz[0])
        size, bits = _magnitude(dc - pred)
        pred = dc
        code, ln = dc_tab[size]
        writer.write(code, ln)
        if size:
            writer.write(bits, size)
        run = 0
        nz = np.flatnonzero(bz[1:])
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(bz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            size, bits = _magnitude(v)
            code, ln = ac_tab[(run << 4) | size]
            writer.write(code, ln)
            writer.write(bits, size)
            run = 0
        if last < 63:
            code, ln = ac_tab[0x00]  # EOB
            writer.write(code, ln)
    return pred


def _component_blocks(plane: np.ndarray, qt: np.ndarray,
                      bh: int | None = None,
                      bw: int | None = None) -> np.ndarray:
    """(h, w) float plane → (bh, bw, 64) zigzagged quantized int block
    grid, edge-replicated out to ``bh×bw`` 8×8 blocks (the component's
    share of the MCU grid)."""
    h, w = plane.shape
    bh = bh if bh is not None else -(-h // 8)
    bw = bw if bw is not None else -(-w // 8)
    ph, pw = bh * 8, bw * 8
    pad = np.empty((ph, pw), dtype=np.float64)
    pad[:h, :w] = plane
    pad[h:, :w] = plane[h - 1:h, :]
    pad[:, w:] = pad[:, w - 1:w]
    blocks = (pad.reshape(bh, 8, bw, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8)) - 128.0
    coeff = _D8[None] @ blocks @ _D8.T[None]
    q = np.round(coeff / qt[None]).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG].reshape(bh, bw, 64)


def jpeg_encode(img: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) RGB or (h, w) grayscale uint8 → baseline JFIF bytes
    (one interleaved scan, Annex K Huffman tables).  ``subsample=True``
    emits 4:2:0 (2×2 luma sampling, box-averaged chroma) — the layout
    real-world JPEGs overwhelmingly use, so the decoder's general MCU
    path gets first-party vectors."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt0 = _scale_qt(QT_LUMA, quality)
    qt1 = _scale_qt(QT_CHROMA, quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        f = img.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2

            def down(p):
                pad = np.empty((ph, pw))
                pad[:h, :w] = p
                pad[h:, :w] = p[h - 1:h, :]
                pad[:, w:] = pad[:, w - 1:w]
                return pad.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1)] * 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)  # APP0, 1:1 density, no thumb
    for tid, qt in ((0, qt0),) + (() if gray else ((1, qt1),)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in qt.reshape(64)[ZIGZAG])
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1],
                      0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
              (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                   (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, bits, vals in tables:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    grids = [
        _component_blocks(p, qt0 if i == 0 else qt1,
                          bh=mcuy * samp[i][1], bw=mcux * samp[i][0])
        for i, p in enumerate(planes)
    ]
    writer = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            m = my * mcux + mx
            if restart_interval and m and m % restart_interval == 0:
                writer.marker(bytes([0xFF, 0xD0 +
                                     ((m // restart_interval - 1) % 8)]))
                preds = [0] * ncomp
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        blk = grids[ci][my * vs + by, mx * hs + bx]
                        preds[ci] = _encode_blocks(
                            writer, blk[None],
                            dc_l if ci == 0 else dc_c,
                            ac_l if ci == 0 else ac_c, preds[ci])
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------- progressive encoder

# uniform 9-bit AC table for progressive scans: every (run, size) plus
# EOBn/ZRL symbol, one code length — valid canonical Huffman (176 ≤ 512
# slots), chosen for simplicity over compression (first-party vectors)
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]


def _sos_header(comp_specs: list[tuple], Ss: int, Se: int, Ah: int,
                Al: int) -> bytes:
    sos = bytes([len(comp_specs)])
    for cid, td, ta in comp_specs:
        sos += bytes([cid, (td << 4) | ta])
    sos += bytes([Ss, Se, (Ah << 4) | Al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos


def _enc_dc_scan(grids: list[np.ndarray], samp: list[tuple], mcux: int,
                 mcuy: int, dc_tabs: list[dict], Ah: int, Al: int,
                 restart_interval: int) -> bytes:
    """DC scan: first pass (Ah=0) codes (dc >> Al) diffs; refinement
    (Ah>0) one raw bit per block (T.81 G.1.2.1).  Interleaved MCU
    order over the padded grids."""
    w = _BitWriter()
    preds = [0] * len(grids)
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            w.marker(bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)]))
            preds = [0] * len(grids)
        my, mx = divmod(m, mcux)
        for ci, g in enumerate(grids):
            hs, vs = samp[ci]
            for by in range(vs):
                for bx in range(hs):
                    dc = int(g[my * vs + by, mx * hs + bx, 0])
                    if Ah == 0:
                        v = dc >> Al
                        size, bits = _magnitude(v - preds[ci])
                        code, ln = dc_tabs[ci][size]
                        w.write(code, ln)
                        if size:
                            w.write(bits, size)
                        preds[ci] = v
                    else:
                        w.write((dc >> Al) & 1, 1)
    return w.flush()


def _enc_ac_first(grid: np.ndarray, nbh: int, nbw: int, ac_codes: dict,
                  Ss: int, Se: int, Al: int,
                  restart_interval: int) -> bytes:
    """AC first scan (Ah=0): band coefficients at point transform Al
    (signed divide toward zero), zero runs + EOBn end-of-band runs
    (T.81 G.1.2.2).  Non-interleaved raster over the TRUE block grid."""
    w = _BitWriter()
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            code, ln = ac_codes[nbits << 4]
            w.write(code, ln)
            if nbits:
                w.write(eobrun - (1 << nbits), nbits)
            eobrun = 0

    for m in range(nbh * nbw):
        if restart_interval and m and m % restart_interval == 0:
            flush_eob()
            w.marker(bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)]))
        by, bx = divmod(m, nbw)
        z = grid[by, bx]
        r = 0
        for k in range(Ss, Se + 1):
            t = int(z[k])
            t = t >> Al if t >= 0 else -((-t) >> Al)
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                code, ln = ac_codes[0xF0]
                w.write(code, ln)
                r -= 16
            size, bits = _magnitude(t)
            code, ln = ac_codes[(r << 4) | size]
            w.write(code, ln)
            w.write(bits, size)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return w.flush()


def _enc_ac_refine(grid: np.ndarray, nbh: int, nbw: int, ac_codes: dict,
                   Ss: int, Se: int, Al: int,
                   restart_interval: int) -> bytes:
    """AC refinement scan (Ah=Al+1): newly-nonzero coefficients (|c| >>
    Al == 1) as run/±1 symbols over zero-history positions; correction
    bits for every already-nonzero coefficient interleave exactly where
    the decoder's advance loop reads them (T.81 G.1.2.3) — this encoder
    mirrors the decode loop step for step, including the EOB-run
    buffered-bit ordering."""
    w = _BitWriter()
    eobrun = 0
    bitbuf: list[int] = []

    def flush_eob() -> None:
        nonlocal eobrun, bitbuf
        if eobrun:
            nbits = eobrun.bit_length() - 1
            code, ln = ac_codes[nbits << 4]
            w.write(code, ln)
            if nbits:
                w.write(eobrun - (1 << nbits), nbits)
            for b in bitbuf:
                w.write(b, 1)
            eobrun = 0
            bitbuf = []

    for m in range(nbh * nbw):
        if restart_interval and m and m % restart_interval == 0:
            flush_eob()
            w.marker(bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)]))
        by, bx = divmod(m, nbw)
        z = grid[by, bx]

        def mag(k: int) -> int:
            return abs(int(z[k])) >> Al

        newpos = [k for k in range(Ss, Se + 1) if mag(k) == 1]
        k = Ss
        for p in newpos:
            flush_eob()
            r = sum(1 for q in range(k, p) if mag(q) == 0)
            while r > 15:
                code, ln = ac_codes[0xF0]
                w.write(code, ln)
                # the decoder's ZRL advance skips 16 zero-history
                # positions, reading one correction bit per nonzero
                # passed — emit exactly those bits, in position order
                zz = 0
                while True:
                    a = mag(k)
                    if a == 0:
                        zz += 1
                        if zz == 16:
                            k += 1
                            break
                    elif a > 1:
                        w.write(mag(k) & 1, 1)
                    k += 1
                r -= 16
            code, ln = ac_codes[(r << 4) | 1]
            w.write(code, ln)
            w.write(1 if int(z[p]) > 0 else 0, 1)
            for q in range(k, p):
                if mag(q) > 1:
                    w.write(mag(q) & 1, 1)
            k = p + 1
        if k <= Se:
            eobrun += 1
            bitbuf.extend(mag(q) & 1 for q in range(k, Se + 1)
                          if mag(q) > 1)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return w.flush()


def jpeg_encode_progressive(img: np.ndarray, quality: int = 90,
                            subsample: bool = False,
                            restart_interval: int = 0) -> bytes:
    """(h, w, 3) RGB or (h, w) grayscale uint8 → progressive (SOF2)
    JFIF bytes with successive approximation: DC first (Al=1) → per-
    component AC first (band 1..63, Al=1) → per-component AC refine →
    DC refine.  Transmits the same quantized coefficients as
    jpeg_encode at equal quality/subsampling, so decodes bit-identical
    to the baseline stream."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt0 = _scale_qt(QT_LUMA, quality)
    qt1 = _scale_qt(QT_CHROMA, quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        f = img.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2

            def down(p):
                pad = np.empty((ph, pw))
                pad[:h, :w] = p
                pad[h:, :w] = p[h - 1:h, :]
                pad[:, w:] = pad[:, w - 1:w]
                return pad.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1)] * 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    ncomp = len(planes)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, qt in ((0, qt0),) + (() if gray else ((1, qt1),)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) \
            + bytes(int(x) for x in qt.reshape(64)[ZIGZAG])
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1],
                      0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
              (0x10, PROG_AC_BITS, PROG_AC_VALS)]
    if not gray:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS)]
    for tc, bits, vals in tables:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_tabs = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)] + \
        [_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)] * (ncomp - 1)
    ac_codes = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)
    grids = [
        _component_blocks(p, qt0 if i == 0 else qt1,
                          bh=mcuy * samp[i][1], bw=mcux * samp[i][0])
        for i, p in enumerate(planes)
    ]
    # true (non-interleaved) block dims per component, T.81 A.2.2
    nb = []
    for i in range(ncomp):
        ch = -(-h * samp[i][1] // vmax)
        cw = -(-w * samp[i][0] // hmax)
        nb.append((-(-ch // 8), -(-cw // 8)))

    comp_specs = [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)]
    # scan 1: DC first, Al=1, interleaved
    out += _sos_header(comp_specs, 0, 0, 0, 1)
    out += _enc_dc_scan(grids, samp, mcux, mcuy, dc_tabs, 0, 1,
                        restart_interval)
    # scans 2..: AC first per component (band 1..63, Al=1)
    for ci in range(ncomp):
        out += _sos_header([comp_specs[ci]], 1, 63, 0, 1)
        out += _enc_ac_first(grids[ci], nb[ci][0], nb[ci][1], ac_codes,
                             1, 63, 1, restart_interval)
    # AC refinement per component (Ah=1 → Al=0)
    for ci in range(ncomp):
        out += _sos_header([comp_specs[ci]], 1, 63, 1, 0)
        out += _enc_ac_refine(grids[ci], nb[ci][0], nb[ci][1], ac_codes,
                              1, 63, 0, restart_interval)
    # DC refinement (Ah=1 → Al=0), interleaved raw bits
    out += _sos_header(comp_specs, 0, 0, 1, 0)
    out += _enc_dc_scan(grids, samp, mcux, mcuy, dc_tabs, 1, 0,
                        restart_interval)
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------- decoder

class _BitReader:
    """Bit-serial reader over de-stuffed entropy data with RST support."""

    def __init__(self, data: bytes, start: int):
        self.segs: list[bytes] = []  # entropy segments split at RSTn
        self.end = len(data)
        buf = bytearray()
        i = start
        while i < len(data):
            b = data[i]
            if b == 0xFF:
                nxt = data[i + 1] if i + 1 < len(data) else 0
                if nxt == 0x00:
                    buf.append(0xFF)
                    i += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
                    self.segs.append(bytes(buf))
                    buf = bytearray()
                    i += 2
                    continue
                self.end = i  # next real marker (EOI, …)
                break
            buf.append(b)
            i += 1
        self.segs.append(bytes(buf))
        self.seg = 0
        self.pos = 0
        self.bit = 0

    def next_segment(self) -> None:
        if self.pos or self.bit:
            self.seg += 1
            self.pos = 0
            self.bit = 0

    def read_bit(self) -> int:
        d = self.segs[self.seg]
        if self.pos >= len(d):
            return 0  # missing-data padding (truncated stream)
        b = (d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _upsample_axis(p: np.ndarray, f: int, axis: int) -> np.ndarray:
    """Chroma upsampling along one axis.  f==2 uses the triangular
    (3/4, 1/4) sample-center interpolation real decoders apply ("fancy
    upsampling"); other factors fall back to sample-and-hold."""
    if f == 1:
        return p
    if f != 2:
        return np.repeat(p, f, axis=axis)
    a = np.moveaxis(p, axis, 0)
    prev = np.concatenate([a[:1], a[:-1]], axis=0)
    nxt = np.concatenate([a[1:], a[-1:]], axis=0)
    out = np.empty((a.shape[0] * 2,) + a.shape[1:], dtype=p.dtype)
    out[0::2] = (3.0 * a + prev) / 4.0
    out[1::2] = (3.0 * a + nxt) / 4.0
    return np.moveaxis(out, 0, axis)


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _read_symbol(reader: _BitReader, table: dict[tuple, int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


def _decode_dc_scan(reader: _BitReader, scan_comps: list[dict],
                    dcs: dict, Ah: int, Al: int, restart_interval: int,
                    mcux: int, mcuy: int) -> None:
    """DC scan (Ss=Se=0): first pass (Ah=0) decodes diffs at point
    transform Al; refinement (Ah>0) reads one bit per block (T.81
    G.1.2.1).  Interleaved in MCU order when the scan has several
    components, block-raster over the component's true grid when one."""
    interleaved = len(scan_comps) > 1
    for c in scan_comps:
        c["pred"] = 0
    if interleaved:
        units = mcux * mcuy
    else:
        c = scan_comps[0]
        units = c["nbw"] * c["nbh"]
    for m in range(units):
        if restart_interval and m and m % restart_interval == 0:
            reader.next_segment()
            for c in scan_comps:
                c["pred"] = 0
        if interleaved:
            my, mx = divmod(m, mcux)
            blocks = [(c, my * c["v"] + by, mx * c["h"] + bx)
                      for c in scan_comps
                      for by in range(c["v"]) for bx in range(c["h"])]
        else:
            c = scan_comps[0]
            by, bx = divmod(m, c["nbw"])
            blocks = [(c, by, bx)]
        for c, by, bx in blocks:
            z = c["qz"][by, bx]
            if Ah == 0:
                size = _read_symbol(reader, dcs[c["td"]])
                c["pred"] += _extend(reader.read_bits(size), size)
                z[0] = c["pred"] << Al
            elif reader.read_bit():
                z[0] = int(z[0]) | (1 << Al)


def _decode_ac_first(reader: _BitReader, c: dict, act: dict, Ss: int,
                     Se: int, Al: int, restart_interval: int) -> None:
    """AC first scan (Ah=0): band Ss..Se at point transform Al with
    EOBn end-of-band runs (T.81 G.1.2.2).  Always non-interleaved."""
    eobrun = 0
    for m in range(c["nbw"] * c["nbh"]):
        if restart_interval and m and m % restart_interval == 0:
            reader.next_segment()
            eobrun = 0
        if eobrun > 0:
            eobrun -= 1
            continue
        by, bx = divmod(m, c["nbw"])
        z = c["qz"][by, bx]
        k = Ss
        while k <= Se:
            rs = _read_symbol(reader, act)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += r
            if k > Se:
                raise ValueError("AC run overflow")
            z[k] = _extend(reader.read_bits(s), s) << Al
            k += 1


def _decode_ac_refine(reader: _BitReader, c: dict, act: dict, Ss: int,
                      Se: int, Al: int, restart_interval: int) -> None:
    """AC refinement scan (Ah=Al+1): newly-nonzero coefficients arrive
    as ±1<<Al run-length coded over ZERO-HISTORY positions; every
    already-nonzero coefficient passed on the way contributes one
    correction bit (T.81 G.1.2.3)."""
    p1, m1 = 1 << Al, -1 << Al
    eobrun = 0
    for m in range(c["nbw"] * c["nbh"]):
        if restart_interval and m and m % restart_interval == 0:
            reader.next_segment()
            eobrun = 0
        by, bx = divmod(m, c["nbw"])
        z = c["qz"][by, bx]
        k = Ss
        if eobrun == 0:
            while k <= Se:
                rs = _read_symbol(reader, act)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    # r == 15: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("bad refinement symbol")
                    val = p1 if reader.read_bit() else m1
                while k <= Se:
                    if z[k] != 0:
                        if reader.read_bit() and not (int(z[k]) & p1):
                            z[k] = int(z[k]) + (p1 if z[k] > 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= Se:
                    z[k] = val
                k += 1
        if eobrun > 0:
            # the EOB symbol's correction bits cover the block's tail
            while k <= Se:
                if z[k] != 0 and reader.read_bit() and not (int(z[k]) & p1):
                    z[k] = int(z[k]) + (p1 if z[k] > 0 else m1)
                k += 1
            eobrun -= 1


def _decode_baseline_scan(reader: _BitReader, scan_comps: list[dict],
                          dcs: dict, acs: dict, restart_interval: int,
                          mcux: int, mcuy: int) -> None:
    """Sequential scan (Ss=0, Se=63): DC diff + AC runs per block."""
    for c in scan_comps:
        c["pred"] = 0
    interleaved = len(scan_comps) > 1
    units = (mcux * mcuy if interleaved
             else scan_comps[0]["nbw"] * scan_comps[0]["nbh"])
    for m in range(units):
        if restart_interval and m and m % restart_interval == 0:
            reader.next_segment()
            for c in scan_comps:
                c["pred"] = 0
        if interleaved:
            my, mx = divmod(m, mcux)
            blocks = [(c, my * c["v"] + by, mx * c["h"] + bx)
                      for c in scan_comps
                      for by in range(c["v"]) for bx in range(c["h"])]
        else:
            c = scan_comps[0]
            by, bx = divmod(m, c["nbw"])
            blocks = [(c, by, bx)]
        for c, by, bx in blocks:
            dct, act = dcs[c["td"]], acs[c["ta"]]
            z = c["qz"][by, bx]
            size = _read_symbol(reader, dct)
            c["pred"] += _extend(reader.read_bits(size), size)
            z[0] = c["pred"]
            k = 1
            while k < 64:
                rs = _read_symbol(reader, act)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run overflow")
                z[k] = _extend(reader.read_bits(s), s)
                k += 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """JFIF bytes → (h, w, 3) uint8 RGB (grayscale replicated).

    Supports baseline SOF0/1 AND progressive SOF2 (spectral selection +
    successive approximation, T.81 annex G) with arbitrary sampling
    factors, DRI restarts, multi-scan streams and multi-table DQT/DHT;
    raises ValueError on arithmetic/hierarchical/12-bit codings.  All
    scans accumulate quantized coefficients; dequantize + IDCT run once
    at the end, batched over every block."""
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    qts: dict[int, np.ndarray] = {}
    dcs: dict[int, dict] = {}
    acs: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    hmax = vmax = mcux = mcuy = 0
    restart_interval = 0
    i = 2
    nscans = 0
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[i + 2:i + 4])
        body = data[i + 4:i + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit DQT unsupported")
                if p + 65 > len(body):
                    raise ValueError("truncated DQT")
                z = np.frombuffer(body[p + 1:p + 65], dtype=np.uint8)
                qts[tq] = z.astype(np.int64)[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                (dcs if tc == 0 else acs)[th] = _decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision")
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcux * c["h"]  # MCU-padded block grid
                c["bh"] = mcuy * c["v"]
                # true (non-interleaved scan) block dims, T.81 A.2.2:
                # ceil(ceil(dim * sampling / max_sampling) / 8)
                cw = -(-w * c["h"] // hmax)
                ch = -(-h * c["v"] // vmax)
                c["nbw"] = -(-cw // 8)
                c["nbh"] = -(-ch // 8)
                c["qz"] = np.zeros((c["bh"], c["bw"], 64), dtype=np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG coding (arithmetic/"
                             "hierarchical/lossless)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — decode the scan, then keep parsing
            if not comps:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                for c in comps:
                    if c["id"] == cs:
                        c["td"], c["ta"] = tdta >> 4, tdta & 0xF
                        scan_comps.append(c)
            Ss, Se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            Ah, Al = ahal >> 4, ahal & 0xF
            reader = _BitReader(data, i + 2 + seglen)
            if Ss == 0 and Se == 63 and Ah == 0 and Al == 0:
                _decode_baseline_scan(reader, scan_comps, dcs, acs,
                                      restart_interval, mcux, mcuy)
            elif Ss == 0 and Se == 0:
                _decode_dc_scan(reader, scan_comps, dcs, Ah, Al,
                                restart_interval, mcux, mcuy)
            elif Ss > 0 and len(scan_comps) == 1:
                fn = _decode_ac_first if Ah == 0 else _decode_ac_refine
                fn(reader, scan_comps[0], acs[scan_comps[0]["ta"]],
                   Ss, Se, Al, restart_interval)
            else:
                raise ValueError("bad scan parameters")
            nscans += 1
            i = reader.end
            continue
        i += 2 + seglen
    if nscans == 0 or not comps:
        raise ValueError("no scan found")

    planes = []
    for c in comps:
        qt = qts[c["tq"]]
        deq = (c["qz"].reshape(-1, 64)[:, UNZIGZAG]
               .reshape(-1, 8, 8).astype(np.float64) * qt[None])
        pix = _D8.T[None] @ deq @ _D8[None] + 128.0
        p = (pix.reshape(c["bh"], c["bw"], 8, 8)
             .transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8))
        p = _upsample_axis(p, vmax // c["v"], axis=0)
        p = _upsample_axis(p, hmax // c["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError(
            f"unsupported component count {len(planes)} (1 or 3)")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
