"""Pure-numpy JPEG codec (ITU-T T.81): baseline sequential + progressive.

The container ships no image libraries, but real crawl payloads are
overwhelmingly JPEG — so the engine carries a minimal-but-real codec built
from the public spec: standard Annex-K quantization + Huffman tables, 8x8
DCT as an orthonormal matrix product, JFIF YCbCr color transform, canonical
Huffman bitstreams with 0xFF byte stuffing. Encode writes baseline 4:4:4 or
4:2:0 (``subsampling="420"`` box-averages chroma 2x2 and interleaves
2x2+1+1 MCUs), plus progressive (``encode_jpeg_progressive``, a
spectral-selection + successive-approximation scan script). Decode handles
sequential frames (SOF0/SOF1, interleaved or multi-scan non-interleaved)
AND progressive frames (SOF2, T.81 Annex G: DC first/refinement, AC
first/refinement with EOB-run coding) at any sampling factor in {1,2}x{1,2}
per component — 4:4:4, 4:2:2, 4:4:0 and the 4:2:0 virtually every real web
JPEG uses — plus single-component (grayscale) frames; chroma upsampling is
the classic triangular ("fancy") filter, exact on constant planes. Scan
components map to planes by SOF component id, not scan position, so a
conformant stream whose SOS lists components in an unusual order still
decodes with correct channels. Restart intervals (DRI + RST0-7) decode in
every scan kind and can be emitted by both encoders. Arithmetic coding,
hierarchical/lossless modes and 16-bit quant tables are rejected
explicitly.

All block math is vectorized numpy (the per-batch path under
operators.multimodal's mapInPandas); only the entropy coder walks symbols in
Python, which is bounded by payload bytes, not pixels^2.

Rounding: quantization and the final pixel rounding use floor(x + 0.5)
(round-half-up) so the arithmetic is expressible 1:1 in SQL for the
constant-color oracle fixtures (numpy's np.round is banker's rounding, which
DuckDB's round() is not).
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 / K.2 base quantization tables (natural order)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# zigzag[k] = natural-order index of the k-th zigzag coefficient
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3 standard Huffman table specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: block DCT = C @ B @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
        )


def quality_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """The public libjpeg quality scaling: 5000/Q below 50, 200-2Q above."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r = arr[..., 0].astype(np.float64)
    g = arr[..., 1].astype(np.float64)
    b = arr[..., 2].astype(np.float64)
    y = r * 0.299 + g * 0.587 + b * 0.114
    cb = r * -0.168736 + g * -0.331264 + b * 0.5 + 128.0
    cr = r * 0.5 + g * -0.418688 + b * -0.081312 + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray, align: int = 8) -> np.ndarray:
    """(H, W) -> (nby, nbx, 8, 8) with edge-replication padding to a
    multiple of ``align`` (16 for the luma plane of an interleaved 4:2:0
    frame: Y blocks must tile whole MCUs)."""
    h, w = plane.shape
    ph, pw = -h % align, -w % align
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)


def _triangle_upsample2(comp: np.ndarray, ry: int, rx: int) -> np.ndarray:
    """Factor-2 triangular-filter upsample per axis (the classic libjpeg
    "fancy" h2v2 filter: nearest sample weighted 3/4, next-nearest 1/4, edges
    replicated). Exact on constant planes, ~3-6 dB better than pixel
    replication on smooth chroma."""

    def up_axis(a: np.ndarray, axis: int) -> np.ndarray:
        n = a.shape[axis]
        idx = np.arange(n)
        left = np.take(a, np.maximum(idx - 1, 0), axis=axis)
        right = np.take(a, np.minimum(idx + 1, n - 1), axis=axis)
        even = 0.75 * a + 0.25 * left
        odd = 0.75 * a + 0.25 * right
        out_shape = list(a.shape)
        out_shape[axis] = 2 * n
        out = np.empty(out_shape, dtype=np.float64)
        sl_even = [slice(None)] * a.ndim
        sl_even[axis] = slice(0, 2 * n, 2)
        sl_odd = [slice(None)] * a.ndim
        sl_odd[axis] = slice(1, 2 * n, 2)
        out[tuple(sl_even)] = even
        out[tuple(sl_odd)] = odd
        return out

    if ry == 2:
        comp = up_axis(comp, 0)
    if rx == 2:
        comp = up_axis(comp, 1)
    return comp


def _box_downsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 box average (the reference chroma subsampler; constant regions
    stay exact, which keeps the DC-only oracle fixtures closed-form)."""
    h, w = plane.shape
    if h % 2 or w % 2:
        plane = np.pad(plane, ((0, -h % 2), (0, -w % 2)), mode="edge")
        h, w = plane.shape
    return plane.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def _dct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ij,abjk,lk->abil", _C, blocks, _C)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("ji,abjk,kl->abil", _C, coefs, _C)


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: list[int], c: int,
                  t: int, dc_codes: list[dict], ac_codes: list[dict]) -> None:
    """Entropy-code one quantized zigzag block (DC diff + AC run/size)."""
    diff = int(zz[0]) - pred[c]
    pred[c] = int(zz[0])
    size, bits = _magnitude(diff)
    code, ln = dc_codes[t][size]
    bw.write(code, ln)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[t][0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_codes[t][(run << 4) | size]
        bw.write(code, ln)
        bw.write(bits, size)
        run = 0
    if last < 63:
        code, ln = ac_codes[t][0x00]  # EOB
        bw.write(code, ln)


def _quantized_components(
    arr: np.ndarray, quality: int, subsampling: str
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """RGB -> per-component quantized zigzag block grids [(nby, nbx, 64)
    int32] plus the two quant tables. 4:2:0 box-downsamples chroma 2x2 and
    16-aligns the luma grid so MCUs are whole."""
    qt = [quality_scaled(QT_LUMA, quality), quality_scaled(QT_CHROMA, quality)]
    ycc = rgb_to_ycbcr(arr)
    sub = subsampling == "420"
    comps = []
    for c in range(3):
        t = 0 if c == 0 else 1
        plane = ycc[..., c]
        if sub and c > 0:
            plane = _box_downsample2(plane)
        align = 16 if (sub and c == 0) else 8
        blocks = _to_blocks(plane - 128.0, align)
        coefs = _dct_blocks(blocks)
        q = np.floor(coefs / qt[t] + 0.5).astype(np.int32)  # round-half-up
        nby, nbx = q.shape[:2]
        comps.append(q.reshape(nby, nbx, 64)[..., ZIGZAG])
    return comps, qt


# Uniform 8-bit AC table for the progressive encoder's scans: every symbol a
# progressive AC scan can emit — (r<<4)|size for size 0..10 (size 0 covers
# EOB-run categories g=r and ZRL r=15) — at a fixed 8-bit length (canonical,
# prefix-free, all-ones code unused). Fixture-grade like the WebP subset
# encoder: ~1.6x the bytes of an optimized table, irrelevant for tests; the
# DECODER reads arbitrary DHTs, which is what real-web coverage needs.
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]


def _frame_headers(
    h: int,
    w: int,
    qt: list[np.ndarray],
    samp: list[int],
    sof_marker: int,
    huff: tuple = (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ),
) -> bytearray:
    """SOI + JFIF APP0 + DQT + SOF + DHTs (3-component)."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for t in (0, 1):  # DQT in zigzag order
        zzq = qt[t].reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([t]) + zzq
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, samp[cid - 1], tq])
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", 2 + len(sof)) + sof
    for cls, tid, bits, vals in huff:
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    return out


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    scan_order: tuple[int, int, int] = (1, 2, 3),
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 RGB -> baseline JFIF bytes.

    ``subsampling``: "444" (1x1x1) or "420" (Y 2x2, chroma box-averaged 2x2
    — what real web encoders emit). ``scan_order``: component-id order in
    the SOS/entropy stream (non-default orders are conformant streams used
    to test decoder cid mapping). ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that-many MCUs with DC-predictor resets
    (T.81 E.1.4) — the error-resilience layout camera firmware and many
    web encoders produce."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected HxWx3 uint8 array")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if sorted(scan_order) != [1, 2, 3]:
        raise ValueError("scan_order must be a permutation of (1, 2, 3)")
    h, w, _ = arr.shape
    comps, qt = _quantized_components(arr, quality, subsampling)

    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    sub = subsampling == "420"
    bw = _BitWriter()
    pred = [0, 0, 0]
    mcuy, mcux = comps[2].shape[:2]  # chroma block grid == MCU grid
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()  # byte-align with 1-fill before the marker
                n = (mcu // restart_interval - 1) % 8
                bw.out += bytes((0xFF, 0xD0 + n))
                pred = [0, 0, 0]
            mcu += 1
            for cid in scan_order:
                c = cid - 1
                t = 0 if c == 0 else 1
                if sub and c == 0:  # 2x2 luma blocks per MCU, row-major
                    for v in (0, 1):
                        for u in (0, 1):
                            _encode_block(
                                bw, comps[0][2 * my + v, 2 * mx + u],
                                pred, c, t, dc_codes, ac_codes,
                            )
                else:
                    _encode_block(
                        bw, comps[c][my, mx], pred, c, t, dc_codes, ac_codes
                    )
    bw.flush()

    samp = [0x22, 0x11, 0x11] if sub else [0x11, 0x11, 0x11]
    out = _frame_headers(h, w, qt, samp, 0xC0)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([3]) + b"".join(
        bytes([cid, 0x00 if cid == 1 else 0x11]) for cid in scan_order
    ) + bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 RGB -> progressive JFIF bytes (SOF2, T.81 Annex G).

    Scan script (exercises every progressive decode path):
      1. DC first, interleaved, Al=1
      2. DC refinement, interleaved, Ah=1 -> Al=0 (raw bits)
      3. per component: AC first, Ss=1..63, Al=1 (EOB-run coding)
      4. per component: AC refinement, Ah=1 -> Al=0 (correction bits,
         buffered-bit EOB runs, ZRL)
    The final Al=0 scans restore every quantized coefficient exactly, so
    decoded pixels are bit-identical to ``encode_jpeg`` at the same quality
    and subsampling. ``restart_interval`` > 0 applies T.81 E.1.4 restarts
    to the DC-first and AC-first scans (predictor/EOB-run reset + RSTn),
    with a DRI 0 re-declaration ahead of the refinement scans — a
    conformant mid-stream interval change that exercises the decoder's
    per-scan DRI tracking."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected HxWx3 uint8 array")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w, _ = arr.shape
    comps, qt = _quantized_components(arr, quality, subsampling)
    sub = subsampling == "420"
    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    # one uniform AC table (id 0) for every AC scan: the Annex-K baseline
    # tables lack EOB-run symbols 0x10..0xE0, which progressive scans need
    prog_ac = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)
    mcuy, mcux = comps[2].shape[:2]  # chroma block grid == MCU grid
    hmax = vmax = 2 if sub else 1

    def mcu_blocks():
        """(mcu, component, zigzag block) in interleaved MCU order."""
        for my in range(mcuy):
            for mx in range(mcux):
                mcu = my * mcux + mx
                for c in range(3):
                    if sub and c == 0:
                        for v in (0, 1):
                            for u in (0, 1):
                                yield mcu, c, comps[0][2 * my + v, 2 * mx + u]
                    else:
                        yield mcu, c, comps[c][my, mx]

    def comp_true_dims(c: int) -> tuple[int, int]:
        """Non-interleaved block dims: ceil of the component's OWN sample
        grid (T.81 A.2.2) — excludes the encoder grid's MCU padding."""
        hi = vi = 2 if (sub and c == 0) else 1
        return -(-(-(-h * vi // vmax)) // 8), -(-(-(-w * hi // hmax)) // 8)

    ri = restart_interval
    scans: list[tuple[bytes, bytes, int]] = []  # (SOS body, entropy, scan DRI)

    def emit_rst(bw: _BitWriter, n_rst: int) -> None:
        bw.flush()
        bw.out += bytes((0xFF, 0xD0 + n_rst % 8))

    # ---- scan 1: DC first (interleaved, Al=1) -----------------------------
    bw = _BitWriter()
    pred = [0, 0, 0]
    next_rst = ri
    for mcu, c, zz in mcu_blocks():
        if ri and mcu == next_rst:
            emit_rst(bw, mcu // ri - 1)
            pred = [0, 0, 0]
            next_rst += ri
        t = 0 if c == 0 else 1
        v = int(zz[0]) >> 1  # point transform (arithmetic shift, G.1.2.1)
        size, bits = _magnitude(v - pred[c])
        code, ln = dc_codes[t][size]
        bw.write(code, ln)
        if size:
            bw.write(bits, size)
        pred[c] = v
    bw.flush()
    hdr = bytes([3]) + b"".join(
        bytes([cid, 0x00 if cid == 1 else 0x10]) for cid in (1, 2, 3)
    ) + bytes([0, 0, 0x01])  # Ss=0 Se=0 Ah=0 Al=1
    scans.append((hdr, bytes(bw.out), ri))

    # ---- scan 2: DC refinement (interleaved, Ah=1 -> Al=0, raw bits) ------
    bw = _BitWriter()
    for _mcu, _c, zz in mcu_blocks():
        bw.write(int(zz[0]) & 1, 1)
    bw.flush()
    hdr = bytes([3]) + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3)) + bytes(
        [0, 0, 0x10]
    )  # Ah=1 Al=0
    scans.append((hdr, bytes(bw.out), 0))

    # ---- scans 3..5: AC first per component (Ss=1..63, Al=1) --------------
    for c in range(3):
        actab = prog_ac
        nby, nbx = comp_true_dims(c)
        bw = _BitWriter()
        eobrun = 0

        def flush_eobrun():
            nonlocal eobrun
            if eobrun:
                g = eobrun.bit_length() - 1
                code, ln = actab[g << 4]
                bw.write(code, ln)
                if g:
                    bw.write(eobrun - (1 << g), g)
                eobrun = 0

        mcu = 0  # non-interleaved scan: each block is one MCU (E.1.4)
        next_rst = ri
        for by in range(nby):
            for bx in range(nbx):
                if ri and mcu == next_rst:
                    flush_eobrun()
                    emit_rst(bw, mcu // ri - 1)
                    next_rst += ri
                mcu += 1
                zz = comps[c][by, bx]
                r = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    mag = abs(v) >> 1  # point transform, Al=1
                    if mag == 0:
                        r += 1
                        continue
                    flush_eobrun()
                    while r > 15:
                        code, ln = actab[0xF0]  # ZRL
                        bw.write(code, ln)
                        r -= 16
                    size, bits = _magnitude(mag if v > 0 else -mag)
                    code, ln = actab[(r << 4) | size]
                    bw.write(code, ln)
                    bw.write(bits, size)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
        flush_eobrun()
        bw.flush()
        hdr = bytes([1, c + 1, 0x00]) + bytes([1, 63, 0x01])  # Ta=0, Ah=0 Al=1
        scans.append((hdr, bytes(bw.out), ri))

    # ---- scans 6..8: AC refinement per component (Ah=1 -> Al=0) -----------
    ah, al = 1, 0
    for c in range(3):
        actab = prog_ac
        nby, nbx = comp_true_dims(c)
        bw = _BitWriter()
        eobrun = 0
        be: list[int] = []        # correction bits riding the pending EOB run
        br_bits: list[int] = []   # correction bits since this block's last symbol

        def flush_eobrun_refine():
            nonlocal eobrun
            if eobrun:
                g = eobrun.bit_length() - 1
                code, ln = actab[g << 4]
                bw.write(code, ln)
                if g:
                    bw.write(eobrun - (1 << g), g)
                eobrun = 0
                for b in be:
                    bw.write(b, 1)
                be.clear()

        for by in range(nby):
            for bx in range(nbx):
                zz = comps[c][by, bx]
                # last newly-significant position folds trailing work into EOB
                eob_pos = 0
                for k in range(1, 64):
                    a = abs(int(zz[k]))
                    if (a >> ah) == 0 and (a >> al) != 0:
                        eob_pos = k
                r = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    mag = abs(v) >> al
                    if mag == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob_pos:
                        flush_eobrun_refine()
                        code, ln = actab[0xF0]  # ZRL
                        bw.write(code, ln)
                        r -= 16
                        for b in br_bits:
                            bw.write(b, 1)
                        br_bits.clear()
                    if mag > 1:  # significant after the previous pass
                        br_bits.append(mag & 1)
                        continue
                    # newly significant (±1 << Al)
                    flush_eobrun_refine()
                    code, ln = actab[(r << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if v > 0 else 0, 1)
                    for b in br_bits:
                        bw.write(b, 1)
                    br_bits.clear()
                    r = 0
                if r > 0 or br_bits:
                    eobrun += 1
                    be.extend(br_bits)
                    br_bits.clear()
                    if eobrun == 0x7FFF:
                        flush_eobrun_refine()
        flush_eobrun_refine()
        bw.flush()
        hdr = bytes([1, c + 1, 0x00]) + bytes([1, 63, 0x10])  # Ta=0, Ah=1 Al=0
        scans.append((hdr, bytes(bw.out), 0))

    samp = [0x22, 0x11, 0x11] if sub else [0x11, 0x11, 0x11]
    out = _frame_headers(
        h, w, qt, samp, 0xC2,
        huff=(
            (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 0, PROG_AC_BITS, PROG_AC_VALS),
        ),
    )
    cur_dri = 0
    for hdr, entropy, scan_ri in scans:
        if scan_ri != cur_dri:
            out += b"\xff\xdd" + struct.pack(">HH", 4, scan_ri)
            cur_dri = scan_ri
        out += b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr + entropy
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray(arr: np.ndarray, quality: int = 90) -> bytes:
    """HxW uint8 grayscale -> baseline single-component JFIF bytes (the
    grayscale frames real crawls also see; exercises the decoder's
    1-component path)."""
    if arr.dtype != np.uint8 or arr.ndim != 2:
        raise ValueError("expected HxW uint8 array")
    h, w = arr.shape
    qt = quality_scaled(QT_LUMA, quality)
    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_codes = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    blocks = _to_blocks(arr.astype(np.float64) - 128.0)
    coefs = _dct_blocks(blocks)
    q = np.floor(coefs / qt + 0.5).astype(np.int32)
    zz = q.reshape(-1, 64)[:, ZIGZAG]
    bw = _BitWriter()
    pred = [0]
    for bi in range(zz.shape[0]):
        _encode_block(bw, zz[bi], pred, 0, 0, dc_codes, ac_codes)
    bw.flush()
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    zzq = qt.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + zzq
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
    ):
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:  # consume stuffing zero
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("unexpected marker in entropy stream")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume the RSTn marker at a restart boundary
        (T.81 E.1.4): padding bits are discarded, the marker's modulo-8
        sequence number is not load-bearing for reconstruction."""
        self.nbits = 0
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xFF
        ):
            self.pos += 1  # fill bytes
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker at interval boundary")
        self.pos += 2


def _decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, tree: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = tree.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

def _next_marker(data: bytes, pos: int, skip_rst: bool = False) -> int:
    """Index of the next marker (0xFF + nonzero code) at/after ``pos``,
    skipping entropy bytes, 0xFF00 stuffing and 0xFF fill bytes. With
    ``skip_rst`` (a nonzero DRI is active) restart markers RST0-7 are part
    of the entropy segment and skipped; without it they are malformed."""
    i = pos
    n = len(data)
    while i < n - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        nxt = data[i + 1]
        if nxt == 0x00:
            i += 2
            continue
        if nxt == 0xFF:
            i += 1
            continue
        if 0xD0 <= nxt <= 0xD7:
            if skip_rst:
                i += 2
                continue
            raise ValueError("unexpected restart marker (DRI is zero)")
        return i
    raise ValueError("ran off stream looking for a marker")


def _scan_block_order(scan_spec, spec_by_cid, w, h, hmax, vmax, n_frame_comps):
    """Yield (mcu, cid, by, bx) in entropy order for one scan.

    Interleaved scans (ns > 1) walk MCUs with hi x vi blocks per component
    (T.81 A.2.3). Single-component scans walk the component's OWN block
    raster ceil(cw/8) x ceil(ch/8) WITHOUT MCU padding (A.2.2) — the rule
    both multi-scan sequential and every progressive AC scan use; there
    each block is its own MCU (the restart-interval unit, E.1.4)."""
    if len(scan_spec) == 1:
        cid = scan_spec[0][0]
        hi, vi, _ = spec_by_cid[cid]
        if n_frame_comps == 1:
            hi = vi = hm = vm = 1
        else:
            hm, vm = hmax, vmax
        cw = -(-w * hi // hm)
        ch = -(-h * vi // vm)
        mcu = 0
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield mcu, cid, by, bx
                mcu += 1
    else:
        mcux = -(-w // (8 * hmax))
        for my in range(-(-h // (8 * vmax))):
            for mx in range(mcux):
                mcu = my * mcux + mx
                for cid, _, _ in scan_spec:
                    hi, vi, _ = spec_by_cid[cid]
                    for v in range(vi):
                        for u in range(hi):
                            yield mcu, cid, my * vi + v, mx * hi + u


def _scan_sequential(br, blocks, store, dtrees, atrees, pred, ri=0) -> None:
    """Full-block sequential scan (baseline, interleaved or not): DC diff +
    AC run/size per block, written into the zigzag coefficient store. With
    a nonzero restart interval ``ri`` (in MCUs), every boundary byte-aligns
    onto an RSTn marker and resets the DC predictors (T.81 E.1.4)."""
    next_rst = ri
    for mcu, cid, by, bx in blocks:
        if ri and mcu == next_rst:
            br.restart()
            for c in pred:
                pred[c] = 0
            next_rst += ri
        zz = store[cid][by, bx]
        size = _read_symbol(br, dtrees[cid])
        pred[cid] += _extend(br.read_bits(size), size)
        zz[0] = pred[cid]
        k = 1
        while k < 64:
            rs = _read_symbol(br, atrees[cid])
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += run
            if k > 63:
                raise ValueError("AC run overflow")
            zz[k] = _extend(br.read_bits(size), size)
            k += 1


def _scan_dc_first(br, blocks, store, dtrees, pred, al, ri=0) -> None:
    """Progressive DC first scan (T.81 G.2): the point-transformed DC value
    is diff-coded exactly like baseline, reconstructed at magnitude << Al."""
    next_rst = ri
    for mcu, cid, by, bx in blocks:
        if ri and mcu == next_rst:
            br.restart()
            for c in pred:
                pred[c] = 0
            next_rst += ri
        size = _read_symbol(br, dtrees[cid])
        pred[cid] += _extend(br.read_bits(size), size)
        store[cid][by, bx, 0] = pred[cid] << al


def _scan_dc_refine(br, blocks, store, al, ri=0) -> None:
    """Progressive DC refinement: one raw bit per block ORed in at Al
    (two's-complement OR is correct for negative DC values, G.1.2.1)."""
    next_rst = ri
    for mcu, cid, by, bx in blocks:
        if ri and mcu == next_rst:
            br.restart()
            next_rst += ri
        if br.read_bit():
            store[cid][by, bx, 0] |= 1 << al


def _scan_ac_first(br, blocks, store, atree, ss, se, al, ri=0) -> None:
    """Progressive AC first scan (G.1.2.2): run/size coding of the
    point-transformed band Ss..Se with EOB-run symbols (r<15, size 0:
    EOBRUN = 2^r - 1 + r extension bits MORE blocks end here). Restart
    boundaries reset the EOB run (E.1.4 applies to all scan state)."""
    eobrun = 0
    next_rst = ri
    for mcu, cid, by, bx in blocks:
        if ri and mcu == next_rst:
            br.restart()
            eobrun = 0
            next_rst += ri
        if eobrun > 0:
            eobrun -= 1
            continue
        zz = store[cid][by, bx]
        k = ss
        while k <= se:
            rs = _read_symbol(br, atree)
            r, size = rs >> 4, rs & 0x0F
            if size == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC run past Se")
            zz[k] = _extend(br.read_bits(size), size) << al
            k += 1


def _scan_ac_refine(br, blocks, store, atree, ss, se, al, ri=0) -> None:
    """Progressive AC refinement (G.1.2.3): newly-significant coefficients
    arrive as run-length symbols with size 1 (value ±1 << Al); every
    already-nonzero coefficient passed over contributes one correction bit
    that moves its magnitude up by 1 << Al when set; EOB runs skip whole
    blocks while still consuming correction bits for their nonzero tail."""
    p1 = 1 << al
    m1 = -(1 << al)
    eobrun = 0
    next_rst = ri
    for mcu, cid, by, bx in blocks:
        if ri and mcu == next_rst:
            br.restart()
            eobrun = 0
            next_rst += ri
        zz = store[cid][by, bx]
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _read_symbol(br, atree)
                r, size = rs >> 4, rs & 0x0F
                val = 0
                if size == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    # r == 15: ZRL — advance over 16 zero-history positions
                else:
                    if size != 1:
                        raise ValueError("AC refinement size must be 1")
                    val = p1 if br.read_bit() else m1
                while k <= se:
                    coef = int(zz[k])
                    if coef != 0:
                        if br.read_bit() and (coef & p1) == 0:
                            zz[k] = coef + (p1 if coef >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val != 0 and k <= se:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            # correction bits for the remaining nonzero coefficients of this
            # block, then count it against the run
            while k <= se:
                coef = int(zz[k])
                if coef != 0 and br.read_bit() and (coef & p1) == 0:
                    zz[k] = coef + (p1 if coef >= 0 else m1)
                k += 1
            eobrun -= 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF bytes -> HxWx3 uint8 RGB.

    Frames: baseline/extended sequential (SOF0/SOF1) — interleaved or
    multi-scan non-interleaved — and progressive (SOF2) with spectral
    selection + successive approximation (T.81 Annex G): interleaved DC
    first/refinement scans and single-component AC first/refinement scans
    with EOB-run coding. Sampling factors 1-2 per axis per component
    (4:4:4 / 4:2:0 / 4:2:2 / 4:4:0) and single-component grayscale frames;
    chroma upsampled by the triangular filter. Planes are assigned by SOF
    component id (JFIF order Y, Cb, Cr), looked up from the scan's cid —
    NOT by scan position. Restart intervals (DRI + RST0-7, T.81 E.1.4)
    are handled in every scan kind. Arithmetic coding, hierarchical/
    lossless modes and 16-bit quant tables stay rejected."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htrees: dict[tuple[int, int], dict] = {}
    h = w = None
    progressive = False
    restart_interval = 0
    comp_spec: list[tuple[int, int, int, int]] = []  # (cid, hi, vi, tq) SOF order
    spec_by_cid: dict[int, tuple[int, int, int]] = {}
    store: dict[int, np.ndarray] = {}  # cid -> (nby, nbx, 64) zigzag int32
    hmax = vmax = 1
    got_scan = False
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no segment body
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly multiple tables per segment)
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(seg[sp + 1 : sp + 65], dtype=np.uint8).astype(np.int32)
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = zz
                qtabs[tq] = nat.reshape(8, 8)
                sp += 65
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                cls, tid = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1 : sp + 17])
                n = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + n])
                htrees[(cls, tid)] = _decode_tree(bits, vals)
                sp += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or nc not in (1, 3):
                raise NotImplementedError("8-bit 1- or 3-component frames only")
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                hi, vi = samp >> 4, samp & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factor {hi}x{vi} unsupported (1-2 per axis)"
                    )
                comp_spec.append((cid, hi, vi, tq))
            hmax = max(hi for _, hi, _, _ in comp_spec)
            vmax = max(vi for _, _, vi, _ in comp_spec)
            if nc == 1:
                hmax = vmax = 1  # single-component frames are never interleaved
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            # coefficient store padded to whole MCUs (interleaved scans
            # cover the padding; single-component scans cover a subset)
            for cid, hi, vi, tq in comp_spec:
                if nc == 1:
                    hi = vi = 1
                spec_by_cid[cid] = (hi, vi, tq)
                store[cid] = np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only sequential (SOF0/SOF1) and progressive (SOF2) Huffman "
                "frames supported"
            )
        elif marker == 0xDD:  # DRI — restart interval in MCUs (0 disables)
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — decode this scan's entropy segment now
            if not comp_spec:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_spec = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                if cid not in spec_by_cid:
                    raise ValueError(f"scan references unknown component id {cid}")
                scan_spec.append((cid, tt >> 4, tt & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            entropy_start = pos + seglen
            ri = restart_interval
            end = _next_marker(data, entropy_start, skip_rst=ri > 0)
            br = _BitReader(data[entropy_start:end])
            blocks = _scan_block_order(
                scan_spec, spec_by_cid, w, h, hmax, vmax, len(comp_spec)
            )
            if not progressive:
                dtrees = {cid: htrees[(0, td)] for cid, td, _ in scan_spec}
                atrees = {cid: htrees[(1, ta)] for cid, _, ta in scan_spec}
                pred = {cid: 0 for cid, _, _ in scan_spec}
                _scan_sequential(br, blocks, store, dtrees, atrees, pred, ri)
            elif ss == 0:  # DC scan
                if se != 0:
                    raise ValueError("progressive DC scan requires Se=0")
                if ah == 0:
                    dtrees = {cid: htrees[(0, td)] for cid, td, _ in scan_spec}
                    pred = {cid: 0 for cid, _, _ in scan_spec}
                    _scan_dc_first(br, blocks, store, dtrees, pred, al, ri)
                else:
                    _scan_dc_refine(br, blocks, store, al, ri)
            else:  # AC scan
                if len(scan_spec) != 1:
                    raise ValueError("progressive AC scans carry one component")
                atree = htrees[(1, scan_spec[0][2])]
                if ah == 0:
                    _scan_ac_first(br, blocks, store, atree, ss, se, al, ri)
                else:
                    _scan_ac_refine(br, blocks, store, atree, ss, se, al, ri)
            got_scan = True
            pos = end
            continue
        pos += seglen
    if not got_scan or h is None:
        raise ValueError("no scan found")

    # dequantize + inverse DCT + upsample per component (vectorized numpy)
    planes = []
    for cid, hi, vi, tq in comp_spec:
        if len(comp_spec) == 1:
            hi = vi = 1
        zz = store[cid]
        nby, nbx = zz.shape[:2]
        nat = np.zeros_like(zz)
        nat[..., ZIGZAG] = zz
        coefs = nat.reshape(nby, nbx, 8, 8).astype(np.float64) * qtabs[tq]
        px = _idct_blocks(coefs) + 128.0
        full = px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        # crop to the component's own sample grid, then upsample to full
        # resolution (triangular "fancy" filter via _triangle_upsample2)
        ch = -(-h * vi // vmax)
        cw = -(-w * hi // hmax)
        comp = full[:ch, :cw]
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            comp = _triangle_upsample2(comp, ry, rx)
        planes.append(comp[:h, :w])
    if len(planes) == 1:  # grayscale: Y replicated to RGB
        y = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return ycbcr_to_rgb(np.stack(planes, axis=-1))
