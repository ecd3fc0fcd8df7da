"""Lossy WebP (VP8 intra-frame / keyframe) decoder, pure numpy + stdlib.

Built from the PUBLIC bitstream specification RFC 6386 ("VP8 Data Format and
Decoding Guide"): boolean arithmetic decoder (#7), frame header (#9),
intra modes (#11), token decoding (#13), dequantization (#14), prediction
(#12), reconstruction (#14.3-14.5) and the in-loop deblocking filter (#15).
Constant tables live in vp8tables.py (published in RFC 6386 #13.4/#13.5/
#14.1/#11.3). Where the RFC leaves a choice of exactly-equivalent integer
formulas, the libwebp variants are used (e.g. y2_ac scaling *101581>>16)
so decode output is certified BIT-EXACT against libwebp's WebPDecodeYUV in
tests/test_vp8.py.

Reference-parity note: the reference crawler (sher-look) stores raw crawled
payload bytes (Crawler.java persist path); decoding image payloads for the
mm tier is this repo's extension, per the image+caption input contract.

Only keyframes (intra frames) exist in still-image WebP files, so this is a
complete decoder for real-web lossy .webp payloads (no interframe tools).

Mode numbering follows the table layout (B_DC=0, B_TM=1, B_VE=2, B_HE=3,
B_RD=4, B_VR=5, B_LD=6, B_VL=7, B_HD=8, B_HU=9; 16x16 DC=0, TM=1, V=2, H=3,
B_PRED=10).
"""
from __future__ import annotations

import numpy as np

from .vp8tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)


class VP8Error(ValueError):
    pass


# ---------------------------------------------------------------- bool coder
class _Bool:
    """RFC 6386 #7.3 boolean decoder (value/range/bit-count form)."""

    __slots__ = ("d", "pos", "val", "rng", "cnt")

    def __init__(self, data: bytes):
        self.d = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.val = (b0 << 8) | b1
        self.pos = 2
        self.rng = 255
        self.cnt = 0

    def bit(self, prob: int) -> int:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        big = split << 8
        if self.val >= big:
            ret = 1
            self.rng -= split
            self.val -= big
        else:
            ret = 0
            self.rng = split
        while self.rng < 128:
            self.val <<= 1
            self.rng <<= 1
            self.cnt += 1
            if self.cnt == 8:
                self.cnt = 0
                if self.pos < len(self.d):
                    self.val |= self.d[self.pos]
                    self.pos += 1
        return ret

    def flag(self) -> int:
        return self.bit(128)

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bit(128) else v

    def tree(self, tree: list[int], probs) -> int:
        i = 0
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i <= 0:
                return -i


# ------------------------------------------------------------------- tables
# Position -> coefficient band (RFC 6386 #13.3), 17th entry for the
# next-position context lookup after the last coefficient.
_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7, 0)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
# extra-bit probabilities for large-value categories 3..6 (RFC 6386 #13.2)
_CAT3456 = (
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)

_B_DC, _B_TM, _B_VE, _B_HE = 0, 1, 2, 3
_B_RD, _B_VR, _B_LD, _B_VL, _B_HD, _B_HU = 4, 5, 6, 7, 8, 9
_DC16, _TM16, _V16, _H16, _B_PRED = 0, 1, 2, 3, 10

# keyframe mode trees (RFC 6386 #11.2/#11.3, leaves renumbered as above)
_KF_YMODE_TREE = (-_B_PRED, 2, 4, 6, -_DC16, -_V16, -_H16, -_TM16)
_KF_YMODE_PROBS = (145, 156, 163, 128)
_UV_MODE_TREE = (-_DC16, 2, -_V16, 4, -_H16, -_TM16)
_KF_UV_PROBS = (142, 114, 183)
_BMODE_TREE = (
    -_B_DC, 2, -_B_TM, 4, -_B_VE, 6, 8, 12,
    -_B_HE, 10, -_B_RD, -_B_VR, -_B_LD, 14, -_B_VL, 16, -_B_HD, -_B_HU,
)
_SEG_TREE = (2, 4, -0, -1, -2, -3)


def _clip_q(v: int, hi: int = 127) -> int:
    return 0 if v < 0 else hi if v > hi else v


# ------------------------------------------------------------ parsed header
class _Header:
    pass


def _parse_header(data: bytes) -> tuple[_Header, _Bool, list[_Bool]]:
    if len(data) < 10:
        raise VP8Error("truncated VP8 payload")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise VP8Error("not a keyframe (still WebP is always intra)")
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise VP8Error("bad VP8 start code")
    h = _Header()
    h.width = (data[6] | (data[7] << 8)) & 0x3FFF
    h.height = (data[8] | (data[9] << 8)) & 0x3FFF
    if h.width == 0 or h.height == 0:
        raise VP8Error("zero dimension")
    if len(data) < 10 + part0_size:
        raise VP8Error("truncated first partition")
    first = data[10 : 10 + part0_size]
    rest = data[10 + part0_size :]
    b = _Bool(first)
    b.flag()  # color_space
    b.flag()  # clamping_type

    # segmentation (RFC 6386 #9.3)
    h.seg_enabled = b.flag()
    h.update_map = 0
    h.seg_abs = 0
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_probs = [255, 255, 255]
    if h.seg_enabled:
        h.update_map = b.flag()
        update_data = b.flag()
        if update_data:
            h.seg_abs = b.flag()
            for i in range(4):
                if b.flag():
                    h.seg_quant[i] = b.signed_literal(7)
            for i in range(4):
                if b.flag():
                    h.seg_lf[i] = b.signed_literal(6)
        if h.update_map:
            for i in range(3):
                h.seg_probs[i] = b.literal(8) if b.flag() else 255

    # loop filter header (RFC 6386 #9.4)
    h.filter_simple = b.flag()
    h.filter_level = b.literal(6)
    h.sharpness = b.literal(3)
    h.lf_delta = b.flag()
    h.ref_delta = [0, 0, 0, 0]
    h.mode_delta = [0, 0, 0, 0]
    if h.lf_delta:
        if b.flag():  # mode_ref_lf_delta_update
            for i in range(4):
                if b.flag():
                    h.ref_delta[i] = b.signed_literal(6)
            for i in range(4):
                if b.flag():
                    h.mode_delta[i] = b.signed_literal(6)

    # token partitions (RFC 6386 #9.5)
    n_parts = 1 << b.literal(2)
    if len(rest) < 3 * (n_parts - 1):
        raise VP8Error("truncated partition table")
    sizes = []
    off = 3 * (n_parts - 1)
    for i in range(n_parts - 1):
        sizes.append(rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16))
    parts = []
    for i in range(n_parts):
        if i < n_parts - 1:
            parts.append(_Bool(rest[off : off + sizes[i]]))
            off += sizes[i]
        else:
            parts.append(_Bool(rest[off:]))

    # quantizer indices (RFC 6386 #9.6)
    h.y_ac_qi = b.literal(7)
    h.y_dc_delta = b.signed_literal(4) if b.flag() else 0
    h.y2_dc_delta = b.signed_literal(4) if b.flag() else 0
    h.y2_ac_delta = b.signed_literal(4) if b.flag() else 0
    h.uv_dc_delta = b.signed_literal(4) if b.flag() else 0
    h.uv_ac_delta = b.signed_literal(4) if b.flag() else 0

    b.flag()  # refresh_entropy_probs (keyframe: no effect within one frame)

    # token probability updates (RFC 6386 #13.4)
    probs = [[[list(COEFF_PROBS[t][bd][c]) for c in range(3)] for bd in range(8)] for t in range(4)]
    for t in range(4):
        for bd in range(8):
            for c in range(3):
                upd = COEFF_UPDATE_PROBS[t][bd][c]
                row = probs[t][bd][c]
                for p in range(11):
                    if b.bit(upd[p]):
                        row[p] = b.literal(8)
    h.probs = probs

    h.use_skip = b.flag()
    h.skip_prob = b.literal(8) if h.use_skip else 0
    return h, b, parts


def _dequant_factors(h: _Header) -> list[tuple]:
    """Per-segment (y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac)."""
    out = []
    for s in range(4):
        if h.seg_enabled:
            q = h.seg_quant[s] if h.seg_abs else h.y_ac_qi + h.seg_quant[s]
        else:
            q = h.y_ac_qi
        q = _clip_q(q)
        y1_dc = DC_QLOOKUP[_clip_q(q + h.y_dc_delta)]
        y1_ac = AC_QLOOKUP[q]
        y2_dc = DC_QLOOKUP[_clip_q(q + h.y2_dc_delta)] * 2
        # 155/100 scaling via the exact fixed-point form (libwebp variant of
        # RFC 6386 #14.1; differs by <=1 from *155//100 for some q)
        y2_ac = (AC_QLOOKUP[_clip_q(q + h.y2_ac_delta)] * 101581) >> 16
        if y2_ac < 8:
            y2_ac = 8
        uv_dc = DC_QLOOKUP[_clip_q(q + h.uv_dc_delta, 117)]
        uv_ac = AC_QLOOKUP[_clip_q(q + h.uv_ac_delta)]
        out.append((y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac))
    return out


# ------------------------------------------------------- coefficient tokens
def _get_coeffs(br: _Bool, probs_t, ctx: int, dq_dc: int, dq_ac: int,
                first: int, out: np.ndarray) -> int:
    """Decode one 4x4 block's tokens (RFC 6386 #13.3).

    probs_t: the 3x11 prob rows per band for this plane type, indexed
    [band][ctx]. Returns the end-of-block position n (== first when the
    block is empty). Dequantized values land in `out` (natural order).
    """
    n = first
    p = probs_t[_BANDS[n]][ctx]
    bit = br.bit
    while n < 16:
        if not bit(p[0]):
            return n
        while not bit(p[1]):  # zero token: no EOB test before next coeff
            n += 1
            if n == 16:
                return 16
            p = probs_t[_BANDS[n]][0]
        # nonzero token
        if not bit(p[2]):
            v = 1
            nctx = 1
        else:
            if not bit(p[3]):
                if not bit(p[4]):
                    v = 2
                else:
                    v = 3 + bit(p[5])
            elif not bit(p[6]):
                if not bit(p[7]):
                    v = 5 + bit(159)
                else:
                    v = 7 + 2 * bit(165) + bit(145)
            else:
                b1 = bit(p[8])
                b0 = bit(p[9 + b1])
                cat = 2 * b1 + b0
                v = 0
                for pr in _CAT3456[cat]:
                    v = (v << 1) + bit(pr)
                v += 3 + (8 << cat)
        if bit(128):
            v = -v
        out[_ZIGZAG[n]] = v * (dq_dc if n == 0 else dq_ac)
        n += 1
        if n == 16:
            return 16
        nctx = 2 if abs(v) > 1 else 1
        p = probs_t[_BANDS[n]][nctx]
    return 16


# ----------------------------------------------------------------- transforms
def _idct_batch(blocks: np.ndarray) -> np.ndarray:
    """RFC 6386 #14.4 inverse DCT, vectorized over blocks.

    blocks: (n, 16) int32 in natural order -> (n, 4, 4) int32 residuals
    (the (v+4)>>3 additive term; clip-add happens at prediction time).
    """
    c = blocks.reshape(-1, 4, 4).astype(np.int64)

    def mul1(a):
        return ((a * 20091) >> 16) + a

    def mul2(a):
        return (a * 35468) >> 16

    # vertical pass (columns)
    a = c[:, 0] + c[:, 2]
    b = c[:, 0] - c[:, 2]
    cc = mul2(c[:, 1]) - mul1(c[:, 3])
    d = mul1(c[:, 1]) + mul2(c[:, 3])
    t = np.stack([a + d, b + cc, b - cc, a - d], axis=1)  # (n,4rows,4cols)
    # horizontal pass (rows)
    dc = t[:, :, 0] + 4
    a = dc + t[:, :, 2]
    b = dc - t[:, :, 2]
    cc = mul2(t[:, :, 1]) - mul1(t[:, :, 3])
    d = mul1(t[:, :, 1]) + mul2(t[:, :, 3])
    out = np.stack([a + d, b + cc, b - cc, a - d], axis=2)
    return (out >> 3).astype(np.int32)


def _wht(dc_in: np.ndarray) -> np.ndarray:
    """RFC 6386 #14.3 inverse Walsh-Hadamard: y2 block -> 16 luma DCs."""
    x = dc_in.reshape(4, 4).astype(np.int64)
    a0 = x[0] + x[3]
    a1 = x[1] + x[2]
    a2 = x[1] - x[2]
    a3 = x[0] - x[3]
    t = np.stack([a0 + a1, a3 + a2, a0 - a1, a3 - a2])  # rows
    dc = t[:, 0] + 3
    a0 = dc + t[:, 3]
    a1 = t[:, 1] + t[:, 2]
    a2 = t[:, 1] - t[:, 2]
    a3 = dc - t[:, 3]
    out = np.stack([a0 + a1, a3 + a2, a0 - a1, a3 - a2], axis=1)
    return (out >> 3).astype(np.int32).reshape(16)


# ------------------------------------------------------------ intra predictors
def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred_block16(mode, above, left, tl, mbx, mby, size):
    """16x16 luma / 8x8 chroma whole-block predictor (RFC 6386 #12.2).

    above/left are int arrays of `size` (border-substituted: 127 row when
    mby==0, 129 column when mbx==0), tl the corner sample. DC uses the
    border variants; V/H/TM just consume the substituted samples.
    """
    if mode == _DC16:
        if mbx > 0 and mby > 0:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                5 if size == 16 else 4
            )
        elif mby > 0:  # no left
            dc = (int(above.sum()) + size // 2) >> (4 if size == 16 else 3)
        elif mbx > 0:  # no top
            dc = (int(left.sum()) + size // 2) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int32)
    if mode == _V16:
        return np.tile(above, (size, 1))
    if mode == _H16:
        return np.tile(left[:, None], (1, size))
    # TM
    out = left[:, None].astype(np.int32) + above[None, :] - int(tl)
    return np.clip(out, 0, 255)


def _pred_b(mode, ws, r, c):
    """4x4 subblock predictor (RFC 6386 #12.3) on the 17x21 workspace."""
    y, x = 4 * r, 4 * c
    A = [int(ws[y, x + 1 + i]) for i in range(4)]
    L = [int(ws[y + 1 + i, x]) for i in range(4)]
    X = int(ws[y, x])
    d = np.empty((4, 4), dtype=np.int32)
    if mode == _B_DC:
        d[:] = (sum(A) + sum(L) + 4) >> 3
    elif mode == _B_TM:
        a = np.array(A, dtype=np.int32)
        lft = np.array(L, dtype=np.int32)
        d[:] = np.clip(lft[:, None] + a[None, :] - X, 0, 255)
    elif mode == _B_VE:
        t = [X] + A + [int(ws[y, x + 5])]
        row = [_avg3(t[i], t[i + 1], t[i + 2]) for i in range(4)]
        d[:] = np.array(row, dtype=np.int32)[None, :]
    elif mode == _B_HE:
        rows = [
            _avg3(X, L[0], L[1]),
            _avg3(L[0], L[1], L[2]),
            _avg3(L[1], L[2], L[3]),
            _avg3(L[2], L[3], L[3]),
        ]
        d[:] = np.array(rows, dtype=np.int32)[:, None]
    elif mode == _B_RD:
        I, J, K, Lw = L
        a, b, c2, dd = A
        d[0, 3] = _avg3(dd, c2, b)
        d[0, 2] = d[1, 3] = _avg3(c2, b, a)
        d[0, 1] = d[1, 2] = d[2, 3] = _avg3(b, a, X)
        d[0, 0] = d[1, 1] = d[2, 2] = d[3, 3] = _avg3(a, X, I)
        d[1, 0] = d[2, 1] = d[3, 2] = _avg3(X, I, J)
        d[2, 0] = d[3, 1] = _avg3(I, J, K)
        d[3, 0] = _avg3(J, K, Lw)
    elif mode == _B_VR:
        I, J, K = L[0], L[1], L[2]
        a, b, c2, dd = A
        d[0, 0] = d[2, 1] = _avg2(X, a)
        d[0, 1] = d[2, 2] = _avg2(a, b)
        d[0, 2] = d[2, 3] = _avg2(b, c2)
        d[0, 3] = _avg2(c2, dd)
        d[3, 0] = _avg3(K, J, I)
        d[2, 0] = _avg3(J, I, X)
        d[1, 0] = d[3, 1] = _avg3(I, X, a)
        d[1, 1] = d[3, 2] = _avg3(X, a, b)
        d[1, 2] = d[3, 3] = _avg3(a, b, c2)
        d[1, 3] = _avg3(b, c2, dd)
    elif mode == _B_LD:
        a, b, c2, dd = A
        e, f, g, hh = (int(ws[y, x + 5 + i]) for i in range(4))
        d[0, 0] = _avg3(a, b, c2)
        d[0, 1] = d[1, 0] = _avg3(b, c2, dd)
        d[0, 2] = d[1, 1] = d[2, 0] = _avg3(c2, dd, e)
        d[0, 3] = d[1, 2] = d[2, 1] = d[3, 0] = _avg3(dd, e, f)
        d[1, 3] = d[2, 2] = d[3, 1] = _avg3(e, f, g)
        d[2, 3] = d[3, 2] = _avg3(f, g, hh)
        d[3, 3] = _avg3(g, hh, hh)
    elif mode == _B_VL:
        a, b, c2, dd = A
        e, f, g, hh = (int(ws[y, x + 5 + i]) for i in range(4))
        d[0, 0] = _avg2(a, b)
        d[0, 1] = d[2, 0] = _avg2(b, c2)
        d[0, 2] = d[2, 1] = _avg2(c2, dd)
        d[0, 3] = d[2, 2] = _avg2(dd, e)
        d[1, 0] = _avg3(a, b, c2)
        d[1, 1] = d[3, 0] = _avg3(b, c2, dd)
        d[1, 2] = d[3, 1] = _avg3(c2, dd, e)
        d[1, 3] = d[3, 2] = _avg3(dd, e, f)
        d[2, 3] = _avg3(e, f, g)
        d[3, 3] = _avg3(f, g, hh)
    elif mode == _B_HD:
        I, J, K, Lw = L
        a, b, c2 = A[0], A[1], A[2]
        d[0, 0] = d[1, 2] = _avg2(I, X)
        d[1, 0] = d[2, 2] = _avg2(J, I)
        d[2, 0] = d[3, 2] = _avg2(K, J)
        d[3, 0] = _avg2(Lw, K)
        d[0, 3] = _avg3(a, b, c2)
        d[0, 2] = _avg3(X, a, b)
        d[0, 1] = d[1, 3] = _avg3(I, X, a)
        d[1, 1] = d[2, 3] = _avg3(X, I, J)
        d[2, 1] = d[3, 3] = _avg3(I, J, K)
        d[3, 1] = _avg3(J, K, Lw)
    else:  # _B_HU
        I, J, K, Lw = L
        d[0, 0] = _avg2(I, J)
        d[0, 2] = d[1, 0] = _avg2(J, K)
        d[1, 2] = d[2, 0] = _avg2(K, Lw)
        d[0, 1] = _avg3(I, J, K)
        d[0, 3] = d[1, 1] = _avg3(J, K, Lw)
        d[1, 3] = d[2, 1] = _avg3(K, Lw, Lw)
        d[2, 2] = d[2, 3] = d[3, 0] = d[3, 1] = d[3, 2] = d[3, 3] = Lw
    return d


# ------------------------------------------------------------- loop filter
def _sclip1(x):
    return np.clip(x, -128, 127)


def _sclip2(x):
    return np.clip(x, -16, 15)


def _u8(x):
    return np.clip(x, 0, 255)


def _filter_lanes(px, lim, ilim, hev_t, kind):
    """Filter one edge across its lanes (RFC 6386 #15.2/#15.3).

    px: list of 8 int32 arrays [p3,p2,p1,p0,q0,q1,q2,q3] (lane-parallel).
    kind: 'mb' (filter6 on non-hev lanes), 'inner' (filter4), or 'simple'.
    Returns the filtered arrays (same order). lim is the edge limit
    (already +4 for MB edges), ilim the interior limit, hev_t the
    high-edge-variance threshold.
    """
    p3, p2, p1, p0, q0, q1, q2, q3 = (a.astype(np.int32) for a in px)
    t = 2 * lim + 1
    need = (4 * np.abs(p0 - q0) + np.abs(p1 - q1)) <= t
    if kind != "simple":
        need &= (
            (np.abs(p3 - p2) <= ilim) & (np.abs(p2 - p1) <= ilim)
            & (np.abs(p1 - p0) <= ilim) & (np.abs(q3 - q2) <= ilim)
            & (np.abs(q2 - q1) <= ilim) & (np.abs(q1 - q0) <= ilim)
        )
    if kind == "simple":
        use2 = need
    else:
        hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
        use2 = need & hev
    # common filter (2-tap, hev/simple lanes): uses the p1-q1 term
    a = 3 * (q0 - p0) + _sclip1(p1 - q1)
    a1 = _sclip2((a + 4) >> 3)
    a2 = _sclip2((a + 3) >> 3)
    f2_p0 = _u8(p0 + a2)
    f2_q0 = _u8(q0 - a1)
    np0, nq0 = np.where(use2, f2_p0, p0), np.where(use2, f2_q0, q0)
    np1, nq1, np2, nq2 = p1, q1, p2, q2
    if kind == "inner":
        m = need & ~hev
        a = 3 * (q0 - p0)  # no p1-q1 term in the 4-tap subblock filter
        a1 = _sclip2((a + 4) >> 3)
        a2 = _sclip2((a + 3) >> 3)
        a3 = (a1 + 1) >> 1
        np1 = np.where(m, _u8(p1 + a3), np1)
        np0 = np.where(m, _u8(p0 + a2), np0)
        nq0 = np.where(m, _u8(q0 - a1), nq0)
        nq1 = np.where(m, _u8(q1 - a3), nq1)
    elif kind == "mb":
        m = need & ~hev
        w = _sclip1(3 * (q0 - p0) + _sclip1(p1 - q1))
        a1 = (27 * w + 63) >> 7
        a2 = (18 * w + 63) >> 7
        a3 = (9 * w + 63) >> 7
        np2 = np.where(m, _u8(p2 + a3), np2)
        np1 = np.where(m, _u8(p1 + a2), np1)
        np0 = np.where(m, _u8(p0 + a1), np0)
        nq0 = np.where(m, _u8(q0 - a1), nq0)
        nq1 = np.where(m, _u8(q1 - a2), nq1)
        nq2 = np.where(m, _u8(q2 - a3), nq2)
    return p3, np2, np1, np0, nq0, nq1, nq2, q3


def _edge_v(P, y0, x, n, lim, ilim, hev_t, kind):
    """Vertical edge at column x (filter across x), lanes = rows y0..y0+n."""
    sl = [P[y0 : y0 + n, x - 4 + k] for k in range(8)]
    out = _filter_lanes(sl, lim, ilim, hev_t, kind)
    for k in range(8):
        P[y0 : y0 + n, x - 4 + k] = out[k]


def _edge_h(P, y, x0, n, lim, ilim, hev_t, kind):
    """Horizontal edge at row y (filter across y), lanes = cols x0..x0+n."""
    sl = [P[y - 4 + k, x0 : x0 + n] for k in range(8)]
    out = _filter_lanes(sl, lim, ilim, hev_t, kind)
    for k in range(8):
        P[y - 4 + k, x0 : x0 + n] = out[k]


def _loop_filter(Y, U, V, h, mbs, mb_w, mb_h):
    """In-loop deblocking (RFC 6386 #15), raster MB order, in place."""
    if h.filter_level == 0:
        return
    # per-(segment, i4x4) strengths
    strengths = {}
    for s in range(4):
        if h.seg_enabled:
            base = h.seg_lf[s] if h.seg_abs else h.filter_level + h.seg_lf[s]
        else:
            base = h.filter_level
        for i4 in (0, 1):
            lv = base
            if h.lf_delta:
                lv += h.ref_delta[0]  # intra frame
                if i4:
                    lv += h.mode_delta[0]  # B_PRED mode delta
            lv = 0 if lv < 0 else 63 if lv > 63 else lv
            if lv == 0:
                strengths[(s, i4)] = None
                continue
            il = lv
            if h.sharpness > 0:
                il >>= 2 if h.sharpness > 4 else 1
                if il > 9 - h.sharpness:
                    il = 9 - h.sharpness
            if il < 1:
                il = 1
            hev_t = 2 if lv >= 40 else 1 if lv >= 15 else 0
            strengths[(s, i4)] = (2 * lv + il, il, hev_t)
    simple = bool(h.filter_simple)
    for mby in range(mb_h):
        for mbx in range(mb_w):
            seg, i4, has_coeffs = mbs[mby][mbx]
            st = strengths[(seg, i4)]
            if st is None:
                continue
            lim, il, hev_t = st
            inner = bool(i4) or has_coeffs
            y0, x0 = 16 * mby, 16 * mbx
            cy0, cx0 = 8 * mby, 8 * mbx
            if simple:
                if mbx > 0:
                    _edge_v(Y, y0, x0, 16, lim + 4, il, hev_t, "simple")
                if inner:
                    for k in (4, 8, 12):
                        _edge_v(Y, y0, x0 + k, 16, lim, il, hev_t, "simple")
                if mby > 0:
                    _edge_h(Y, y0, x0, 16, lim + 4, il, hev_t, "simple")
                if inner:
                    for k in (4, 8, 12):
                        _edge_h(Y, y0 + k, x0, 16, lim, il, hev_t, "simple")
            else:
                if mbx > 0:
                    _edge_v(Y, y0, x0, 16, lim + 4, il, hev_t, "mb")
                    _edge_v(U, cy0, cx0, 8, lim + 4, il, hev_t, "mb")
                    _edge_v(V, cy0, cx0, 8, lim + 4, il, hev_t, "mb")
                if inner:
                    for k in (4, 8, 12):
                        _edge_v(Y, y0, x0 + k, 16, lim, il, hev_t, "inner")
                    _edge_v(U, cy0, cx0 + 4, 8, lim, il, hev_t, "inner")
                    _edge_v(V, cy0, cx0 + 4, 8, lim, il, hev_t, "inner")
                if mby > 0:
                    _edge_h(Y, y0, x0, 16, lim + 4, il, hev_t, "mb")
                    _edge_h(U, cy0, cx0, 8, lim + 4, il, hev_t, "mb")
                    _edge_h(V, cy0, cx0, 8, lim + 4, il, hev_t, "mb")
                if inner:
                    for k in (4, 8, 12):
                        _edge_h(Y, y0 + k, x0, 16, lim, il, hev_t, "inner")
                    _edge_h(U, cy0 + 4, cx0, 8, lim, il, hev_t, "inner")
                    _edge_h(V, cy0 + 4, cx0, 8, lim, il, hev_t, "inner")


# ------------------------------------------------------------- frame decode
def _ctx_block(P, y0, x0, size, mbx, mby):
    """(above, left, top-left) with frame-border substitution: the row above
    the frame reads 127, the column left of it 129 (RFC 6386 #12.2)."""
    if mby > 0:
        above = P[y0 - 1, x0 : x0 + size].astype(np.int32)
    else:
        above = np.full(size, 127, dtype=np.int32)
    if mbx > 0:
        left = P[y0 : y0 + size, x0 - 1].astype(np.int32)
    else:
        left = np.full(size, 129, dtype=np.int32)
    tl = 127 if mby == 0 else (129 if mbx == 0 else int(P[y0 - 1, x0 - 1]))
    return above, left, tl


def _blocks_to_plane(res, nb):
    """(nb*nb, 4, 4) raster blocks -> (nb*4, nb*4)."""
    return res.reshape(nb, nb, 4, 4).transpose(0, 2, 1, 3).reshape(nb * 4, nb * 4)


def decode_vp8_yuv(data: bytes, max_pixels: int | None = None):
    """Decode a VP8 keyframe bitstream to (Y, U, V) uint8 planes.

    Y is (height, width); U/V are ((height+1)//2, (width+1)//2), i.e. the
    4:2:0 layout WebPDecodeYUV reports. Bit-exact vs libwebp (certified in
    tests/test_vp8.py when the system library is present).
    """
    h, b, parts = _parse_header(data)
    if max_pixels is not None and h.width * h.height > max_pixels:
        raise VP8Error(f"VP8 dims {h.width}x{h.height} exceed cap {max_pixels}")
    mb_w = (h.width + 15) >> 4
    mb_h = (h.height + 15) >> 4
    Y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.int32)
    U = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int32)
    V = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int32)
    dq = _dequant_factors(h)
    probs = h.probs

    # ---- pass 1: per-MB mode records, all in partition 0 (RFC 6386 #11)
    top_modes = [[_B_DC] * 4 for _ in range(mb_w)]
    meta = []
    for mby in range(mb_h):
        left_modes = [_B_DC] * 4
        row = []
        for mbx in range(mb_w):
            seg = b.tree(_SEG_TREE, h.seg_probs) if h.update_map else 0
            skip = b.bit(h.skip_prob) if h.use_skip else 0
            ymode = b.tree(_KF_YMODE_TREE, _KF_YMODE_PROBS)
            if ymode == _B_PRED:
                modes = []
                tm = top_modes[mbx]
                for y4 in range(4):
                    ym = left_modes[y4]
                    for x4 in range(4):
                        ym = b.tree(_BMODE_TREE, KF_BMODE_PROBS[tm[x4]][ym])
                        tm[x4] = ym
                        modes.append(ym)
                    left_modes[y4] = ym
            else:
                modes = None
                top_modes[mbx] = [ymode] * 4
                left_modes = [ymode] * 4
            uv = b.tree(_UV_MODE_TREE, _KF_UV_PROBS)
            row.append((seg, skip, ymode, modes, uv))
        meta.append(row)

    # ---- pass 2: residuals + reconstruction, row by row
    top_y_nz = [[0] * 4 for _ in range(mb_w)]
    top_u_nz = [[0] * 2 for _ in range(mb_w)]
    top_v_nz = [[0] * 2 for _ in range(mb_w)]
    top_y2_nz = [0] * mb_w
    nparts = len(parts)
    mbs_filter = []  # (segment, is_i4x4, has_coeffs) per MB for the filter
    for mby in range(mb_h):
        br = parts[mby & (nparts - 1)]
        left_y_nz = [0] * 4
        left_u_nz = [0] * 2
        left_v_nz = [0] * 2
        left_y2_nz = 0
        frow = []
        for mbx in range(mb_w):
            seg, skip, ymode, modes, uvmode = meta[mby][mbx]
            i4 = ymode == _B_PRED
            y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac = dq[seg]
            coeffs = np.zeros((24, 16), dtype=np.int32)
            has_coeffs = False
            if skip:
                left_y_nz = [0] * 4
                left_u_nz = [0] * 2
                left_v_nz = [0] * 2
                top_y_nz[mbx] = [0] * 4
                top_u_nz[mbx] = [0] * 2
                top_v_nz[mbx] = [0] * 2
                if not i4:
                    left_y2_nz = top_y2_nz[mbx] = 0
                res = None
            else:
                if not i4:
                    dc16 = np.zeros(16, dtype=np.int32)
                    ctx = left_y2_nz + top_y2_nz[mbx]
                    n2 = _get_coeffs(br, probs[1], ctx, y2_dc, y2_ac, 0, dc16)
                    left_y2_nz = top_y2_nz[mbx] = 1 if n2 > 0 else 0
                    dcs = _wht(dc16)
                    first, ptype = 1, 0
                else:
                    dcs = None
                    first, ptype = 0, 3
                pt = probs[ptype]
                for by in range(4):
                    lf = left_y_nz[by]
                    for bx in range(4):
                        i = 4 * by + bx
                        ctx = lf + top_y_nz[mbx][bx]
                        n = _get_coeffs(
                            br, pt, ctx, y1_dc, y1_ac, first, coeffs[i]
                        )
                        lf = 1 if n > first else 0
                        top_y_nz[mbx][bx] = lf
                        if dcs is not None:
                            coeffs[i, 0] = dcs[i]
                        if n > 1 or coeffs[i, 0] != 0:
                            has_coeffs = True
                    left_y_nz[by] = lf
                p2 = probs[2]
                for ch, (lnz, tnz) in (
                    (0, (left_u_nz, top_u_nz[mbx])),
                    (1, (left_v_nz, top_v_nz[mbx])),
                ):
                    for by in range(2):
                        lf = lnz[by]
                        for bx in range(2):
                            i = 16 + 4 * ch + 2 * by + bx
                            ctx = lf + tnz[bx]
                            n = _get_coeffs(
                                br, p2, ctx, uv_dc, uv_ac, 0, coeffs[i]
                            )
                            lf = 1 if n > 0 else 0
                            tnz[bx] = lf
                            if n > 1 or coeffs[i, 0] != 0:
                                has_coeffs = True
                        lnz[by] = lf
                res = _idct_batch(coeffs)  # (24,4,4)
            frow.append((seg, 1 if i4 else 0, has_coeffs))

            # ---- reconstruct
            y0, x0 = 16 * mby, 16 * mbx
            cy0, cx0 = 8 * mby, 8 * mbx
            if i4:
                ws = np.empty((17, 21), dtype=np.int32)
                above, left, tl = _ctx_block(Y, y0, x0, 16, mbx, mby)
                ws[0, 1:17] = above
                ws[1:17, 0] = left
                ws[0, 0] = tl
                if mby == 0:
                    ar = np.full(4, 127, dtype=np.int32)
                elif mbx >= mb_w - 1:
                    ar = np.full(4, int(Y[y0 - 1, x0 + 15]), dtype=np.int32)
                else:
                    ar = Y[y0 - 1, x0 + 16 : x0 + 20].astype(np.int32)
                for r4 in (0, 4, 8, 12):
                    ws[r4, 17:21] = ar
                for n in range(16):
                    r, c = n >> 2, n & 3
                    blk = _pred_b(modes[n], ws, r, c)
                    if res is not None:
                        blk = blk + res[n]
                    ws[4 * r + 1 : 4 * r + 5, 4 * c + 1 : 4 * c + 5] = np.clip(
                        blk, 0, 255
                    )
                Y[y0 : y0 + 16, x0 : x0 + 16] = ws[1:17, 1:17]
            else:
                above, left, tl = _ctx_block(Y, y0, x0, 16, mbx, mby)
                pred = _pred_block16(ymode, above, left, tl, mbx, mby, 16)
                if res is not None:
                    pred = pred + _blocks_to_plane(res[:16], 4)
                Y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(pred, 0, 255)
            for P, base in ((U, 16), (V, 20)):
                above, left, tl = _ctx_block(P, cy0, cx0, 8, mbx, mby)
                pred = _pred_block16(uvmode, above, left, tl, mbx, mby, 8)
                if res is not None:
                    pred = pred + _blocks_to_plane(res[base : base + 4], 2)
                P[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(pred, 0, 255)
        mbs_filter.append(frow)

    _loop_filter(Y, U, V, h, mbs_filter, mb_w, mb_h)
    cw, ch_ = (h.width + 1) // 2, (h.height + 1) // 2
    return (
        Y[: h.height, : h.width].astype(np.uint8),
        U[:ch_, :cw].astype(np.uint8),
        V[:ch_, :cw].astype(np.uint8),
    )


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """4:2:0 planes -> HxWx3 RGB uint8 (BT.601 limited-range, 2x chroma
    repeat). Shared by decode_vp8_rgb and the mm oracle builder so both
    sides of the correctness check apply the identical colorspace formula
    to independently-decoded planes."""
    hh, ww = y.shape
    up = np.repeat(np.repeat(u.astype(np.int32), 2, 0), 2, 1)[:hh, :ww]
    vp = np.repeat(np.repeat(v.astype(np.int32), 2, 0), 2, 1)[:hh, :ww]
    c = 298 * (y.astype(np.int32) - 16)
    r = (c + 409 * (vp - 128) + 128) >> 8
    g = (c - 100 * (up - 128) - 208 * (vp - 128) + 128) >> 8
    bl = (c + 516 * (up - 128) + 128) >> 8
    return np.clip(np.stack([r, g, bl], axis=-1), 0, 255).astype(np.uint8)


def decode_vp8_rgb(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Decode to HxWx3 RGB uint8 (BT.601 limited-range, 2x chroma repeat)."""
    return yuv420_to_rgb(*decode_vp8_yuv(data, max_pixels=max_pixels))


# ------------------------------------------------------------------ encoder
# Subset VP8 *encoder* (RFC 6386 #7.3 reference boolean encoder + the same
# tables the decoder uses): keyframe, DC_PRED 16x16 luma + DC chroma for
# every macroblock, one token partition, default coefficient probabilities,
# loop filter level 0, no segmentation / skip flags. Enough to produce real,
# spec-conformant lossy .webp payloads for the synthetic web and the mm
# query fixtures; streams decode bit-exact through decode_vp8_yuv AND
# through libwebp (certified in tests/test_vp8.py). The forward DCT/WHT are
# derived NUMERICALLY as the exact linear inverses of this file's integer
# inverse transforms, so no external encoder constants are needed, and the
# encoder reconstructs each macroblock with the decoder's own integer
# pipeline to keep the DC-prediction chain in perfect sync.

class _BoolWriter:
    """RFC 6386 #7.3 boolean *encoder* (bottom/range/bit-count form)."""

    __slots__ = ("out", "rng", "bottom", "cnt")

    def __init__(self):
        self.out = bytearray()
        self.rng = 255
        self.bottom = 0
        self.cnt = 24

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def put(self, prob: int, bit: int) -> None:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.rng -= split
        else:
            self.rng = split
        while self.rng < 128:
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.cnt -= 1
            if self.cnt == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.cnt = 8
            self.rng <<= 1

    def flag(self, bit: int) -> None:
        self.put(128, bit)

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put(128, (v >> i) & 1)

    def tobytes(self) -> bytes:
        c = self.cnt
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        out = bytes(self.out)
        tail = bytes(((v >> 24) & 0xFF, (v >> 16) & 0xFF,
                      (v >> 8) & 0xFF, v & 0xFF))
        return out + tail


def _tree_path(tree, leaf: int):
    """Root-to-leaf (prob_index, bit) path through an RFC 6386 mode tree."""
    def walk(i, path):
        for b in (0, 1):
            j = tree[i + b]
            p2 = path + [(i >> 1, b)]
            if j <= 0:
                if -j == leaf:
                    return p2
            else:
                r = walk(j, p2)
                if r is not None:
                    return r
        return None
    return walk(0, [])


_FWD_CACHE: dict = {}


def _fwd_mats():
    """(fdct_fwd, wht_fwd) 16x16 float matrices: exact linear inverses of
    _idct_batch / _wht, derived numerically at high amplitude so the integer
    rounding in the inverses washes out. Forward coefficients are rounded to
    int; the ONLY reconstruction error left is quantization."""
    if "m" in _FWD_CACHE:
        return _FWD_CACHE["m"]
    amp = 1 << 16
    eye = np.eye(16, dtype=np.int64) * amp
    idct_cols = _idct_batch(eye.astype(np.int32)).reshape(16, 16).T
    wht_cols = np.stack([_wht(eye[i].astype(np.int32)) for i in range(16)], axis=1)
    fdct = np.linalg.inv(idct_cols.astype(np.float64) / amp)
    wht_f = np.linalg.inv(wht_cols.astype(np.float64) / amp)
    _FWD_CACHE["m"] = (fdct, wht_f)
    return _FWD_CACHE["m"]


_CAT_BASE = (11, 19, 35, 67)  # v range starts for categories 3..6
_MAX_LEVEL = 67 + 2047  # largest magnitude the token alphabet encodes


def _quantize(vec: np.ndarray, dq_dc: int, dq_ac: int) -> np.ndarray:
    """Round-to-nearest levels in natural order, clamped to the alphabet."""
    dq = np.full(16, dq_ac, dtype=np.int64)
    dq[0] = dq_dc
    a = np.abs(vec.astype(np.int64))
    lev = (a + dq // 2) // dq
    np.clip(lev, 0, _MAX_LEVEL, out=lev)
    return (np.sign(vec) * lev).astype(np.int64)


def _put_coeffs(bw: _BoolWriter, probs_t, ctx: int, lev_scan, first: int) -> int:
    """Encode one 4x4 block's levels (scan order), mirroring _get_coeffs.
    Returns 1 if the block has any nonzero coefficient (the nz context)."""
    last = -1
    for i in range(first, 16):
        if lev_scan[i]:
            last = i
    n = first
    p = probs_t[_BANDS[n]][ctx]
    while n < 16:
        if last < n:
            bw.put(p[0], 0)  # end-of-block
            return 1 if last >= first else 0
        bw.put(p[0], 1)
        while lev_scan[n] == 0:
            bw.put(p[1], 0)
            n += 1
            p = probs_t[_BANDS[n]][0]
        bw.put(p[1], 1)
        v = int(abs(lev_scan[n]))
        if v == 1:
            bw.put(p[2], 0)
        else:
            bw.put(p[2], 1)
            if v <= 4:
                bw.put(p[3], 0)
                if v == 2:
                    bw.put(p[4], 0)
                else:
                    bw.put(p[4], 1)
                    bw.put(p[5], v - 3)
            elif v <= 10:
                bw.put(p[3], 1)
                bw.put(p[6], 0)
                if v <= 6:
                    bw.put(p[7], 0)
                    bw.put(159, v - 5)
                else:
                    bw.put(p[7], 1)
                    bw.put(165, (v - 7) >> 1)
                    bw.put(145, (v - 7) & 1)
            else:
                bw.put(p[3], 1)
                bw.put(p[6], 1)
                cat = 3
                for c4 in range(4):
                    if v < (_CAT_BASE[c4 + 1] if c4 < 3 else 1 << 30):
                        cat = c4
                        break
                b1, b0 = cat >> 1, cat & 1
                bw.put(p[8], b1)
                bw.put(p[9 + b1], b0)
                extra = v - _CAT_BASE[cat]
                row = _CAT3456[cat]
                for k, pr in enumerate(row):
                    bw.put(pr, (extra >> (len(row) - 1 - k)) & 1)
        bw.put(128, 1 if lev_scan[n] < 0 else 0)
        n += 1
        if n == 16:
            return 1
        p = probs_t[_BANDS[n]][2 if v > 1 else 1]
    return 1


def _rgb_to_yuv420(rgb: np.ndarray):
    """BT.601 studio-range RGB->YUV with 2x2 box chroma (encoder-side
    choice; the decode direction is fixed by decode_vp8_rgb)."""
    r = rgb[:, :, 0].astype(np.int32)
    g = rgb[:, :, 1].astype(np.int32)
    b = rgb[:, :, 2].astype(np.int32)
    y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    u = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
    v = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
    h, w = y.shape
    he, we = h + (h & 1), w + (w & 1)
    up = np.empty((he, we), dtype=np.int32)
    vp = np.empty((he, we), dtype=np.int32)
    up[:h, :w] = u
    vp[:h, :w] = v
    if he > h:
        up[h], vp[h] = up[h - 1], vp[h - 1]
    if we > w:
        up[:, w], vp[:, w] = up[:, w - 1], vp[:, w - 1]
    u2 = (up[0::2, 0::2] + up[0::2, 1::2] + up[1::2, 0::2] + up[1::2, 1::2] + 2) >> 2
    v2 = (vp[0::2, 0::2] + vp[0::2, 1::2] + vp[1::2, 0::2] + vp[1::2, 1::2] + 2) >> 2
    return (np.clip(y, 0, 255).astype(np.int32),
            np.clip(u2, 0, 255).astype(np.int32),
            np.clip(v2, 0, 255).astype(np.int32))


def _pad_to(P: np.ndarray, hh: int, ww: int) -> np.ndarray:
    out = np.empty((hh, ww), dtype=np.int32)
    h, w = P.shape
    out[:h, :w] = P
    if hh > h:
        out[h:, :w] = P[h - 1]
    if ww > w:
        out[:, w:] = out[:, w - 1 : w]
    return out


def encode_vp8(rgb: np.ndarray, qindex: int = 8) -> bytes:
    """Encode HxWx3 uint8 RGB as a VP8 keyframe bitstream (see section
    comment for the subset). qindex in [0, 127] is the y_ac quantizer
    index; all plane deltas are zero."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise VP8Error("encode_vp8 expects HxWx3 uint8")
    height, width = rgb.shape[:2]
    if not (0 < width < 16384 and 0 < height < 16384):
        raise VP8Error("dims out of range")
    qindex = int(qindex)
    if not 0 <= qindex <= 127:
        raise VP8Error("qindex out of range")
    ysrc, usrc, vsrc = _rgb_to_yuv420(rgb)
    mb_w = (width + 15) >> 4
    mb_h = (height + 15) >> 4
    ysrc = _pad_to(ysrc, mb_h * 16, mb_w * 16)
    usrc = _pad_to(usrc, mb_h * 8, mb_w * 8)
    vsrc = _pad_to(vsrc, mb_h * 8, mb_w * 8)
    Y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.int32)
    U = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int32)
    V = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int32)

    # quantizer factors — same derivation the decoder applies
    y1_dc = DC_QLOOKUP[_clip_q(qindex)]
    y1_ac = AC_QLOOKUP[_clip_q(qindex)]
    y2_dc = DC_QLOOKUP[_clip_q(qindex)] * 2
    y2_ac = max(8, (AC_QLOOKUP[_clip_q(qindex)] * 101581) >> 16)
    uv_dc = DC_QLOOKUP[_clip_q(qindex, 117)]
    uv_ac = AC_QLOOKUP[_clip_q(qindex)]
    fdct, wht_f = _fwd_mats()
    probs = COEFF_PROBS

    # ---- partition 0: frame header + per-MB modes
    b0 = _BoolWriter()
    b0.flag(0)          # color_space
    b0.flag(0)          # clamping_type
    b0.flag(0)          # segmentation_enabled
    b0.flag(0)          # filter_type (normal; level 0 disables anyway)
    b0.literal(0, 6)    # filter_level = 0
    b0.literal(0, 3)    # sharpness
    b0.flag(0)          # lf_delta
    b0.literal(0, 2)    # log2(token partitions) = 0 -> 1
    b0.literal(qindex, 7)
    for _ in range(5):
        b0.flag(0)      # y_dc / y2_dc / y2_ac / uv_dc / uv_ac deltas absent
    b0.flag(1)          # refresh_entropy_probs
    for t in range(4):  # no coefficient-probability updates
        for bd in range(8):
            for c in range(3):
                upd = COEFF_UPDATE_PROBS[t][bd][c]
                for p in range(11):
                    b0.put(upd[p], 0)
    b0.flag(0)          # mb_no_coeff_skip off -> every MB carries tokens
    ypath = _tree_path(_KF_YMODE_TREE, _DC16)
    uvpath = _tree_path(_UV_MODE_TREE, _DC16)
    for _ in range(mb_w * mb_h):
        for idx, bit in ypath:
            b0.put(_KF_YMODE_PROBS[idx], bit)
        for idx, bit in uvpath:
            b0.put(_KF_UV_PROBS[idx], bit)

    # ---- token partition: residuals, with decoder-identical nz contexts
    bw = _BoolWriter()
    top_y_nz = [[0] * 4 for _ in range(mb_w)]
    top_u_nz = [[0] * 2 for _ in range(mb_w)]
    top_v_nz = [[0] * 2 for _ in range(mb_w)]
    top_y2_nz = [0] * mb_w
    for mby in range(mb_h):
        left_y_nz = [0] * 4
        left_u_nz = [0] * 2
        left_v_nz = [0] * 2
        left_y2_nz = 0
        for mbx in range(mb_w):
            y0, x0 = 16 * mby, 16 * mbx
            cy0, cx0 = 8 * mby, 8 * mbx
            coeffs = np.zeros((24, 16), dtype=np.int32)
            lev = np.zeros((24, 16), dtype=np.int64)  # scan-order levels

            # luma: forward DCT per 4x4, DCs through the forward WHT
            above, left, tl = _ctx_block(Y, y0, x0, 16, mbx, mby)
            pred = _pred_block16(_DC16, above, left, tl, mbx, mby, 16)
            res = ysrc[y0 : y0 + 16, x0 : x0 + 16] - pred
            blocks = (
                res.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)
            )
            fc = np.rint(blocks.astype(np.float64) @ fdct.T).astype(np.int64)
            dcs_target = fc[:, 0].copy()
            y2 = np.rint(wht_f @ dcs_target.astype(np.float64)).astype(np.int64)
            y2_lev = _quantize(y2, y2_dc, y2_ac)
            dq2 = np.full(16, y2_ac, dtype=np.int64)
            dq2[0] = y2_dc
            dcs = _wht((y2_lev * dq2).astype(np.int32))
            for i in range(16):
                for zz in range(1, 16):
                    nat = _ZIGZAG[zz]
                    c = fc[i, nat]
                    l_ = (abs(int(c)) + y1_ac // 2) // y1_ac
                    if l_ > _MAX_LEVEL:
                        l_ = _MAX_LEVEL
                    lev[i, zz] = -l_ if c < 0 else l_
                    coeffs[i, nat] = int(lev[i, zz]) * y1_ac
                coeffs[i, 0] = dcs[i]
            y2_scan = np.array([y2_lev[_ZIGZAG[z]] for z in range(16)])
            ctx = left_y2_nz + top_y2_nz[mbx]
            nz2 = _put_coeffs(bw, probs[1], ctx, y2_scan, 0)
            left_y2_nz = top_y2_nz[mbx] = nz2
            for by in range(4):
                lf = left_y_nz[by]
                for bx in range(4):
                    i = 4 * by + bx
                    ctx = lf + top_y_nz[mbx][bx]
                    lf = _put_coeffs(bw, probs[0], ctx, lev[i], 1)
                    top_y_nz[mbx][bx] = lf
                left_y_nz[by] = lf

            # reconstruct luma exactly as the decoder will
            resi = _idct_batch(coeffs[:16])
            Y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(
                pred + _blocks_to_plane(resi, 4), 0, 255
            )

            # chroma planes
            for ch, (P, S, base, lnz, tnz) in enumerate((
                (U, usrc, 16, left_u_nz, top_u_nz[mbx]),
                (V, vsrc, 20, left_v_nz, top_v_nz[mbx]),
            )):
                above, left, tl = _ctx_block(P, cy0, cx0, 8, mbx, mby)
                pred = _pred_block16(_DC16, above, left, tl, mbx, mby, 8)
                res = S[cy0 : cy0 + 8, cx0 : cx0 + 8] - pred
                blocks = (
                    res.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3).reshape(4, 16)
                )
                fc = np.rint(blocks.astype(np.float64) @ fdct.T).astype(np.int64)
                for j in range(4):
                    i = base + j
                    q = _quantize(fc[j], uv_dc, uv_ac)
                    for zz in range(16):
                        nat = _ZIGZAG[zz]
                        lev[i, zz] = q[nat]
                        coeffs[i, nat] = int(q[nat]) * (uv_dc if nat == 0 else uv_ac)
                for by in range(2):
                    lf = lnz[by]
                    for bx in range(2):
                        i = base + 2 * by + bx
                        ctx = lf + tnz[bx]
                        lf = _put_coeffs(bw, probs[2], ctx, lev[i], 0)
                        tnz[bx] = lf
                    lnz[by] = lf
                resi = _idct_batch(coeffs[base : base + 4])
                P[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(
                    pred + _blocks_to_plane(resi, 2), 0, 255
                )

    part0 = b0.tobytes()
    tokens = bw.tobytes()
    tag = (1 << 4) | (len(part0) << 5)  # keyframe, version 0, show_frame
    head = bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    head += b"\x9d\x01\x2a"
    head += bytes((width & 0xFF, (width >> 8) & 0x3F))
    head += bytes((height & 0xFF, (height >> 8) & 0x3F))
    return head + part0 + tokens


def encode_webp_lossy(rgb: np.ndarray, qindex: int = 8) -> bytes:
    """RGB -> lossy .webp file bytes (RIFF container + VP8 keyframe)."""
    payload = encode_vp8(rgb, qindex=qindex)
    chunk = b"VP8 " + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
