"""Pure-Python WebP lossless (VP8L) codec — RFC 9649.

Closes the webp gap in the multimodal tier (operators/multimodal.py) the
same way functions/jpegcodec.py closed the JPEG one: built from the public
spec only, no image libraries.

Decoder coverage (the VP8L feature set):
  * RIFF container: bare `VP8L` chunks and `VP8X`-extended files that carry
    a VP8L chunk; *lossy* `VP8 ` bitstreams are explicitly rejected (a VP8
    video intra-frame codec is out of scope).
  * all four transforms: predictor (14 modes), color, subtract-green,
    color-indexing (incl. sub-byte pixel packing),
  * spatially-coded meta prefix codes (the "huffman image"),
  * color cache,
  * LZ77 backward references with the full distance mapping (2D window
    codes and plain distances).

Encoder: a deliberately simple-but-conformant subset used for fixtures and
round-trip tests — no transforms, no color cache, single prefix-code group,
fixed 8-bit literal codes, optional LZ77 run compression with plain
distance codes.

Caveat (honest): the container ships no reference webp files or libwebp, so
the decoder is certified by spec-conformant round-trips and hand-built
streams exercising each feature (tests/test_webp.py), not by corpus files.
The 120-entry 2D distance-map table is generated from the sort rule the
RFC's listed table follows (d^2 ascending, then dy descending, then
positive dx first); its low-distance prefix — the codes short matches
actually use — is the documented table.

Bit order: VP8L streams are LSB-first per byte; prefix codes are walked
MSB-first (canonical codes, shorter codes numerically first).
"""

from __future__ import annotations

import struct

import numpy as np

# code-length-code transmission order (RFC 9649 §5.2.2 kCodeLengthCodeOrder)
CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

NUM_LITERAL = 256
NUM_LENGTH = 24
NUM_DISTANCE = 40


def _distance_map() -> list[tuple[int, int]]:
    """The 120 2D window codes: (dx, dy) sorted by squared distance, then
    larger dy first, then positive dx before negative — the ordering the
    RFC's explicit table follows: (0,1),(1,0),(1,1),(-1,1),(0,2),(2,0),
    (1,2),(-1,2),(2,1),(-2,1),..."""
    cands = []
    for dy in range(8):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -(p[0] > 0)))
    return cands[:120]


DIST_MAP = _distance_map()


# --------------------------------------------------------------- bit I/O

class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[(self.pos + i) >> 3]
            v |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos += n
        return v

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write_bits(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def write_bit(self, b: int) -> None:
        self.bits.append(b & 1)

    def write_code_msb(self, code: int, length: int) -> None:
        """Prefix codes go to the stream MSB-first."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# ------------------------------------------------------------ prefix codes

def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length); canonical: sorted by (length, symbol)."""
    pairs = sorted((ln, s) for s, ln in enumerate(lengths) if ln > 0)
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for ln, s in pairs:
        code <<= (ln - prev_len)
        codes[s] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class _PrefixTree:
    """Decode tree walked bit-by-bit (MSB-first codes)."""

    __slots__ = ("map", "single")

    def __init__(self, lengths: list[int]):
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1:
            self.single = nz[0][0]
            self.map = None
            return
        self.single = None
        self.map = {}
        for s, (code, ln) in _canonical_codes(lengths).items():
            self.map[(ln, code)] = s

    @classmethod
    def simple(cls, symbols: list[int]):
        t = cls.__new__(cls)
        if len(symbols) == 1:
            t.single = symbols[0]
            t.map = None
        else:
            t.single = None
            t.map = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return t

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read_bit()
            s = self.map.get((ln, code))
            if s is not None:
                return s
        raise ValueError("invalid prefix code")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixTree:
    """One prefix code: simple (1-2 symbols) or code-length-coded."""
    if br.read_bit():  # simple
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            first = br.read_bits(8)
        else:
            first = br.read_bit()
        symbols = [first]
        if num_symbols == 2:
            symbols.append(br.read_bits(8))
        return _PrefixTree.simple(symbols)
    # full: code lengths are themselves prefix-coded
    num_cl = br.read_bits(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[CL_ORDER[i]] = br.read_bits(3)
    cl_tree = _PrefixTree(cl_lengths)
    max_symbol = alphabet_size
    if br.read_bit():  # use max_symbol
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = cl_tree.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:  # repeat previous non-zero length 3-6 times
            rep = 3 + br.read_bits(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read_bits(3)
        else:  # 18
            i += 11 + br.read_bits(7)
    return _PrefixTree(lengths)


# --------------------------------------------------------------- decoder

def _prefix_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding (RFC 9649 §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read_bits(extra) + 1


def _read_code_groups(br: _BitReader, num_groups: int, cache_bits: int):
    groups = []
    cache_size = (1 << cache_bits) if cache_bits else 0
    for _ in range(num_groups):
        g = (
            _read_prefix_code(br, NUM_LITERAL + NUM_LENGTH + cache_size),
            _read_prefix_code(br, NUM_LITERAL),  # red
            _read_prefix_code(br, NUM_LITERAL),  # blue
            _read_prefix_code(br, NUM_LITERAL),  # alpha
            _read_prefix_code(br, NUM_DISTANCE),
        )
        groups.append(g)
    return groups


def _decode_image_data(
    br: _BitReader, w: int, h: int, allow_meta: bool
) -> np.ndarray:
    """Spatially-coded (entropy image) ARGB decode -> (h, w, 4) uint8
    [a, r, g, b]. Used for the main image and (with allow_meta=False-ish
    semantics identical) transform sub-images — per spec every entropy-coded
    image carries its own color-cache/meta-prefix headers."""
    # color cache
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read_bits(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"bad color cache bits {cache_bits}")
    # meta prefix image
    meta = None
    meta_bits = 0
    num_groups = 1
    if allow_meta and br.read_bit():
        meta_bits = br.read_bits(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_image_data(br, mw, mh, allow_meta=False)
        # group index = (red << 8) | green
        meta = (meta_img[..., 1].astype(np.int32) << 8) | meta_img[..., 2]
        num_groups = int(meta.max()) + 1
    groups = _read_code_groups(br, num_groups, cache_bits)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_mul = 0x1E35A7BD

    out = np.zeros((h * w, 4), dtype=np.uint8)  # a, r, g, b
    pos = 0
    total = h * w
    cache_base = NUM_LITERAL + NUM_LENGTH
    while pos < total:
        x, y = pos % w, pos // w
        if meta is not None:
            gi = int(meta[y >> meta_bits, x >> meta_bits])
        else:
            gi = 0
        gcode, rcode, bcode, acode, dcode = groups[gi]
        s = gcode.read(br)
        if s < NUM_LITERAL:  # literal pixel
            g = s
            r = rcode.read(br)
            b = bcode.read(br)
            a = acode.read(br)
            out[pos] = (a, r, g, b)
            if cache is not None:
                argb = (a << 24) | (r << 16) | (g << 8) | b
                cache[((argb * cache_mul) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            pos += 1
        elif s < cache_base:  # LZ77 backward reference
            length = _prefix_value(s - NUM_LITERAL, br)
            dist_code = _prefix_value(dcode.read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = DIST_MAP[dist_code - 1]
                dist = max(1, dy * w + dx)
            if dist > pos:
                raise ValueError("LZ77 distance before image start")
            for _ in range(length):
                if pos >= total:
                    break
                out[pos] = out[pos - dist]
                if cache is not None:
                    a, r, g, b = out[pos]
                    argb = (int(a) << 24) | (int(r) << 16) | (int(g) << 8) | int(b)
                    cache[((argb * cache_mul) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
                pos += 1
        else:  # color cache hit
            if cache is None:
                raise ValueError("cache symbol without color cache")
            argb = cache[s - cache_base]
            out[pos] = ((argb >> 24) & 0xFF, (argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF)
            pos += 1
    return out.reshape(h, w, 4)


def _apply_predictor_inverse(img: np.ndarray, modes: np.ndarray, bits: int) -> None:
    """In-place inverse predictor transform (14 modes, §4.4.1). img is
    (h, w, 4) int-addressable uint8 [a,r,g,b]; modes (mh, mw) from the green
    channel of the transform sub-image.

    The scan is inherently sequential (left neighbors are post-inverse), so
    the inner loop runs on native Python ints over row lists — ~20x faster
    than per-pixel numpy scalar ops, which matters now that real-web VP8L
    payloads (megapixel scale, capped in crawler/imaging.py) route here."""
    h, w = img.shape[:2]
    mode_rows = modes.astype(np.int64)
    prev: list[list[int]] = []
    for y in range(h):
        residues = img[y].tolist()
        row: list[list[int]] = [None] * w  # type: ignore[list-item]
        mrow = mode_rows[y >> bits].tolist()
        for x in range(w):
            if x == 0 and y == 0:
                pa, pr, pg, pb = 255, 0, 0, 0
            elif y == 0:
                pa, pr, pg, pb = row[x - 1]
            elif x == 0:
                pa, pr, pg, pb = prev[0]
            else:
                mode = mrow[x >> bits]
                L = row[x - 1]
                T = prev[x]
                if mode == 1:
                    pa, pr, pg, pb = L
                elif mode == 2:
                    pa, pr, pg, pb = T
                elif mode == 0:
                    pa, pr, pg, pb = 255, 0, 0, 0
                else:
                    TL = prev[x - 1]
                    # RFC 9649 §4.4.1: in the rightmost column TR wraps to
                    # the leftmost pixel of the SAME row (already
                    # reconstructed) — libwebp's contiguous-buffer top[x+1]
                    # lands on row y, col 0.
                    TR = prev[x + 1] if x + 1 < w else row[0]
                    if mode == 3:
                        pa, pr, pg, pb = TR
                    elif mode == 4:
                        pa, pr, pg, pb = TL
                    elif mode == 5:
                        pa = ((L[0] + TR[0]) // 2 + T[0]) // 2
                        pr = ((L[1] + TR[1]) // 2 + T[1]) // 2
                        pg = ((L[2] + TR[2]) // 2 + T[2]) // 2
                        pb = ((L[3] + TR[3]) // 2 + T[3]) // 2
                    elif mode == 6:
                        pa, pr, pg, pb = (
                            (L[0] + TL[0]) // 2, (L[1] + TL[1]) // 2,
                            (L[2] + TL[2]) // 2, (L[3] + TL[3]) // 2,
                        )
                    elif mode == 7:
                        pa, pr, pg, pb = (
                            (L[0] + T[0]) // 2, (L[1] + T[1]) // 2,
                            (L[2] + T[2]) // 2, (L[3] + T[3]) // 2,
                        )
                    elif mode == 8:
                        pa, pr, pg, pb = (
                            (TL[0] + T[0]) // 2, (TL[1] + T[1]) // 2,
                            (TL[2] + T[2]) // 2, (TL[3] + T[3]) // 2,
                        )
                    elif mode == 9:
                        pa, pr, pg, pb = (
                            (T[0] + TR[0]) // 2, (T[1] + TR[1]) // 2,
                            (T[2] + TR[2]) // 2, (T[3] + TR[3]) // 2,
                        )
                    elif mode == 10:
                        pa = ((L[0] + TL[0]) // 2 + (T[0] + TR[0]) // 2) // 2
                        pr = ((L[1] + TL[1]) // 2 + (T[1] + TR[1]) // 2) // 2
                        pg = ((L[2] + TL[2]) // 2 + (T[2] + TR[2]) // 2) // 2
                        pb = ((L[3] + TL[3]) // 2 + (T[3] + TR[3]) // 2) // 2
                    elif mode == 11:  # Select
                        pl = (
                            abs(T[0] - TL[0]) + abs(T[1] - TL[1])
                            + abs(T[2] - TL[2]) + abs(T[3] - TL[3])
                        )
                        pt = (
                            abs(L[0] - TL[0]) + abs(L[1] - TL[1])
                            + abs(L[2] - TL[2]) + abs(L[3] - TL[3])
                        )
                        pa, pr, pg, pb = L if pl < pt else T
                    elif mode == 12:  # ClampAddSubtractFull
                        pa = min(max(L[0] + T[0] - TL[0], 0), 255)
                        pr = min(max(L[1] + T[1] - TL[1], 0), 255)
                        pg = min(max(L[2] + T[2] - TL[2], 0), 255)
                        pb = min(max(L[3] + T[3] - TL[3], 0), 255)
                    elif mode == 13:  # ClampAddSubtractHalf (trunc toward 0)
                        pred = []
                        for ci in range(4):
                            ave = (L[ci] + T[ci]) // 2
                            d = ave - TL[ci]
                            half = d // 2 if d >= 0 else -((-d) // 2)
                            pred.append(min(max(ave + half, 0), 255))
                        pa, pr, pg, pb = pred
                    else:
                        raise ValueError(f"bad predictor mode {mode}")
            v = residues[x]
            row[x] = [
                (v[0] + pa) & 0xFF, (v[1] + pr) & 0xFF,
                (v[2] + pg) & 0xFF, (v[3] + pb) & 0xFF,
            ]
        img[y] = np.asarray(row, dtype=np.uint8)
        prev = row


def _apply_color_inverse(img: np.ndarray, cdata: np.ndarray, bits: int) -> None:
    """Inverse color transform (§4.4.2), fully vectorized: cdata (mh, mw, 4)
    holds per-tile transform elements in [a,r,g,b] as (0, red_to_blue,
    green_to_blue, green_to_red); both the element and the predicting
    channel are interpreted as signed 8-bit (ColorTransformDelta)."""
    h, w = img.shape[:2]
    ty = np.arange(h) >> bits
    tx = np.arange(w) >> bits
    tiles = cdata[np.ix_(ty, tx)]  # (h, w, 4) per-pixel transform elements

    def delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
        return (
            t.astype(np.uint8).astype(np.int8).astype(np.int32)
            * c.astype(np.uint8).astype(np.int8).astype(np.int32)
        ) >> 5

    g = img[..., 2]
    r = (img[..., 1].astype(np.int32) + delta(tiles[..., 3], g)) & 0xFF
    b = (
        img[..., 3].astype(np.int32)
        + delta(tiles[..., 2], g)
        + delta(tiles[..., 1], r)
    ) & 0xFF
    img[..., 1] = r.astype(np.uint8)
    img[..., 3] = b.astype(np.uint8)


def decode_webp(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    """WebP bytes -> (h, w, 3) uint8 RGB (alpha dropped after compositing
    is left to the caller; VP8L alpha is decoded but not returned).

    Dispatches on the payload chunk: lossless ``VP8L`` decodes here; lossy
    ``VP8 `` (keyframe intra bitstream — what most real-web .webp files
    carry) decodes via functions/vp8codec.py (RFC 6386, YUV planes certified
    bit-exact vs libwebp in tests/test_vp8.py).

    ``max_pixels`` rejects oversized dimensions BEFORE any symbol decoding —
    the per-pixel Python loops are unbounded in cost, so untrusted fetch
    payloads must pass a cap (crawler/imaging.py does)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP header)")
    # find the VP8L chunk (bare or inside VP8X layout)
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"VP8L":
            payload = data[pos + 8 : pos + 8 + size]
            break
        if tag == b"VP8 ":
            from .vp8codec import decode_vp8_rgb

            return decode_vp8_rgb(
                data[pos + 8 : pos + 8 + size], max_pixels=max_pixels
            )
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk found")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(payload[1:])
    w = br.read_bits(14) + 1
    h = br.read_bits(14) + 1
    if max_pixels is not None and w * h > max_pixels:
        raise ValueError(
            f"VP8L dimensions {w}x{h} exceed max_pixels={max_pixels} "
            "(decode cost cap for untrusted payloads)"
        )
    br.read_bit()  # alpha hint
    if br.read_bits(3) != 0:
        raise ValueError("unknown VP8L version")

    # transforms (applied in reverse order after decode)
    transforms = []
    xsize = w
    while br.read_bit():
        ttype = br.read_bits(2)
        if ttype == 2:  # subtract-green
            transforms.append(("subtract_green", None, None))
        elif ttype in (0, 1):  # predictor / color
            bits = br.read_bits(3) + 2
            mw = (xsize + (1 << bits) - 1) >> bits
            mh = (h + (1 << bits) - 1) >> bits
            sub = _decode_image_data(br, mw, mh, allow_meta=False)
            transforms.append(("predictor" if ttype == 0 else "color", sub, bits))
        else:  # color-indexing
            n_colors = br.read_bits(8) + 1
            palette = _decode_image_data(br, n_colors, 1, allow_meta=False)[0]
            # palette is delta-coded
            pal = palette.astype(np.int32)
            for i in range(1, n_colors):
                pal[i] = (pal[i] + pal[i - 1]) & 0xFF
            width_bits = 0
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            transforms.append(("color_indexing", (pal.astype(np.uint8), width_bits, xsize), None))
            if width_bits:
                xsize = (xsize + (1 << width_bits) - 1) >> width_bits
    img = _decode_image_data(br, xsize, h, allow_meta=True)

    for name, tdata, bits in reversed(transforms):
        if name == "subtract_green":
            g = img[..., 2].astype(np.int32)
            img[..., 1] = ((img[..., 1].astype(np.int32) + g) & 0xFF).astype(np.uint8)
            img[..., 3] = ((img[..., 3].astype(np.int32) + g) & 0xFF).astype(np.uint8)
        elif name == "predictor":
            _apply_predictor_inverse(img, tdata[..., 2].astype(np.int32), bits)
        elif name == "color":
            _apply_color_inverse(img, tdata, bits)
        elif name == "color_indexing":
            pal, width_bits, full_w = tdata
            if width_bits:
                ppb = 1 << width_bits          # packed pixels per byte-pixel
                bpp = 8 >> width_bits          # bits per packed pixel
                idx = np.zeros((img.shape[0], full_w), dtype=np.int32)
                green = img[..., 2]
                for x in range(full_w):
                    src = green[:, x // ppb]
                    shift = (x % ppb) * bpp
                    idx[:, x] = (src >> shift) & ((1 << bpp) - 1)
            else:
                idx = img[..., 2].astype(np.int32)
            # RFC 9649 §4.4.4: index >= color_table_size yields 0x00000000
            # (transparent black), not a clamped palette entry.
            pal_ext = np.vstack([pal, np.zeros((1, 4), dtype=pal.dtype)])
            idx = np.where(idx >= len(pal), len(pal), idx)
            img = pal_ext[idx]
    # [a, r, g, b] -> RGB
    return img[..., 1:4].copy()


# --------------------------------------------------------------- encoder

def _write_code_lengths(bw: _BitWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Transmit a full (non-simple) prefix code as explicit per-symbol code
    lengths (no 16/17/18 run compression — fixture-grade, not size-optimal);
    returns the canonical codes for the transmitted lengths."""
    bw.write_bit(0)  # not simple
    used = sorted(set(lengths))
    if used == [0]:
        raise ValueError("empty code")
    # code-length-code over the distinct length values: 2 values -> both
    # 1 bit; 3 values -> 1+2+2 bits (complete codes)
    if len(used) == 1:
        cl_lens = {used[0]: 1, (0 if used[0] != 0 else 1): 1}
    elif len(used) == 2:
        cl_lens = {used[0]: 1, used[1]: 1}
    elif len(used) == 3:
        cl_lens = {used[0]: 1, used[1]: 2, used[2]: 2}
    else:
        raise ValueError("fixture encoder supports <= 3 distinct lengths")
    n_transmit = max(CL_ORDER.index(s) for s in cl_lens) + 1
    bw.write_bits(n_transmit - 4, 4)
    for i in range(n_transmit):
        bw.write_bits(cl_lens.get(CL_ORDER[i], 0), 3)
    bw.write_bit(0)  # no max_symbol
    cl_codes = _canonical_codes([cl_lens.get(s, 0) for s in range(19)])
    for s in lengths:
        code, ln = cl_codes[s]
        bw.write_code_msb(code, ln)
    return _canonical_codes(lengths)


# Complete literal+length green code: literals 0..231 at 8 bits, literals
# 232..255 and the 24 length symbols at 9 bits (232/256 + 48/512 = 1).
_GREEN_LENGTHS = [8] * 232 + [9] * 24 + [9] * NUM_LENGTH
_BYTE_LENGTHS = [8] * 256


def encode_webp_lossless(arr: np.ndarray, use_lz77: bool = True) -> bytes:
    """HxWx3 uint8 RGB -> lossless WebP (VP8L) bytes.

    Subset encoder: no transforms, no color cache, one code group, complete
    fixed-length prefix codes; optional LZ77 encoding of exact repeats of
    the previous pixel (distance 1) / previous row (distance w), emitted as
    plain distance codes (> 120). Lossless by construction:
    decode_webp(encode_webp_lossless(x)) == x."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected HxWx3 uint8 array")
    h, w, _ = arr.shape
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("dimensions out of VP8L range")
    bw = _BitWriter()
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bit(0)  # no alpha hint
    bw.write_bits(0, 3)  # version
    bw.write_bit(0)  # no transforms
    bw.write_bit(0)  # no color cache
    bw.write_bit(0)  # no meta prefix image
    gcodes = _write_code_lengths(bw, _GREEN_LENGTHS)
    rcodes = _write_code_lengths(bw, _BYTE_LENGTHS)
    bcodes = _write_code_lengths(bw, _BYTE_LENGTHS)
    acodes = _write_code_lengths(bw, _BYTE_LENGTHS)
    # distance code: the encoder only emits plain distances 1 and w
    # (codes 121 and w+120); transmit a tiny complete code over the one or
    # two distance-prefix symbols used
    d_syms = sorted({_dist_prefix_code(121)[0], _dist_prefix_code(w + 120)[0]})
    bw.write_bit(1)  # simple distance code
    if len(d_syms) == 1:
        bw.write_bit(0)  # one symbol
        bw.write_bit(1)  # 8-bit symbol
        bw.write_bits(d_syms[0], 8)
        dcodes = {d_syms[0]: (0, 0)}
    else:
        bw.write_bit(1)  # two symbols
        bw.write_bit(1)
        bw.write_bits(d_syms[0], 8)
        bw.write_bits(d_syms[1], 8)
        dcodes = {d_syms[0]: (0, 1), d_syms[1]: (1, 1)}

    flat = arr.reshape(-1, 3)
    n = flat.shape[0]

    def emit_pixel(i: int) -> None:
        r, g, b = (int(v) for v in flat[i])
        for codes, s in ((gcodes, g), (rcodes, r), (bcodes, b), (acodes, 255)):
            code, ln = codes[s]
            bw.write_code_msb(code, ln)

    i = 0
    while i < n:
        best_len, best_dist = 0, 0
        if use_lz77:
            for dist in (1, w):
                if i >= dist and np.array_equal(flat[i], flat[i - dist]):
                    ln = 0
                    while ln < 4096 and i + ln < n and np.array_equal(
                        flat[i + ln], flat[i + ln - dist]
                    ):
                        ln += 1
                    if ln > best_len:
                        best_len, best_dist = ln, dist
        if best_len >= 3:
            lcode, lextra, lebits = _len_prefix_code(best_len)
            code, ln = gcodes[NUM_LITERAL + lcode]
            bw.write_code_msb(code, ln)
            if lebits:
                bw.write_bits(lextra, lebits)
            pcode, pextra, pebits = _dist_prefix_code(best_dist + 120)
            code, ln = dcodes[pcode]
            if ln:
                bw.write_code_msb(code, ln)
            if pebits:
                bw.write_bits(pextra, pebits)
            i += best_len
        else:
            emit_pixel(i)
            i += 1

    payload = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _dist_prefix_code(dist: int) -> tuple[int, int, int]:
    """distance -> (prefix code, extra value, extra bits)."""
    d = dist - 1
    if d < 4:
        return d, 0, 0
    nbits = d.bit_length() - 1
    rem = d - (1 << nbits)
    if rem < (1 << (nbits - 1)):
        return 2 * nbits, rem, nbits - 1
    return 2 * nbits + 1, rem - (1 << (nbits - 1)), nbits - 1


def _len_prefix_code(length: int) -> tuple[int, int, int]:
    return _dist_prefix_code(length)
