"""WebP lossless (VP8L) codec — functions/webpcodec.py.

Round-trips through the subset encoder plus HAND-BUILT spec streams for the
decoder features the encoder deliberately does not emit (transforms, color
cache, 2D distance codes, meta prefix codes). No webp fixtures or libwebp
exist in this container, so these certify spec-conformant self-consistency;
the module docstring records that honestly.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sher_look_spark.functions.webpcodec import (
    DIST_MAP,
    NUM_LENGTH,
    NUM_LITERAL,
    _BitWriter,
    _canonical_codes,
    _write_code_lengths,
    decode_webp,
    encode_webp_lossless,
)


def _rand(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _wrap_vp8l(bw: _BitWriter) -> bytes:
    payload = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bit(0)  # alpha hint
    bw.write_bits(0, 3)  # version


def _plain_codes(bw: _BitWriter, sub: bool = False):
    """No cache, no meta, fixed complete codes; returns (g, r, b, a) codes
    plus a single-symbol distance code (symbol 0 -> 2D code (0,1)).
    ``sub``: transform/meta sub-images carry no meta-prefix bit."""
    bw.write_bit(0)  # no color cache
    if not sub:
        bw.write_bit(0)  # no meta prefix image
    g = _write_code_lengths(bw, [8] * 232 + [9] * 24 + [9] * NUM_LENGTH)
    r = _write_code_lengths(bw, [8] * 256)
    b = _write_code_lengths(bw, [8] * 256)
    a = _write_code_lengths(bw, [8] * 256)
    bw.write_bit(1)  # simple distance code, one symbol: 0
    bw.write_bit(0)
    bw.write_bit(0)
    bw.write_bit(0)
    return g, r, b, a


def _emit_px(bw, codes, r, g, b, a=255):
    gc, rc, bc, ac = codes
    for cmap, s in ((gc, g), (rc, r), (bc, b), (ac, a)):
        code, ln = cmap[s]
        bw.write_code_msb(code, ln)


@pytest.mark.parametrize("shape", [(1, 1), (5, 7), (16, 16), (40, 33)])
def test_roundtrip_exact(shape):
    arr = _rand(*shape, seed=shape[0])
    for lz in (False, True):
        dec = decode_webp(encode_webp_lossless(arr, use_lz77=lz))
        assert np.array_equal(dec, arr), (shape, lz)


def test_lz77_compresses_runs():
    arr = np.zeros((24, 32, 3), np.uint8)
    arr[...] = (9, 200, 33)
    with_lz = encode_webp_lossless(arr, use_lz77=True)
    without = encode_webp_lossless(arr, use_lz77=False)
    assert len(with_lz) < len(without) / 5
    assert np.array_equal(decode_webp(with_lz), arr)


def test_riff_structure_and_rejections():
    arr = _rand(4, 4)
    data = encode_webp_lossless(arr)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP" and data[12:16] == b"VP8L"
    with pytest.raises(ValueError):
        decode_webp(b"JUNKJUNKJUNKJUNK")
    # lossy VP8 chunks dispatch to functions/vp8codec.py; an empty payload
    # raises its typed error (decode itself is covered in tests/test_vp8.py)
    from sher_look_spark.functions.vp8codec import VP8Error

    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(VP8Error):
        decode_webp(lossy)


def test_subtract_green_transform():
    """Hand-built stream: subtract-green transform + literal residuals must
    invert to the original pixels."""
    arr = _rand(3, 5, seed=9)
    h, w, _ = arr.shape
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bit(1)  # transform present
    bw.write_bits(2, 2)  # subtract-green
    bw.write_bit(0)  # no more transforms
    codes = _plain_codes(bw)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in arr[y, x])
            _emit_px(bw, codes, (r - g) & 0xFF, g, (b - g) & 0xFF)
    assert np.array_equal(decode_webp(_wrap_vp8l(bw)), arr)


def test_color_indexing_packed():
    """2-color palette -> 8 pixels packed per byte via the green channel."""
    w, h = 13, 4
    c0, c1 = (10, 20, 30), (200, 150, 100)
    idx = (np.arange(h * w).reshape(h, w) + np.arange(h)[:, None]) % 2
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bit(1)
    bw.write_bits(3, 2)  # color-indexing
    bw.write_bits(2 - 1, 8)  # n_colors - 1
    pcodes = _plain_codes(bw, sub=True)  # palette sub-image: w=2, h=1
    _emit_px(bw, pcodes, *c0)
    _emit_px(
        bw, pcodes,
        (c1[0] - c0[0]) & 0xFF, (c1[1] - c0[1]) & 0xFF, (c1[2] - c0[2]) & 0xFF,
    )  # delta-coded second entry
    bw.write_bit(0)  # no more transforms
    codes = _plain_codes(bw)
    packed_w = (w + 7) // 8
    for y in range(h):
        for bx in range(packed_w):
            byte = 0
            for k in range(8):
                x = bx * 8 + k
                if x < w and idx[y, x]:
                    byte |= 1 << k
            _emit_px(bw, codes, 0, byte, 0)
    dec = decode_webp(_wrap_vp8l(bw))
    want = np.where(idx[..., None] == 1, np.array(c1, np.uint8), np.array(c0, np.uint8))
    assert np.array_equal(dec, want.astype(np.uint8))


def test_color_transform_inverse():
    """Hand-built color-transform stream (§4.4.2): residuals produced by the
    forward ColorTransformDelta rule (signed-8-bit element x channel, >>5)
    must invert exactly — r from g, then b from g and the reconstructed r."""
    w, h = 6, 4
    arr = _rand(h, w, seed=21)
    g2r, g2b, r2b = 0x35, 0xE2, 0x11  # mixed-sign int8 elements
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bit(1)
    bw.write_bits(1, 2)  # color transform
    bw.write_bits(3 - 2, 3)  # 8x8 tiles -> single tile
    pcodes = _plain_codes(bw, sub=True)
    # tile pixel channels: red=r2b, green=g2b, blue=g2r (decoder reads
    # cdata[..., 1]=r2b, [..., 2]=g2b, [..., 3]=g2r)
    _emit_px(bw, pcodes, r2b, g2b, g2r)
    bw.write_bit(0)  # no more transforms
    codes = _plain_codes(bw)

    def delta(t, c):
        t = t - 256 if t >= 128 else t
        c = c - 256 if c >= 128 else c
        return (t * c) >> 5

    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in arr[y, x])
            rr = (r - delta(g2r, g)) & 0xFF
            bb = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
            _emit_px(bw, codes, rr, g, bb)
    assert np.array_equal(decode_webp(_wrap_vp8l(bw)), arr)


def test_color_indexing_out_of_range_is_transparent_black():
    """RFC 9649 §4.4.4: index >= color_table_size decodes to 0x00000000
    (transparent black -> RGB (0,0,0)), never a clamped palette entry."""
    w, h = 5, 2
    c0, c1, c2 = (10, 20, 30), (200, 150, 100), (1, 2, 3)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bit(1)
    bw.write_bits(3, 2)  # color-indexing
    bw.write_bits(3 - 1, 8)  # 3 colors -> width_bits=2, 4 packed per byte
    pcodes = _plain_codes(bw, sub=True)
    _emit_px(bw, pcodes, *c0)
    _emit_px(bw, pcodes, (c1[0] - c0[0]) & 0xFF, (c1[1] - c0[1]) & 0xFF, (c1[2] - c0[2]) & 0xFF)
    _emit_px(bw, pcodes, (c2[0] - c1[0]) & 0xFF, (c2[1] - c1[1]) & 0xFF, (c2[2] - c1[2]) & 0xFF)
    bw.write_bit(0)  # no more transforms
    codes = _plain_codes(bw)
    idx = np.array([[0, 1, 2, 3, 1], [3, 3, 0, 2, 1]])  # 3 is OOB
    packed_w = (w + 3) // 4
    for y in range(h):
        for bx in range(packed_w):
            byte = 0
            for k in range(4):
                x = bx * 4 + k
                if x < w:
                    byte |= int(idx[y, x]) << (2 * k)
            _emit_px(bw, codes, 0, byte, 0)
    dec = decode_webp(_wrap_vp8l(bw))
    pal = np.array([c0, c1, c2, (0, 0, 0)], dtype=np.uint8)
    assert np.array_equal(dec, pal[idx])


def test_color_cache_hits():
    """Literal fills the cache; subsequent identical pixels arrive as cache
    symbols and must reproduce the same ARGB."""
    w, h = 6, 1
    px = (40, 77, 90)  # r, g, b
    cache_bits = 4
    a, r, g, b = 255, *px
    argb = (a << 24) | (r << 16) | (g << 8) | b
    idx = ((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bit(0)  # no transforms
    bw.write_bit(1)  # color cache
    bw.write_bits(cache_bits, 4)
    bw.write_bit(0)  # no meta
    cache_size = 1 << cache_bits
    # complete green code over 256+24+16 symbols: 216 @8 + 80 @9
    # (216/256 + 80/512 = 1)
    gc = _write_code_lengths(
        bw, [8] * 216 + [9] * (256 - 216 + NUM_LENGTH + cache_size)
    )
    rc = _write_code_lengths(bw, [8] * 256)
    bc = _write_code_lengths(bw, [8] * 256)
    ac = _write_code_lengths(bw, [8] * 256)
    bw.write_bit(1)  # simple single-symbol distance code
    bw.write_bit(0)
    bw.write_bit(0)
    bw.write_bit(0)
    codes = (gc, rc, bc, ac)
    _emit_px(bw, codes, r, g, b)  # literal -> fills cache
    cache_sym = NUM_LITERAL + NUM_LENGTH + idx
    for _ in range(w - 1):
        code, ln = gc[cache_sym]
        bw.write_code_msb(code, ln)
    dec = decode_webp(_wrap_vp8l(bw))
    assert np.array_equal(dec, np.tile(np.array(px, np.uint8), (1, w, 1)))


def test_2d_distance_codes():
    """dist_code 1 = (0,1) -> distance w (copy row above); the map's head
    matches the RFC listing."""
    assert DIST_MAP[:6] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0)]
    w, h = 5, 3
    row = [(i * 11 % 256, i * 7 % 256, i * 3 % 256) for i in range(w)]
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bit(0)  # no transforms
    codes = _plain_codes(bw)  # distance code: single symbol 0 -> 2D (0,1)
    gc = codes[0]
    for r, g, b in row:
        _emit_px(bw, codes, r, g, b)
    # two back-references, each copying a full row from distance w
    for _ in range(2):
        # length w: prefix for value w=5 -> d=4, code=4, extra 0 over 1 bit
        code, ln = gc[NUM_LITERAL + 4]
        bw.write_code_msb(code, ln)
        bw.write_bits(0, 1)  # extra bits for length 5
        # distance symbol: single-symbol code (0 bits) -> prefix 0 ->
        # dist_code 1 -> DIST_MAP (0,1) -> dist = w
    dec = decode_webp(_wrap_vp8l(bw))
    want = np.tile(np.array(row, np.uint8).reshape(1, w, 3), (h, 1, 1))
    assert np.array_equal(dec, want)


def test_predictor_transform_mode_L():
    """Predictor transform with mode 1 (left) everywhere: residuals built by
    the forward rule must invert exactly."""
    arr = _rand(4, 6, seed=4)
    h, w, _ = arr.shape
    bits = 2  # 4x4 tiles
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bit(1)
    bw.write_bits(0, 2)  # predictor
    bw.write_bits(bits - 2, 3)
    mw, mh = (w + 3) // 4, (h + 3) // 4
    pcodes = _plain_codes(bw, sub=True)  # mode sub-image
    for _ in range(mw * mh):
        _emit_px(bw, pcodes, 0, 1, 0)  # green=1 -> mode L
    bw.write_bit(0)  # no more transforms
    codes = _plain_codes(bw)
    px = arr.astype(np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pa, pr, pg, pb = 255, 0, 0, 0
            elif y == 0:
                pr, pg, pb = px[0, x - 1]
                pa = 255
            elif x == 0:
                pr, pg, pb = px[y - 1, 0]
                pa = 255
            else:  # mode L
                pr, pg, pb = px[y, x - 1]
                pa = 255
            r, g, b = px[y, x]
            _emit_px(
                bw, codes,
                (r - pr) & 0xFF, (g - pg) & 0xFF, (b - pb) & 0xFF,
                (255 - pa) & 0xFF,
            )
    assert np.array_equal(decode_webp(_wrap_vp8l(bw)), arr)


def test_predictor_transform_mode_TR_right_edge():
    """Predictor mode 3 (top-right) everywhere. RFC 9649 §4.4.1: in the
    rightmost column TR wraps to the leftmost pixel of the SAME row (already
    reconstructed), not T — residuals built with that forward rule must
    invert exactly, which fails if the decoder substitutes T on the edge."""
    arr = _rand(5, 6, seed=11)
    h, w, _ = arr.shape
    bits = 3  # 8x8 tiles -> one tile covers the whole image
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bit(1)
    bw.write_bits(0, 2)  # predictor
    bw.write_bits(bits - 2, 3)
    pcodes = _plain_codes(bw, sub=True)
    _emit_px(bw, pcodes, 0, 3, 0)  # green=3 -> mode TR, single tile
    bw.write_bit(0)  # no more transforms
    codes = _plain_codes(bw)
    px = arr.astype(np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pa, (pr, pg, pb) = 255, (0, 0, 0)
            elif y == 0:
                pa, (pr, pg, pb) = 255, px[0, x - 1]
            elif x == 0:
                pa, (pr, pg, pb) = 255, px[y - 1, 0]
            else:  # mode TR; rightmost column wraps to px[y, 0]
                src = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
                pa, (pr, pg, pb) = 255, src
            r, g, b = px[y, x]
            _emit_px(
                bw, codes,
                (r - pr) & 0xFF, (g - pg) & 0xFF, (b - pb) & 0xFF,
                (255 - pa) & 0xFF,
            )
    assert np.array_equal(decode_webp(_wrap_vp8l(bw)), arr)


def test_decode_rejects_oversized_dims():
    """max_pixels caps decode cost before any symbol reading (untrusted
    fetch payloads); a tiny image under the cap still decodes."""
    arr = _rand(4, 4, seed=9)
    data = encode_webp_lossless(arr)
    with pytest.raises(ValueError, match="max_pixels"):
        decode_webp(data, max_pixels=8)
    assert np.array_equal(decode_webp(data, max_pixels=16), arr)


def test_meta_prefix_groups():
    """Spatially-selected code groups: tiles mapped to group 1 use a
    single-symbol green code (0 bits, green=7); group 0 a full code. Wrong
    group selection would desynchronize the stream immediately."""
    w, h = 8, 4
    meta_bits = 2  # 4x4 tiles -> 2x1 meta image
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write_bit(0)  # no transforms
    bw.write_bit(0)  # no color cache
    bw.write_bit(1)  # meta prefix image present
    bw.write_bits(meta_bits - 2, 3)
    mcodes = _plain_codes(bw, sub=True)  # meta sub-image 2x1: (r<<8)|g = group
    _emit_px(bw, mcodes, 0, 0, 0)   # tile 0 -> group 0
    _emit_px(bw, mcodes, 0, 1, 0)   # tile 1 -> group 1
    # group 0: full codes
    g0 = _write_code_lengths(bw, [8] * 232 + [9] * 24 + [9] * NUM_LENGTH)
    r0 = _write_code_lengths(bw, [8] * 256)
    b0 = _write_code_lengths(bw, [8] * 256)
    a0 = _write_code_lengths(bw, [8] * 256)
    bw.write_bit(1)
    bw.write_bit(0)
    bw.write_bit(0)
    bw.write_bit(0)  # distance: single symbol 0
    # group 1: green = simple single-symbol 7 (0 bits), full r/b/a codes
    bw.write_bit(1)  # simple
    bw.write_bit(0)  # one symbol
    bw.write_bit(1)  # 8-bit symbol
    bw.write_bits(7, 8)
    r1 = _write_code_lengths(bw, [8] * 256)
    b1 = _write_code_lengths(bw, [8] * 256)
    a1 = _write_code_lengths(bw, [8] * 256)
    bw.write_bit(1)
    bw.write_bit(0)
    bw.write_bit(0)
    bw.write_bit(0)
    want = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            if x < 4:  # group 0
                r, g, b = (x * 31) % 256, (y * 17) % 256, 77
                _emit_px(bw, (g0, r0, b0, a0), r, g, b)
            else:  # group 1: green implied = 7
                r, b = (x * 5) % 256, (y * 13) % 256
                g = 7
                for cmap, s in ((r1, r), (b1, b), (a1, 255)):
                    code, ln = cmap[s]
                    bw.write_code_msb(code, ln)
            want[y, x] = (r, g, b)
    assert np.array_equal(decode_webp(_wrap_vp8l(bw)), want)


def test_mm_operators_decode_webp(spark):
    """The multimodal tier decodes webp rows through the same Arrow path."""
    from sher_look_spark.operators.multimodal import image_features

    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    arrs = {f"w{i}": np.full((3, 4, 3), i * 40, np.uint8) for i in range(3)}
    rows = [
        (k, bytearray(encode_webp_lossless(v)), "webp") for k, v in arrs.items()
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {r.image_id: r for r in image_features(df).collect()}
    for k, v in arrs.items():
        assert got[k].w == 4 and got[k].h == 3
        assert got[k].mean_r == float(v[0, 0, 0])
