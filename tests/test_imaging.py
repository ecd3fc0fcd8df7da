"""PNG/raw codec + phash/PSNR invariants (payload plumbing for the graft)."""

from __future__ import annotations

import numpy as np

from sher_look_spark.crawler.imaging import (
    decode_image,
    decode_png,
    decode_raw,
    encode_png,
    encode_raw,
    phash64,
    psnr,
)


def _img(seed=7, h=17, w=23):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_lossless():
    arr = _img()
    out = decode_png(encode_png(arr))
    assert np.array_equal(arr, out)
    assert psnr(arr, out) == float("inf")


def test_png_is_standards_shaped():
    data = encode_png(_img())
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data[:40] and data[-8:-4] == b"IEND"


def test_raw_roundtrip():
    arr = _img(9)
    assert np.array_equal(arr, decode_raw(encode_raw(arr)))


def test_decode_image_dispatch_and_stub():
    arr = _img(3)
    assert np.array_equal(decode_image(encode_png(arr), "png"), arr)
    # jpeg now routes to the real baseline codec (functions/jpegcodec.py)
    from sher_look_spark.functions.jpegcodec import encode_jpeg
    from sher_look_spark.crawler.imaging import psnr

    assert psnr(arr, decode_image(encode_jpeg(arr, 95), "jpeg")) >= 30.0
    try:
        decode_image(b"\x00garbage", "jpeg")
        raise AssertionError("expected ValueError for malformed jpeg")
    except ValueError:
        pass
    # webp routes to the real codecs: VP8L lossless round-trips, lossy VP8
    # decodes (functions/vp8codec.py); a headerless RIFF and an empty VP8
    # payload are clean typed ValueErrors
    import struct

    from sher_look_spark.functions.vp8codec import VP8Error, encode_webp_lossy
    from sher_look_spark.functions.webpcodec import encode_webp_lossless

    assert np.array_equal(decode_image(encode_webp_lossless(arr), "webp"), arr)
    assert decode_image(encode_webp_lossy(arr, qindex=4), "webp").shape == arr.shape
    try:
        decode_image(b"RIFF....WEBP", "webp")
        raise AssertionError("expected ValueError for chunkless webp")
    except ValueError:
        pass
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    try:
        decode_image(lossy, "webp")
        raise AssertionError("expected VP8Error for empty VP8 payload")
    except VP8Error:
        pass


def test_psnr_scale():
    arr = _img(11)
    noisy = arr.copy()
    noisy[0, 0, 0] = (int(noisy[0, 0, 0]) + 8) % 256
    assert psnr(arr, noisy) > 40.0  # single-pixel wiggle stays above the bar
    assert psnr(arr, np.zeros_like(arr)) < 40.0


def test_phash_stability_and_sensitivity():
    arr = _img(13, 32, 32)
    assert phash64(arr) == phash64(arr.copy())
    other = _img(14, 32, 32)
    assert phash64(arr) != phash64(other)
    assert -(2**63) <= phash64(arr) < 2**63
