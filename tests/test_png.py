"""Full-feature PNG decoder vs the system libpng16, both directions.

Direction 1 (real encoder -> our decoder): libpng's simplified write API
encodes arrays with its own adaptive row-filter choices — the streams real
websites serve — and our decoder must reproduce the pixels bit-exact.

Direction 2 (adversarial encoder -> reference decoder): our test encoder
forces specific filters / sub-byte depths / palette+tRNS / Adam7, libpng's
simplified read API decodes them, and our decoder must agree bit-exact.

Tests skip if libpng16 is absent (hand-built spec streams still run)."""

from __future__ import annotations

import ctypes
import struct
import zlib

import numpy as np
import pytest

from sher_look_spark.functions.pngcodec import (
    PngError,
    decode_png_full,
    decode_png_rgba,
    encode_png_adv,
)

try:
    _lib = ctypes.CDLL("libpng16.so.16")
except OSError:  # pragma: no cover
    _lib = None

requires_libpng = pytest.mark.skipif(_lib is None, reason="system libpng16 not available")

# png.h simplified-API constants
_PNG_IMAGE_VERSION = 1
_FMT_GRAY = 0
_FMT_GA = 1
_FMT_RGB = 2
_FMT_RGBA = 3
_FMT_LINEAR_RGB = 6  # 16-bit components, no gamma change for gAMA-less input
_FLAG_COLORMAP = 0x08


class _PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


def _libpng_read(data: bytes, fmt: int, dtype, channels: int) -> np.ndarray:
    img = _PngImage()
    img.version = _PNG_IMAGE_VERSION
    ok = _lib.png_image_begin_read_from_memory(
        ctypes.byref(img), data, ctypes.c_size_t(len(data))
    )
    assert ok, f"libpng begin_read failed: {img.message!r}"
    img.format = fmt
    itemsize = np.dtype(dtype).itemsize
    buf = (ctypes.c_ubyte * (img.height * img.width * channels * itemsize))()
    ok = _lib.png_image_finish_read(ctypes.byref(img), None, buf, 0, None)
    assert ok, f"libpng finish_read failed: {img.message!r}"
    arr = np.frombuffer(bytes(buf), dtype=dtype).reshape(
        img.height, img.width, channels
    )
    _lib.png_image_free(ctypes.byref(img))
    return arr


def libpng_rgba(data: bytes) -> np.ndarray:
    return _libpng_read(data, _FMT_RGBA, np.uint8, 4)


def libpng_rgb16(data: bytes) -> np.ndarray:
    # LINEAR_RGB returns the file's 16-bit samples unchanged when the
    # stream carries no gAMA/sRGB chunk (our encoder never writes one)
    return _libpng_read(data, _FMT_LINEAR_RGB, np.dtype(">u2") if False else np.uint16, 3)


def libpng_write(arr: np.ndarray, fmt: int) -> bytes:
    img = _PngImage()
    img.version = _PNG_IMAGE_VERSION
    img.height, img.width = arr.shape[0], arr.shape[1]
    img.format = fmt
    size = ctypes.c_size_t(0)
    raw = np.ascontiguousarray(arr, dtype=np.uint8).tobytes()
    ok = _lib.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0, raw, 0, None
    )
    assert ok, f"libpng write (size probe) failed: {img.message!r}"
    buf = (ctypes.c_ubyte * size.value)()
    ok = _lib.png_image_write_to_memory(
        ctypes.byref(img), buf, ctypes.byref(size), 0, raw, 0, None
    )
    assert ok, f"libpng write failed: {img.message!r}"
    return bytes(buf[: size.value])


def _grad(h: int, w: int, c: int, seed: int = 7) -> np.ndarray:
    """Gradient + structured noise: exercises every filter's prediction."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = ((x * 3 + y * 5) % 256).astype(np.uint8)
    out = np.stack([(base + 37 * i) % 256 for i in range(c)], axis=2).astype(np.uint8)
    noise = rng.randint(0, 32, size=out.shape).astype(np.uint8)
    return out + noise  # uint8 wrap is fine — content just needs variety


# --------------------------------------------------------------------------
# Direction 1: libpng-encoded streams (real adaptive filters) -> our decoder
# --------------------------------------------------------------------------


@requires_libpng
@pytest.mark.parametrize(
    "fmt,channels",
    [(_FMT_GRAY, 1), (_FMT_GA, 2), (_FMT_RGB, 3), (_FMT_RGBA, 4)],
)
def test_decode_libpng_encoded(fmt, channels):
    arr = _grad(37, 23, channels, seed=fmt)
    data = libpng_write(arr, fmt)
    ours = decode_png_rgba(data)
    ref = libpng_rgba(data)
    np.testing.assert_array_equal(ours, ref)


@requires_libpng
def test_decode_libpng_encoded_colormap():
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 40, size=(29, 31, 1)).astype(np.uint8)
    img = _PngImage()
    img.version = _PNG_IMAGE_VERSION
    img.height, img.width = idx.shape[0], idx.shape[1]
    img.format = _FMT_RGB | _FLAG_COLORMAP
    img.colormap_entries = 40
    cmap = rng.randint(0, 256, size=(40, 3)).astype(np.uint8).tobytes()
    size = ctypes.c_size_t(0)
    ok = _lib.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0, idx.tobytes(), 0, cmap
    )
    assert ok, img.message
    buf = (ctypes.c_ubyte * size.value)()
    ok = _lib.png_image_write_to_memory(
        ctypes.byref(img), buf, ctypes.byref(size), 0, idx.tobytes(), 0, cmap
    )
    assert ok, img.message
    data = bytes(buf[: size.value])
    np.testing.assert_array_equal(decode_png_rgba(data), libpng_rgba(data))


# --------------------------------------------------------------------------
# Direction 2: our adversarial encoder -> libpng reference decode
# --------------------------------------------------------------------------


@requires_libpng
@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ctype", [0, 2, 4, 6])
def test_forced_filters_8bit(ctype, f):
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    arr = _grad(21, 17, ch, seed=10 * ctype + f)
    data = encode_png_adv(arr, ctype, 8, filters=f)
    np.testing.assert_array_equal(decode_png_rgba(data), libpng_rgba(data))


@requires_libpng
@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("ctype", [0, 3])
def test_subbyte_depths(ctype, depth):
    rng = np.random.RandomState(depth * 5 + ctype)
    maxv = (1 << depth) - 1
    arr = rng.randint(0, maxv + 1, size=(19, 13, 1)).astype(np.uint8)
    kw = {}
    if ctype == 3:
        kw["palette"] = rng.randint(0, 256, size=(maxv + 1, 3)).astype(np.uint8)
        kw["trns"] = bytes(rng.randint(0, 256, size=min(3, maxv + 1)).tolist())
    data = encode_png_adv(arr, ctype, depth, filters=[0, 1, 2, 3, 4], **kw)
    np.testing.assert_array_equal(decode_png_rgba(data), libpng_rgba(data))


@requires_libpng
def test_16bit_rgb_filters():
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 65536, size=(15, 11, 3)).astype(np.uint16)
    data = encode_png_adv(arr, 2, 16, filters=[4, 3, 2, 1, 0])
    ref16 = libpng_rgb16(data)
    ours = decode_png_rgba(data)
    # libpng LINEAR_RGB returns the raw 16-bit samples; our RGBA8 takes the
    # high byte — compare both: exact 16-bit path and the 8-bit reduction
    np.testing.assert_array_equal(ref16, arr)
    np.testing.assert_array_equal(ours[:, :, :3], (arr >> 8).astype(np.uint8))


@requires_libpng
@pytest.mark.parametrize(
    "ctype,depth",
    [(0, 1), (0, 8), (2, 8), (3, 4), (4, 8), (6, 8), (2, 16)],
)
def test_adam7_interlace(ctype, depth):
    rng = np.random.RandomState(ctype * 17 + depth)
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    maxv = (1 << depth) - 1
    dt = np.uint16 if depth == 16 else np.uint8
    kw = {}
    if ctype == 3:
        n = min(maxv + 1, 16)
        arr = rng.randint(0, n, size=(13, 9, ch)).astype(dt)
        kw["palette"] = rng.randint(0, 256, size=(n, 3)).astype(np.uint8)
    else:
        arr = rng.randint(0, maxv + 1, size=(13, 9, ch)).astype(dt)
    data = encode_png_adv(arr, ctype, depth, filters=[1, 0, 2, 4, 3], interlace=True, **kw)
    if depth == 16:
        np.testing.assert_array_equal(libpng_rgb16(data), arr)
        np.testing.assert_array_equal(
            decode_png_rgba(data)[:, :, :3], (arr >> 8).astype(np.uint8)
        )
    else:
        np.testing.assert_array_equal(decode_png_rgba(data), libpng_rgba(data))


@requires_libpng
def test_adam7_tiny_images_skip_empty_passes():
    # w,h < 8 leaves several Adam7 passes empty — both decoders must agree
    for h, w in [(1, 1), (2, 3), (5, 4), (7, 7), (8, 1)]:
        arr = _grad(h, w, 3, seed=h * 10 + w)
        data = encode_png_adv(arr, 2, 8, filters=[2, 1], interlace=True)
        np.testing.assert_array_equal(decode_png_rgba(data), libpng_rgba(data))


@requires_libpng
def test_trns_color_keys():
    # gray key
    g = np.arange(64, dtype=np.uint8).reshape(8, 8, 1) % 7
    data = encode_png_adv(g, 0, 8, filters=1, trns=struct.pack(">H", 3))
    np.testing.assert_array_equal(decode_png_rgba(data), libpng_rgba(data))
    # RGB key
    arr = _grad(9, 9, 3, seed=1)
    arr[2:4, 2:4] = (10, 20, 30)
    data = encode_png_adv(arr, 2, 8, filters=2, trns=struct.pack(">HHH", 10, 20, 30))
    np.testing.assert_array_equal(decode_png_rgba(data), libpng_rgba(data))


# --------------------------------------------------------------------------
# Contract + robustness (no libpng needed)
# --------------------------------------------------------------------------


def test_composite_over_white():
    arr = np.zeros((2, 2, 4), dtype=np.uint8)
    arr[..., :3] = 100
    arr[..., 3] = [[255, 128], [0, 64]]
    data = encode_png_adv(arr, 6, 8)
    out = decode_png_full(data)
    a = arr[..., 3:4].astype(np.uint16)
    want = ((100 * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)
    np.testing.assert_array_equal(out, np.repeat(want, 3, axis=2))


def test_crc_corruption_raises():
    data = bytearray(encode_png_adv(_grad(6, 6, 3), 2, 8))
    data[40] ^= 0xFF  # inside IHDR payload or its CRC region
    with pytest.raises(PngError):
        decode_png_rgba(bytes(data))


def test_decode_cap():
    data = encode_png_adv(_grad(32, 32, 3), 2, 8)
    with pytest.raises(PngError, match="cap"):
        decode_png_rgba(data, max_pixels=100)


def test_truncated_raises():
    data = encode_png_adv(_grad(6, 6, 3), 2, 8)
    with pytest.raises(PngError):
        decode_png_rgba(data[: len(data) // 2])


def _raw_chunk(tag: bytes, payload: bytes) -> bytes:
    import zlib as _z

    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", _z.crc32(tag + payload) & 0xFFFFFFFF)
    )


def test_zero_dimension_ihdr_raises():
    """Spec requires nonzero width/height; a crafted 0-width stream must be
    rejected (an empty decode slips past the max_pixels cap and NaNs the
    feature means downstream)."""
    import struct as _s
    import zlib as _z

    sig = b"\x89PNG\r\n\x1a\n"
    for w, h in ((0, 3), (3, 0)):
        ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        idat = _z.compress(b"\x00")
        data = (
            sig + _raw_chunk(b"IHDR", ihdr) + _raw_chunk(b"IDAT", idat)
            + _raw_chunk(b"IEND", b"")
        )
        with pytest.raises(PngError, match="zero image dimension"):
            decode_png_rgba(data)


def test_short_ihdr_raises_pngerror():
    """An IHDR payload shorter than the spec's 13 bytes must raise PngError,
    not struct.error."""
    sig = b"\x89PNG\r\n\x1a\n"
    data = sig + _raw_chunk(b"IHDR", b"\x00" * 8) + _raw_chunk(b"IEND", b"")
    with pytest.raises(PngError, match="bad IHDR length"):
        decode_png_rgba(data)


def test_imaging_dispatch_full_decoder():
    # the crawl-path decode_image('png') must handle real-web streams now
    from sher_look_spark.crawler import imaging

    arr = _grad(12, 10, 3, seed=5)
    data = encode_png_adv(arr, 2, 8, filters=[4, 3, 1])
    np.testing.assert_array_equal(imaging.decode_image(data, "png"), arr)
    # legacy filter-0 synth streams still decode identically
    legacy = imaging.encode_png(arr)
    np.testing.assert_array_equal(imaging.decode_image(legacy, "png"), arr)


def test_idat_deflate_bomb_bounded():
    # a 4x4 image whose IDAT inflates to 10 MB must decode using only the
    # h*(stride+1) bytes the geometry needs — excess inflation is never run
    from sher_look_spark.functions.pngcodec import PNG_SIG, _chunk

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x01" * 12 for _ in range(4))
    bomb = zlib.compress(raw + b"\x00" * (10 * 1024 * 1024), 9)
    data = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b"")
    out = decode_png_full(data)
    assert out.shape == (4, 4, 3) and (out == 1).all()
