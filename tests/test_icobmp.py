"""BMP/ICO decoder tests against the system gdk-pixbuf loaders.

Oracle: libgdk_pixbuf-2.0 via ctypes (libpixbufloader-bmp / -ico), the same
independent-reference pattern the GIF (giflib), PNG (libpng16) and WebP
(libwebp) suites use. Our encoders' streams must decode identically through
gdk-pixbuf, and gdk-readable fixtures must decode identically through us.
"""

from __future__ import annotations

import ctypes
import struct

import numpy as np
import pytest

from sher_look_spark.functions.icobmp import (
    BmpError,
    decode_bmp,
    decode_ico,
    encode_bmp,
    encode_ico,
)

# ---------------------------------------------------------------- gdk oracle


# probe at import time so gdk-parametrized tests SKIP (not ERROR) on hosts
# without gdk-pixbuf — same pattern as test_png.py's requires_libpng
try:
    _gdk_probe = ctypes.CDLL("libgdk_pixbuf-2.0.so.0")
except OSError:  # pragma: no cover
    _gdk_probe = None


class _Gdk:
    def __init__(self) -> None:
        gp = ctypes.CDLL("libgdk_pixbuf-2.0.so.0")
        gp.gdk_pixbuf_loader_new.restype = ctypes.c_void_p
        gp.gdk_pixbuf_loader_write.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        gp.gdk_pixbuf_loader_close.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)
        ]
        gp.gdk_pixbuf_loader_get_pixbuf.argtypes = [ctypes.c_void_p]
        gp.gdk_pixbuf_loader_get_pixbuf.restype = ctypes.c_void_p
        for f in ("get_width", "get_height", "get_rowstride", "get_n_channels"):
            fn = getattr(gp, "gdk_pixbuf_" + f)
            fn.argtypes = [ctypes.c_void_p]
            fn.restype = ctypes.c_int
        gp.gdk_pixbuf_get_pixels.argtypes = [ctypes.c_void_p]
        gp.gdk_pixbuf_get_pixels.restype = ctypes.POINTER(ctypes.c_ubyte)
        self.gp = gp

    def decode_rgb_over_white(self, data: bytes) -> np.ndarray:
        gp = self.gp
        err = ctypes.c_void_p()
        ld = gp.gdk_pixbuf_loader_new()
        ok = gp.gdk_pixbuf_loader_write(ld, data, len(data), ctypes.byref(err))
        ok2 = gp.gdk_pixbuf_loader_close(ld, ctypes.byref(err))
        pb = gp.gdk_pixbuf_loader_get_pixbuf(ld)
        if not (ok and ok2 and pb):
            raise RuntimeError("gdk-pixbuf failed to decode")
        w, h = gp.gdk_pixbuf_get_width(pb), gp.gdk_pixbuf_get_height(pb)
        rs, nc = gp.gdk_pixbuf_get_rowstride(pb), gp.gdk_pixbuf_get_n_channels(pb)
        buf = bytes(gp.gdk_pixbuf_get_pixels(pb)[: rs * h])
        arr = np.frombuffer(buf, dtype=np.uint8).reshape(h, rs)[:, : w * nc]
        arr = arr.reshape(h, w, nc)
        if nc == 4:
            rgb = arr[:, :, :3].astype(np.uint16)
            a = arr[:, :, 3:4].astype(np.uint16)
            return ((rgb * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)
        return arr.copy()


@pytest.fixture(scope="module")
def gdk() -> _Gdk:
    if _gdk_probe is None:
        pytest.skip("system gdk-pixbuf not available")
    return _Gdk()


def _rand_rgb(h: int, w: int, seed: int = 0) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


# --------------------------------------------------------------------- BMP


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp24_vs_gdk(gdk, top_down):
    arr = _rand_rgb(11, 7, seed=1)
    data = encode_bmp(arr, 24, top_down=top_down)
    np.testing.assert_array_equal(decode_bmp(data), arr)
    np.testing.assert_array_equal(gdk.decode_rgb_over_white(data), arr)


def test_bmp32_birgb_vs_gdk(gdk):
    arr = _rand_rgb(6, 9, seed=2)
    data = encode_bmp(arr, 32)
    np.testing.assert_array_equal(decode_bmp(data), arr)
    np.testing.assert_array_equal(gdk.decode_rgb_over_white(data), arr)


def test_bmp32_bitfields_alpha(gdk):
    arr = _rand_rgb(5, 5, seed=3)
    alpha = np.random.default_rng(4).integers(0, 256, (5, 5), dtype=np.uint8)
    data = encode_bmp(arr, 32, alpha=alpha)
    a = alpha[:, :, None].astype(np.int32)
    want = ((arr.astype(np.int32) * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)
    np.testing.assert_array_equal(decode_bmp(data), want)


def test_bmp16_555_vs_gdk(gdk):
    arr = (_rand_rgb(8, 6, seed=5) & 0xF8).astype(np.uint8)  # representable in 555
    data = encode_bmp(arr, 16)
    got = decode_bmp(data)
    ref = gdk.decode_rgb_over_white(data)
    np.testing.assert_array_equal(got, ref)
    # 5-bit channels round-trip within scaling error
    assert int(np.abs(got.astype(int) - arr.astype(int)).max()) <= 7


def test_bmp8_palette_vs_gdk(gdk):
    pal = _rand_rgb(1, 200, seed=6)[0]
    idx = np.random.default_rng(7).integers(0, 200, (9, 13), dtype=np.uint8)
    data = encode_bmp(idx, 8, palette=pal)
    np.testing.assert_array_equal(decode_bmp(data), pal[idx])
    np.testing.assert_array_equal(gdk.decode_rgb_over_white(data), pal[idx])


@pytest.mark.parametrize("bpp", [1, 4])
def test_bmp_subbyte_palette_vs_gdk(gdk, bpp):
    n = 1 << bpp
    pal = _rand_rgb(1, n, seed=8 + bpp)[0]
    idx = np.random.default_rng(9).integers(0, n, (10, 11), dtype=np.uint8)
    data = encode_bmp(idx, bpp, palette=pal)
    np.testing.assert_array_equal(decode_bmp(data), pal[idx])
    np.testing.assert_array_equal(gdk.decode_rgb_over_white(data), pal[idx])


def test_bmp_rle8_vs_gdk(gdk):
    pal = _rand_rgb(1, 16, seed=10)[0]
    rng = np.random.default_rng(11)
    # runs of repeated values so both RLE modes (runs + absolute) appear
    idx = np.repeat(rng.integers(0, 16, (7, 5), dtype=np.uint8), 3, axis=1)[:, :13]
    data = encode_bmp(idx, 8, palette=pal, rle=True)
    np.testing.assert_array_equal(decode_bmp(data), pal[idx])
    np.testing.assert_array_equal(gdk.decode_rgb_over_white(data), pal[idx])


def test_bmp_rle8_delta_and_eol():
    # hand-built stream: row 0 = two literal pixels, delta skip, EOL, EOB;
    # skipped pixels stay palette index 0
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    w, h = 6, 2
    rle = bytes(
        [2, 1]  # run: 2x index 1
        + [0, 2, 2, 1]  # delta: x+=2, y+=1
        + [3, 2]  # run: 3x index 2 (lands on row 1, x=4.. clipped at w)
        + [0, 1]  # end of bitmap
    )
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(rle), 0, 0, 3, 0)
    pal_bytes = np.hstack([pal[:, ::-1], np.zeros((3, 1), np.uint8)]).tobytes()
    off = 14 + 40 + len(pal_bytes)
    data = b"BM" + struct.pack("<IHHI", off + len(rle), 0, 0, off) + dib + pal_bytes + rle
    got = decode_bmp(data)
    # RLE y counts from the BOTTOM row; delta moved to row 1 (=image row 0)
    want = np.zeros((h, w, 3), dtype=np.uint8)
    want[1, 0] = want[1, 1] = [255, 0, 0]
    want[0, 4] = want[0, 5] = [0, 255, 0]
    np.testing.assert_array_equal(got, want)


def test_bmp_core_header():
    # BITMAPCOREHEADER (12 bytes, 3-byte palette entries, always 2^bpp long)
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[0], pal[1] = [10, 20, 30], [40, 50, 60]
    idx = np.array([[0, 1, 1], [1, 0, 0]], dtype=np.uint8)
    w, h = 3, 2
    stride = ((w * 8 + 31) // 32) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = idx[::-1]
    core = struct.pack("<IHHHH", 12, w, h, 1, 8)
    pal_bytes = pal[:, ::-1].tobytes()
    off = 14 + 12 + len(pal_bytes)
    data = (
        b"BM" + struct.pack("<IHHI", off + rows.nbytes, 0, 0, off)
        + core + pal_bytes + rows.tobytes()
    )
    np.testing.assert_array_equal(decode_bmp(data), pal[idx])


def test_bmp_decode_cap_and_garbage():
    arr = _rand_rgb(40, 40, seed=12)
    data = encode_bmp(arr, 24)
    with pytest.raises(BmpError, match="cap"):
        decode_bmp(data, max_pixels=100)
    with pytest.raises(BmpError):
        decode_bmp(b"BM" + b"\x00" * 10)
    with pytest.raises(BmpError):
        decode_bmp(b"not a bmp at all")


def test_bmp_truncated_header_body_raises_bmperror():
    """A 40-byte BITMAPINFOHEADER whose body is cut off must raise BmpError,
    not leak struct.error through the module's declared error boundary."""
    data = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + struct.pack("<I", 40) + b"\x00" * 8
    with pytest.raises(BmpError):
        decode_bmp(data)


def test_bmp_rle8_run_overflowing_row_clips():
    """Consecutive RLE8 runs overflowing the row width must clip (or raise
    BmpError), never crash with a raw numpy broadcast ValueError."""
    w, h = 4, 2
    # palette: 2 entries; rows bottom-up; run of 3 then run of 4 on a 4-px row
    rle = bytes([3, 1, 4, 0, 0, 0, 3, 1, 4, 0, 0, 1])  # two rows, EOL, EOB
    pal = bytes([0, 0, 0, 0, 255, 255, 255, 0])
    hdr40 = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(rle), 0, 0, 2, 0)
    off = 14 + 40 + len(pal)
    data = b"BM" + struct.pack("<IHHI", off + len(rle), 0, 0, off) + hdr40 + pal + rle
    try:
        out = decode_bmp(data)
        assert out.shape[:2] == (h, w)  # clipped decode, no crash
    except BmpError:
        pass  # rejecting malformed RLE is equally acceptable
    except ValueError as e:  # pragma: no cover
        raise AssertionError(f"raw numpy error leaked: {e}") from e


# --------------------------------------------------------------------- ICO


def test_ico_dib_entry_vs_gdk(gdk):
    arr = _rand_rgb(16, 16, seed=13)
    alpha = np.where(np.arange(16)[:, None] + np.arange(16)[None, :] < 16, 255, 0).astype(np.uint8)
    data = encode_ico([(arr, alpha)])
    got = decode_ico(data)
    want = np.where(alpha[:, :, None] == 255, arr, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(gdk.decode_rgb_over_white(data), want)


def test_ico_png_entry():
    # gdk-pixbuf's ico loader rejects Vista-style PNG-compressed entries
    # (long-standing limitation), so no cross-check here; the embedded PNG
    # stream itself is libpng-validated by tests/test_png.py
    arr = _rand_rgb(24, 24, seed=14)
    data = encode_ico([(arr, None)], png_entries=True)
    np.testing.assert_array_equal(decode_ico(data), arr)
    alpha = np.tile(np.array([0, 255], dtype=np.uint8), 288).reshape(24, 24)
    data2 = encode_ico([(arr, alpha)], png_entries=True)
    want = np.where(alpha[:, :, None] == 255, arr, 255).astype(np.uint8)
    np.testing.assert_array_equal(decode_ico(data2), want)


def test_ico_picks_largest_entry():
    small = _rand_rgb(8, 8, seed=15)
    big = _rand_rgb(32, 32, seed=16)
    data = encode_ico([(small, None), (big, None)])
    got = decode_ico(data)
    assert got.shape == (32, 32, 3)
    np.testing.assert_array_equal(got, big)


def test_ico_garbage_raises():
    with pytest.raises(BmpError):
        decode_ico(b"\x00\x00\x02\x00\x01\x00")  # type 2 = CUR, not ICO
    with pytest.raises(BmpError):
        decode_ico(b"xx")


def test_imaging_dispatch_ico_bmp():
    from sher_look_spark.crawler import imaging

    arr = _rand_rgb(10, 10, seed=17)
    np.testing.assert_array_equal(imaging.decode_image(encode_bmp(arr, 24), "bmp"), arr)
    np.testing.assert_array_equal(imaging.decode_image(encode_ico([(arr, None)]), "ico"), arr)
