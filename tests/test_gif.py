"""GIF codec tests — functions/gifcodec.py.

Layers: encode/decode roundtrips (the LZW + structure path), hand-built
spec streams (interlace, transparency, multi-frame compositing, OOB
palette indices), typed-error cases, and a libgif oracle battery (skipped
if the system library is absent) that has giflib decode OUR encoder's
streams and compares rasters — independent validation of the LZW layer.
"""
from __future__ import annotations

import ctypes
import struct

import numpy as np
import pytest

from sher_look_spark.functions.gifcodec import (
    GifError,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)

_LIBGIF = "/usr/lib/x86_64-linux-gnu/libgif.so.7"


def _rand_paletted(seed: int, h: int, w: int, ncol: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    palette = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    return palette[rng.integers(0, ncol, (h, w))]


# -------------------------------------------------------------- roundtrip
@pytest.mark.parametrize("seed,h,w,ncol,interlace", [
    (1, 1, 1, 1, False),
    (2, 7, 13, 2, False),
    (3, 33, 47, 17, False),
    (4, 33, 47, 17, True),     # interlaced file order
    (5, 64, 64, 200, False),
    (6, 9, 9, 5, True),
])
def test_roundtrip_exact(seed, h, w, ncol, interlace):
    img = _rand_paletted(seed, h, w, ncol)
    data = encode_gif(img, interlace=interlace)
    assert data[:6] == b"GIF89a"
    assert np.array_equal(decode_gif(data), img)


def test_full_256_color_palette():
    pal = np.arange(256, dtype=np.uint8)
    img = np.stack([pal, 255 - pal, pal ^ 0x55], -1).reshape(16, 16, 3)
    assert np.array_equal(decode_gif(encode_gif(img)), img)
    over = np.zeros((257, 1, 3), np.uint8)
    over[:, 0, 0] = np.arange(257) % 256
    over[256, 0, 1] = 9
    with pytest.raises(GifError, match="palette"):
        encode_gif(over)


def test_typed_errors():
    with pytest.raises(GifError, match="signature"):
        decode_gif(b"NOTAGIF" + b"\x00" * 16)
    with pytest.raises(GifError):
        decode_gif(b"GIF89a" + b"\x00" * 4)  # truncated header
    img = _rand_paletted(7, 8, 8, 4)
    with pytest.raises(GifError, match="cap"):
        decode_gif(encode_gif(img), max_pixels=8 * 8 - 1)
    decode_gif(encode_gif(img), max_pixels=64)  # exact bound passes


# ----------------------------------------------------- hand-built streams
def _screen(w, h, pal, bg=0):
    bits = max(1, (len(pal) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), bg, 0)
    p = np.zeros((1 << bits, 3), np.uint8)
    p[: len(pal)] = pal
    out += p.tobytes()
    return out, bits


def _image_block(left, top, w, h, indices, min_code, interlace=False):
    out = bytearray(struct.pack("<BHHHHB", 0x2C, left, top, w, h,
                                0x40 if interlace else 0))
    out.append(min_code)
    lzw = _lzw_encode(min_code, np.asarray(indices, np.uint8).reshape(-1))
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return out


def test_transparency_composites_over_canvas():
    """Frame 2's transparent pixels must show frame 1 underneath (GCE
    transparency, disposal 1 = leave in place)."""
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    out, bits = _screen(2, 2, pal, bg=0)
    # frame 1: all green
    out += _image_block(0, 0, 2, 2, [1, 1, 1, 1], 2)
    # GCE: transparent index 2, disposal 1
    out += bytes([0x21, 0xF9, 4, (1 << 2) | 1, 0, 0, 2, 0])
    # frame 2: blue at top-left, rest transparent
    out += _image_block(0, 0, 2, 2, [0, 2, 2, 2], 2)  # index 0 = red? no:
    out.append(0x3B)
    frames = decode_gif_frames(bytes(out))
    assert len(frames) == 2
    assert (frames[0] == np.array([0, 255, 0])).all()
    # frame 2: pixel (0,0) is palette[0] (red), others keep green
    assert tuple(frames[1][0, 0]) == (255, 0, 0)
    assert tuple(frames[1][0, 1]) == (0, 255, 0)
    assert tuple(frames[1][1, 1]) == (0, 255, 0)


def test_disposal_restore_background():
    """Disposal 2 clears the frame's region to the background color before
    the next frame composites."""
    pal = [(9, 9, 9), (200, 10, 10)]
    out, bits = _screen(2, 1, pal, bg=0)
    out += bytes([0x21, 0xF9, 4, (2 << 2), 0, 0, 0, 0])  # disposal 2
    out += _image_block(0, 0, 1, 1, [1], 2)  # left pixel red
    # second frame: right pixel red, left untouched (shows restored bg)
    out += _image_block(1, 0, 1, 1, [1], 2)
    out.append(0x3B)
    frames = decode_gif_frames(bytes(out))
    assert tuple(frames[0][0, 0]) == (200, 10, 10)
    assert tuple(frames[1][0, 0]) == (9, 9, 9)     # restored to bg
    assert tuple(frames[1][0, 1]) == (200, 10, 10)


def test_oob_palette_index_handling():
    # index 3 with a 3-color palette lands on the zero-padded 4th slot;
    # an index past the table entirely clamps to the last entry
    pal = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]
    out, bits = _screen(2, 1, pal)
    out += _image_block(0, 0, 2, 1, [1, 3], 2)
    out.append(0x3B)
    img = decode_gif(bytes(out))
    assert tuple(img[0, 0]) == (40, 50, 60)
    assert tuple(img[0, 1]) == (0, 0, 0)  # padded palette entry


def test_sample_frames_over_gif(spark):
    """Animated GIF rows flow through sample_frames: composited frames out
    as PNG rows, every k-th."""
    from sher_look_spark.crawler.imaging import decode_png
    from sher_look_spark.operators.multimodal import sample_frames

    pal = [(0, 0, 0), (255, 255, 255), (128, 0, 128)]
    out, bits = _screen(3, 3, pal)
    for f in range(4):
        out += _image_block(0, 0, 3, 3, [(f + i) % 3 for i in range(9)], 2)
    out.append(0x3B)
    df = spark.createDataFrame(
        [("g1", bytes(out), "gif")], "video_id string, bytes binary, fmt string"
    )
    rows = {r.frame_idx: r for r in sample_frames(df, every=2).collect()}
    assert set(rows) == {0, 2}
    f0 = decode_png(bytes(rows[0].bytes))
    assert f0.shape == (3, 3, 3) and tuple(f0[0, 0]) == (0, 0, 0)
    f2 = decode_png(bytes(rows[2].bytes))
    assert tuple(f2[0, 0]) == (128, 0, 128)


def test_imaging_dispatch_decodes_gif():
    from sher_look_spark.crawler.imaging import decode_image

    img = _rand_paletted(11, 12, 18, 7)
    assert np.array_equal(decode_image(encode_gif(img), "gif"), img)


# ---------------------------------------------------------- libgif oracle
def _load_libgif():
    try:
        lib = ctypes.CDLL(_LIBGIF)
    except OSError:
        return None
    return lib


_lib = _load_libgif()
needs_libgif = pytest.mark.skipif(
    _lib is None, reason="system giflib not available (hand-built spec "
    "streams still pin the format)")

_GifWord = ctypes.c_int


class _GifImageDesc(ctypes.Structure):
    _fields_ = [("Left", _GifWord), ("Top", _GifWord), ("Width", _GifWord),
                ("Height", _GifWord), ("Interlace", ctypes.c_bool),
                ("ColorMap", ctypes.c_void_p)]


class _SavedImage(ctypes.Structure):
    _fields_ = [("ImageDesc", _GifImageDesc),
                ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.c_void_p)]


class _GifFileType(ctypes.Structure):
    _fields_ = [("SWidth", _GifWord), ("SHeight", _GifWord),
                ("SColorResolution", _GifWord), ("SBackGroundColor", _GifWord),
                ("AspectByte", ctypes.c_ubyte), ("SColorMap", ctypes.c_void_p),
                ("ImageCount", ctypes.c_int), ("Image", _GifImageDesc),
                ("SavedImages", ctypes.POINTER(_SavedImage)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.c_void_p), ("Error", ctypes.c_int),
                ("UserData", ctypes.c_void_p), ("Private", ctypes.c_void_p)]


_READFUNC = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(_GifFileType),
                             ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int)


def _libgif_first_raster(data: bytes):
    _lib.DGifOpen.restype = ctypes.POINTER(_GifFileType)
    _lib.DGifOpen.argtypes = [ctypes.c_void_p, _READFUNC,
                              ctypes.POINTER(ctypes.c_int)]
    _lib.DGifSlurp.argtypes = [ctypes.POINTER(_GifFileType)]
    state = {"pos": 0}

    def read(gf, buf, count):
        n = min(count, len(data) - state["pos"])
        ctypes.memmove(buf, data[state["pos"] : state["pos"] + n], n)
        state["pos"] += n
        return n

    cb = _READFUNC(read)
    err = ctypes.c_int(0)
    gf = _lib.DGifOpen(None, cb, ctypes.byref(err))
    assert gf, f"DGifOpen error {err.value}"
    assert _lib.DGifSlurp(gf) == 1
    g = gf.contents
    img = g.SavedImages[0]
    w, h = img.ImageDesc.Width, img.ImageDesc.Height
    raster = np.ctypeslib.as_array(img.RasterBits, shape=(h * w,)).copy()
    return raster.reshape(h, w), g.SWidth, g.SHeight, bool(img.ImageDesc.Interlace)


@needs_libgif
@pytest.mark.parametrize("seed,h,w,ncol,interlace", [
    (21, 30, 41, 11, False),
    (22, 30, 41, 11, True),
    (23, 64, 64, 256, False),
    (24, 5, 5, 2, False),
])
def test_encoder_streams_validate_via_libgif(seed, h, w, ncol, interlace):
    """giflib must decode our encoder's streams to exactly our palette
    indices (this giflib's DGifSlurp deinterlaces, so the comparison is in
    display order for interlaced streams too)."""
    img = _rand_paletted(seed, h, w, ncol)
    data = encode_gif(img, interlace=interlace)
    raster, sw, sh, gil = _libgif_first_raster(data)
    assert (sw, sh, gil) == (w, h, interlace)
    _, inverse = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
    assert np.array_equal(raster, inverse.reshape(h, w))
    # and our own decoder agrees with the pixels
    assert np.array_equal(decode_gif(data), img)
