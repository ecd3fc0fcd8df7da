"""Image payload codec + perceptual hashing (graft payload: image+caption).

The container has no image libraries (no PIL/opencv), so the engine ships
pure-numpy codecs built from the public specs: full PNG decode (all row
filters, color types, depths, Adam7 — functions/pngcodec.py), JPEG (T.81),
WebP (VP8L + VP8), GIF, plus raw-RGB containers. The Spark-side plumbing —
binary columns, Arrow batch decode, PSNR/phash checks — is the real thing.
encode_png below stays the synth web's fast writer (filter-0 RGB8).

Payload invariant (BASELINE.json input_hint): decoded-pixel PSNR >= 40 dB
(infinite for our lossless codec) + exact caption equality.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 array as a valid RGB8 PNG (filter 0 rows)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected HxWx3 uint8 array")
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Decode any legal PNG stream to HxWx3 RGB8 (alpha over white).

    Real-web PNGs use adaptive row filters 1-4, palette/gray/alpha color
    types, sub-byte and 16-bit depths and occasionally Adam7 interlace —
    the full decoder lives in functions/pngcodec.py (validated bit-exact
    against the system libpng16 in tests/test_png.py)."""
    from sher_look_spark.functions.pngcodec import decode_png_full

    return decode_png_full(data, max_pixels=max_pixels)


def encode_raw(arr: np.ndarray) -> bytes:
    """Headerful raw-RGB container: 'RAW0' + H + W + pixels."""
    h, w, _ = arr.shape
    return b"RAW0" + struct.pack(">II", h, w) + arr.tobytes()


def decode_raw(data: bytes) -> np.ndarray:
    if data[:4] != b"RAW0":
        raise ValueError("not a RAW0 payload")
    h, w = struct.unpack(">II", data[4:12])
    return np.frombuffer(data[12:], dtype=np.uint8).reshape(h, w, 3)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        # full decoder: the cap bounds the serial Average/Paeth unfilter
        # loops against oversized untrusted payloads, same as webp/gif
        return decode_png(data, max_pixels=1 << 20)
    if fmt == "raw":
        return decode_raw(data)
    if fmt in ("jpeg", "jpg"):
        # baseline JPEG — the format that dominates real crawl payloads —
        # via the pure-numpy T.81 codec (functions/jpegcodec.py)
        from sher_look_spark.functions.jpegcodec import decode_jpeg

        return decode_jpeg(bytes(data))
    if fmt == "webp":
        # lossless WebP (VP8L, RFC 9649) via functions/webpcodec.py; lossy
        # VP8 keyframes (RFC 6386) via functions/vp8codec.py. The pixel
        # cap bounds the pure-Python decode loops against oversized
        # untrusted payloads in the fetch path (~1 Mpx ≈ 1024x1024).
        from sher_look_spark.functions.webpcodec import decode_webp

        return decode_webp(bytes(data), max_pixels=1 << 20)
    if fmt == "gif":
        # GIF 87a/89a (functions/gifcodec.py): first frame for the image
        # tier; animated streams expose all frames via sample_frames
        from sher_look_spark.functions.gifcodec import decode_gif

        return decode_gif(bytes(data), max_pixels=1 << 20)
    if fmt == "bmp":
        from sher_look_spark.functions.icobmp import decode_bmp

        return decode_bmp(bytes(data), max_pixels=1 << 20)
    if fmt == "ico":
        # favicon container: best entry, DIB (+AND mask) or embedded PNG
        from sher_look_spark.functions.icobmp import decode_ico

        return decode_ico(bytes(data), max_pixels=1 << 20)
    raise NotImplementedError(f"unsupported payload format: {fmt}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    if a.shape != b.shape:
        raise ValueError("shape mismatch")
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(arr: np.ndarray) -> int:
    """Average-hash: 8x8 block-mean of the grayscale image, thresholded by
    its mean -> 64-bit signed int (fits the input_hint's phash:int64)."""
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > blocks.mean()).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    # two's-complement into signed int64
    return val - (1 << 64) if val >= (1 << 63) else val
