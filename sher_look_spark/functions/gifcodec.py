"""GIF (87a/89a) codec, pure numpy + stdlib — decoder + subset encoder.

Built from the PUBLIC specification (GIF89a, CompuServe 1990 / W3C note):
logical screen descriptor, global/local color tables, image descriptors,
interlacing, graphic-control extensions (transparency, disposal), and the
variable-code-width LZW entropy layer (LSB-first bit packing, clear/EOI
codes, 12-bit dictionary cap).

Decode supports multi-frame (animated) streams: frames are composited onto
the logical screen honoring disposal methods 1 (leave) and 2 (restore to
background); method 3 (restore to previous) is treated as 2 — a visual
approximation real tooling commonly takes. Transparent pixels inherit the
canvas underneath (background color for the first frame).

The subset encoder writes a single-frame GIF89a with a global color table
built from the image's unique colors (<= 256 required — the format's own
limit; callers quantize first if needed) and real LZW compression. It
exists to produce deterministic, spec-conformant fixtures; decode(encode(x))
round-trips exactly.

Reference-parity note: the reference crawler (sher-look) stores payload
bytes verbatim; decoding image payloads for the mm tier is this repo's
extension per the image+caption input contract.
"""
from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


# ------------------------------------------------------------------ LZW


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF LZW -> palette indices (length n_pixels; short streams pad 0)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.zeros(n_pixels, dtype=np.uint8)
    pos = 0

    # bit reader state (LSB-first)
    acc = 0
    nbits = 0
    di = 0
    code_size = min_code_size + 1
    # dictionary: list of byte sequences; None marks unassigned
    table: list[bytes | None] = [bytes([i]) for i in range(clear)] + [None, None]
    prev: bytes | None = None

    while pos < n_pixels:
        while nbits < code_size:
            if di >= len(data):
                return out  # truncated stream: decoded prefix stands
            acc |= data[di] << nbits
            nbits += 8
            di += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [None, None]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise GifError("invalid LZW code")
        n = min(len(entry), n_pixels - pos)
        out[pos : pos + n] = np.frombuffer(entry[:n], dtype=np.uint8)
        pos += n
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Palette indices -> GIF LZW bytes (with clear/EOI, LSB-first)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, code_size)
    w = b""
    for b in indices.astype(np.uint8).tobytes():
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:  # dictionary full: reset (keeps the encoder simple + valid)
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------- decoder

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    rows = np.empty(h, dtype=np.int64)
    k = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            rows[y] = k
            k += 1
    return idx[rows]


def decode_gif_frames(data: bytes, max_pixels: int | None = None):
    """GIF bytes -> list of (h, w, 3) uint8 RGB frames (composited)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF (bad signature)")
    if len(data) < 13:
        raise GifError("truncated header")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    if sw == 0 or sh == 0:
        raise GifError("zero logical screen dimension")
    if max_pixels is not None and sw * sh > max_pixels:
        raise GifError(f"GIF dims {sw}x{sh} exceed cap {max_pixels}")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    if gct is not None and bg < len(gct):
        canvas = np.tile(gct[bg].astype(np.uint8), (sh, sw, 1)).copy()
        bg_rgb = gct[bg].astype(np.uint8)
    else:
        canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
        bg_rgb = np.zeros(3, dtype=np.uint8)

    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                sz = data[pos]
                gce = data[pos + 1 : pos + 1 + sz]
                flags = gce[0]
                disposal = (flags >> 2) & 0x07
                transparent = gce[3] if flags & 0x01 else -1
                pos += 1 + sz
            # skip remaining sub-blocks (and the whole body of other exts)
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1  # terminator
        elif block == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
            pos += 9
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise GifError("image with no color table")
            min_code = data[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise GifError("bad LZW minimum code size")
            chunks = []
            while pos < len(data) and data[pos] != 0:
                sz = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + sz])
                pos += 1 + sz
            pos += 1  # block terminator
            idx = _lzw_decode(min_code, b"".join(chunks), w * h).reshape(h, w)
            if ipacked & 0x40:
                idx = _deinterlace(idx, h)
            safe = np.minimum(idx, len(pal) - 1)  # OOB indices clamp
            rgb = pal[safe]
            y1, x1 = min(top + h, sh), min(left + w, sw)
            ch, cw = y1 - top, x1 - left
            if ch > 0 and cw > 0:
                region = canvas[top:y1, left:x1]
                sub_rgb = rgb[:ch, :cw]
                if transparent >= 0:
                    mask = (idx[:ch, :cw] != transparent)[..., None]
                    region[...] = np.where(mask, sub_rgb, region)
                else:
                    region[...] = sub_rgb
            frames.append(canvas.copy())
            if disposal == 2 or disposal == 3:
                if ch > 0 and cw > 0:
                    canvas[top:y1, left:x1] = bg_rgb
            transparent = -1
            disposal = 0
        else:
            raise GifError(f"unknown block 0x{block:02x}")
    if not frames:
        raise GifError("no image data")
    return frames


def decode_gif(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    """First (or only) frame as (h, w, 3) uint8 RGB."""
    return decode_gif_frames(data, max_pixels=max_pixels)[0]


# --------------------------------------------------------------- encoder


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """HxWx3 uint8 RGB (<= 256 unique colors) -> single-frame GIF89a."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise GifError("encode_gif expects HxWx3 uint8")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise GifError(f"{len(colors)} unique colors exceed the GIF palette")
    # palette size: power of two >= max(2, n)
    bits = max(1, int(len(colors) - 1).bit_length())
    n_pal = 1 << bits
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        order = []
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, h, step))
        idx_stream = idx[order]
    else:
        idx_stream = idx
    min_code = max(2, bits)
    lzw = _lzw_encode(min_code, idx_stream.reshape(-1))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)
