"""BMP (Windows DIB) + ICO (favicon container) decoders, pure numpy.

Favicons are the one image class every real crawl fetches for every host
(`/favicon.ico`, `<link rel="icon">`), and they ship as ICO containers whose
entries are either raw DIBs (BITMAPINFOHEADER with doubled height and a
1-bit AND transparency mask) or, since Vista, embedded PNG streams. Plain
BMPs also appear in the long tail of legacy pages. This module decodes:

- BMP: BITMAPFILEHEADER + any of BITMAPCOREHEADER (12) / BITMAPINFOHEADER
  (40) / V2-V5 (52/56/108/124) DIBs; bit depths 1/4/8 (palette), 16 (555
  default or BI_BITFIELDS masks), 24, 32 (opaque BI_RGB or BI_BITFIELDS
  with alpha); BI_RLE8 / BI_RLE4 compression incl. delta escapes; bottom-up
  and top-down (negative height) row order;
- ICO: ICONDIR image type 1, best-entry selection (largest area, then
  deepest), per-entry dispatch to the PNG decoder (functions/pngcodec.py)
  or to the DIB path with the AND mask applied as 1-bit alpha.

Output contract matches the imaging tier: HxWx3 uint8 RGB, alpha composited
over opaque white. Decoders are validated against the system gdk-pixbuf
loaders (libpixbufloader-bmp/ico) via ctypes in tests/test_icobmp.py, the
same pattern the GIF/PNG/WebP suites use with giflib/libpng/libwebp.

Reference parity: the reference crawler stores favicon bytes opaquely and
leans on JVM ImageIO for pixels; here decode happens in numpy inside the
Arrow-batched multimodal UDFs (operators/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    pass


def _mask_shift(mask: int) -> tuple[int, int]:
    """(right-shift, bit-width) of a contiguous channel mask."""
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    width = (mask >> shift).bit_length()
    return shift, width


def _scale_to_8(vals: np.ndarray, width: int) -> np.ndarray:
    if width == 0:
        return np.zeros_like(vals, dtype=np.uint8)
    if width >= 8:
        return (vals >> (width - 8)).astype(np.uint8)
    if width >= 4:
        # bit replication — the convention BMP decoders (incl. gdk-pixbuf)
        # use for 5/6-bit channels; differs from round-scaling by ±1
        v = vals.astype(np.uint16)
        return ((v << (8 - width)) | (v >> (2 * width - 8))).astype(np.uint8)
    maxv = (1 << width) - 1
    return (vals.astype(np.uint32) * 255 // maxv).astype(np.uint8)


def _unrle(data: bytes, w: int, h: int, four_bit: bool) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 -> (h, w) palette indices, bottom-up rows."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if four_bit:
                pair = [(val >> 4) & 0xF, val & 0xF]
                run = [pair[k % 2] for k in range(cnt)]
            else:
                run = [val] * cnt
            end = min(x + cnt, w)
            if y < h and x < w:  # runs overflowing the row clip, not crash
                out[y, x:end] = run[: end - x]
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if i + 1 >= n:
                break
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # absolute mode: `val` literal pixels, padded to 16-bit
            cnt = val
            if four_bit:
                nbytes = (cnt + 1) // 2
                chunk = data[i : i + nbytes]
                pix = []
                for b in chunk:
                    pix.append((b >> 4) & 0xF)
                    pix.append(b & 0xF)
                pix = pix[:cnt]
                i += nbytes + (nbytes % 2)
            else:
                pix = list(data[i : i + cnt])
                i += cnt + (cnt % 2)
            end = min(x + cnt, w)
            if y < h and x < w:  # runs overflowing the row clip, not crash
                out[y, x:end] = pix[: end - x]
            x += cnt
    return out[::-1]  # RLE rows are stored bottom-up


def _decode_dib(
    data: bytes, off: int, *, ico_entry: bool = False,
    max_pixels: int | None = None,
) -> np.ndarray:
    """Decode a DIB (headers + palette + pixels) at ``off`` -> (h, w, 4) RGBA8.

    ``ico_entry``: biHeight counts XOR+AND blocks (doubled) and a 1-bit AND
    mask follows the XOR pixels; no BITMAPFILEHEADER precedes the DIB.
    """
    if off + 12 > len(data):
        raise BmpError("truncated DIB header")
    (hsize,) = struct.unpack_from("<I", data, off)
    # the declared header must fit entirely before any unpack_from below —
    # a truncated header would otherwise surface as struct.error, breaking
    # the module's BmpError boundary for untrusted favicon bytes
    if off + hsize > len(data):
        raise BmpError("truncated DIB header body")
    top_down = False
    masks = None
    palette_entry = 4
    if hsize == 12:  # BITMAPCOREHEADER: 16-bit dims, 3-byte palette entries
        w, h, planes, bpp = struct.unpack_from("<HHHH", data, off + 4)
        compression, clr_used = 0, 0
        palette_entry = 3
    elif hsize in (40, 52, 56, 64, 108, 124):
        w, h, planes, bpp, compression, _sz, _xp, _yp, clr_used, _imp = (
            struct.unpack_from("<iiHHIIiiII", data, off + 4)
        )
        if h < 0:
            top_down, h = True, -h
        if compression == 3:
            # BI_BITFIELDS: masks live inside the header (hsize >= 52) or
            # immediately after a 40-byte header; the alpha mask exists
            # only from the 56-byte (V3) header on
            cnt = 4 if hsize >= 56 else 3
            if off + 40 + 4 * cnt > len(data):  # masks may trail a 40-byte header
                raise BmpError("truncated bitfield masks")
            avail = struct.unpack_from(f"<{cnt}I", data, off + 40)
            masks = (avail + (0,))[:4]
    else:
        raise BmpError(f"unsupported DIB header size {hsize}")
    if ico_entry:
        h //= 2
    if planes != 1 or bpp not in (1, 2, 4, 8, 16, 24, 32):
        raise BmpError(f"bad planes/bpp {planes}/{bpp}")
    if w <= 0 or h <= 0:
        raise BmpError("bad dimensions")
    if max_pixels is not None and w * h > max_pixels:
        raise BmpError(f"image {w}x{h} exceeds decode cap {max_pixels}")

    pal_off = off + hsize
    if hsize == 40 and compression == 3:
        pal_off += 12  # the 3 masks trail the 40-byte header
    palette = None
    if bpp <= 8:
        n_pal = clr_used or (1 << bpp)
        raw = np.frombuffer(
            data, dtype=np.uint8, count=n_pal * palette_entry, offset=pal_off
        ).reshape(n_pal, palette_entry)
        palette = raw[:, :3][:, ::-1]  # BGR(A) -> RGB
        pal_off += n_pal * palette_entry
    px_off = pal_off

    if compression in (1, 2):  # RLE8 / RLE4
        if bpp not in (4, 8) or top_down:
            raise BmpError("illegal RLE depth")
        idx = _unrle(data[px_off:], w, h, four_bit=(compression == 2))
        if palette is None or int(idx.max(initial=0)) >= len(palette):
            raise BmpError("RLE palette index out of range")
        rgb = palette[idx]
        alpha = np.full((h, w), 255, dtype=np.uint8)
    elif compression in (0, 3):
        stride = ((w * bpp + 31) // 32) * 4
        need = stride * h
        if px_off + need > len(data):
            raise BmpError("truncated pixel data")
        rows = np.frombuffer(
            data, dtype=np.uint8, count=need, offset=px_off
        ).reshape(h, stride)
        if not top_down:
            rows = rows[::-1]
        if bpp <= 8:
            bits = np.unpackbits(rows, axis=1)
            vals = bits.reshape(h, -1, bpp) if bpp > 1 else bits[:, :, None]
            weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint16)
            idx = (vals * weights).sum(axis=2)[:, :w].astype(np.int32)
            if int(idx.max(initial=0)) >= len(palette):
                raise BmpError("palette index out of range")
            rgb = palette[idx]
            alpha = np.full((h, w), 255, dtype=np.uint8)
        elif bpp == 16:
            v = (
                np.ascontiguousarray(rows[:, : w * 2])
                .reshape(h, w, 2)
                .view("<u2")[:, :, 0]
            )
            m = masks if (masks and any(masks[:3])) else (0x7C00, 0x03E0, 0x001F, 0)
            chans = []
            for k in range(3):
                s, wd = _mask_shift(m[k])
                chans.append(_scale_to_8((v >> s) & ((1 << wd) - 1 if wd else 0), wd))
            rgb = np.dstack(chans)
            s, wd = _mask_shift(m[3] if len(m) > 3 else 0)
            alpha = (
                _scale_to_8((v >> s) & ((1 << wd) - 1), wd)
                if wd
                else np.full((h, w), 255, dtype=np.uint8)
            )
        elif bpp == 24:
            rgb = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
            alpha = np.full((h, w), 255, dtype=np.uint8)
        else:  # 32
            quad = rows[:, : w * 4].reshape(h, w, 4)
            if compression == 3 and masks and any(masks):
                v = quad.copy().view("<u4")[:, :, 0]
                chans = []
                for k in range(3):
                    s, wd = _mask_shift(masks[k])
                    chans.append(
                        _scale_to_8((v >> s) & ((1 << wd) - 1 if wd else 0), wd)
                    )
                rgb = np.dstack(chans)
                s, wd = _mask_shift(masks[3] if len(masks) > 3 else 0)
                alpha = (
                    _scale_to_8((v >> s) & ((1 << wd) - 1), wd)
                    if wd
                    else np.full((h, w), 255, dtype=np.uint8)
                )
            else:
                rgb = quad[:, :, 2::-1]
                # BI_RGB 32bpp: 4th byte is "reserved"; decoders treat
                # all-zero as opaque, else as alpha (gdk-pixbuf ignores it
                # for plain BMP — we follow for BMP, honor it for ICO XOR)
                a = quad[:, :, 3]
                alpha = (
                    a
                    if ico_entry and int(a.max(initial=0)) > 0
                    else np.full((h, w), 255, dtype=np.uint8)
                )
        px_off += need
    else:
        raise BmpError(f"unsupported compression {compression}")

    if ico_entry and compression in (0, 3):
        # 1-bit AND mask, rows padded to 32 bits, bottom-up: 1 = transparent
        mstride = ((w + 31) // 32) * 4
        mneed = mstride * h
        if px_off + mneed <= len(data):
            mrows = np.frombuffer(
                data, dtype=np.uint8, count=mneed, offset=px_off
            ).reshape(h, mstride)[::-1]
            mbits = np.unpackbits(mrows, axis=1)[:, :w]
            alpha = np.where(mbits == 1, 0, alpha).astype(np.uint8)
    return np.dstack([np.ascontiguousarray(rgb), alpha])


def _over_white(rgba: np.ndarray) -> np.ndarray:
    rgb = rgba[:, :, :3].astype(np.uint16)
    a = rgba[:, :, 3:4].astype(np.uint16)
    return ((rgb * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)


def decode_bmp(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Decode a BMP file to (h, w, 3) RGB8 (alpha, if any, over white)."""
    if data[:2] != b"BM" or len(data) < 26:
        raise BmpError("not a BMP")
    # the BITMAPFILEHEADER's pixel offset is advisory; headers are
    # self-describing, so walk them (some writers leave it stale)
    return _over_white(_decode_dib(data, 14, max_pixels=max_pixels))


def decode_ico(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Decode the best (largest, then deepest) image of an ICO container."""
    if len(data) < 6:
        raise BmpError("not an ICO")
    reserved, imgtype, count = struct.unpack_from("<HHH", data, 0)
    if reserved != 0 or imgtype != 1 or count == 0:
        raise BmpError("not an ICO")
    best = None
    for i in range(count):
        eoff = 6 + 16 * i
        if eoff + 16 > len(data):
            raise BmpError("truncated ICONDIR")
        bw, bh, _ncol, _res, _planes, ebpp, size, off = struct.unpack_from(
            "<BBBBHHII", data, eoff
        )
        bw, bh = bw or 256, bh or 256  # 0 encodes 256
        key = (bw * bh, ebpp)
        if best is None or key > best[0]:
            best = (key, off, size)
    _, off, size = best
    if off + size > len(data):
        raise BmpError("truncated ICO entry")
    payload = data[off : off + size]
    if payload[:8] == b"\x89PNG\r\n\x1a\n":  # Vista-style PNG entry
        from sher_look_spark.functions.pngcodec import decode_png_full

        return decode_png_full(payload, max_pixels=max_pixels)
    return _over_white(_decode_dib(payload, 0, ico_entry=True, max_pixels=max_pixels))


# --------------------------------------------------------------------------
# Test encoders: enough of the format space to exercise every decode path
# with files the gdk-pixbuf loaders also read.
# --------------------------------------------------------------------------


def encode_bmp(
    arr: np.ndarray, bpp: int = 24, *, top_down: bool = False,
    rle: bool = False, palette: np.ndarray | None = None,
    alpha: np.ndarray | None = None,
) -> bytes:
    """Encode (h, w, 3) RGB8 (or palette indices for bpp<=8) as BMP.

    For bpp<=8, ``arr`` is (h, w) indices and ``palette`` is (n, 3) RGB.
    ``rle`` selects BI_RLE8 (bpp must be 8; encoded as one absolute-mode
    run per row — legal, exercises the RLE path). ``alpha`` with bpp=32
    writes BI_BITFIELDS ARGB masks.
    """
    if bpp <= 8:
        h, w = arr.shape
        n_pal = len(palette)
        pal = np.zeros((n_pal, 4), dtype=np.uint8)
        pal[:, :3] = palette[:, ::-1]  # RGB -> BGR
        pal_bytes = pal.tobytes()
        if rle:
            if bpp != 8:
                raise ValueError("RLE test encoder is 8-bit only")
            out = bytearray()
            for row in arr[::-1]:  # bottom-up
                i = 0
                while i < w:
                    cnt = min(255, w - i)
                    if cnt >= 3:
                        out += bytes([0, cnt]) + bytes(row[i : i + cnt].tolist())
                        if cnt % 2:
                            out.append(0)
                    else:
                        for v in row[i : i + cnt]:
                            out += bytes([1, int(v)])
                    i += cnt
                out += b"\x00\x00"
            out += b"\x00\x01"
            px = bytes(out)
            compression = 1
        else:
            stride = ((w * bpp + 31) // 32) * 4
            if bpp == 8:
                rows = arr.astype(np.uint8)
            else:
                bits = (
                    (arr[:, :, None].astype(np.uint8) >> np.arange(bpp - 1, -1, -1))
                    & 1
                ).reshape(h, -1).astype(np.uint8)
                rows = np.packbits(bits, axis=1)
            pad = np.zeros((h, stride - rows.shape[1]), dtype=np.uint8)
            px = np.hstack([rows, pad])[:: 1 if top_down else -1].tobytes()
            compression = 0
    else:
        h, w, _ = arr.shape
        pal_bytes = b""
        compression = 0
        stride = ((w * bpp + 31) // 32) * 4
        if bpp == 24:
            rows = arr[:, :, ::-1].reshape(h, -1)
        elif bpp == 32:
            if alpha is not None:
                quad = np.dstack([arr[:, :, ::-1], alpha])
                compression = 3
            else:
                quad = np.dstack(
                    [arr[:, :, ::-1], np.zeros((h, w), dtype=np.uint8)]
                )
            rows = quad.reshape(h, -1)
        elif bpp == 16:
            v = (
                (arr[:, :, 0].astype(np.uint16) >> 3) << 10
                | (arr[:, :, 1].astype(np.uint16) >> 3) << 5
                | (arr[:, :, 2].astype(np.uint16) >> 3)
            )
            rows = v.astype("<u2").view(np.uint8).reshape(h, -1)
        else:
            raise ValueError(f"bpp {bpp}")
        pad = np.zeros((h, stride - rows.shape[1]), dtype=np.uint8)
        px = np.hstack([rows, pad])[:: 1 if top_down else -1].tobytes()

    masks = b""
    if compression == 3:
        masks = struct.pack("<3I", 0x00FF0000, 0x0000FF00, 0x000000FF)
        # alpha mask via V3-style 4th mask would need hsize>=56; keep the
        # 40-byte header + 3 masks (opaque-alpha files) for gdk parity and
        # exercise the 4-mask path with a 56-byte header:
        dib = struct.pack(
            "<IiiHHIIiiII", 56, w, (-h if top_down else h), 1, bpp,
            3, len(px), 2835, 2835, 0, 0,
        ) + struct.pack(
            "<4I", 0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000
        )
        masks = b""
    else:
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, bpp,
            compression, len(px), 2835, 2835,
            len(pal_bytes) // 4 if pal_bytes else 0, 0,
        )
    off = 14 + len(dib) + len(masks) + len(pal_bytes)
    head = b"BM" + struct.pack("<IHHI", off + len(px), 0, 0, off)
    return head + dib + masks + pal_bytes + px


def encode_ico(images: list[tuple[np.ndarray, np.ndarray | None]],
               png_entries: bool = False) -> bytes:
    """Encode RGB arrays (+optional alpha) as an ICO container.

    DIB entries write 32bpp XOR pixels + the 1-bit AND mask derived from
    alpha==0; ``png_entries`` wraps each image as a PNG stream instead.
    """
    headers = b""
    blobs: list[bytes] = []
    off = 6 + 16 * len(images)
    for arr, alpha in images:
        h, w, _ = arr.shape
        if png_entries:
            from sher_look_spark.functions.pngcodec import encode_png_adv

            if alpha is not None:
                samples = np.dstack([arr, alpha])
                blob = encode_png_adv(samples, 6, 8)
            else:
                blob = encode_png_adv(arr, 2, 8)
        else:
            a = (
                alpha
                if alpha is not None
                else np.full((h, w), 255, dtype=np.uint8)
            )
            quad = np.dstack([arr[:, :, ::-1], a])[::-1].reshape(h, -1)
            mstride = ((w + 31) // 32) * 4
            mbits = (a == 0).astype(np.uint8)
            mrows = np.packbits(mbits, axis=1)
            mpad = np.zeros((h, mstride - mrows.shape[1]), dtype=np.uint8)
            mask = np.hstack([mrows, mpad])[::-1].tobytes()
            dib = struct.pack(
                "<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0,
                quad.nbytes + len(mask), 2835, 2835, 0, 0,
            )
            blob = dib + quad.tobytes() + mask
        headers += struct.pack(
            "<BBBBHHII",
            w if w < 256 else 0, h if h < 256 else 0, 0, 0, 1,
            32 if not png_entries else 0, len(blob), off,
        )
        blobs.append(blob)
        off += len(blob)
    return struct.pack("<HHH", 0, 1, len(images)) + headers + b"".join(blobs)
