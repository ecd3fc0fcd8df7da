"""Unfragmented MP4 (ISO base media file format) box parsing + sync-sample
(I-frame) extraction — no codec decode.

A training-data pipeline over video crawls needs the CONTAINER layer long
before it needs pixels: find the video track, read its sample tables, slice
out the key-frame (sync-sample) payload bytes with timestamps, and hand
those to a downstream GPU/codec tier. That layer is pure public structure
(ISO/IEC 14496-12): box tree (32-bit size, 64-bit largesize, size-0 =
to-EOF), moov/trak/mdia/minf/stbl, and the sample tables

  stsd  sample description (codec fourcc, e.g. avc1/hev1)
  stts  decode-time deltas          ctts  composition offsets (optional)
  stss  sync-sample numbers (absent => every sample is sync)
  stsz  sample sizes                stsc  sample-to-chunk runs
  stco / co64  chunk byte offsets

Per-sample file offsets come from expanding stsc runs over stco chunks and
accumulating sizes within each chunk. Decoding the sliced AVC/HEVC access
units to pixels requires a video codec and stays NotImplementedError
(COVERAGE.md payload table); everything up to the byte slices is real and
tested against a hand-built file (tests/test_multimodal.py).

Reference parity: the reference crawler stores fetched media opaquely
(payload bytes + metadata); this module is part of the beyond-reference
training-data tier (SURVEY §2, multimodal)."""

from __future__ import annotations

import struct
from typing import Iterator

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex"}


def iter_boxes(data: bytes, start: int = 0, end: int | None = None) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, payload_start, payload_end) for each box in [start, end)."""
    end = len(data) if end is None else end
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            payload = pos + 16
        elif size == 0:  # to end of enclosing scope
            size = end - pos
            payload = pos + 8
        else:
            payload = pos + 8
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed box {typ!r} at {pos} (size {size})")
        yield typ, payload, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, *path: bytes) -> tuple[int, int] | None:
    """Payload range of the first box matching a nested type path."""
    for typ, ps, pe in iter_boxes(data, start, end):
        if typ == path[0]:
            if len(path) == 1:
                return ps, pe
            return _find(data, ps, pe, *path[1:])
    return None


def _find_all(data: bytes, start: int, end: int, typ: bytes) -> list[tuple[int, int]]:
    return [(ps, pe) for t, ps, pe in iter_boxes(data, start, end) if t == typ]


def _u32s(data: bytes, pos: int, n: int) -> list[int]:
    return list(struct.unpack(f">{n}I", data[pos : pos + 4 * n]))


def mp4_video_sample_table(data: bytes) -> dict:
    """Sample table of the first video (`hdlr` type ``vide``) track.

    Returns codec fourcc, track timescale, per-sample (offset, size, dts,
    pts) arrays and the 0-based sync-sample indices. Fragmented files
    (moof) are rejected explicitly — their sample tables live in movie
    fragments, a separate (declared) boundary."""
    if _find(data, 0, len(data), b"moof") is not None:
        raise NotImplementedError("fragmented MP4 (moof) unsupported")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov box (not an MP4 or streaming-only remainder)")
    for tps, tpe in _find_all(data, moov[0], moov[1], b"trak"):
        mdia = _find(data, tps, tpe, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
        version = data[mdhd[0]]
        timescale = struct.unpack(
            ">I", data[mdhd[0] + (20 if version else 12) : mdhd[0] + (24 if version else 16)]
        )[0]
        stbl = _find(data, mdia[0], mdia[1], b"minf", b"stbl")
        if stbl is None:
            raise ValueError("video track has no stbl")

        def req(typ: bytes) -> tuple[int, int]:
            r = _find(data, stbl[0], stbl[1], typ)
            if r is None:
                raise ValueError(f"missing {typ.decode()} box")
            return r

        # stsd: codec fourcc + visual sample entry width/height
        sp, _ = req(b"stsd")
        codec = data[sp + 12 : sp + 16].decode("latin1")
        w, h = struct.unpack(">HH", data[sp + 16 + 8 + 16 : sp + 16 + 8 + 20])

        # stsz: sample sizes
        sp, _ = req(b"stsz")
        uniform, count = struct.unpack(">II", data[sp + 4 : sp + 12])
        sizes = [uniform] * count if uniform else _u32s(data, sp + 12, count)

        # stsc runs + stco/co64 chunk offsets -> per-sample offsets
        sp, _ = req(b"stsc")
        (n_runs,) = struct.unpack(">I", data[sp + 4 : sp + 8])
        runs = [
            struct.unpack(">III", data[sp + 8 + 12 * i : sp + 20 + 12 * i])
            for i in range(n_runs)
        ]  # (first_chunk 1-based, samples_per_chunk, desc_idx)
        co = _find(data, stbl[0], stbl[1], b"stco")
        if co is not None:
            (n_chunks,) = struct.unpack(">I", data[co[0] + 4 : co[0] + 8])
            chunk_offs = _u32s(data, co[0] + 8, n_chunks)
        else:
            co = req(b"co64")
            (n_chunks,) = struct.unpack(">I", data[co[0] + 4 : co[0] + 8])
            chunk_offs = list(
                struct.unpack(f">{n_chunks}Q", data[co[0] + 8 : co[0] + 8 + 8 * n_chunks])
            )
        per_chunk: list[int] = []
        for i, (first, spc, _desc) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
            per_chunk.extend([spc] * (last - first + 1))
        offsets: list[int] = []
        si = 0
        for ci, base in enumerate(chunk_offs):
            off = base
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if si >= count:
                    break
                offsets.append(off)
                off += sizes[si]
                si += 1
        if si != count:
            raise ValueError(f"chunk map covers {si} of {count} samples")

        # stts -> dts; optional ctts -> pts
        sp, _ = req(b"stts")
        (n_e,) = struct.unpack(">I", data[sp + 4 : sp + 8])
        dts: list[int] = []
        t = 0
        for i in range(n_e):
            cnt, delta = struct.unpack(">II", data[sp + 8 + 8 * i : sp + 16 + 8 * i])
            for _ in range(cnt):
                dts.append(t)
                t += delta
        pts = list(dts)
        ct = _find(data, stbl[0], stbl[1], b"ctts")
        if ct is not None:
            (n_e,) = struct.unpack(">I", data[ct[0] + 4 : ct[0] + 8])
            si = 0
            for i in range(n_e):
                cnt, off = struct.unpack(">Ii", data[ct[0] + 8 + 8 * i : ct[0] + 16 + 8 * i])
                for _ in range(cnt):
                    if si < count:
                        pts[si] = dts[si] + off
                    si += 1

        # stss: 1-based sync sample numbers; absent = all samples sync
        ss = _find(data, stbl[0], stbl[1], b"stss")
        if ss is None:
            sync = list(range(count))
        else:
            (n_s,) = struct.unpack(">I", data[ss[0] + 4 : ss[0] + 8])
            sync = [s - 1 for s in _u32s(data, ss[0] + 8, n_s)]

        return {
            "codec": codec,
            "timescale": timescale,
            "width": w,
            "height": h,
            "count": count,
            "sizes": sizes,
            "offsets": offsets,
            "dts": dts,
            "pts": pts,
            "sync": sync,
        }
    raise ValueError("no video track (hdlr 'vide') found")


def mp4_extract_iframes(data: bytes) -> list[dict]:
    """Sync-sample (I-frame) payload slices of the first video track:
    [{index, pts_seconds, codec, width, height, bytes}]. The bytes are the
    raw access unit (e.g. length-prefixed AVC NAL units) — decoding them to
    pixels needs a video codec and is out of scope here."""
    st = mp4_video_sample_table(data)
    ts = max(st["timescale"], 1)
    out = []
    for idx in st["sync"]:
        off, size = st["offsets"][idx], st["sizes"][idx]
        if off + size > len(data):
            raise ValueError(f"sample {idx} range {off}+{size} beyond file end")
        out.append(
            {
                "index": idx,
                "pts_seconds": st["pts"][idx] / ts,
                "codec": st["codec"],
                "width": st["width"],
                "height": st["height"],
                "bytes": data[off : off + size],
            }
        )
    return out


# --------------------------------------------------------------- fixture

def build_minimal_mp4(
    samples: list[bytes],
    sync: list[int],
    timescale: int = 1000,
    delta: int = 100,
    width: int = 64,
    height: int = 48,
    samples_per_chunk: int = 2,
    codec: str = "avc1",
) -> bytes:
    """Hand-assemble a minimal valid unfragmented MP4 holding ``samples`` as
    the video track's media data (fixture-grade, for tests and synth webs:
    real box structure, dummy codec payloads)."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    count = len(samples)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2" + codec.encode())

    # chunks of samples_per_chunk samples laid sequentially in mdat
    n_chunks = -(-count // samples_per_chunk)
    mdat_payload = b"".join(samples)

    # stsd: minimal visual sample entry
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_reference_index
        + b"\x00" * 16                       # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)  # reserved + frame_count
        + b"\x00" * 32                        # compressorname
        + struct.pack(">Hh", 24, -1)          # depth, pre_defined
    )
    stsd = box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + box(codec.encode(), entry))
    stts = box(b"stts", b"\x00" * 4 + struct.pack(">III", 1, count, delta))
    stss = box(b"stss", b"\x00" * 4 + struct.pack(">I", len(sync))
               + b"".join(struct.pack(">I", s + 1) for s in sync))
    stsz = box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, count)
               + b"".join(struct.pack(">I", len(s)) for s in samples))
    stsc = box(b"stsc", b"\x00" * 4 + struct.pack(">I", 1)
               + struct.pack(">III", 1, samples_per_chunk, 1))

    hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"video\x00")
    mdhd = box(b"mdhd", b"\x00" * 4 + struct.pack(">IIII", 0, 0, timescale, count * delta)
               + struct.pack(">HH", 0x55C4, 0))
    tkhd = box(b"tkhd", b"\x00\x00\x00\x07" + struct.pack(">IIII", 0, 0, 1, 0)
               + struct.pack(">I", count * delta) + b"\x00" * 52
               + struct.pack(">II", width << 16, height << 16))
    mvhd = box(b"mvhd", b"\x00" * 4 + struct.pack(">IIII", 0, 0, timescale, count * delta)
               + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100) + b"\x00" * 10
               + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
               + b"\x00" * 24 + struct.pack(">I", 2))

    # two-pass assembly: chunk offsets depend on moov's size, which is fixed
    # once the (constant-size) stco is included — build with zeros, re-build
    def assemble(chunk_offs: list[int]) -> bytes:
        stco = box(b"stco", b"\x00" * 4 + struct.pack(">I", n_chunks)
                   + b"".join(struct.pack(">I", o) for o in chunk_offs))
        stbl = box(b"stbl", stsd + stts + stss + stsz + stsc + stco)
        minf = box(b"minf", box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
                   + box(b"dinf", box(b"dref", b"\x00" * 4 + struct.pack(">I", 1)
                                      + box(b"url ", b"\x00\x00\x00\x01")))
                   + stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        return box(b"moov", mvhd + trak)

    moov = assemble([0] * n_chunks)
    mdat_start = len(ftyp) + len(moov) + 8  # mdat payload begins after its header
    chunk_offs = []
    off = mdat_start
    si = 0
    for _ in range(n_chunks):
        chunk_offs.append(off)
        for _ in range(samples_per_chunk):
            if si < count:
                off += len(samples[si])
                si += 1
    moov = assemble(chunk_offs)
    return ftyp + moov + box(b"mdat", mdat_payload)
