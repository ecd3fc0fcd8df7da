"""MP3 (MPEG-1/2 audio layer III) frame-header metadata — no audio decode.

The training-data-pipeline counterpart of mp4box.py for audio payloads: walk
the public frame-header structure (ISO/IEC 11172-3) — 11-bit sync, version,
layer, bitrate index, sample-rate index, padding — and derive the metadata a
curation pipeline filters on (duration, mean bitrate, sample rate, frame
count, VBR-ness) without decoding a single sample. ID3v2 prefixes are
skipped by their declared syncsafe size; ID3v1 trailers by their fixed 128
bytes. Decoding samples to PCM requires an MDCT/huffman audio codec and
stays NotImplementedError at the multimodal dispatch (COVERAGE.md)."""

from __future__ import annotations

# kbps by bitrate index, MPEG-1 Layer III (index 0 = free, 15 = bad)
_BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
# MPEG-2 / 2.5 Layer III
_BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_SAMPLERATE = {  # by version bits
    3: [44100, 48000, 32000],  # MPEG-1
    2: [22050, 24000, 16000],  # MPEG-2
    0: [11025, 12000, 8000],   # MPEG-2.5
}


def _id3v2_size(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    # syncsafe 28-bit size, excludes the 10-byte header
    return 10 + (
        ((data[6] & 0x7F) << 21)
        | ((data[7] & 0x7F) << 14)
        | ((data[8] & 0x7F) << 7)
        | (data[9] & 0x7F)
    )


def mp3_metadata(data: bytes) -> dict:
    """Frame-walk an MP3 payload -> {frames, duration_s, sample_rate,
    mean_bitrate_kbps, vbr, channels}. Raises ValueError when no valid
    Layer-III frame sequence is found (not an MP3)."""
    pos = _id3v2_size(data)
    end = len(data)
    if end - pos > 128 and data[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 trailer
    frames = 0
    samples = 0
    bitrates: list[int] = []
    rate = None
    channels = None
    while pos + 4 <= end:
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            if frames:
                break  # trailing junk after a valid run
            pos += 1  # resync before the first frame
            continue
        version = (b1 >> 3) & 0x03  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 0x03   # 1 = Layer III
        if version == 1 or layer != 1:
            if frames:
                break
            pos += 1
            continue
        bit_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        if bit_idx in (0, 15) or sr_idx == 3:
            if frames:
                break
            pos += 1
            continue
        table = _BITRATE_V1_L3 if version == 3 else _BITRATE_V2_L3
        kbps = table[bit_idx]
        sr = _SAMPLERATE[version][sr_idx]
        padding = (b2 >> 1) & 1
        spf = 1152 if version == 3 else 576  # samples per Layer-III frame
        frame_len = (spf // 8) * kbps * 1000 // sr + padding
        if frame_len < 4 or pos + frame_len > end:
            break
        if rate is None:
            rate = sr
            channels = 1 if ((b3 >> 6) & 0x03) == 3 else 2
        frames += 1
        samples += spf
        bitrates.append(kbps)
        pos += frame_len
    if not frames or rate is None:
        raise ValueError("no valid MPEG Layer-III frames found")
    return {
        "frames": frames,
        "duration_s": round(samples / rate, 3),
        "sample_rate": rate,
        "mean_bitrate_kbps": round(sum(bitrates) / frames, 1),
        "vbr": len(set(bitrates)) > 1,
        "channels": channels,
    }


def build_minimal_mp3(
    n_frames: int = 10, kbps: int = 128, sample_rate: int = 44100,
    id3: bytes | None = None,
) -> bytes:
    """Fixture-grade MPEG-1 Layer-III stream: valid frame headers, zero
    payloads (header-walk structure is real; there is no audio to decode)."""
    sr_idx = _SAMPLERATE[3].index(sample_rate)
    bit_idx = _BITRATE_V1_L3.index(kbps)
    out = bytearray()
    if id3 is not None:
        body = id3
        sz = len(body)
        out += b"ID3\x04\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        ) + body
    frame_len = 144 * kbps * 1000 // sample_rate
    for _ in range(n_frames):
        hdr = bytes([
            0xFF,
            0xFB,  # MPEG-1, Layer III, no CRC
            (bit_idx << 4) | (sr_idx << 2),
            0x00,  # stereo
        ])
        out += hdr + b"\x00" * (frame_len - 4)
    return bytes(out)
