"""Multimodal binary-column operators over Spark (decode/resize/frames)."""

from __future__ import annotations

import numpy as np
import pytest

from sher_look_spark.crawler.imaging import decode_png, encode_png, phash64
from sher_look_spark.operators.multimodal import encode_vid0


def _img(seed, h=20, w=30):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def images_df(spark):
    rows = [(f"img{i}", encode_png(_img(i)), "png") for i in range(6)]
    return spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")


def test_image_features(spark, images_df):
    from sher_look_spark.operators.multimodal import image_features

    feats = {r.image_id: r for r in image_features(images_df).collect()}
    assert len(feats) == 6
    a0 = _img(0)
    assert feats["img0"].w == 30 and feats["img0"].h == 20
    assert feats["img0"].mean_r == pytest.approx(float(a0[:, :, 0].mean()), abs=1e-3)
    assert feats["img0"].phash == phash64(a0)


def test_resize_roundtrip(spark, images_df):
    from sher_look_spark.operators.multimodal import resize_images

    out = {r.image_id: r for r in resize_images(images_df, 8, 8).collect()}
    arr = decode_png(bytes(out["img1"].bytes))
    assert arr.shape == (8, 8, 3)
    # nearest-neighbor: every output pixel exists in the source
    src_pixels = {tuple(p) for p in _img(1).reshape(-1, 3)}
    assert all(tuple(p) in src_pixels for p in arr.reshape(-1, 3))


def test_frame_sampling(spark):
    from sher_look_spark.operators.multimodal import sample_frames

    frames = [_img(100 + i, 12, 12) for i in range(7)]
    df = spark.createDataFrame(
        [("vidA", encode_vid0(frames), "vid0")], "video_id string, bytes binary, fmt string"
    )
    out = sample_frames(df, every=2).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in out] == [0, 2, 4, 6]
    assert np.array_equal(decode_png(bytes(out[1].bytes)), frames[2])


def test_unsupported_codec_is_clearly_stubbed(spark):
    from sher_look_spark.operators.multimodal import image_features

    df = spark.createDataFrame(
        [("x", b"\xff\xd8\xff", "jpeg")], "image_id string, bytes binary, fmt string"
    )
    with pytest.raises(Exception) as exc:
        image_features(df).collect()
    assert "NotImplementedError" in str(exc.value) or "codec" in str(exc.value)


def test_mp4_box_parse_and_iframe_extraction():
    """Unfragmented MP4 (functions/mp4box.py): the hand-built fixture's box
    tree + sample tables resolve to exact sync-sample byte slices with pts;
    stss-less files treat every sample as sync; fragmented files reject."""
    import struct

    from sher_look_spark.functions.mp4box import (
        build_minimal_mp4,
        mp4_extract_iframes,
        mp4_video_sample_table,
    )

    samples = [bytes([(i * 7 + 13) % 256]) * (20 + 3 * i) for i in range(6)]
    mp4 = build_minimal_mp4(samples, sync=[0, 3], timescale=1000, delta=100)
    st = mp4_video_sample_table(mp4)
    assert (st["codec"], st["count"], st["width"], st["height"]) == ("avc1", 6, 64, 48)
    frames = mp4_extract_iframes(mp4)
    assert [f["index"] for f in frames] == [0, 3]
    assert frames[0]["bytes"] == samples[0] and frames[1]["bytes"] == samples[3]
    assert frames[1]["pts_seconds"] == pytest.approx(0.3)

    # chunk map must hold when the last chunk is partial (5 samples, 2/chunk)
    odd = build_minimal_mp4(samples[:5], sync=[4], samples_per_chunk=2)
    assert mp4_extract_iframes(odd)[0]["bytes"] == samples[4]

    # fragmented -> explicit boundary
    frag = mp4 + struct.pack(">I", 8) + b"moof"
    with pytest.raises(NotImplementedError, match="fragmented"):
        mp4_video_sample_table(frag)


def test_mp4_frame_sampling_through_spark(spark):
    """sample_frames over fmt='mp4' rows: the mapInPandas path emits each
    sync sample's raw access unit with fmt = codec fourcc (downstream
    GPU-decode shape), alongside vid0 rows that decode to PNG."""
    from sher_look_spark.functions.mp4box import build_minimal_mp4
    from sher_look_spark.operators.multimodal import sample_frames

    samples = [bytes([i]) * 16 for i in range(4)]
    mp4 = build_minimal_mp4(samples, sync=[0, 2], width=32, height=24)
    df = spark.createDataFrame(
        [("v1", mp4, "mp4")], "video_id string, bytes binary, fmt string"
    )
    rows = {r.frame_idx: r for r in sample_frames(df, every=1).collect()}
    assert set(rows) == {0, 2}
    assert rows[0].fmt == "avc1" and bytes(rows[0].bytes) == samples[0]
    assert rows[2].w == 32 and rows[2].h == 24


def test_mp3_metadata_parse_and_operator(spark):
    """MP3 frame-header walk: frame count/duration/bitrate from the public
    header structure (ID3v2 skipped, trailing junk tolerated), surfaced
    through the Arrow audio_metadata operator; PCM decode stays rejected."""
    from sher_look_spark.functions.mp3meta import build_minimal_mp3, mp3_metadata
    from sher_look_spark.operators.multimodal import audio_metadata

    mp3 = build_minimal_mp3(25, 128, 44100, id3=b"\x00" * 32)
    m = mp3_metadata(mp3)
    assert m["frames"] == 25 and m["sample_rate"] == 44100 and m["vbr"] is False
    assert m["duration_s"] == pytest.approx(25 * 1152 / 44100, abs=1e-3)
    with pytest.raises(ValueError):
        mp3_metadata(b"\x01" * 64)

    df = spark.createDataFrame(
        [("a1", mp3, "mp3")], "audio_id string, bytes binary, fmt string"
    )
    row = audio_metadata(df).collect()[0]
    assert row.frames == 25 and row.sample_rate == 44100 and row.channels == 2


def test_imaging_reject_set():
    """COVERAGE.md payload-coverage table: every ❌ class raises a typed
    NotImplementedError naming the boundary; every ✅ class decodes. Pins
    the documented reject set exactly (no silent wrong-pixels fallbacks)."""
    import struct

    from sher_look_spark.crawler.imaging import decode_image
    from sher_look_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    arr = np.full((16, 16, 3), 90, np.uint8)

    # ✅ baseline, progressive, multi-scan, restart intervals covered by
    # test_jpeg; webp VP8L by test_webp; png/raw by the roundtrip tests
    # above. ❌ classes:
    # 1. JPEG restart intervals now DECODE; a DRI that promises restarts a
    # marker-less stream can't deliver is a typed ValueError (malformed),
    # not a silent wrong-pixels decode
    data = bytearray(encode_jpeg(arr, 90))
    i = bytes(data).find(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 1)
    data[i:i] = dri
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(data))
    assert decode_jpeg(encode_jpeg(arr, 90, restart_interval=1)).shape == (16, 16, 3)
    # 2. JPEG arithmetic coding (SOF9)
    data = bytearray(encode_jpeg(arr, 90))
    j = bytes(data).find(b"\xff\xc0")
    data[j + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(data))
    # 3. WebP lossy (VP8) now DECODES (functions/vp8codec.py); a garbage
    # VP8 chunk raises the typed codec error, not NotImplementedError
    from sher_look_spark.functions.vp8codec import VP8Error, encode_webp_lossy

    img = np.full((5, 6, 3), 77, dtype=np.uint8)
    assert decode_image(encode_webp_lossy(img, qindex=4), "webp").shape == (5, 6, 3)
    vp8 = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(VP8Error):
        decode_image(vp8, "webp")
    # 4. unknown container formats (avif/mp3/mp4 route here; gif now decodes)
    for fmt in ("avif", "mp3", "mp4"):
        with pytest.raises(NotImplementedError, match="unsupported payload format"):
            decode_image(b"\x00" * 16, fmt)


def test_multimodal_plans_are_arrow(spark, images_df):
    from sher_look_spark.operators.multimodal import image_features
    from sher_look_spark.plans import plan_summary

    s = plan_summary(image_features(images_df))
    assert s["row_python"] == 0 and s["arrow_python"] >= 1
