"""Pure-numpy baseline JPEG codec (functions/jpegcodec.py): round-trip PSNR
>= 40 dB on web-photo-like content (the input_hint payload invariant), marker
structure, error paths, and the crawl engine carrying JPEG payloads
end-to-end with payload fidelity vs the ideal pre-encode pixels."""

from __future__ import annotations

import numpy as np
import pytest

from sher_look_spark.crawler.imaging import psnr
from sher_look_spark.functions.jpegcodec import decode_jpeg, encode_jpeg


def _smooth(h, w, seed=3):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    chans = []
    for _ in range(3):
        py, px = rng.random(), rng.random()
        chans.append(
            128 + 45 * np.sin(2 * np.pi * (y / (2 * h) + py))
            * np.cos(2 * np.pi * (x / (2 * w) + px))
        )
    return np.clip(np.floor(np.stack(chans, axis=-1)), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape", [(8, 8), (21, 19), (37, 53), (64, 48)])
def test_roundtrip_psnr_above_40(shape):
    arr = _smooth(*shape)
    for q in (93, 95):
        dec = decode_jpeg(encode_jpeg(arr, q))
        assert dec.shape == arr.shape
        assert psnr(arr, dec) >= 40.0, (shape, q)


def test_constant_image_roundtrips_near_exact():
    arr = np.zeros((11, 13, 3), np.uint8)
    arr[...] = (200, 30, 90)
    dec = decode_jpeg(encode_jpeg(arr, 90))
    # DC-only blocks: every pixel identical, within quantization of the DC
    assert len({tuple(p) for p in dec.reshape(-1, 3)}) == 1
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 3


def test_gradient_quality_monotonic():
    y, x = np.mgrid[0:32, 0:40]
    arr = ((y * 3 + x * 2) % 256).astype(np.uint8)[..., None].repeat(3, axis=2)
    p_low = psnr(arr, decode_jpeg(encode_jpeg(arr, 60)))
    p_high = psnr(arr, decode_jpeg(encode_jpeg(arr, 95)))
    assert p_high > p_low >= 30.0


def test_marker_structure_and_errors():
    arr = _smooth(16, 16)
    data = encode_jpeg(arr, 90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in data[:32]
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    with pytest.raises((ValueError, NotImplementedError, struct_error := Exception)):
        decode_jpeg(data[: len(data) // 2])  # truncated stream


def test_bitstream_has_no_bare_ff(tmp_path):
    """Entropy bytes 0xFF must be stuffed with 0x00 (T.81 B.1.1.5)."""
    arr = _smooth(40, 40, seed=9)
    data = encode_jpeg(arr, 92)
    # scan section starts after SOS header
    sos = data.find(b"\xff\xda")
    seglen = int.from_bytes(data[sos + 2 : sos + 4], "big")
    scan = data[sos + 2 + seglen : -2]
    i = 0
    while i < len(scan) - 1:
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00, f"bare 0xFF at {i}"
            i += 2
        else:
            i += 1


def test_crawl_carries_jpeg_payloads_with_fidelity(spark, tmp_path):
    """End-to-end: the synthetic web serves a JPEG mix (jpeg_every), the wave
    engine fetches/dedups/commits them, and every committed JPEG decodes to
    >= 40 dB PSNR against the IDEAL pre-encode pixels (a genuinely lossy
    check, unlike the PNG rows where stored == reference bytes)."""
    from sher_look_spark.crawler import synth
    from sher_look_spark.crawler.engine import CrawlConfig, CrawlEngine
    from sher_look_spark.crawler.imaging import decode_image
    from sher_look_spark.crawler.simulator import simulate_crawl

    web = synth.SynthWebConfig(
        n_hosts=5, pages_per_host=8, seed=77, timeout_pct=0, dup_every=0,
        jpeg_every=2, img_min=12, img_max=28,
    )
    seeds = synth.seed_urls(web, 3)
    eng = CrawlEngine(
        spark, str(tmp_path / "jp"), CrawlConfig(max_pages=1000, max_depth=2, web=web)
    )
    eng.run(seeds)
    rows = eng.store.read(spark, "images").collect()
    sim = simulate_crawl(web, seeds, max_pages=1000, max_depth=2)
    assert {r.url for r in rows} == {c["url"] for c in sim.committed}
    fmts = {r.fmt for r in rows}
    assert fmts == {"jpeg", "png"}, fmts
    n_jpeg = 0
    for r in rows:
        parsed = synth.parse_page_url(web, r.url)
        ci, cj = synth.content_key(web, *parsed)
        ideal, fmt = synth.page_image_array(web, ci, cj)
        got = decode_image(bytes(r.bytes), r.fmt)
        assert got.shape == ideal.shape
        if fmt == "jpeg":
            n_jpeg += 1
            assert psnr(ideal, got) >= 40.0, r.url
        else:
            assert np.array_equal(got, ideal)
    assert n_jpeg >= 5


@pytest.mark.parametrize("shape", [(37, 53), (64, 48), (33, 32), (128, 96)])
def test_420_roundtrip_psnr_above_40(shape):
    """The real-web 4:2:0 layout: MCU-interleaved encode, box-downsampled
    chroma, triangular upsample on decode — >= 40 dB on web-photo-like
    content at web-realistic sizes (>= 32 px; tinier images are kept 4:4:4
    by the synth encoder because 2x2 chroma decimation of a two-block image
    cannot hold the bar)."""
    arr = _smooth(*shape)
    dec = decode_jpeg(encode_jpeg(arr, 93, subsampling="420"))
    assert dec.shape == arr.shape
    assert psnr(arr, dec) >= 40.0, shape


@pytest.mark.parametrize("shape", [(8, 8), (15, 9), (21, 19), (37, 53)])
def test_420_odd_sizes_roundtrip(shape):
    """Odd/non-MCU-multiple sizes: padding + crop must reproduce exact
    dimensions and stay visually close (>= 30 dB even at tiny sizes)."""
    arr = _smooth(*shape, seed=11)
    dec = decode_jpeg(encode_jpeg(arr, 93, subsampling="420"))
    assert dec.shape == arr.shape
    assert psnr(arr, dec) >= 30.0, shape


def test_420_constant_color_matches_444_exactly():
    """Constant planes are exact under box-downsample + triangular upsample,
    so 4:2:0 and 4:4:4 decode to the identical DC-only closed form — the
    property the mm_jpeg_roundtrip oracle relies on."""
    for color in ((200, 30, 90), (5, 250, 128), (77, 200, 13)):
        arr = np.zeros((13, 21, 3), np.uint8)
        arr[...] = color
        d444 = decode_jpeg(encode_jpeg(arr, 90, subsampling="444"))
        d420 = decode_jpeg(encode_jpeg(arr, 90, subsampling="420"))
        assert np.array_equal(d444, d420), color
        assert len({tuple(p) for p in d420.reshape(-1, 3)}) == 1


def test_scan_order_maps_planes_by_component_id():
    """ADVICE: a conformant stream whose SOS lists components in a
    non-(1,2,3) order must decode with correct channels (planes assigned by
    SOF component id, not scan position)."""
    arr = _smooth(24, 17, seed=5)
    want = decode_jpeg(encode_jpeg(arr, 90))
    for order in ((3, 1, 2), (2, 3, 1), (3, 2, 1)):
        got = decode_jpeg(encode_jpeg(arr, 90, scan_order=order))
        assert np.array_equal(got, want), order
        got420 = decode_jpeg(encode_jpeg(arr, 90, subsampling="420", scan_order=order))
        want420 = decode_jpeg(encode_jpeg(arr, 90, subsampling="420"))
        assert np.array_equal(got420, want420), order


def test_grayscale_single_component_decode():
    """Single-component (grayscale) frames — also on the real web — decode
    through the non-interleaved path to replicated-RGB."""
    from sher_look_spark.functions.jpegcodec import encode_jpeg_gray

    g = _smooth(25, 34, seed=8)[..., 0]
    dec = decode_jpeg(encode_jpeg_gray(g, 93))
    assert dec.shape == (25, 34, 3)
    assert np.array_equal(dec[..., 0], dec[..., 1])
    assert np.array_equal(dec[..., 0], dec[..., 2])
    g3 = np.stack([g, g, g], axis=-1)
    assert psnr(g3, dec) >= 40.0


def test_progressive_roundtrip_matches_baseline():
    """SOF2 decode: the progressive scan script (interleaved DC
    first/refinement + per-component AC first/refinement with EOB runs)
    restores every quantized coefficient, so decoded pixels must be
    bit-identical to the baseline encoding at the same quality."""
    from sher_look_spark.functions.jpegcodec import encode_jpeg_progressive

    for shape in ((24, 24), (37, 29)):
        arr = _smooth(*shape, seed=5)
        for sub in ("444", "420"):
            base = decode_jpeg(encode_jpeg(arr, 85, sub))
            prog = decode_jpeg(encode_jpeg_progressive(arr, 85, sub))
            assert np.array_equal(base, prog), (shape, sub)


def test_progressive_psnr_above_40():
    """The input_hint payload invariant holds through the progressive path."""
    from sher_look_spark.functions.jpegcodec import encode_jpeg_progressive

    arr = _smooth(48, 64, seed=8)
    dec = decode_jpeg(encode_jpeg_progressive(arr, 95))
    assert psnr(arr, dec) >= 40.0


def test_progressive_eob_runs_flat_image():
    """A flat image empties every AC block -> multi-block EOB runs with
    category > 0 plus correction-bit-free refinement skips (the decoder's
    eobrun accumulation paths in both AC scan kinds)."""
    from sher_look_spark.functions.jpegcodec import encode_jpeg_progressive

    flat = np.full((64, 64, 3), 77, np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(flat, 90)),
        decode_jpeg(encode_jpeg(flat, 90)),
    )


def test_multiscan_sequential_non_interleaved():
    """Baseline multi-scan: three single-component scans walk each
    component's own block raster (T.81 A.2.2) and must decode identically
    to the interleaved single-scan stream."""
    import struct

    from sher_look_spark.functions import jpegcodec as J

    arr = _smooth(24, 17, seed=9)
    h, w, _ = arr.shape
    comps, qt = J._quantized_components(arr, 90, "444")
    dc_codes = [
        J._canonical_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS),
        J._canonical_codes(J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
    ]
    ac_codes = [
        J._canonical_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS),
        J._canonical_codes(J.AC_CHROMA_BITS, J.AC_CHROMA_VALS),
    ]
    out = J._frame_headers(h, w, qt, [0x11, 0x11, 0x11], 0xC0)
    for c in range(3):
        t = 0 if c == 0 else 1
        bw = J._BitWriter()
        pred = [0, 0, 0]  # DC prediction resets per scan
        nby, nbx = comps[c].shape[:2]
        for by in range(nby):
            for bx in range(nbx):
                J._encode_block(bw, comps[c][by, bx], pred, c, t, dc_codes, ac_codes)
        bw.flush()
        sos = bytes([1, c + 1, (t << 4) | t, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos + bw.out
    out += b"\xff\xd9"
    assert np.array_equal(
        decode_jpeg(bytes(out)), decode_jpeg(encode_jpeg(arr, 90, "444"))
    )


def test_synth_web_serves_420_for_web_sized_images():
    """The synthetic web's JPEG payloads carry the real-web 4:2:0 layout for
    >= 32 px images (SOF sampling byte 0x22), 4:4:4 below."""
    from sher_look_spark.crawler import synth

    web = synth.SynthWebConfig(
        n_hosts=2, pages_per_host=6, seed=13, jpeg_every=1, img_min=64, img_max=96
    )
    data, w, h, fmt, _, _ = synth.page_image(web, 0, 0)
    assert fmt == "jpeg"
    i = data.find(b"\xff\xc0")
    samp_y = data[i + 11]  # SOF0: len(2) prec(1) h(2) w(2) nc(1) cid(1) samp
    assert samp_y == 0x22, hex(samp_y)
    web_small = synth.SynthWebConfig(
        n_hosts=2, pages_per_host=6, seed=13, jpeg_every=1, img_min=12, img_max=20
    )
    data2, *_ = synth.page_image(web_small, 0, 0)
    i2 = data2.find(b"\xff\xc0")
    assert data2[i2 + 11] == 0x11


def test_restart_interval_roundtrip_equals_no_restart():
    """DRI + RSTn markers segment the entropy stream without changing the
    reconstruction: decode(encode(ri=k)) must equal decode(encode()) for
    every sampling, including ri values that slice mid-MCU-row. A decoder
    that failed to reset DC predictors or re-align at markers diverges."""
    from sher_look_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.Generator(np.random.PCG64(17))
    for (h, w), sub, ri in [
        ((40, 56), "444", 1), ((40, 56), "420", 2), ((57, 63), "444", 5),
        ((57, 63), "420", 3), ((16, 16), "444", 100),  # ri > MCU count
    ]:
        yy, xx = np.mgrid[0:h, 0:w].astype(float)
        img = np.clip(
            np.stack([128 + 60 * np.sin(xx / 9), (xx + 2 * yy) % 256,
                      255 - (yy * 3) % 256], -1)
            + rng.normal(0, 8, (h, w, 3)), 0, 255).astype(np.uint8)
        plain = encode_jpeg(img, 85, subsampling=sub)
        rst = encode_jpeg(img, 85, subsampling=sub, restart_interval=ri)
        assert b"\xff\xdd" in rst
        assert np.array_equal(decode_jpeg(plain), decode_jpeg(rst))


def test_progressive_restart_interval_matches_baseline():
    """Progressive scans with restarts (DC-first + AC-first restart-aware,
    refinement scans under a mid-stream DRI 0 re-declaration) reconstruct
    bit-identical to the plain baseline encoding."""
    from sher_look_spark.functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.Generator(np.random.PCG64(23))
    for (h, w), sub, ri in [((40, 56), "444", 3), ((57, 63), "420", 2)]:
        yy, xx = np.mgrid[0:h, 0:w].astype(float)
        img = np.clip(
            np.stack([120 + 70 * np.cos(yy / 11), (3 * xx) % 256,
                      (xx * yy / 7) % 256], -1)
            + rng.normal(0, 6, (h, w, 3)), 0, 255).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, 85, subsampling=sub))
        prog = encode_jpeg_progressive(img, 85, subsampling=sub, restart_interval=ri)
        # DRI changes: ri (DC first) -> 0 (DC refine) -> ri (AC first) -> 0
        assert prog.count(b"\xff\xdd") == 4
        assert np.array_equal(base, decode_jpeg(prog))


def test_missing_restart_marker_is_malformed():
    from sher_look_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    data = bytearray(encode_jpeg(img, 85, restart_interval=1))
    i = bytes(data).find(b"\xff\xd0")
    assert i > 0
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(data[:i] + data[i + 2:]))
