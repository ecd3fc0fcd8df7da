"""Determinism + shape of the synthetic web."""

from __future__ import annotations

from sher_look_spark.crawler import synth
from sher_look_spark.functions.urls import normalize_url

CFG = synth.SynthWebConfig(n_hosts=6, pages_per_host=10, seed=99)


def test_fetch_is_pure():
    url = synth.page_url(CFG, 2, 3)
    a = synth.fetch(CFG, url)
    b = synth.fetch(CFG, url)
    assert a == b
    assert a.status in ("ok", "timeout")


def test_unknown_url_is_notfound():
    assert synth.fetch(CFG, "http://host0002.test/relative/path").status == "notfound"
    assert synth.fetch(CFG, "http://elsewhere.example/x").status == "notfound"


def test_duplicate_content_pages_share_html_and_image():
    cfg = synth.SynthWebConfig(n_hosts=3, pages_per_host=15, seed=5, dup_every=7, timeout_pct=0)
    orig = synth.fetch(cfg, synth.page_url(cfg, 1, 6))
    dup = synth.fetch(cfg, synth.page_url(cfg, 1, 7))
    assert dup.html == orig.html
    assert dup.image == orig.image and dup.caption == orig.caption


def test_messy_links_normalize_to_canonical_pages():
    res = synth.fetch(CFG, synth.page_url(CFG, 0, 0))
    assert res.status == "ok" and len(res.links) >= CFG.min_links
    normd = [normalize_url(h) for h in res.links]
    for raw, n in zip(res.links, normd):
        if n is not None and synth.parse_page_url(CFG, n):
            assert n.startswith("http://host") and "/page/" in n


def test_robots_bodies_parse():
    from sher_look_spark.functions.robots import parse_robots_txt

    with_rules = [i for i in range(CFG.n_hosts) if synth.robots_txt(CFG, i)]
    assert with_rules, "some hosts must publish robots.txt"
    for i in with_rules:
        allow, disallow = parse_robots_txt(synth.robots_txt(CFG, i))
        assert disallow, "synthetic robots must contain disallow rules"


def test_seed_urls_shape():
    seeds = synth.seed_urls(CFG, 5)
    assert len(seeds) == 5
    assert all(normalize_url(s) for s in seeds)
    # last seed is a messy duplicate of seed 0
    assert normalize_url(seeds[-1]) == normalize_url(seeds[0])


def test_webp_payload_class_fidelity():
    """webp_every pages serve real WebP bytes: lossy VP8 at >=32 px
    (PSNR >= 40 vs the pre-encode reference pixels), VP8L lossless below;
    phash/metadata describe the payload as stored (post-codec)."""
    from sher_look_spark.crawler.imaging import decode_image, phash64, psnr

    cfg = synth.SynthWebConfig(
        n_hosts=4, pages_per_host=12, seed=7, webp_every=3,
        img_min=16, img_max=64, timeout_pct=0,
    )
    seen_lossy = seen_lossless = 0
    for ci in range(cfg.n_hosts):
        for cj in range(cfg.pages_per_host):
            data, w, h, fmt, _cap, ph = synth.page_image(cfg, ci, cj)
            want_webp = cj % 3 == 1
            assert (fmt == "webp") == want_webp
            if not want_webp:
                continue
            assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
            ref, _ = synth.page_image_array(cfg, ci, cj)
            got = decode_image(data, "webp")
            assert got.shape == (h, w, 3)
            assert phash64(got) == ph  # metadata matches stored payload
            if data[12:16] == b"VP8 ":
                seen_lossy += 1
                assert min(h, w) >= 32
                assert psnr(ref, got) >= 40.0
            else:
                seen_lossless += 1
                assert data[12:16] == b"VP8L"
                assert (got == ref).all()
    assert seen_lossy and seen_lossless  # both subclasses exercised


def test_ico_payload_class_exact():
    """ico_every pages serve real ICO containers (32-bit DIB entry) that
    decode bit-exact; phash/metadata describe the stored payload."""
    from sher_look_spark.crawler.imaging import decode_image, phash64

    cfg = synth.SynthWebConfig(
        n_hosts=3, pages_per_host=10, seed=11, ico_every=4,
        img_min=8, img_max=24, timeout_pct=0,
    )
    seen = 0
    for ci in range(cfg.n_hosts):
        for cj in range(cfg.pages_per_host):
            data, w, h, fmt, _cap, ph = synth.page_image(cfg, ci, cj)
            want_ico = cj % 4 == 2
            assert (fmt == "ico") == want_ico
            if not want_ico:
                continue
            seen += 1
            assert data[:4] == b"\x00\x00\x01\x00"  # ICONDIR, type 1
            ref, _ = synth.page_image_array(cfg, ci, cj)
            got = decode_image(data, "ico")
            assert got.shape == (h, w, 3)
            assert (got == ref).all()
            assert phash64(got) == ph
    assert seen > 0
