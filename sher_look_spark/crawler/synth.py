"""Deterministic synthetic web — the engine's test/bench universe.

Everything (page HTML, out-links, robots.txt bodies, image+caption payloads,
timeouts) is a pure function of ``(config, url)`` via sha256, so:

* the Spark fetch UDF and the pure-Python reference simulator observe the
  SAME web without any network or shared state;
* fetches are reproducible across executors, waves, restarts and cluster
  sizes (the two-cluster-size scaling bench reads identical input);
* scale is a config knob (10^2 pages for unit tests, 10^7+ for the bench)
  with zero external data.

The link generator deliberately emits messy hrefs (uppercase hosts, default
ports, tracking params, fragments, trailing slashes, junk schemes) so the
canonicalizer (functions/urls.py) does real work, plus duplicate-content
pages and a configurable hot host to exercise content-dedup and skew
handling.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

from sher_look_spark.crawler.imaging import encode_png, phash64


@dataclass(frozen=True)
class SynthWebConfig:
    n_hosts: int = 20
    pages_per_host: int = 50
    seed: int = 42
    min_links: int = 4
    max_links: int = 12
    external_pct: int = 30   # % of real links that point off-host
    hot_host_pct: int = 50   # % of external links that hit host 0 (skew knob)
    messy_pct: int = 60      # % of hrefs written in non-canonical form
    junk_pct: int = 8        # % of hrefs that are mailto:/javascript:/relative
    dup_every: int = 7       # page j duplicates page j-1's content when j%dup_every==0
    robots_every: int = 3    # host i publishes robots.txt when i%robots_every==1
    block_all_every: int = 0 # host i robots-blocks everything when set and i%it==2
    timeout_pct: int = 4     # % of pages whose fetch times out
    img_min: int = 8
    img_max: int = 24
    # page (ci, cj) serves a smooth-gradient JPEG (vs a noise PNG) when
    # cj % jpeg_every == 0 — web-realistic payload mix through the real
    # baseline codec; 0 disables (keeps pre-existing fixtures byte-stable)
    jpeg_every: int = 0
    # page (ci, cj) serves an ICO favicon container when
    # cj % ico_every == 2 (offset 2: disjoint from the jpeg/webp classes
    # at the usual strides) — lossless 32-bit DIB entry, so the PSNR
    # payload contract stays exact
    ico_every: int = 0
    # page (ci, cj) serves a WebP when cj % webp_every == 1 (offset 1 so
    # the jpeg and webp classes never collide): lossy VP8 (vp8codec.py)
    # at >=32 px, VP8L lossless below (the 4:2:0 chroma floor of the lossy
    # format cannot hold the PSNR>=40 contract on couple-of-block images —
    # real web encoders special-case tiny graphics the same way)
    webp_every: int = 0


class FetchResult(NamedTuple):
    status: str              # 'ok' | 'timeout' | 'notfound'
    html: str | None
    title: str | None
    description: str | None
    links: list[str]         # raw hrefs as they appear in the page
    image: bytes | None
    w: int | None
    h: int | None
    fmt: str | None
    caption: str | None
    phash: int | None


_VOCAB = (
    "spark crawl frontier image caption engine wave parquet shuffle "
    "partition robots politeness depth queue index token stem rank link "
    "host page fetch hash bloom salt skew broadcast snapshot lineage"
).split()


def _h(cfg: SynthWebConfig, *parts) -> int:
    key = f"{cfg.seed}|" + "|".join(str(p) for p in parts)
    return int.from_bytes(hashlib.sha256(key.encode()).digest()[:8], "big")


def host_name(cfg: SynthWebConfig, host_idx: int) -> str:
    return f"host{host_idx:04d}.test"


def page_url(cfg: SynthWebConfig, host_idx: int, page_idx: int) -> str:
    return f"http://{host_name(cfg, host_idx)}/page/{page_idx}"


def parse_page_url(cfg: SynthWebConfig, url: str) -> tuple[int, int] | None:
    """Inverse of page_url for canonical (normalized) URLs."""
    prefix = "http://host"
    if not url.startswith(prefix):
        return None
    rest = url[len(prefix):]
    try:
        host_part, page_part = rest.split(".test/page/", 1)
        i, j = int(host_part), int(page_part)
    except ValueError:
        return None
    if 0 <= i < cfg.n_hosts and 0 <= j < cfg.pages_per_host:
        return i, j
    return None


def content_key(cfg: SynthWebConfig, host_idx: int, page_idx: int) -> tuple[int, int]:
    """Duplicate-content mapping: every dup_every-th page mirrors its
    predecessor, so a later-crawled URL hits the content-hash dedup (C9)."""
    if cfg.dup_every and page_idx > 0 and page_idx % cfg.dup_every == 0:
        return host_idx, page_idx - 1
    return host_idx, page_idx


def _words(cfg: SynthWebConfig, tag: str, ci: int, cj: int, n: int) -> list[str]:
    return [_VOCAB[_h(cfg, tag, ci, cj, k) % len(_VOCAB)] for k in range(n)]


def page_links_raw(cfg: SynthWebConfig, host_idx: int, page_idx: int) -> list[str]:
    """Raw hrefs of a page — a mix of canonical, messy and junk forms.

    Link targets derive from the content key so duplicate-content pages carry
    identical link lists (their HTML is byte-identical).
    """
    ci, cj = content_key(cfg, host_idx, page_idx)
    n = cfg.min_links + _h(cfg, "nlinks", ci, cj) % (cfg.max_links - cfg.min_links + 1)
    hrefs: list[str] = []
    for k in range(n):
        r = _h(cfg, "link", ci, cj, k)
        if r % 100 < cfg.junk_pct:
            junk = ("mailto:admin@example.com", "javascript:void(0)", "/relative/path",
                    "ftp://files.test/x")
            hrefs.append(junk[r % len(junk)])
            continue
        if (r >> 8) % 100 < cfg.external_pct:
            if (r >> 16) % 100 < cfg.hot_host_pct:
                ti = 0
            else:
                ti = (r >> 24) % cfg.n_hosts
        else:
            ti = ci
        tj = (r >> 32) % cfg.pages_per_host
        base_host = host_name(cfg, ti)
        canonical_path = f"/page/{tj}"
        m = (r >> 40) % 100
        if m >= cfg.messy_pct:
            hrefs.append(f"http://{base_host}{canonical_path}")
        else:
            variant = (r >> 48) % 5
            if variant == 0:
                hrefs.append(f"HTTP://{base_host.upper()}:80{canonical_path}")
            elif variant == 1:
                hrefs.append(f"http://{base_host}{canonical_path}/")
            elif variant == 2:
                hrefs.append(f"http://{base_host}{canonical_path}?utm_source=synth&ref=x")
            elif variant == 3:
                hrefs.append(f"http://{base_host}{canonical_path}#frag-{k}")
            else:
                hrefs.append(f"http://{base_host}{canonical_path}?b=2&a=1")
    return hrefs


def robots_txt(cfg: SynthWebConfig, host_idx: int) -> str | None:
    """Deterministic robots.txt body for a host (None = no robots.txt)."""
    if cfg.block_all_every and host_idx % cfg.block_all_every == 2:
        return "User-agent: *\nDisallow: /\n"
    if cfg.robots_every and host_idx % cfg.robots_every == 1:
        d = _h(cfg, "robots", host_idx) % 10
        # Disallow a digit-prefix; Allow back a longer sub-prefix (exercises
        # the longest-match + tie-goes-to-disallow precedence, Robots.java:114-136).
        return (
            "User-agent: googlebot\nDisallow: /\n\n"
            "User-agent: *\n"
            f"Disallow: /page/{d}\n"
            f"Allow: /page/{d}{d}\n"
        )
    return None


def page_title(cfg: SynthWebConfig, ci: int, cj: int) -> str:
    return f"Synthetic page {cj} of host {ci}"


def page_html(cfg: SynthWebConfig, host_idx: int, page_idx: int) -> str:
    """Byte-identical for duplicate-content pages (content-hash dedup)."""
    ci, cj = content_key(cfg, host_idx, page_idx)
    body_words = " ".join(_words(cfg, "body", ci, cj, 40))
    anchors = "\n".join(f'<a href="{u}">link {k}</a>' for k, u in
                        enumerate(page_links_raw(cfg, ci, cj)))
    return (
        "<html><head>"
        f"<title>{page_title(cfg, ci, cj)}</title>"
        f'<meta name="description" content="about {" ".join(_words(cfg, "desc", ci, cj, 5))}">'
        "</head><body>"
        f"<h1>{page_title(cfg, ci, cj)}</h1>"
        f"<p>{body_words}</p>"
        f"{anchors}"
        "</body></html>"
    )


def page_image_array(cfg: SynthWebConfig, ci: int, cj: int) -> tuple[np.ndarray, str]:
    """(ideal pixel array, fmt) for page (ci, cj) — the pre-encode reference
    pixels the PSNR fidelity check compares against."""
    rng = np.random.Generator(np.random.PCG64(_h(cfg, "img", ci, cj)))
    span = cfg.img_max - cfg.img_min + 1
    w = cfg.img_min + int(rng.integers(span))
    h = cfg.img_min + int(rng.integers(span))
    is_webp = cfg.webp_every and cj % cfg.webp_every == 1
    if (cfg.jpeg_every and cj % cfg.jpeg_every == 0) or is_webp:
        # smooth half-period 2-D gradients: web-photo-like low-frequency
        # content that survives the lossy codec at PSNR > 40 dB even when
        # the whole image is a couple of 8x8 blocks (full-period harmonics
        # concentrate energy in high DCT bins and fail the target; pure
        # noise fails it by a mile — by design of the fidelity bar)
        y, x = np.mgrid[0:h, 0:w].astype(np.float64)
        chans = []
        for _c in range(3):
            py, px = rng.random(), rng.random()
            chans.append(
                128.0 + 45.0 * np.sin(2 * np.pi * (y / (2 * h) + py))
                * np.cos(2 * np.pi * (x / (2 * w) + px))
            )
        arr = np.clip(np.floor(np.stack(chans, axis=-1)), 0, 255).astype(np.uint8)
        return arr, ("webp" if is_webp else "jpeg")
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if cfg.ico_every and cj % cfg.ico_every == 2:
        return arr, "ico"
    return arr, "png"


def page_image(cfg: SynthWebConfig, ci: int, cj: int) -> tuple[bytes, int, int, str, str, int]:
    """(bytes, w, h, fmt, caption, phash) — derived from the content key."""
    arr, fmt = page_image_array(cfg, ci, cj)
    h, w = arr.shape[:2]
    if fmt == "jpeg":
        from sher_look_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

        # web-sized images get the 4:2:0 subsampling virtually every real
        # web encoder emits; tiny thumbnails stay 4:4:4 (2x2 chroma decimation
        # on a couple-of-blocks image cannot hold the PSNR>=40 dB payload
        # contract, and real encoders special-case small images the same way)
        sub = "420" if min(h, w) >= 32 else "444"
        data = encode_jpeg(arr, quality=93, subsampling=sub)
        # metadata (phash) describes the PAYLOAD as stored, i.e. post-codec
        arr = decode_jpeg(data)
    elif fmt == "webp":
        from sher_look_spark.functions.vp8codec import encode_webp_lossy
        from sher_look_spark.functions.webpcodec import (
            decode_webp,
            encode_webp_lossless,
        )

        # lossy VP8 where the 4:2:0 format can hold PSNR>=40 on this
        # content (qindex 4: worst case ~40.5 dB at 32 px, rising with
        # size); VP8L lossless for tiny graphics — same fmt, the decoder
        # dispatches on the container chunk
        if min(h, w) >= 32:
            data = encode_webp_lossy(arr, qindex=4)
            arr = decode_webp(data)
        else:
            data = encode_webp_lossless(arr)
    elif fmt == "ico":
        from sher_look_spark.functions.icobmp import encode_ico

        # favicon-class payload: ICO container, 32-bit DIB entry (lossless)
        data = encode_ico([(arr, None)])
    else:
        data = encode_png(arr)
    caption = f"img host{ci} page{cj} " + " ".join(_words(cfg, "cap", ci, cj, 4))
    return data, w, h, fmt, caption, phash64(arr)


def fetch(cfg: SynthWebConfig, url: str) -> FetchResult:
    """The 'network': pure-function page fetch keyed by the normalized URL.

    Plays the role of Jsoup.connect(...).get() (CrawlTask.java:104-113):
    timeouts and unknown pages are skip-and-continue conditions.
    """
    parsed = parse_page_url(cfg, url)
    if parsed is None:
        return FetchResult("notfound", None, None, None, [], None, None, None, None, None, None)
    i, j = parsed
    if _h(cfg, "timeout", i, j) % 100 < cfg.timeout_pct:
        return FetchResult("timeout", None, None, None, [], None, None, None, None, None, None)
    ci, cj = content_key(cfg, i, j)
    html = page_html(cfg, i, j)
    img, w, h, fmt, caption, ph = page_image(cfg, ci, cj)
    desc = "about " + " ".join(_words(cfg, "desc", ci, cj, 5))
    return FetchResult(
        "ok", html, page_title(cfg, ci, cj), desc, page_links_raw(cfg, ci, cj),
        img, w, h, fmt, caption, ph,
    )


def seed_urls(cfg: SynthWebConfig, n_seeds: int) -> list[str]:
    """Depth-0 seed list (analog of data/start-pages.txt, 205 seeds).

    Some seeds are deliberately messy; one near the end duplicates seed 0
    after normalization (the reference's visited-set check absorbs it).
    """
    seeds = []
    for s in range(n_seeds):
        i = s % cfg.n_hosts
        if s > 0 and s == n_seeds - 1:
            seeds.append(f"HTTP://{host_name(cfg, 0).upper()}:80/page/0#dup")
        elif s % 4 == 1:
            seeds.append(f"http://{host_name(cfg, i)}/page/0/")
        elif s % 4 == 3:
            seeds.append(f"http://{host_name(cfg, i)}/page/0?utm_campaign=seed")
        else:
            seeds.append(page_url(cfg, i, 0))
    return seeds
