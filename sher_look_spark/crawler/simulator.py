"""Single-threaded reference crawler simulator — the fidelity oracle.

A faithful pure-Python rendition of the reference's crawl loop at threads=1
(the configuration its own deterministic tests use,
/root/reference/src/test/resources/application.properties:7):

  Crawler.start()        Crawler.java:87-105   — seed iff queue initially empty
  PersistentQueue        PersistentQueue.java  — FIFO; offer() dedups on the
                          *uncrawled* (url,depth) pair set; cap 50 000; the
                          entry keeps the URL string as offered
  CrawlTask.crawl()      CrawlTask.java:60-205 — normalize(×2) -> visited-set
                          check -> robots -> fetch -> content-hash dedup ->
                          link extraction/offer -> per-depth child top-K ->
                          persist document+links

The Spark wave engine must reproduce this simulator's committed order,
visited set, links table and payloads exactly (BASELINE.json north_rule).
NOT a performance path — it exists only as the equality oracle for tests.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from sher_look_spark.crawler import synth
from sher_look_spark.functions.hashing import sha256_b64url
from sher_look_spark.functions.robots import is_allowed_by_rules, parse_robots_txt
from sher_look_spark.functions.urls import canonicalize_href, normalize_url

DEPTH_LIMITS = {0: 300, 1: 150, 2: 75, 3: 50}  # CrawlTask.java:150-167
DEFAULT_DEPTH_LIMIT = 25


def child_limit(depth: int) -> int:
    return DEPTH_LIMITS.get(depth, DEFAULT_DEPTH_LIMIT)


@dataclass
class SimResult:
    committed: list[dict] = field(default_factory=list)   # in commit order
    visited: set[str] = field(default_factory=set)        # normalized URLs polled
    links: list[tuple[str, str]] = field(default_factory=list)  # (parent, child)
    frontier_final: list[tuple[str, int]] = field(default_factory=list)  # pending at stop
    robots_hosts: set[str] = field(default_factory=set)


def simulate_crawl(
    cfg: synth.SynthWebConfig,
    seeds: list[str],
    max_pages: int = 50_000,
    max_depth: int = 3,
    queue_cap: int = 50_000,
) -> SimResult:
    res = SimResult()
    queue: deque[tuple[str, int]] = deque()
    uncrawled: set[tuple[str, int]] = set()
    visited: set[str] = res.visited
    seen_hashes: set[str] = set()
    robots_rules: dict[str, tuple[list[str], list[str]] | None] = {}

    def offer(url: str, depth: int) -> bool:
        # PersistentQueue.offer :95-117 — pair-dedup + cap; normalize is only
        # a validity gate, the queue stores the URL as offered.
        pair = (url, depth)
        if pair in uncrawled or len(queue) >= queue_cap:
            return False
        if normalize_url(url) is None:
            return False
        queue.append(pair)
        uncrawled.add(pair)
        return True

    for s in seeds:
        offer(s, 0)

    while queue:
        if len(res.committed) >= max_pages:  # CrawlTask.run :50-55
            break
        url_raw, depth = queue.popleft()
        uncrawled.discard((url_raw, depth))

        url = normalize_url(normalize_url(url_raw))  # CrawlTask :71-73
        if url is None:
            continue
        if url in visited:  # CrawlTask :82-93 (memory set + DB check)
            continue
        visited.add(url)

        # robots (fetch once per host base URL) — CrawlTask :96, Robots.java
        from urllib.parse import urlsplit

        parts = urlsplit(url)
        base = f"{parts.scheme}://{parts.hostname}"
        if base not in robots_rules:
            host_page = synth.parse_page_url(cfg, f"{base}/page/0")
            body = synth.robots_txt(cfg, host_page[0]) if host_page else None
            robots_rules[base] = parse_robots_txt(body) if body is not None else None
            res.robots_hosts.add(base)
        rules = robots_rules[base]
        if rules is not None and not is_allowed_by_rules(parts.path, rules[0], rules[1]):
            continue

        page = synth.fetch(cfg, url)
        if page.status != "ok":  # timeout / unsupported: skip-and-continue
            continue

        content_hash = sha256_b64url(page.html)
        if content_hash in seen_hashes:  # CrawlTask :116-128
            continue
        seen_hashes.add(content_hash)

        # link extraction + enqueue (CrawlTask :130-143); 'links' records only
        # the children offer() newly accepted
        new_links: list[str] = []
        for href in page.links:
            child = canonicalize_href(url, href)
            if child is not None and depth < max_depth:
                if offer(child, depth + 1):
                    new_links.append(child)

        # per-depth top-K persisted to the links table (CrawlTask :149-178);
        # Java stream distinct() keeps first occurrence, sorted() is stable
        unique_children: list[str] = []
        seen_child = set()
        for c in new_links:
            if c not in seen_child:
                seen_child.add(c)
                unique_children.append(c)
        unique_children.sort(key=len)  # stable: ties keep discovery order
        limited = unique_children[: child_limit(depth)]
        for c in limited:
            res.links.append((url, c))

        res.committed.append(
            {
                "url": url,
                "depth": depth,
                "title": page.title,
                "description": page.description,
                "content_hash": content_hash,
                "image": page.image,
                "w": page.w,
                "h": page.h,
                "fmt": page.fmt,
                "caption": page.caption,
                "phash": page.phash,
            }
        )

    res.frontier_final = list(queue)
    return res
