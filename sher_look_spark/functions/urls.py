"""URL canonicalization — semantics of the reference normalizer, vectorized.

Reference: /root/reference/src/main/java/com/sherlook/search/utils/UrlNormalizer.java
(normalize :31-89, excluded params :16-29, isAbsolute :91-93, resolve :95-102).

Rules (must match the reference's JUnit goldens, UrlNormalizerTests.java):
  * reject non-http(s) schemes and syntactically invalid URLs -> None
  * lowercase scheme and host
  * drop default ports (http:80, https:443); keep any other port
  * drop the fragment
  * strip ONE trailing "/" from the path
  * drop query params whose key starts with "utm_" or is in
    {ref, fbclid, geo_filter, cId, iId}; sort the surviving "k=v" strings
    lexicographically; omit "?" when nothing survives

The hot path is ``normalize_url_udf`` — an Arrow-batched pandas UDF applying
the pure-Python ``normalize_url`` over a pd.Series (no per-row Python UDF in
the Spark plan; the loop runs inside one Arrow batch).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType

EXCLUDED_PARAMS = frozenset({"ref", "fbclid", "geo_filter", "cId", "iId"})

# Same pattern as the reference's isAbsolute (UrlNormalizer.java:92) — note the
# character class contains the *range* '+'..'.' exactly as Java interprets it.
_ABSOLUTE_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+-.]*://")

# Characters java.net.URI rejects outright (unencoded whitespace and friends).
_ILLEGAL_RE = re.compile(r"[\s<>\"{}|\\^`]")

_RESOLVABLE_SCHEMES = ("http", "https", "ftp", "file")

# Fixed points of normalize_url, provable by the regex alone: lowercase http
# scheme+host, no userinfo/port/query/fragment/percent-escapes, path absent
# or starting with '/' and not ending in one. Such URLs pass normalize_url
# unchanged, so they short-circuit — on a real crawl the bulk of frontier
# URLs are already canonical (they were normalized when enqueued), and this
# one regex test replaces a urlsplit + filter + sort per URL per wave.
_CANONICAL_RE = re.compile(r"http://[a-z0-9.-]+(?:/[A-Za-z0-9._~!$&'()*+,;=:@/-]*[A-Za-z0-9._~!$&'()*+,;=:@-])?")


def normalize_url(url: str | None) -> str | None:
    """Pure-Python port of UrlNormalizer.normalize (idempotent)."""
    if url is None:
        return None
    if _CANONICAL_RE.fullmatch(url):
        return url
    if _ILLEGAL_RE.search(url):
        return None  # java.net.URI -> URISyntaxException -> null
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    try:
        host = parts.hostname
        port = parts.port  # raises ValueError on non-numeric port
    except ValueError:
        return None
    if not host:
        return None
    host = host.lower()

    if port is not None and (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        port = None

    path = parts.path
    if path.endswith("/"):
        path = path[:-1]

    query = parts.query or None
    if query is not None:
        filtered = []
        for param in query.split("&"):
            key = param.split("=")[0]
            if not key.startswith("utm_") and key not in EXCLUDED_PARAMS:
                filtered.append(param)
        query = "&".join(sorted(filtered)) if filtered else None

    out = scheme + "://" + host
    if port is not None:
        out += f":{port}"
    out += path
    if query is not None:
        out += "?" + query
    return out


def is_absolute(url: str | None) -> bool:
    """Port of UrlNormalizer.isAbsolute (UrlNormalizer.java:91-93)."""
    return bool(url) and _ABSOLUTE_RE.search(url) is not None


def resolve_url(base: str | None, relative: str | None) -> str | None:
    """Port of UrlNormalizer.resolve (UrlNormalizer.java:95-102)."""
    if base is None or relative is None:
        return None
    if _ILLEGAL_RE.search(base) or _ILLEGAL_RE.search(relative):
        return None
    try:
        resolved = urljoin(base, relative)
    except ValueError:
        return None
    # java URI.resolve(...).toURL() throws unless the result is an absolute
    # URL with a known protocol.
    if not resolved.lower().startswith(tuple(s + ":" for s in _RESOLVABLE_SCHEMES)):
        return None
    return resolved


def canonicalize_href(base_url: str, href: str) -> str | None:
    """Child-link canonicalization as the reference does it:
    Jsoup ``absUrl("href")`` (resolve against the page URL) followed by
    ``UrlNormalizer.normalize`` and the isAbsolute gate (CrawlTask.java:132-137).
    Returns the normalized absolute child URL, or None if rejected."""
    if _ABSOLUTE_RE.search(href):
        resolved = href
    else:
        resolved = resolve_url(base_url, href)
        if resolved is None:
            return None
    child = normalize_url(resolved)
    if child is None or not is_absolute(child):
        return None
    return child


def _normalize_series(urls: pd.Series) -> pd.Series:
    return urls.map(normalize_url)


@pandas_udf(StringType())
def normalize_url_udf(urls: pd.Series) -> pd.Series:
    """Arrow-batched canonicalizer for DataFrame pipelines (SURVEY §2 C3)."""
    return _normalize_series(urls)


@pandas_udf(BooleanType())
def is_absolute_udf(urls: pd.Series) -> pd.Series:
    return urls.map(is_absolute).astype("boolean")


@pandas_udf(StringType())
def canonicalize_href_udf(base_urls: pd.Series, hrefs: pd.Series) -> pd.Series:
    """Arrow-batched child-link canonicalization (SURVEY §2 C10): resolve the
    href against its page URL, normalize, gate on absoluteness."""
    return pd.Series([canonicalize_href(b, h) for b, h in zip(base_urls, hrefs)])
