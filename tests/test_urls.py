"""URL canonicalizer goldens — ported from the reference JUnit suite
(/root/reference/src/test/java/com/sherlook/search/utils/UrlNormalizerTests.java)."""

from __future__ import annotations

from sher_look_spark.functions.urls import is_absolute, normalize_url, resolve_url


def test_normalize_standard_url_removes_fragment_and_normalizes():
    assert (
        normalize_url("HTTP://EXAMPLE.COM:80/path/?b=2&a=1#fragment")
        == "http://example.com/path?a=1&b=2"
    )


def test_normalize_https_default_port():
    assert (
        normalize_url("HTTPS://EXAMPLE.COM:443/secure/?param=value")
        == "https://example.com/secure?param=value"
    )


def test_normalize_keeps_path_intact():
    assert (
        normalize_url("http://example.com/path/to/page.html")
        == "http://example.com/path/to/page.html"
    )


def test_normalize_preserves_empty_param_value():
    assert (
        normalize_url("http://example.com/path/?empty=&value=something")
        == "http://example.com/path?empty=&value=something"
    )


def test_normalize_invalid_returns_none():
    assert normalize_url("not a url") is None


def test_normalize_preserves_non_default_port():
    assert normalize_url("http://example.com:8080/path/") == "http://example.com:8080/path"


def test_normalize_rejects_non_http_schemes():
    assert normalize_url("mailto:user@example.com") is None
    assert normalize_url("ftp://files.example.com/x") is None
    assert normalize_url("javascript:alert(1)") is None


def test_normalize_drops_tracking_params():
    assert (
        normalize_url("http://example.com/p?utm_source=x&ref=y&b=2&a=1&fbclid=z")
        == "http://example.com/p?a=1&b=2"
    )


def test_normalize_is_idempotent():
    once = normalize_url("HTTP://EXAMPLE.COM:80/path/?b=2&a=1#fragment")
    assert normalize_url(once) == once


def test_is_absolute():
    assert is_absolute("http://example.com")
    assert is_absolute("https://example.com")
    assert is_absolute("ftp://files.example.com")
    assert not is_absolute("mailto:user@example.com")
    assert not is_absolute("/path/page.html")
    assert not is_absolute("//example.com/path")
    assert not is_absolute("example.com")


def test_resolve_relative_path():
    assert resolve_url("http://example.com/base/", "../page.html") == "http://example.com/page.html"


def test_resolve_absolute_returns_unchanged():
    assert (
        resolve_url("http://example.com/base/", "https://another.com/page.html")
        == "https://another.com/page.html"
    )


def test_resolve_empty_relative_returns_base():
    assert resolve_url("http://example.com/base/", "") == "http://example.com/base/"


def test_resolve_preserves_query_and_encoding():
    assert (
        resolve_url("http://example.com/base/", "page.html?param=value")
        == "http://example.com/base/page.html?param=value"
    )
    assert (
        resolve_url("http://example.com/base/", "search?q=test%20query&lang=en")
        == "http://example.com/base/search?q=test%20query&lang=en"
    )


def test_resolve_invalid_base_returns_none():
    assert resolve_url("invalid url", "page.html") is None


def test_normalize_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from sher_look_spark.functions.urls import normalize_url_udf

    urls = [
        "HTTP://EXAMPLE.COM:80/path/?b=2&a=1#fragment",
        "not a url",
        "http://example.com:8080/path/",
        "mailto:user@example.com",
        "https://Sub.HOST.net/A/B/?utm_c=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r.n for r in df.select(normalize_url_udf(F.col("url")).alias("n")).collect()]
    assert got == [normalize_url(u) for u in urls]


def test_canonical_fast_path_is_exact(monkeypatch):
    """The _CANONICAL_RE short-circuit must be a true fixed-point set: for a
    broad URL zoo, fast-path output == full normalization output."""
    import re

    from sher_look_spark.functions import urls as U

    zoo = [
        "http://host0001.test/page/3",
        "http://a-b.c.d/x/y_z~q",
        "http://host.test",
        "http://host.test/p:q@r",
        "http://host.test/a//b",
        "http://host.test/tail.",
        "http://host.test/semi;colon,()'&=$!*+",
        # near-misses that must take the slow path (and change or reject):
        "http://host.test/",
        "http://HOST.test/x",
        "HTTP://host.test/x",
        "http://host.test:80/x",
        "http://host.test/x?b=2&a=1",
        "http://host.test/x#f",
        "https://host.test/x",
        "http://user@host.test/x",
        "http://host.test/x%20y",
        "http://host.test/x y",
        "ftp://host.test/x",
    ]
    fast = [U.normalize_url(u) for u in zoo]
    never = re.compile(r"(?!x)x")
    monkeypatch.setattr(U, "_CANONICAL_RE", never)
    slow = [U.normalize_url(u) for u in zoo]
    assert fast == slow
    # and the fast path actually fires for the canonical ones
    assert U._CANONICAL_RE is never  # monkeypatch sanity
