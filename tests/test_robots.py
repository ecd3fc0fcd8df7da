"""robots.txt goldens — ported from RobotsTests.java + parse semantics."""

from __future__ import annotations

from sher_look_spark.functions.robots import (
    is_allowed_by_rules,
    is_allowed_url,
    parse_robots_txt,
    rule_to_regex,
)


def test_rule_to_regex_goldens():
    # RobotsTests.java:39-43
    assert rule_to_regex("/private/") == "^/private/.*"
    assert rule_to_regex("/path/*file.html") == "^/path/.*file\\.html.*"
    assert rule_to_regex("/admin/") == "^/admin/.*"
    assert rule_to_regex("/file.php?id=*") == "^/file\\.php\\?id=.*"
    assert rule_to_regex("/admin$") == "^/admin$"


def test_default_allow_without_rules():
    assert is_allowed_by_rules("/page", None, None)
    assert is_allowed_url("http://nonexistent1234567890.com/page", {})


def test_allow_overrides_disallow_with_longer_match():
    # RobotsTests.java:89-108
    allow = ["^/folder/subfolder/.*"]
    disallow = ["^/folder/.*"]
    assert is_allowed_by_rules("/folder/subfolder/file", allow, disallow)


def test_allowed_with_mock_rules():
    # RobotsTests.java:47-65: allow ^/allowed/.* beats disallow ^/.* (longer)
    assert is_allowed_by_rules("/allowed/page", ["^/allowed/.*"], ["^/.*"])


def test_disallowed_with_mock_rules():
    assert not is_allowed_by_rules("/blocked/page", [], ["^/blocked/.*"])


def test_tie_goes_to_disallow():
    # Robots.java:114-136 — allow needs a STRICTLY longer regex to win.
    pat_a = rule_to_regex("/aaa/")  # ^/aaa/.*  (len 8)
    pat_d = rule_to_regex("/aab/")  # same length
    assert len(pat_a) == len(pat_d)
    # Build a path matching both via wildcard-free equality is impossible;
    # use identical-length rules matching the same path:
    assert not is_allowed_by_rules("/xy/page", [rule_to_regex("/xy/")], [rule_to_regex("/xy/")])


def test_parse_robots_accumulates_matching_groups():
    body = """
# comment
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Disallow: /private/
Allow: /private/ok/

User-agent: sher-look-cawler
Disallow: /no-sherlook/
"""
    allow, disallow = parse_robots_txt(body)
    assert allow == ["^/private/ok/.*"]
    assert disallow == ["^/private/.*", "^/no-sherlook/.*"]
    rules = {"http://h.com": (allow, disallow)}
    assert not is_allowed_url("http://h.com/private/x", rules)
    assert is_allowed_url("http://h.com/private/ok/x", rules)
    assert is_allowed_url("http://h.com/public", rules)
    assert is_allowed_url("http://h.com/google-only/x", rules)


def test_empty_path_defaults_to_root():
    assert not is_allowed_by_rules("", [], [rule_to_regex("/")])
    assert not is_allowed_by_rules(None, [], [rule_to_regex("/")])


def test_robots_udf(spark):
    from pyspark.sql import functions as F

    from sher_look_spark.functions.robots import robots_allowed_udf

    rows = [
        ("/folder/subfolder/file", ["^/folder/subfolder/.*"], ["^/folder/.*"], True),
        ("/folder/other", ["^/folder/subfolder/.*"], ["^/folder/.*"], False),
        ("/anything", None, None, True),
        ("/blocked/page", [], ["^/blocked/.*"], False),
    ]
    df = spark.createDataFrame(
        [(p, a, d) for p, a, d, _ in rows],
        "path string, allow array<string>, disallow array<string>",
    )
    got = [
        r.ok
        for r in df.select(
            robots_allowed_udf(F.col("path"), F.col("allow"), F.col("disallow")).alias("ok")
        ).collect()
    ]
    assert got == [e for _, _, _, e in rows]
