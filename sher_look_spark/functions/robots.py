"""robots.txt parsing + allow/disallow evaluation.

Reference: /root/reference/src/main/java/com/sherlook/search/crawler/Robots.java
  * ruleToRegex       :145-157  (escape specials except '*' and '$'; '*'->'.*';
                                 implicit '.*' suffix unless '$'/'.*'-terminated;
                                 '^' anchor)
  * fetch/parse       :19-94    (accumulate Allow/Disallow under 'User-agent: *'
                                 or 'sher-look-cawler' [sic])
  * isAllowed         :96-143   (default allow; longest REGEX-string match wins;
                                 allow beats disallow only with STRICTLY longer
                                 match — tie goes to disallow because the
                                 disallow loop runs first)

In the Spark engine the static per-host cache becomes a ``robots`` DataFrame
(host, allow array<string>, disallow array<string>) joined to candidates and
evaluated with an Arrow-batched pandas UDF (`robots_allowed_udf`).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

USER_AGENT = "sher-look-cawler"  # [sic] — the reference's robots UA, Robots.java:40

_SPECIALS_RE = re.compile(r"([\\.\+\?\^\{\}\(\)\[\]\|])")


def rule_to_regex(rule: str) -> str:
    """Port of Robots.ruleToRegex — goldens in RobotsTests.java:34-44."""
    escaped = _SPECIALS_RE.sub(r"\\\1", rule)
    escaped = escaped.replace("*", ".*")
    if not escaped.endswith("$") and not escaped.endswith(".*"):
        escaped += ".*"
    return "^" + escaped


def parse_robots_txt(body: str, user_agent: str = USER_AGENT) -> tuple[list[str], list[str]]:
    """Parse a robots.txt body into (allow_regexes, disallow_regexes).

    Mirrors Robots.fetchRobots :52-68: rules accumulate across every matching
    ``User-agent:`` group ('*' or our own UA); no reset between groups.
    """
    allow: list[str] = []
    disallow: list[str] = []
    my_agent = False
    for raw in body.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        low = line.lower()
        if low.startswith("user-agent:"):
            agent = line[len("user-agent:"):].strip().lower()
            my_agent = agent == "*" or agent == user_agent
        elif low.startswith("disallow:") and my_agent:
            disallow.append(rule_to_regex(line[len("disallow:"):].strip()))
        elif low.startswith("allow:") and my_agent:
            allow.append(rule_to_regex(line[len("allow:"):].strip()))
    return allow, disallow


def is_allowed_by_rules(
    path: str | None, allow: list[str] | None, disallow: list[str] | None
) -> bool:
    """Port of Robots.isAllowed precedence (Robots.java:114-137).

    ``allow``/``disallow`` are regex strings from :func:`rule_to_regex`;
    None means "no robots.txt entry for the host" -> default allow.
    """
    if allow is None and disallow is None:
        return True
    if not path:
        path = "/"
    allowed = True
    matched_length = -1
    for pat in disallow or []:
        if re.fullmatch(pat, path):
            if len(pat) > matched_length:
                matched_length = len(pat)
                allowed = False
    for pat in allow or []:
        if re.fullmatch(pat, path):
            if len(pat) > matched_length:
                matched_length = len(pat)
                allowed = True
    return allowed


def is_allowed_url(url: str, rules_by_host: dict[str, tuple[list[str], list[str]]]) -> bool:
    """Driver/simulator-side helper: evaluate a full URL against a host->rules map."""
    parts = urlsplit(url)
    base = f"{parts.scheme}://{parts.hostname}"
    rules = rules_by_host.get(base)
    if rules is None:
        return True
    return is_allowed_by_rules(parts.path, rules[0], rules[1])


@pandas_udf(BooleanType())
def robots_allowed_udf(
    paths: pd.Series, allow_rules: pd.Series, disallow_rules: pd.Series
) -> pd.Series:
    """Vectorized allow check: (path, allow array, disallow array) per row.

    Null rule arrays (left-join miss on the robots table) -> default allow.
    Compiled-regex results are memoized per (ruleset, path) inside the batch —
    per-host rulesets repeat heavily since candidates are host-clustered.
    """
    cache: dict[tuple, bool] = {}

    def check(path, allow, disallow):
        a = tuple(allow) if allow is not None else None
        d = tuple(disallow) if disallow is not None else None
        key = (path, a, d)
        hit = cache.get(key)
        if hit is None:
            hit = cache[key] = is_allowed_by_rules(
                path, list(a) if a is not None else None, list(d) if d is not None else None
            )
        return hit

    return pd.Series(
        [check(p, a, d) for p, a, d in zip(paths, allow_rules, disallow_rules)],
        dtype="boolean",
    )
