"""Vectorized scalar-function surface of the engine.

Submodules:
* ``urls``    — RFC-3986-ish canonicalization with the reference's exact rules
* ``hashing`` — content/url hashing (sha256-b64url, xxhash64-compatible ids)
* ``robots``  — robots.txt parsing + longest-match allow/disallow evaluation
* ``text``    — tokenization, stop words, Porter stemming, quality/lang-id
"""

from sher_look_spark.functions.urls import (  # noqa: F401
    is_absolute,
    normalize_url,
    normalize_url_udf,
    resolve_url,
)
