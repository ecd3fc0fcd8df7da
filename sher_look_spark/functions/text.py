"""Tokenization + stop words + stemming surface (index tier I4-I6).

Reference semantics (/root/reference/src/main/java/com/sherlook/search/indexer/):
  * Tokenizer.java:24-50 — lowercase, split on \\W+, drop empties and stop
    words; the running position counter increments ONLY on kept tokens.
  * StopWordsFilter.java:15-34 — 1297-word list (data/stop-words.txt).
  * Stemmer.java:16-42 — Porter stemmer; stored alongside the surface form.

Spark mapping: tokenization is pure built-ins (`lower` + `split` +
`posexplode` + broadcast stop-word anti-filter) so it stays inside
whole-stage codegen; only stemming needs Python, as an Arrow-batched
pandas UDF with per-batch memoization.
"""

from __future__ import annotations

import re
from functools import lru_cache
from importlib import resources

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from sher_look_spark.functions.porter import porter_stem

TOKEN_SPLIT_RE = r"\W+"  # Tokenizer.java:33


@lru_cache(maxsize=1)
def stop_words() -> frozenset[str]:
    """The reference's stop-word list (data/stop-words.txt, 1297 entries)."""
    body = (
        resources.files("sher_look_spark").joinpath("data/stop-words.txt").read_text("utf-8")
    )
    return frozenset(w.strip() for w in body.splitlines() if w.strip())


def tokenize_py(text: str) -> list[str]:
    """Driver/simulator-side tokenizer: lowercase, \\W+ split, stop-word drop."""
    sw = stop_words()
    return [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t and t not in sw]


def tokenize_with_positions_py(text: str, start_pos: int = 0) -> list[tuple[str, str, int]]:
    """(token, stem, position) triples; positions count kept tokens only
    (Tokenizer.java:43)."""
    out = []
    pos = start_pos
    for tok in tokenize_py(text):
        out.append((tok, porter_stem(tok), pos))
        pos += 1
    return out


@pandas_udf(StringType())
def porter_stem_udf(words: pd.Series) -> pd.Series:
    cache: dict[str, str] = {}

    def stem(w):
        if w is None:
            return None
        s = cache.get(w)
        if s is None:
            s = cache[w] = porter_stem(w)
        return s

    return words.map(stem)


def tokens_column(text_col: Column | str) -> Column:
    """array<string> of raw lowercase \\W+ tokens (JVM-side, codegen)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(c), TOKEN_SPLIT_RE)


@lru_cache(maxsize=1)
def _kept_filter_sql() -> str:
    """The stop-word NOT IN predicate pre-rendered as ONE SQL fragment.

    Building ``t.isin(*1297 words)`` through the DataFrame API creates one
    py4j literal per word — ~0.7 s of driver time per call (measured);
    handing the parser a single string costs milliseconds and resolves to
    the identical InSet predicate."""
    quoted = ",".join("'" + w.replace("'", "''") + "'" for w in sorted(stop_words()))
    return f"t -> t != '' AND t NOT IN ({quoted})"


def kept_tokens_column(text_col: Column | str, drop_stop_words: bool = True) -> Column:
    """array<string> of KEPT tokens (empties and, optionally, stop words
    removed) in document order — entirely JVM-side.

    Because `filter` preserves array order, the kept array's element index IS
    the reference position (positions advance only on kept tokens,
    Tokenizer.java:43): a later `posexplode` yields positions directly, with
    no per-document shuffle + window re-rank."""
    if drop_stop_words and isinstance(text_col, str):
        # string-name fast path: the whole tokenize+filter renders as one
        # parsed SQL expression (see _kept_filter_sql); `\\W+` re-escapes
        # for the SQL string literal
        sql_re = TOKEN_SPLIT_RE.replace("\\", "\\\\")
        return F.expr(
            f"filter(split(lower({text_col}), '{sql_re}'), {_kept_filter_sql()})"
        )
    c = tokens_column(text_col)
    if drop_stop_words:
        sw = sorted(stop_words())
        return F.filter(c, lambda t: (t != "") & ~t.isin(sw))
    return F.filter(c, lambda t: t != "")


def explode_tokens(
    df: DataFrame,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id",),
    with_stems: bool = False,
    drop_stop_words: bool = True,
) -> DataFrame:
    """documents -> one row per kept token with its reference-exact position.

    Position semantics: empties/stop words are dropped INSIDE the token array
    (order-preserving `filter`), so `posexplode` indexes kept tokens only —
    matching Tokenizer.java:43 with zero shuffles (the previous formulation
    re-ranked exploded rows with a per-document window, paying an Exchange +
    Sort over every token in the corpus)."""
    toks = df.select(
        *keep_cols,
        F.posexplode(kept_tokens_column(text_col, drop_stop_words)).alias("position", "word"),
    ).select(*keep_cols, "word", "position")
    if with_stems:
        toks = toks.withColumn("stem", porter_stem_udf("word"))
    return toks
