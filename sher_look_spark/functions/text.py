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

    Position semantics: empties/stop words are dropped from the token
    stream in document order, so the kept index IS the reference position
    (positions advance only on kept tokens, Tokenizer.java:43) — zero
    shuffles either way.

    Execution: one `mapInArrow` stage running RE2 split + vectorized
    stop-word membership + numpy position arithmetic per record batch
    (guide §4.2 — hand whole batches to native code). Same \\W semantics as
    the JVM/DuckDB regex engines (ASCII word chars); parity with the
    higher-order-function formulation and the Python reference tokenizer is
    pinned by tests. The JVM path (`kept_tokens_column` + posexplode)
    measured ~30x slower per batch (interpreted per-element lambda with an
    InSet probe per token) and remains available for Column inputs."""
    import pyarrow as pa

    out_fields = [df.schema[c] for c in keep_cols]
    from pyspark.sql import types as T

    out_schema = T.StructType(
        out_fields
        + [T.StructField("word", T.StringType()), T.StructField("position", T.IntegerType())]
    )
    drop = drop_stop_words
    sw_sorted = sorted(stop_words()) if drop else None
    split_re = TOKEN_SPLIT_RE
    keep_list = list(keep_cols)
    text_name = text_col

    def tokenize_batches(batches):
        import numpy as np
        import pyarrow.compute as pc

        sw_arr = pa.array(sw_sorted, type=pa.string()) if drop else None
        for batch in batches:
            tab = pa.table(batch)
            toks = pc.split_pattern_regex(
                pc.utf8_lower(tab.column(text_name).combine_chunks()), split_re
            )
            flat = pc.list_flatten(toks)
            parent = pc.list_parent_indices(toks)
            keep = pc.not_equal(flat, "")
            if drop:
                keep = pc.and_(keep, pc.invert(pc.is_in(flat, value_set=sw_arr)))
            words = pc.filter(flat, keep)
            kept_parent = pc.filter(parent, keep).to_numpy(zero_copy_only=False)
            # running kept-token index per doc: parents arrive non-decreasing
            starts = np.flatnonzero(np.diff(kept_parent, prepend=-1))
            run_len = np.diff(np.append(starts, len(kept_parent)))
            pos = np.arange(len(kept_parent), dtype=np.int32) - np.repeat(
                starts.astype(np.int32), run_len
            )
            cols = [
                tab.column(c).take(kept_parent).combine_chunks() for c in keep_list
            ]
            yield pa.record_batch(
                cols + [words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words,
                        pa.array(pos, type=pa.int32())],
                names=keep_list + ["word", "position"],
            )

    toks = df.select(*keep_cols, text_col).mapInArrow(tokenize_batches, out_schema)
    if with_stems:
        toks = toks.withColumn("stem", porter_stem_udf("word"))
    return toks
