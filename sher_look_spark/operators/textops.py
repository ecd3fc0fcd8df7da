"""Text analysis operators for training-data curation (language-ID, quality
scoring, token counting, document fingerprinting).

All four are pure JVM expressions (codegen, no Python) and each has an exact
ANSI-SQL formulation so the DuckDB oracle can verify them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sher_look_spark.functions.text import TOKEN_SPLIT_RE
from sher_look_spark.operators.dedup import shingles_column

# Tiny high-frequency function-word lists; argmax overlap = predicted language.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "dans", "que", "pour", "une", "des"],
    "es": ["el", "la", "los", "que", "de", "en", "es", "por", "con", "para"],
}


def _raw_tokens(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(text_col: str = "text"):
    """Whitespace/punct token count — the BPE-ish budget estimator."""
    return F.size(_raw_tokens(text_col))


def lang_scores(text_col: str = "text") -> dict[str, object]:
    toks = _raw_tokens(text_col)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(words)))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text_col: str = "text"):
    """Predicted language: argmax marker-word hits; ties broken by language
    code order; 0 hits everywhere -> 'und'."""
    scores = lang_scores(text_col)
    langs = sorted(LANG_MARKERS)  # strict ">" scan = alphabetical tie-break
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        cond = scores[lang] > best_score
        new_best = F.when(cond, F.lit(lang)).otherwise(best)
        new_score = F.when(cond, scores[lang]).otherwise(best_score)
        best, best_score = new_best, new_score
    return best


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length features
    + a blended [0,1] quality score (heuristic filter for corpus curation)."""
    toks = _raw_tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace(F.col(text_col), "[^.,;:!?]", ""))
    en = LANG_MARKERS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(en)))
    mean_word_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double") / n_tokens,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.4)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * F.lit(0.2)
    )
    return df.select(
        id_col,
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def fingerprint(text_col: str = "text", n: int = 4):
    """Winnowing-style document fingerprint: minimum sha256-hex prefix over
    word n-gram shingles (string min — portable to any SQL oracle).
    Empty/short docs fingerprint to sha256 of the whole text."""
    sh = shingles_column(text_col, n)
    mins = F.array_min(F.transform(sh, lambda s: F.substring(F.sha2(s, 256), 1, 16)))
    return F.coalesce(mins, F.substring(F.sha2(F.col(text_col), 256), 1, 16))
