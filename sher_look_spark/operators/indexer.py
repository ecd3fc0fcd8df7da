"""Index tier (SURVEY §2.2 I1-I11) — postings, dictionary, sizes, IDF.

Reference: /root/reference/src/main/java/com/sherlook/search/indexer/Indexer.java
and utils/DatabaseHelper.java. The per-document sequential loop with 10k-row
batch inserts becomes a handful of declarative jobs: tokenize/posexplode into
a postings fact table, aggregate the word dictionary, doc sizes and IDF.

Key exact semantics:
  * positions increment only on kept (non-stop) tokens, running across the
    document's sections in order: title first, then body (Indexer.java:86-104,
    Tokenizer.java:43)
  * section weights at query time: title 2.0 / header 1.5 / body 1.0
  * IDF = ln(N / df + 1) with df = COUNT(DISTINCT doc) — note the +1 sits
    INSIDE the log (DatabaseHelper.java:563)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sher_look_spark.functions.text import kept_tokens_column, porter_stem_udf


def build_postings(
    docs: DataFrame,
    sections: list[tuple[str, str]] | None = None,
    doc_col: str = "doc_id",
    with_stems: bool = False,
) -> DataFrame:
    """documents -> postings(doc_id, section, word, position).

    ``sections``: ordered (section_name, text_column) pairs; position runs
    across sections in list order (title tokenized before body, I3/I4).

    Positions come straight from `posexplode` over the flattened
    (section, kept-token) array — kept-only filtering happens inside each
    section's array (order-preserving), so the cross-section running position
    needs NO shuffle + per-document window (the previous formulation paid an
    Exchange + Sort over every token in the corpus).
    """
    sections = sections or [("body", "text")]

    def _tag(sec_name):
        # NB: must be a 1-arg lambda — a 2-arg lambda would be read by
        # PySpark as transform's (element, index) form
        return lambda t: F.struct(F.lit(sec_name).alias("section"), t.alias("word"))

    flat = F.flatten(
        F.array(
            *[F.transform(kept_tokens_column(col), _tag(name)) for name, col in sections]
        )
    )
    postings = docs.select(doc_col, F.posexplode(flat).alias("position", "sw")).select(
        doc_col, "sw.section", "sw.word", "position"
    )
    if with_stems:
        postings = postings.withColumn("stem", porter_stem_udf("word"))
    return postings


def word_dictionary(postings: DataFrame) -> DataFrame:
    """I7: dictionary with global occurrence counts and deterministic ids
    (xxhash64 replaces the AUTOINCREMENT id, schema.sql:17)."""
    has_stem = "stem" in postings.columns
    aggs = [F.count(F.lit(1)).alias("count")]
    if has_stem:
        aggs.append(F.first("stem").alias("stem"))
    return postings.groupBy("word").agg(*aggs).withColumn("word_id", F.xxhash64("word"))


def document_sizes(postings: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """I9: total kept-token count per document (the TF denominator)."""
    return postings.groupBy(doc_col).agg(F.count(F.lit(1)).alias("document_size"))


def idf_table(postings: DataFrame, n_docs: int | None = None, doc_col: str = "doc_id") -> DataFrame:
    """I11: idf = ln(N / df + 1), df = COUNT(DISTINCT doc) per word."""
    if n_docs is None:
        n_docs = postings.select(doc_col).distinct().count()
    return idf_from_df(
        postings.groupBy("word").agg(F.countDistinct(doc_col).alias("df")), n_docs
    )


def idf_from_df(word_df: DataFrame, n_docs: int) -> DataFrame:
    """I11 from a maintained (word, df) table — the incremental-index path
    skips re-aggregating all postings (DatabaseHelper.java:544-567 semantics,
    same ln(N/df+1) formula)."""
    return word_df.withColumn(
        "idf", F.log(F.lit(float(n_docs)) / F.col("df") + F.lit(1.0))
    )
