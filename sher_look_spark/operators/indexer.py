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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sher_look_spark.functions.text import porter_stem_udf, stop_words, tokens_column


def build_postings(
    docs: DataFrame,
    sections: list[tuple[str, str]] | None = None,
    doc_col: str = "doc_id",
    with_stems: bool = False,
) -> DataFrame:
    """documents -> postings(doc_id, section, word, position).

    ``sections``: ordered (section_name, text_column) pairs; position runs
    across sections in list order (title tokenized before body, I3/I4).
    """
    sections = sections or [("body", "text")]
    section_struct = F.array(
        *[
            F.struct(
                F.lit(i).alias("sec_ord"),
                F.lit(name).alias("section"),
                tokens_column(col).alias("toks"),
            )
            for i, (name, col) in enumerate(sections)
        ]
    )
    exploded = (
        docs.select(doc_col, F.explode(section_struct).alias("s"))
        .select(doc_col, "s.sec_ord", "s.section", F.posexplode("s.toks").alias("raw_pos", "word"))
        .filter(F.col("word") != "")
        .filter(~F.col("word").isin(sorted(stop_words())))
    )
    w = Window.partitionBy(doc_col).orderBy("sec_ord", "raw_pos")
    postings = exploded.withColumn("position", F.row_number().over(w) - F.lit(1)).drop(
        "raw_pos", "sec_ord"
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
