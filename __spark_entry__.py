"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship search-ranking pipeline (tokenize -> IDF -> TF-IDF ->
               top-k with snippets) over sf0.001.
queries()    — one entry per implemented operator from SURVEY.md §2 plus the
               training-data operator family (see sher_look_spark/queries.py).
oracle_sql() — equivalent DuckDB SQL per query (omitted only for genuinely
               non-SQL-expressible ops: PageRank iteration, xxhash64-based
               MinHash/SimHash/LSH — those get rows-only checks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: rank documents for a keyword
    query by TF-IDF and attach hit snippets."""
    from pyspark.sql import functions as F

    from sher_look_spark.operators.indexer import idf_table
    from sher_look_spark.operators.ranking import snippets, tfidf_scores_onepass
    from sher_look_spark.queries import QUERY_TERMS, _spark_tokens, load

    sf_dir = "/root/testdata/sf0.001"
    docs = load(spark, sf_dir, "documents")
    toks = _spark_tokens(spark, sf_dir).withColumn("section", F.lit("body"))
    # query-term idf pruning + one-pass scorer (identical result — see
    # queries.q_q4_tfidf)
    idf = idf_table(toks.filter(F.col("word").isin(QUERY_TERMS)), n_docs=docs.count())
    scores = tfidf_scores_onepass(toks, idf, QUERY_TERMS)
    # paginate FIRST (TakeOrderedAndProject), then snippets for just the
    # shown docs — the reference's order (Ranker.java:623-637 -> :527-621);
    # corpus-wide snippet generation is unbounded for a frequent term
    top = (
        scores.orderBy(F.desc("tfidf"), "doc_id").limit(10)
        .localCheckpoint(eager=True)  # consumed twice below; plan is the whole ranking
    )
    page_toks = toks.join(F.broadcast(top.select("doc_id")), "doc_id", "left_semi")
    snips = snippets(page_toks, QUERY_TERMS, window=15)
    return (
        top.join(snips, "doc_id", "left")
        .orderBy(F.desc("tfidf"), "doc_id")
        .select("doc_id", F.round("tfidf", 6).alias("tfidf"), "snippet")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sher_look_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from sher_look_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
