"""Index + serve tiers over crawled pages — the reference's `index` and
`serve` run modes (Application.java:15-48) as DataFrame jobs over the crawl
engine's snapshot tables.

index_pages: pages(html) -> postings/doc-metadata/sizes/IDF with the
reference's exact extraction semantics (functions/htmlparse.py) and
kept-token positions running title -> document-order sections.

pagerank_from_links: the link graph exactly as DatabaseHelper.getLinks
(:451-466) builds it — edges only between crawled documents (target URL
resolved against the documents table), every crawled doc a vertex.

search_pages: Q1-Q11 end-to-end over a crawl state dir.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sher_look_spark.crawler.storage import SnapshotStore
from sher_look_spark.functions.hashing import url_hash64
from sher_look_spark.functions.htmlparse import extract_fields
from sher_look_spark.functions.text import stop_words, tokens_column

PARSE_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField(
            "sections",
            T.ArrayType(
                T.StructType(
                    [T.StructField("sec", T.StringType()), T.StructField("txt", T.StringType())]
                )
            ),
        ),
    ]
)


def _parse_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(PARSE_SCHEMA)
    def parse(html: pd.Series) -> pd.DataFrame:
        titles, descs, secs = [], [], []
        for h in html:
            t, d, s = extract_fields(h or "")
            titles.append(t)
            descs.append(d)
            secs.append(s)
        return pd.DataFrame({"title": titles, "description": descs, "sections": secs})

    return parse


def index_pages(pages: DataFrame) -> dict[str, DataFrame]:
    """pages(url, html, ...) -> {documents_meta, postings, doc_sizes, idf}."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def uh(urls: pd.Series) -> pd.Series:
        return urls.map(url_hash64)

    parsed = pages.withColumn("p", _parse_udf()("html")).withColumn("doc_id", uh("url")).persist()
    meta = parsed.select(
        "doc_id", "url", F.col("p.title").alias("title"),
        F.col("p.description").alias("description"),
    )
    sec = parsed.select(
        "doc_id", F.posexplode("p.sections").alias("sec_ord", "s")
    ).select("doc_id", "sec_ord", F.col("s.sec").alias("section"), F.col("s.txt").alias("txt"))
    raw = sec.select(
        "doc_id", "sec_ord", "section", F.posexplode(tokens_column("txt")).alias("raw_pos", "word")
    ).filter(F.col("word") != "")
    kept = raw.filter(~F.col("word").isin(sorted(stop_words())))
    w = Window.partitionBy("doc_id").orderBy("sec_ord", "raw_pos")
    postings = kept.withColumn("position", F.row_number().over(w) - F.lit(1)).select(
        "doc_id", "section", "word", "position"
    )
    from sher_look_spark.operators.indexer import document_sizes, idf_table

    sizes = document_sizes(postings)
    n_docs = pages.count()
    idf = idf_table(postings, n_docs=n_docs)
    return {"documents_meta": meta, "postings": postings, "doc_sizes": sizes, "idf": idf}


def index_incremental(spark: SparkSession, store: SnapshotStore) -> dict[str, int]:
    """I1: the reference's `index` run mode — index only documents whose
    index_time IS NULL (DatabaseHelper.java:122-135). The crawled-docs view
    left-joins `documents_meta`; rows with a NULL index_time are the to-do
    set, exactly the reference's predicate (no side table). Appended meta
    rows carry the reference's documents-table columns (schema.sql:4-15):
    crawl_time (from the crawl tier), index_time (stamped here),
    document_size; page_rank is filled by store_pagerank. Idempotent across
    crashes: the manifest commit is atomic."""
    pages = store.read(spark, "pages")
    if pages is None:
        return {"indexed": 0}
    meta = store.read(spark, "documents_meta")
    todo = pages
    if meta is not None:
        docview = pages.join(
            meta.select("url", "index_time"), "url", "left"
        )
        todo = docview.filter(F.col("index_time").isNull()).drop("index_time")
    todo = todo.persist()
    n = todo.count()
    if n == 0:
        todo.unpersist()
        return {"indexed": 0}
    idx = index_pages(todo)
    images = store.read(spark, "images")
    new_meta = idx["documents_meta"].join(
        idx["doc_sizes"], "doc_id", "left"
    ).withColumn("index_time", F.current_timestamp())
    if images is not None and "crawl_time" in images.columns:
        new_meta = new_meta.join(images.select("url", "crawl_time"), "url", "left")
    else:
        new_meta = new_meta.withColumn("crawl_time", F.lit(None).cast("timestamp"))
    new_meta = new_meta.withColumn("page_rank", F.lit(None).cast("double")).select(
        "doc_id", "url", "title", "description", "document_size",
        "crawl_time", "index_time", "page_rank",
    )
    snap = store.latest()
    wave = (snap.state.get("index_runs", 0) if snap else 0) + 1
    appends = {
        "postings": [store.stage_write(idx["postings"], "postings", wave)],
        "documents_meta": [store.stage_write(new_meta, "documents_meta", wave)],
    }
    state = dict(snap.state) if snap else {}
    state["index_runs"] = wave
    store.commit(appends=appends, state=state)
    todo.unpersist()
    return {"indexed": n}


def store_pagerank(spark: SparkSession, store: SnapshotStore) -> DataFrame:
    """The reference's `page-rank` run mode: compute PageRank over the link
    graph and persist it into the documents metadata (the distributed MERGE
    analog of DatabaseHelper.updatePageRank :483). Rewrites documents_meta
    with the page_rank column filled; returns the new meta frame."""
    meta = store.read(spark, "documents_meta")
    if meta is None:
        raise ValueError("run index_incremental before page-rank")
    pr = pagerank_from_links(spark, store)
    new_meta = (
        meta.drop("page_rank")
        .join(pr.withColumnRenamed("id", "doc_id").withColumnRenamed("rank", "page_rank"),
              "doc_id", "left")
        .select(*meta.columns)
    )
    snap = store.latest()
    wave = (snap.state.get("index_runs", 0) if snap else 0)
    rel = store.stage_write(new_meta, "documents_meta", wave)
    store.commit(replaces={"documents_meta": [rel]}, state=dict(snap.state))
    return store.read(spark, "documents_meta")


def pagerank_from_links(spark: SparkSession, store: SnapshotStore) -> DataFrame:
    """(id=url_hash, rank) over the crawled link graph (both-ends-crawled edges)."""
    from pyspark.sql.functions import pandas_udf

    from sher_look_spark.operators.ranking import pagerank

    @pandas_udf(T.LongType())
    def uh(urls: pd.Series) -> pd.Series:
        return urls.map(url_hash64)

    images = store.read(spark, "images")
    links = store.read(spark, "links")
    verts = images.select(uh("url").alias("id")).distinct()
    if links is None:
        return pagerank(spark, verts, spark.createDataFrame([], "src long, dst long"))
    edges = (
        links.select(uh("parent_url").alias("src"), uh("child_url").alias("dst"))
        .join(verts.select(F.col("id").alias("dst")), "dst", "left_semi")
    )
    return pagerank(spark, verts, edges)


def search_pages(
    spark: SparkSession, state_dir: str, query: str, page: int = 1, per_page: int = 10
) -> DataFrame:
    """The `serve` tier: ranked (url, title, final_score, snippet) page slice."""
    from sher_look_spark.operators.query_parse import parse_query, search
    from sher_look_spark.operators.ranking import snippets

    store = SnapshotStore(state_dir)
    pages = store.read(spark, "pages")
    idx = index_pages(pages)
    pr = pagerank_from_links(spark, store)
    ranked = search(
        spark, idx["postings"], idx["doc_sizes"], idx["idf"], pr, query, page, per_page
    )
    parsed = parse_query(query)
    terms = parsed.tokens if parsed and not parsed.is_phrase else [
        t for p in (parsed.phrases if parsed else []) for t in p.split()
    ]
    snips = snippets(idx["postings"], terms) if terms else None
    out = ranked.join(idx["documents_meta"], "doc_id", "left")
    if snips is not None:
        out = out.join(snips, "doc_id", "left")
    else:
        out = out.withColumn("snippet", F.lit(None).cast("string"))
    return out.select("url", "title", "final_score", "snippet").orderBy(
        F.desc("final_score"), "url"
    )
