"""Query/rank tier (SURVEY §2.3 Q1-Q11) — TF-IDF, PageRank, phrase, snippets.

Reference: /root/reference/src/main/java/com/sherlook/search/ranker/Ranker.java.
Numeric goldens ported from RankerTests.java (TF-IDF ±0.001, PageRank graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SECTION_WEIGHTS = {"title": 2.0, "header": 1.5, "body": 1.0}  # Ranker.java:22-23
DAMPING = 0.85          # Ranker.java:24
CONVERGENCE = 1e-5      # Ranker.java:25
MAX_ITERATIONS = 100    # Ranker.java:26
TFIDF_WEIGHT = 0.7      # Ranker.java:27
PAGERANK_WEIGHT = 0.3   # Ranker.java:28


def section_weight_col(section_col: str = "section"):
    c = F.col(section_col)
    expr = F.lit(1.0)  # SECTION_WEIGHTS.getOrDefault(section, 1.0)
    for name, wgt in SECTION_WEIGHTS.items():
        expr = F.when(c == name, F.lit(wgt)).otherwise(expr)
    return expr


def tfidf_scores(
    postings: DataFrame,
    doc_sizes: DataFrame,
    idf: DataFrame,
    query_terms: list[str],
    doc_col: str = "doc_id",
    missing_idf_default: float = 0.0,
) -> DataFrame:
    """Q4: score = Σ_terms Σ_sections (freq/doc_size)·weight(section)·idf(term).

    ``missing_idf_default``: 0.0 for keyword mode (Ranker.java:89), 1.0 for
    phrase mode (Ranker.java:319).
    """
    terms = postings.sparkSession.createDataFrame([(t,) for t in query_terms], "word string")
    hits = postings.join(F.broadcast(terms), "word")
    freqs = hits.groupBy(doc_col, "word", "section").agg(F.count(F.lit(1)).alias("freq"))
    scored = (
        freqs.join(doc_sizes, doc_col)
        .join(F.broadcast(idf.select("word", "idf")), "word", "left")
        .withColumn("idf", F.coalesce(F.col("idf"), F.lit(missing_idf_default)))
        .withColumn(
            "contrib",
            F.col("freq") / F.col("document_size") * section_weight_col() * F.col("idf"),
        )
    )
    return scored.groupBy(doc_col).agg(F.sum("contrib").alias("tfidf"))


def pagerank(
    spark: SparkSession,
    vertices: DataFrame,
    edges: DataFrame,
    damping: float = DAMPING,
    tol: float = CONVERGENCE,
    max_iter: int = MAX_ITERATIONS,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Q8: power iteration with uniform dangling redistribution — exact
    reference semantics (Ranker.java:128-187) including the quirk that on
    convergence the PREVIOUS iterate is returned (the loop breaks before the
    swap at :178).

    vertices: (id) — every node, linked or not; edges: (src, dst).
    Returns (id, rank). Iterative DataFrame job; lineage cut by
    localCheckpoint every ``checkpoint_every`` iterations so plans stay flat
    at cluster scale.
    """
    n = vertices.count()
    if n == 0:
        return vertices.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))
    verts = vertices.join(out_deg, "id", "left").fillna({"out_degree": 0}).persist()
    prev = verts.select("id", "out_degree", F.lit(1.0 / n).alias("rank")).persist()

    base = (1.0 - damping) / n
    for i in range(max_iter):
        dangling = (
            prev.filter(F.col("out_degree") == 0).agg(F.sum("rank")).collect()[0][0] or 0.0
        )
        dangling_contrib = dangling / n
        contribs = (
            prev.join(edges, prev.id == edges.src)
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("out_degree")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("in_sum"))
        )
        cur = (
            verts.join(contribs, "id", "left")
            .select(
                "id",
                "out_degree",
                (
                    F.lit(base)
                    + F.lit(damping) * (F.coalesce(F.col("in_sum"), F.lit(0.0)) + F.lit(dangling_contrib))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
        else:
            cur = cur.persist()
        max_diff = (
            cur.alias("c")
            .join(prev.alias("p"), "id")
            .agg(F.max(F.abs(F.col("c.rank") - F.col("p.rank"))))
            .collect()[0][0]
        )
        if max_diff is not None and max_diff < tol:
            # reference returns pageRankPrevious on convergence (break before swap)
            cur.unpersist()
            break
        old = prev
        prev = cur
        old.unpersist()
    result = prev.select("id", "rank")
    verts.unpersist()
    return result


def blend_scores(tfidf: DataFrame, pr: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """Q9: final = 0.7*tfidf + 0.3*pagerank, sorted desc."""
    return (
        tfidf.join(pr.withColumnRenamed("id", doc_col), doc_col, "left")
        .withColumn(
            "final_score",
            F.lit(TFIDF_WEIGHT) * F.col("tfidf")
            + F.lit(PAGERANK_WEIGHT) * F.coalesce(F.col("rank"), F.lit(0.0)),
        )
        .orderBy(F.desc("final_score"))
    )


def phrase_match(
    postings: DataFrame, phrase_terms: list[str], doc_col: str = "doc_id"
) -> DataFrame:
    """Q5: docs where, within one section, term_i occurs at start+i for some
    start position of term_0 (Ranker.java:252-312).

    Positions self-join formulation: posting rows for term_i shifted by -i
    must all meet at the same (doc, section, start) — an equi-join chain that
    Catalyst executes as hash joins (no UDF).
    """
    if not phrase_terms:
        return postings.select(doc_col).limit(0)
    parts = []
    for i, t in enumerate(phrase_terms):
        parts.append(
            postings.filter(F.col("word") == t).select(
                doc_col, "section", (F.col("position") - F.lit(i)).alias("start"), F.lit(i).alias("ti")
            )
        )
    joined = parts[0].select(doc_col, "section", "start")
    for p in parts[1:]:
        joined = joined.join(p.select(doc_col, "section", "start"), [doc_col, "section", "start"])
    return joined.select(doc_col).distinct()


def paginate(ranked: DataFrame, page: int, per_page: int = 10) -> DataFrame:
    """Q10: offset/limit slice via row_number (Spark has no OFFSET pushdown)."""
    w = Window.orderBy(F.desc("final_score"))
    start = (page - 1) * per_page
    return (
        ranked.withColumn("pos", F.row_number().over(w))
        .filter((F.col("pos") > start) & (F.col("pos") <= start + per_page))
        .drop("pos")
    )


def snippets(
    postings: DataFrame,
    hit_terms: list[str],
    window: int = 15,
    doc_col: str = "doc_id",
) -> DataFrame:
    """Q11: earliest hit position per doc -> all words within ±window rebuilt
    in order, query terms wrapped in <b> (Ranker.java:527-621, window :574).

    Range join postings.position BETWEEN hit±window + ordered collect_list.
    """
    terms = postings.sparkSession.createDataFrame([(t,) for t in hit_terms], "word string")
    first_hit = (
        postings.join(F.broadcast(terms), "word")
        .groupBy(doc_col)
        .agg(F.min("position").alias("hit"))
    )
    ctx = postings.join(F.broadcast(first_hit), doc_col).filter(
        (F.col("position") >= F.col("hit") - window) & (F.col("position") <= F.col("hit") + window)
    )
    decorated = ctx.withColumn(
        "piece",
        F.when(F.col("word").isin(hit_terms), F.concat(F.lit("<b>"), F.col("word"), F.lit("</b>"))).otherwise(
            F.col("word")
        ),
    )
    return decorated.groupBy(doc_col).agg(
        F.concat_ws(
            " ", F.transform(F.array_sort(F.collect_list(F.struct("position", "piece"))), lambda s: s["piece"])
        ).alias("snippet")
    )
