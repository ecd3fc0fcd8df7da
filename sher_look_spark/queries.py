"""Operator showcase queries + DuckDB oracle SQL — the driver correctness gate.

Each entry pairs a Spark DataFrame implementation (the engine's operators
exercised over the driver's testdata tables) with an equivalent ANSI-SQL
string DuckDB can run on the same parquet. Column names/aliases match on both
sides; doubles are rounded identically so order-insensitive value-hashes
agree.

Operator coverage keys mirror SURVEY §2 (C=crawl, I=index, Q=query/rank) plus
the training-data-pipeline family (dedup_*, sim_*, text_*).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sher_look_spark.functions.robots import robots_allowed_udf, rule_to_regex
from sher_look_spark.functions.text import TOKEN_SPLIT_RE, stop_words
from sher_look_spark.functions.urls import normalize_url_udf

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _sql_stoplist() -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(stop_words()))


# Shared DuckDB CTE: reference tokenizer (lower, \W+ split, stop-drop, kept-only
# positions) over the documents table.
def _sql_tokens_cte() -> str:
    return f"""
raw AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '\\W+')) AS word,
         generate_subscripts(regexp_split_to_array(lower(text), '\\W+'), 1) AS ord
  FROM documents
),
tokens AS (
  SELECT doc_id, word,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS position
  FROM raw
  WHERE word <> '' AND word NOT IN ({_sql_stoplist()})
)
"""


# Raw-token CTE (empties dropped, stop words KEPT) — the shingle basis for
# fingerprint/jaccard, matching operators.dedup.shingles_column.
SQL_RAWTOK_CTE = """
rawtok AS (
  SELECT doc_id, word,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS position
  FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '\\W+')) AS word,
           generate_subscripts(regexp_split_to_array(lower(text), '\\W+'), 1) AS ord
    FROM documents
  )
  WHERE word <> ''
)
"""


def _spark_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sher_look_spark.functions.text import explode_tokens

    return explode_tokens(load(spark, sf_dir, "documents"), "text")


QUERY_TERMS = ["spark", "merge", "vector"]  # frequent non-stop corpus words


# --------------------------------------------------------------------- crawl

def q_c3_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: canonicalizer over messy URLs synthesized from table columns."""
    docs = load(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("HTTP://"), F.upper("source"), F.lit(".TEST:80/d/"),
        F.col("doc_id").cast("string"), F.lit("/?utm_src=x&b=2&a=1&ref=y#frag"),
    )
    return docs.select(
        "doc_id", normalize_url_udf(messy).alias("norm_url")
    )


SQL_C3 = """
SELECT doc_id,
       'http://' || lower(source) || '.test/d/' || doc_id || '?a=1&b=2' AS norm_url
FROM documents
"""


def q_c4_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: URL-seen dedup shape — anti-join events against a 'seen' set
    covering only even customer keys, so the survivor set is non-empty at
    every sf (a 0-row anti-join result would verify nothing)."""
    events = load(spark, sf_dir, "events")
    seen = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select(F.col("c_custkey").alias("user_id"))
    )
    return (
        events.join(seen, "user_id", "left_anti")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


SQL_C4 = """
SELECT user_id, count(*) AS n_events
FROM events e
WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = e.user_id AND c.c_custkey % 2 = 0)
GROUP BY user_id
"""


def q_c6_robots_precedence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: longest-match allow/disallow over synthesized paths
    (disallow /d/1*, allow-back /d/12*)."""
    docs = load(spark, sf_dir, "documents")
    allow = F.array(F.lit(rule_to_regex("/d/12")))
    disallow = F.array(F.lit(rule_to_regex("/d/1")))
    path = F.concat(F.lit("/d/"), F.col("doc_id").cast("string"))
    return docs.select(
        "doc_id",
        robots_allowed_udf(path, allow, disallow).alias("allowed"),
    )


SQL_C6 = """
SELECT doc_id,
       (NOT ('/d/' || doc_id) LIKE '/d/1%') OR (('/d/' || doc_id) LIKE '/d/12%') AS allowed
FROM documents
"""


def q_c7_politeness_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: per-host crawl-delay budget as a rank window (host≈user)."""
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("slot", F.row_number().over(w))
        .filter(F.col("slot") <= 3)
        .select("event_id", "user_id", "slot")
    )


SQL_C7 = """
SELECT event_id, user_id, slot FROM (
  SELECT event_id, user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS slot
  FROM events
) WHERE slot <= 3
"""


def q_c9_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: exact content-hash dedup — canonical id + duplicate count."""
    from sher_look_spark.operators.dedup import exact_dedup

    return exact_dedup(load(spark, sf_dir, "documents"))


SQL_C9 = """
SELECT sha256(text) AS content_hash, min(doc_id) AS canonical_id, count(*) AS dup_count
FROM documents GROUP BY sha256(text)
"""


def q_c11_topk_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11: per-parent top-K by (length, id) — the child-select window."""
    from pyspark.sql import Window

    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.length("c_name"), "c_custkey")
    return (
        cust.withColumn("slot", F.row_number().over(w))
        .filter(F.col("slot") <= 5)
        .select("c_nationkey", "c_custkey", "slot")
    )


SQL_C11 = """
SELECT c_nationkey, c_custkey, slot FROM (
  SELECT c_nationkey, c_custkey,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY length(c_name), c_custkey) AS slot
  FROM customer
) WHERE slot <= 5
"""


# --------------------------------------------------------------------- index

def q_i4_tokenize_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4: tokenizer with kept-only positions over the documents corpus."""
    return _spark_tokens(spark, sf_dir).select("doc_id", "word", "position")


def sql_i4() -> str:
    return f"WITH {_sql_tokens_cte()} SELECT doc_id, word, position FROM tokens"


def q_i9_doc_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I9: kept-token count per document (TF denominator)."""
    from sher_look_spark.operators.indexer import document_sizes

    return document_sizes(_spark_tokens(spark, sf_dir))


def sql_i9() -> str:
    return (
        f"WITH {_sql_tokens_cte()} "
        "SELECT doc_id, count(*) AS document_size FROM tokens GROUP BY doc_id"
    )


def q_i11_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I11: idf = ln(N/df + 1), rounded for cross-engine hash equality."""
    from sher_look_spark.operators.indexer import idf_table

    docs = load(spark, sf_dir, "documents")
    toks = _spark_tokens(spark, sf_dir)
    idf = idf_table(toks, n_docs=docs.count())
    return idf.select("word", "df", F.round("idf", 6).alias("idf"))


def sql_i11() -> str:
    return f"""
WITH {_sql_tokens_cte()}
SELECT word, count(DISTINCT doc_id) AS df,
       round(ln((SELECT count(*) FROM documents)::DOUBLE / count(DISTINCT doc_id) + 1), 6) AS idf
FROM tokens GROUP BY word
"""


# ---------------------------------------------------------------- query/rank

def q_q4_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: TF-IDF scores for a fixed keyword query over the corpus."""
    from sher_look_spark.operators.indexer import document_sizes, idf_table
    from sher_look_spark.operators.ranking import tfidf_scores

    docs = load(spark, sf_dir, "documents")
    toks = _spark_tokens(spark, sf_dir).withColumn("section", F.lit("body"))
    sizes = document_sizes(toks)
    idf = idf_table(toks, n_docs=docs.count())
    scores = tfidf_scores(toks, sizes, idf, QUERY_TERMS)
    return scores.select("doc_id", F.round("tfidf", 6).alias("tfidf"))


def sql_q4() -> str:
    terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    return f"""
WITH {_sql_tokens_cte()},
sizes AS (SELECT doc_id, count(*) AS document_size FROM tokens GROUP BY doc_id),
idf AS (
  SELECT word, ln((SELECT count(*) FROM documents)::DOUBLE / count(DISTINCT doc_id) + 1) AS idf
  FROM tokens GROUP BY word
),
freqs AS (
  SELECT doc_id, word, count(*) AS freq FROM tokens WHERE word IN ({terms})
  GROUP BY doc_id, word
)
SELECT f.doc_id, round(sum(f.freq::DOUBLE / s.document_size * i.idf), 6) AS tfidf
FROM freqs f JOIN sizes s USING (doc_id) JOIN idf i USING (word)
GROUP BY f.doc_id
"""


def q_q7_boolean_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: doc-id set algebra — (docs∋spark ∩ docs∋merge) \\ docs∋slow."""
    toks = _spark_tokens(spark, sf_dir)

    def docs_with(word):
        return toks.filter(F.col("word") == word).select("doc_id").distinct()

    return docs_with("spark").intersect(docs_with("merge")).exceptAll(docs_with("slow"))


def sql_q7() -> str:
    return f"""
WITH {_sql_tokens_cte()}
SELECT DISTINCT doc_id FROM tokens WHERE word = 'spark'
INTERSECT
SELECT DISTINCT doc_id FROM tokens WHERE word = 'merge'
EXCEPT
SELECT DISTINCT doc_id FROM tokens WHERE word = 'slow'
"""


def q_q8_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: PageRank on a 25-node graph derived from orders (rows-only check;
    numeric goldens live in tests/test_ranking.py)."""
    from sher_look_spark.operators.ranking import pagerank

    orders = load(spark, sf_dir, "orders")
    edges = (
        orders.select(
            (F.col("o_custkey") % 25).alias("src"), (F.col("o_orderkey") % 25).alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    verts = spark.range(25).select(F.col("id").cast("long").alias("id"))
    pr = pagerank(spark, verts, edges)
    return pr.select("id", F.round("rank", 6).alias("rank"))


def q_q11_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 with the reference's per-term-window semantics: the earliest hit of
    EACH query term opens its own ±15 window; windows merge per doc; trailing
    ' ...'; docs without hits fall back to a description column. Multi-term so
    the oracle discriminates (a single combined-min window would differ)."""
    from sher_look_spark.operators.ranking import snippets

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.lit("src="), F.col("source")).alias("description")
    )
    toks = _spark_tokens(spark, sf_dir).withColumn("section", F.lit("body"))
    return snippets(toks, ["spark", "vector"], window=15, docs=docs)


def sql_q11() -> str:
    return f"""
WITH {_sql_tokens_cte()},
hits AS (
  SELECT doc_id, word, min(position) AS hit FROM tokens
  WHERE word IN ('spark', 'vector') GROUP BY doc_id, word
),
ctx AS (
  SELECT DISTINCT t.doc_id, t.position, t.word
  FROM tokens t JOIN hits h ON t.doc_id = h.doc_id
  WHERE t.position BETWEEN greatest(0, h.hit - 15) AND h.hit + 15
),
snip AS (
  SELECT doc_id,
         string_agg(
           CASE WHEN word IN ('spark', 'vector') THEN '<b>' || word || '</b>' ELSE word END,
           ' ' ORDER BY position
         ) || ' ...' AS snippet
  FROM ctx GROUP BY doc_id
)
SELECT d.doc_id, coalesce(s.snippet, 'src=' || d.source) AS snippet
FROM documents d LEFT JOIN snip s ON d.doc_id = s.doc_id
"""


# ------------------------------------------------------------ dedup / simhash

def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard similarity pairs over a doc subset (exact, oracle-checked).

    Threshold 0.02 / doc window 200 yields ~70 pairs at the driver's checked
    sf0.01 (incl. the near-dup trio >0.95) — a non-vacuous result set. The
    threshold filter compares the identical IEEE-double ratio of exact integer
    counts on both engines, so boundary pairs cannot diverge."""
    from sher_look_spark.operators.dedup import ngram_jaccard_pairs

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.02)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def sql_dedup_ngram_jaccard() -> str:
    return f"""
WITH {SQL_RAWTOK_CTE},
toklists AS (
  SELECT doc_id, list(word ORDER BY position) AS toks FROM rawtok
  WHERE doc_id < 200 GROUP BY doc_id
),
shingles AS (
  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(toks) - 1),
         i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS shingle
  FROM toklists WHERE len(toks) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(i::DOUBLE / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE i::DOUBLE / (sa.n_sh + sb.n_sh - i) >= 0.02
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (xxhash64 signatures — no SQL analog;
    rows-only driver check, behavior pinned in tests/test_dedup_similarity.py)."""
    from sher_look_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sigs = minhash_signatures(docs, num_hashes=32)
    return minhash_lsh_pairs(sigs, bands=16).select(
        "id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash per doc (xxhash64-based — rows-only driver check)."""
    from sher_look_spark.operators.dedup import simhash_table

    return simhash_table(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------- similarity

def q_sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 around the vec_id=0 query vector."""
    from sher_look_spark.operators.similarity import brute_force_topk

    emb = load(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    top = brute_force_topk(emb, q, k=10)
    return top.select("vec_id", F.round("cosine", 4).alias("cosine"))


SQL_SIM_TOPK = """
WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], (SELECT e FROM q)), 4) AS cosine
FROM embeddings
ORDER BY list_cosine_similarity(embedding::DOUBLE[], (SELECT e FROM q)) DESC, vec_id
LIMIT 10
"""


def q_sim_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine pair similarity >= 0.3 on a subset (oracle-checked)."""
    from sher_look_spark.operators.similarity import _dot, _norm

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= 0.3)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


SQL_SIM_NEARDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 150 AND b.vec_id < 150
  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
"""


def q_sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-10 (approximate — rows-only driver check)."""
    from sher_look_spark.operators.similarity import lsh_topk

    emb = load(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    top = lsh_topk(emb, q, k=10, n_planes=10, probe_hamming=1)
    return top.select("vec_id", F.round("cosine", 4).alias("cosine"))


# ----------------------------------------------------------------- text ops

def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sher_look_spark.operators.textops import lang_id

    return load(spark, sf_dir, "documents").select(
        "doc_id", lang_id("text").alias("pred_lang")
    )


def sql_text_langid() -> str:
    from sher_look_spark.operators.textops import LANG_MARKERS

    score = {
        lang: (
            "(SELECT count(*) FROM unnest(regexp_split_to_array(lower(text), '\\W+')) AS u(w) "
            f"WHERE w IN ({', '.join(repr(x) for x in words)}))"
        )
        for lang, words in LANG_MARKERS.items()
    }
    langs = sorted(LANG_MARKERS)
    # strict argmax scan with alphabetical tie-break == operators.textops.lang_id
    expr = "'und'"
    best = "0"
    for lang in langs:
        expr = f"CASE WHEN {score[lang]} > {best} THEN '{lang}' ELSE {expr} END"
        best = f"greatest({score[lang]}, {best})"
    return f"SELECT doc_id, {expr} AS pred_lang FROM documents"


def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sher_look_spark.operators.textops import token_count

    return load(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )


SQL_TEXT_TOKEN_COUNT = """
SELECT doc_id,
       (SELECT count(*) FROM unnest(regexp_split_to_array(lower(text), '\\W+')) AS u(w)
        WHERE w <> '') AS n_tokens
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sher_look_spark.operators.textops import quality_features

    return quality_features(load(spark, sf_dir, "documents"))


def sql_text_quality() -> str:
    from sher_look_spark.operators.textops import LANG_MARKERS

    en = ", ".join(repr(w) for w in LANG_MARKERS["en"])
    return f"""
WITH t AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         (SELECT count(*) FROM unnest(regexp_split_to_array(lower(text), '\\W+')) u(w)
          WHERE w <> '') AS n_tokens,
         (SELECT coalesce(sum(length(w)), 0) FROM unnest(regexp_split_to_array(lower(text), '\\W+')) u(w)
          WHERE w <> '') AS tok_chars,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         (SELECT count(*) FROM unnest(regexp_split_to_array(lower(text), '\\W+')) u(w)
          WHERE w IN ({en})) AS n_stop
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
       round(CASE WHEN n_tokens > 0 THEN tok_chars::DOUBLE / n_tokens ELSE 0.0 END, 4) AS mean_word_len,
       round(CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0.0 END, 4) AS punct_ratio,
       round(CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens ELSE 0.0 END, 4) AS stop_ratio,
       round(
         least(n_tokens::DOUBLE / 100.0, 1.0) * 0.4
         + least(CASE WHEN n_tokens > 0 THEN n_stop::DOUBLE / n_tokens ELSE 0.0 END * 5.0, 1.0) * 0.4
         + (1.0 - least(CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0.0 END * 10.0, 1.0)) * 0.2,
       4) AS quality_score
FROM t
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sher_look_spark.operators.textops import fingerprint

    return load(spark, sf_dir, "documents").select(
        "doc_id", fingerprint("text", n=4).alias("fp")
    )


def sql_text_fingerprint() -> str:
    return f"""
WITH {SQL_RAWTOK_CTE},
toklists AS (SELECT doc_id, list(word ORDER BY position) AS toks FROM rawtok GROUP BY doc_id),
mins AS (
  SELECT d.doc_id,
         CASE WHEN t.toks IS NOT NULL AND len(t.toks) >= 4 THEN
           (SELECT min(substr(sha256(array_to_string(list_slice(t.toks, i.i, i.i + 3), ' ')), 1, 16))
            FROM (SELECT unnest(range(1, len(t.toks) - 2)) AS i) i)
         ELSE substr(sha256(d.text), 1, 16) END AS fp
  FROM documents d LEFT JOIN toklists t ON d.doc_id = t.doc_id
)
SELECT doc_id, fp FROM mins
"""


# ------------------------------------------------------------- relational

def q_rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan+filter+agg surface (TPC-H Q1 shape) over lineitem."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_REL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_rel_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way broadcast-join revenue rollup per region."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


SQL_REL_REGION_REVENUE = """
SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_rel_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered running aggregate per user over the events stream table."""
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


SQL_REL_RUNNING = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
FROM events
"""


# ------------------------------------------------------------------ registry

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "c3_url_normalize": q_c3_url_normalize,
        "c4_seen_antijoin": q_c4_seen_antijoin,
        "c6_robots_precedence": q_c6_robots_precedence,
        "c7_politeness_slots": q_c7_politeness_slots,
        "c9_content_dedup": q_c9_content_dedup,
        "c11_topk_children": q_c11_topk_children,
        "i4_tokenize_positions": q_i4_tokenize_positions,
        "i9_doc_sizes": q_i9_doc_sizes,
        "i11_idf": q_i11_idf,
        "q4_tfidf": q_q4_tfidf,
        "q7_boolean_set_ops": q_q7_boolean_set_ops,
        "q8_pagerank": q_q8_pagerank,
        "q11_snippets": q_q11_snippets,
        "dedup_exact": q_c9_content_dedup,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "sim_topk_cosine": q_sim_topk_cosine,
        "sim_neardup_pairs": q_sim_neardup_pairs,
        "sim_lsh_topk": q_sim_lsh_topk,
        "text_langid": q_text_langid,
        "text_token_count": q_text_token_count,
        "text_quality": q_text_quality,
        "text_fingerprint": q_text_fingerprint,
        "rel_pricing_summary": q_rel_pricing_summary,
        "rel_region_revenue": q_rel_region_revenue,
        "rel_running_window": q_rel_running_window,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "c3_url_normalize": SQL_C3,
        "c4_seen_antijoin": SQL_C4,
        "c6_robots_precedence": SQL_C6,
        "c7_politeness_slots": SQL_C7,
        "c9_content_dedup": SQL_C9,
        "c11_topk_children": SQL_C11,
        "i4_tokenize_positions": sql_i4(),
        "i9_doc_sizes": sql_i9(),
        "i11_idf": sql_i11(),
        "q4_tfidf": sql_q4(),
        "q7_boolean_set_ops": sql_q7(),
        # q8_pagerank: iterative — rows-only check
        "q11_snippets": sql_q11(),
        "dedup_exact": SQL_C9,
        "dedup_ngram_jaccard": sql_dedup_ngram_jaccard(),
        # dedup_minhash_lsh / dedup_simhash / sim_lsh_topk: xxhash64/LSH — rows-only
        "sim_topk_cosine": SQL_SIM_TOPK,
        "sim_neardup_pairs": SQL_SIM_NEARDUP,
        "text_langid": sql_text_langid(),
        "text_token_count": SQL_TEXT_TOKEN_COUNT,
        "text_quality": sql_text_quality(),
        "text_fingerprint": sql_text_fingerprint(),
        "rel_pricing_summary": SQL_REL_PRICING,
        "rel_region_revenue": SQL_REL_REGION_REVENUE,
        "rel_running_window": SQL_REL_RUNNING,
    }
