"""sher_look_spark — a PySpark-native crawl/index/rank analytics engine.

A from-scratch reimplementation of the capabilities of the reference search
engine (AhmedSobhy01/sher-look, a Java/SQLite crawler+indexer+ranker) as an
idiomatic Spark engine:

* ``crawler``  — Mercator-style URL frontier + fetch scheduler as a wave-based
  BFS of DataFrame jobs over snapshot-committed parquet tables
  (reference: src/main/java/com/sherlook/search/crawler/*).
* ``functions`` — vectorized URL canonicalization, hashing, tokenization,
  Porter stemming, robots.txt rule evaluation
  (reference: utils/UrlNormalizer.java, utils/Hash.java, indexer/Tokenizer.java).
* ``operators`` — index builder (postings/IDF), TF-IDF + PageRank ranking,
  dedup (exact/MinHash-LSH/SimHash), embedding similarity search
  (reference: indexer/*, ranker/*).

All hot paths are DataFrame ops or Arrow-vectorized pandas UDFs; no per-row
Python UDFs.
"""

__version__ = "0.1.0"
