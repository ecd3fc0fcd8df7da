"""Deduplication operators for training-data pipelines at 100 TB.

Beyond the reference's exact content-hash dedup (CrawlTask.java:116-128),
the engine ships the near-dup family a web-scale corpus needs: MinHash+LSH,
SimHash, and n-gram Jaccard. All hot paths are JVM-side array expressions
(higher-order functions over token/shingle arrays — whole-stage codegen);
only SimHash bit-counting drops to one Arrow-batched numpy UDF.

Scale notes: LSH turns the O(n²) all-pairs problem into a band-bucket
shuffle (groupBy band_hash) + within-bucket verify; bucket skew is handled
by AQE; signatures are fixed-width arrays so shuffle rows stay small.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sher_look_spark.functions.text import tokens_column

def shingles_column(text_col: str, n: int = 3):
    """array<string> of word n-gram shingles (JVM-side, codegen).

    Shingles keep stop words (they are content for near-dup detection) but
    drop the empty boundary tokens \\W+ splitting produces.
    Guard: sequence(1, size-n+1) DESCENDS when size < n (Spark semantics),
    which would feed slice() invalid starts — short docs get no shingles.
    """
    toks = F.filter(tokens_column(text_col), lambda t: t != "")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: canonical row = min id per sha256(text); emits
    (content_hash, canonical_id, dup_count)."""
    hashed = df.select(id_col, F.sha2(F.col(text_col), 256).alias("content_hash"))
    return hashed.groupBy("content_hash").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("dup_count")
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 64, shingle: int = 3, seed: int = 42,
) -> DataFrame:
    """(id, signature array<long>) — min over per-permutation shingle hashes.

    Entirely JVM-side: permutation i is xxhash64 with a per-i salt prefix
    (an affine h*a+b permutation overflows int64 under ANSI mode), then
    array_min per permutation. No Python in the row path.
    """
    sh = shingles_column(text_col, shingle)
    sig_cols = [
        F.array_min(
            F.transform(
                F.col("_shingles"),
                lambda s, i=i: F.xxhash64(F.concat(F.lit(f"mh{seed}|{i}|"), s)),
            )
        )
        for i in range(num_hashes)
    ]
    return (
        df.select(id_col, sh.alias("_shingles"))
        .filter(F.size("_shingles") > 0)
        .select(id_col, F.array(*sig_cols).alias("signature"))
    )


def minhash_lsh_pairs(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 16
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.
    Returns (id_a, id_b, est_jaccard) with id_a < id_b; est_jaccard = fraction
    of equal signature slots."""
    rows_per_band = F.floor(F.size("signature") / F.lit(bands)).cast("int")
    banded = sigs.select(
        id_col,
        "signature",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).select(
        id_col,
        "signature",
        "band",
        F.xxhash64(
            F.col("band"),
            F.concat_ws("-", F.slice("signature", F.col("band") * rows_per_band + 1, rows_per_band)),
        ).alias("bucket"),
    )
    a = banded.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"), "band", "bucket")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq))
        / F.size("sig_a")
    )
    return pairs.select("id_a", "id_b", est.alias("est_jaccard"))


def minhash_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 64, bands: int = 16, threshold: float = 0.8, shingle: int = 3,
) -> DataFrame:
    """Near-dup groups: candidate pairs above threshold, clustered to their
    minimum id (one union-find hop — sufficient for near-dup star clusters)."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle)
    pairs = minhash_lsh_pairs(sigs, id_col, bands).filter(F.col("est_jaccard") >= threshold)
    canon = pairs.groupBy("id_b").agg(F.min("id_a").alias("canonical_id"))
    return canon.select(F.col("id_b").alias(id_col), "canonical_id")


def simhash_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def simhash(token_hashes: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for arr in token_hashes:
            if arr is None or len(arr) == 0:
                out.append(0)
                continue
            a = np.asarray(arr, dtype=np.uint64)
            bits = ((a[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
            counts = (2 * bits - 1).sum(axis=0)
            val = 0
            for i in range(64):
                if counts[i] > 0:
                    val |= 1 << i
            out.append(val - (1 << 64) if val >= (1 << 63) else val)
        return pd.Series(out, dtype="int64")

    return simhash


def simhash_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) — token hashing JVM-side, bit voting in one numpy UDF."""
    toks = tokens_column(text_col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return df.select(id_col, simhash_udf()(hashes.alias("h")).alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3, threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing >=1 shingle.

    distinct-shingle explode -> self-join on shingle -> |A∩B| per pair;
    |A∪B| = |A|+|B|-|A∩B|. The shingle join IS the candidate pruning (pairs
    sharing nothing never meet), and it's what the DuckDB oracle can verify.
    """
    sh = df.select(id_col, F.explode(F.array_distinct(shingles_column(text_col, n))).alias("shingle"))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
