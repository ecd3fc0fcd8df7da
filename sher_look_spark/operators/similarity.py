"""Embedding similarity search (ANN) over array<float> columns.

Baseline: brute-force cosine top-k with the dot product computed JVM-side
(zip_with + aggregate — no Python in the row path). Scale path: random-
hyperplane LSH bucketing so each query probes only matching buckets, plus a
block-matrix pandas-UDF variant for many-query batches (BLAS beats per-row
expressions when the query set is large).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_col(vec_col, query: list[float]):
    """cosine(vec, constant query) as a pure JVM expression."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = math.sqrt(sum(x * x for x in query)) or 1.0
    return _dot(vec_col, q) / (_norm(vec_col) * F.lit(qn))


def brute_force_topk(
    emb: DataFrame, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: scan + TakeOrderedAndProject (no full sort).
    Ties broken by id for determinism."""
    scored = emb.select(id_col, cosine_col(F.col(vec_col), query).alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42):
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim)).astype("float64")


def lsh_bucket_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """Random-hyperplane signature (sign bits -> int bucket) as one
    Arrow-batched matrix multiply per batch."""
    from pyspark.sql.functions import pandas_udf

    planes = _hyperplanes(dim, n_planes, seed)

    @pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        import numpy as np

        mat = np.stack([np.asarray(v, dtype="float64") for v in vecs])
        bits = (mat @ planes.T) > 0
        weights = (1 << np.arange(n_planes)).astype("int64")
        return pd.Series(bits @ weights, dtype="int64")

    return bucket


def lsh_topk(
    emb: DataFrame, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 12, seed: int = 42, probe_hamming: int = 1,
) -> DataFrame:
    """ANN: probe only buckets within `probe_hamming` bit flips of the query's
    bucket, then exact cosine re-rank inside the probed buckets.

    At 100 TB the bucketed table is written partitioned by bucket so a query
    touches a handful of partitions instead of the full scan.
    """
    import numpy as np

    dim = len(query)
    bucketer = lsh_bucket_udf(dim, n_planes, seed)
    bucketed = emb.withColumn("bucket", bucketer(F.col(vec_col)))
    planes = _hyperplanes(dim, n_planes, seed)
    qbits = (np.asarray(query, dtype="float64") @ planes.T) > 0
    weights = (1 << np.arange(n_planes)).astype("int64")
    qbucket = int(qbits @ weights)
    probes = {qbucket}
    if probe_hamming >= 1:
        for i in range(n_planes):
            probes.add(qbucket ^ (1 << i))
    cand = bucketed.filter(F.col("bucket").isin(sorted(probes)))
    return brute_force_topk(cand, query, k, id_col, vec_col)


def lsh_multitable_udf(dim: int, n_planes: int, n_tables: int, seed: int = 42):
    """array<long> of per-table random-hyperplane buckets, one Arrow-batched
    matmul per batch (OR-construction: a pair is a candidate if ANY table
    agrees — the knob that trades join fan-out for recall)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    allp = np.concatenate(
        [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    )  # (n_tables*n_planes, dim)
    weights = (1 << np.arange(n_planes)).astype("int64")

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype="float64") for v in vecs])
        bits = (mat @ allp.T) > 0  # (n, n_tables*n_planes)
        out = [
            bits[:, t * n_planes : (t + 1) * n_planes] @ weights for t in range(n_tables)
        ]
        return pd.Series(np.stack(out, axis=1).tolist())

    return buckets


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 12, seed: int = 42, n_tables: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate detection by cosine: LSH-bucket self-join candidates
    (same bucket in ANY of ``n_tables`` independent bucketings), exact cosine
    verify >= threshold.

    Recall tuning: P(candidate | cosine c) = 1 - (1 - p^n_planes)^n_tables
    with p = 1 - acos(c)/pi. For a LOW threshold, use few planes and many
    tables (e.g. 0.3 -> n_planes=2, n_tables=24: miss ~3e-5 per true pair);
    the 0.95 default is fine with the single 12-plane table. Deterministic
    hyperplanes (fixed seed) make recall reproducible run-to-run.

    Pass ``dim`` when known: the fallback runs a driver action (`first()`)
    just to learn the embedding width, serializing a job before the LSH
    stage can even be planned.
    """
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    bucketer = lsh_multitable_udf(dim, n_planes, n_tables, seed)
    bucketed = emb.select(
        id_col, vec_col, F.posexplode(bucketer(F.col(vec_col))).alias("t", "bucket")
    )
    a = bucketed.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "t", "bucket")
    b = bucketed.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "t", "bucket")
    pairs = (
        a.join(b, ["t", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
