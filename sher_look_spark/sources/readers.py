"""Batch and streaming readers with explicit schemas.

Explicit schemas everywhere: schema inference is a full extra pass over the
data at 100 TB and can silently drift between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_seeds(spark: SparkSession, path: str) -> DataFrame:
    """C1: seed file of '<url> <depth>' lines (data/start-pages.txt shape),
    preserving file order as discovery_rank.

    JVM-only rank assignment: the text source preserves line order per file,
    ``coalesce(1)`` concatenates splits in file order, and the dense rank is a
    row_number over ``monotonically_increasing_id`` — no Python row
    serialization (a seed list is a few hundred lines; the single-partition
    window is bounded by the seed file, not the data)."""
    from pyspark.sql import Window

    lines = spark.read.text(path).coalesce(1)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    df = (
        lines.withColumn("_ord", F.monotonically_increasing_id())
        .select(
            F.get(parts, 0).alias("url"),
            F.coalesce(F.get(parts, 1).cast("int"), F.lit(0)).alias("depth"),
            "_ord",
        )
        .filter(F.col("url").isNotNull() & (F.col("url") != ""))
    )
    w = Window.orderBy("_ord")
    return df.withColumn("rank", (F.row_number().over(w) - 1).cast(T.LongType())).drop("_ord")


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", schema=None) -> DataFrame:
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt in ("csv",):
        reader = reader.option("header", "true")
    return reader.load(path)


def stream_events(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-based Structured Streaming source over the events table shape."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .load(path)
    )
