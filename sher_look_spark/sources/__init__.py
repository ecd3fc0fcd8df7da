"""Source/sink surface: batch + streaming readers for the engine's tables.

The reference reads seeds from a text file (Crawler.java:87-105), pages over
HTTP, and persists to SQLite + an HTML file store. Spark-side equivalents:
seed text files, parquet/csv/json table readers with explicit schemas, the
snapshot store (crawler/storage.py), and file-based Structured Streaming.
"""

from sher_look_spark.sources.readers import (  # noqa: F401
    read_seeds,
    read_table,
    stream_events,
)
