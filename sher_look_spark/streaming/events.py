"""Watermarked event-time aggregation over the events stream.

readStream -> event-time window + watermark -> writeStream; late rows beyond
the watermark are dropped, which bounds state size on an unbounded stream —
the property that matters at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-type event counts + value sums in event-time windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, timeout_sec: float = 60.0):
    """Drive a streaming query into an in-memory sink until idle (test/dev
    helper); returns the StreamingQuery after processing available data."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
