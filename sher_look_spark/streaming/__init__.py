"""Structured Streaming tier.

The reference has no streaming (SURVEY §2.5) — its crawl is a long batch.
The engine still exposes the streaming shapes a production crawl/analytics
deployment needs: watermarked event-time windows over an event stream, and a
continuously-ingesting frontier (new seed files appearing in a directory).
"""

from sher_look_spark.streaming.events import (  # noqa: F401
    run_stream_to_memory,
    windowed_event_counts,
)
