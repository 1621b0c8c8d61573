"""Streaming deduplication — exactly-once semantics over at-least-once
sources.

A replayed Kafka topic or file stream delivers duplicates (the
reference's cleanUp()-and-reprocess startup, T6, guarantees them).
``dropDuplicatesWithinWatermark`` keeps one row per key while the key
is inside the watermark horizon and retires the dedup state afterwards
— bounded state, unlike a global distinct.  This is the streaming
member of the dedup family (exact dedup's hash-groupBy, batch side, is
plans/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    event_time_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate rows by ``keys`` within the watermark horizon."""
    return stream.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
