"""Streaming deduplication with watermark-bounded state (extension
surface; the reference has no streaming at all, SURVEY.md §2.10).

``dedup_stream`` keeps the FIRST occurrence of each key.  With an
event-time watermark the state store evicts keys older than the
watermark, so memory is bounded by the dedup horizon, not the stream
length — the requirement for an unbounded 100 TB/day feed.  The exact
batch twin is ``dropDuplicates`` / ``row_number() = 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once key dedup over a stream (or batch frame — the same
    call works on both, which is how the test pins equivalence)."""
    if stream.isStreaming:
        return stream.withWatermark(ts_col, watermark).dropDuplicates(keys)
    return stream.dropDuplicates(keys)
