"""Streaming windowed aggregation with watermark-based late-data handling
(SURVEY.md §2.10; the streaming twin of relational.events_tumbling).

``events_stream_tumbling`` is the canonical shape: watermark bounds state
(late rows beyond the watermark are dropped and their windows finalized),
tumbling windows aggregate counts/sums, append-mode output emits each
window exactly once when it closes. At 100 TB/day the same plan runs on a
Kafka source with state in RocksDB; nothing here is local-mode-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def events_stream_tumbling(
    stream: DataFrame,
    minutes: int = 10,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window event aggregates.

    Output schema matches relational.events_tumbling (ws_epoch/n_events/
    value_cents) so batch results can oracle-check the streaming ones."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, f"{minutes} minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(cents).cast("long").alias("value_cents"),
        )
        .select(
            F.unix_timestamp("win.start").cast("long").alias("ws_epoch"),
            "n_events",
            "value_cents",
        )
    )


def sessionize_stream(
    stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows (gap-based) per user — the stateful-window variant;
    uses Spark's native session_window (state compaction handled by the
    engine, no custom applyInPandasWithState needed for this shape)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), F.session_window(ts_col, f"{gap_minutes} minutes").alias("win"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            user_col,
            F.unix_timestamp("win.start").cast("long").alias("session_start_epoch"),
            F.unix_timestamp("win.end").cast("long").alias("session_end_epoch"),
            "n_events",
        )
    )
