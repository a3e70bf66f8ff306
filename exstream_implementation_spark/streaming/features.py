"""Watermarked window feature aggregation (SURVEY §2.2 → §7 M6).

Streaming analogue of ``sources.events_trace`` (the batch groupBy/pivot that
builds the EXstream metric trace): per (window, event_type) counts and value
sums, with a watermark bounding state so late events older than the allowed
lateness are dropped and window state is evicted.

Scale notes: the aggregation is a partial-agg + single shuffle on the window
key; state per key is O(1) (count/sum/avg), so state store size is
(#open windows × #event types) regardless of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_features(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark_delay: str = "2 hours",
    time_col: str = "event_time",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide_duration``) window aggregation.

    Works identically on a streaming or batch DataFrame; on a stream the
    watermark enables append-mode output and state eviction.
    """
    if events.isStreaming:
        events = events.withWatermark(time_col, watermark_delay)
    win = (
        F.window(time_col, window_duration, slide_duration)
        if slide_duration
        else F.window(time_col, window_duration)
    )
    return (
        events.groupBy(win.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )
