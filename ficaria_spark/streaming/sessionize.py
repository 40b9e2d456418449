"""Streaming sessionization + windowed aggregation.

The batch engine covers the reference's semantics (it has no streaming), but
the target pipeline shape benefits from incremental variants: late data is
handled with watermarks, sessions with ``session_window``, tumbling stats
with ``window``. These are the drop-in streaming twins of
``operators/temporal.sessionize`` / ``tumble``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessionize(
    events: DataFrame,
    *,
    entity: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-(entity, session) aggregates over a streaming DataFrame.

    Uses the native ``session_window`` operator — state is bounded by the
    watermark; sessions close ``gap`` after their last event.
    """
    aggs = [F.count("*").alias("n_events")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(entity), F.session_window(F.col(ts), gap).alias("session"))
        .agg(*aggs)
        .select(
            entity,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            *[c for c in ("n_events", "sum_value") if value_col or c == "n_events"],
        )
    )


def streaming_tumble(
    events: DataFrame,
    *,
    ts: str = "ts",
    width: str = "1 hour",
    watermark: str = "1 hour",
    keys: list[str] | None = None,
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling-window aggregates with late-data watermarking."""
    keys = keys or []
    aggs = [F.count("*").alias("n_events")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), width).alias("win"), *keys)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"), *keys,
            *[c for c in ("n_events", "sum_value") if value_col or c == "n_events"],
        )
    )
