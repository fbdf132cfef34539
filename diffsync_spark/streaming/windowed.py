"""Watermarked windowed aggregation over the changelog stream (ST3).

The engine's LWW core deliberately accepts arbitrarily late data (the
stored-version comparison, not a watermark, decides staleness). But
OPERATIONAL analytics over the change stream — ingest rates, per-
conversation activity windows — must bound their state, and that is
exactly what ``withWatermark`` is for: state for event-time windows older
than the watermark is finalized and dropped, and later-than-watermark
events are discarded from the aggregation (NOT from the table — the merge
path still applies them).

Reference analog: none (the reference has no streaming surface); this is
the BASELINE north-star "watermarks + windowed aggs for late data" row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def session_change_stats(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("conv_id",),
) -> DataFrame:
    """Per-key SESSION-window change stats with bounded state — the
    aggregated companion of ``functions.sessions.sessionize`` (which labels
    rows in batch): ``F.session_window`` merges events whose gaps are under
    ``gap`` into one growing window, finalized when the watermark passes
    ``session_end + gap``. State per key is one open session, not the
    event history, so 10^10 events cost O(active keys) state.

    Output: key_cols + (session_start, session_end, n_changes, n_deletes).
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.count_if(F.lower(F.col("op")) == "delete").alias("n_deletes"),
        )
        .select(
            *key_cols,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_changes",
            "n_deletes",
        )
    )


def windowed_change_rate(
    stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("conv_id",),
) -> DataFrame:
    """Per-key, per-event-time-window change counts with bounded state.

    Append-mode compatible: a window's row is emitted once, when the
    watermark passes its end; events later than the watermark are excluded
    (the table merge, not this aggregate, is the correctness path for them).

    Output: key_cols + (window_start, window_end, n_changes, n_deletes).
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.count_if(F.lower(F.col("op")) == "delete").alias("n_deletes"),
        )
        .select(
            *key_cols,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_changes",
            "n_deletes",
        )
    )
