"""Streaming event ingestion: watermarked window aggregation + custom
stateful operator (task-mandated streaming surface beyond the reference's
batch-only Builder; reference F9 is the foreachBatch incremental builder in
builder_stream.py).

Pipeline shape: ``readStream`` (file/kafka source of events) -> deterministic
geocode to quadtree cells -> either

- :func:`windowed_cell_counts`: event-time window aggregation with a
  watermark — late events older than the watermark are DROPPED and each
  (window, cell) row is emitted exactly once in append mode (the
  streaming-native LoD-0 tile update feed), or
- :func:`stateful_cell_stats`: ``applyInPandasWithState`` running per-cell
  aggregates (count/sum/max) that persist across micro-batches — the
  custom-stateful-operator slot (e.g. for online quality stats or
  incremental tile summaries that are not expressible as a windowed agg).

Both operate per-cell, so state is partitioned exactly like the tiles table:
at 100 TB the state store shards on the same key the storage shards on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def geocode_events(events: DataFrame, e: int = 0) -> DataFrame:
    """Deterministic user_id -> cell geocode (same arithmetic family as the
    documents geocode in the driver contract — engine-independent)."""
    uid = F.col("user_id").cast("long")
    return events.select(
        # parquet timestamps can arrive as TIMESTAMP_NTZ; watermarks require
        # TIMESTAMP (LTZ) — cast is a no-op on already-LTZ columns
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "value",
        ((uid * 73) % 997 - 498).cast("long").alias("cx"),
        ((uid * 179) % 991 - 495).cast("long").alias("cy"),
        F.lit(e).cast("int").alias("e"),
    )


def windowed_cell_counts(
    event_stream: DataFrame,
    watermark_delay: str = "15 minutes",
    window_duration: str = "1 hour",
) -> DataFrame:
    """Watermarked event-time window aggregation per cell.

    Append-mode compatible: a (window, cell) row is emitted once, when the
    watermark passes the window end; events arriving later than
    ``watermark_delay`` past the max seen event time are dropped by the
    engine (bounded state — the requirement for an unbounded 100 TB/day
    stream).
    """
    cells = geocode_events(event_stream)
    return (
        cells.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"), "cx", "cy", "e")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "cx",
            "cy",
            "e",
            "n_events",
            "avg_value",
        )
    )


_STATE_SCHEMA = "n long, total double, mx double"
_OUT_SCHEMA = "cx long, cy long, e int, n_events long, mean_value double, max_value double"


def stateful_cell_stats(event_stream: DataFrame) -> DataFrame:
    """Running per-cell stats across micro-batches via
    ``applyInPandasWithState`` (update mode).

    State = (count, sum, max) per cell — order-insensitive, so results are
    deterministic under any within-batch row order. Each micro-batch emits
    the UPDATED cumulative row for every cell it touched.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdf_iter, state):
        import pandas as pd

        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdf_iter:
            vals = pdf["value"].astype(float)
            n += len(pdf)
            total += float(vals.sum())
            mx = max(mx, float(vals.max()))
        state.update((n, total, mx))
        cx, cy, e = key
        yield pd.DataFrame(
            {
                "cx": [cx],
                "cy": [cy],
                "e": [e],
                "n_events": [n],
                "mean_value": [round(total / n, 6)],
                "max_value": [mx],
            }
        )

    cells = geocode_events(event_stream)
    return cells.groupBy("cx", "cy", "e").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
