"""Incremental builder via Structured Streaming (reference F9 / S2 Add path).

The reference's only incremental surface is the mutable ``Builder``
accumulator (Builder.fs:299-359): patches are added under a lock and the
tree is rebuilt on demand. Spark-side: patches arrive as a stream, each
micro-batch appends to the patches staging table and incrementally
re-aggregates only the affected tiles via ``foreachBatch`` — the
streaming-native equivalent of Builder.Add + Build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.build import with_tile_key


def start_builder_stream(
    patch_stream: DataFrame,
    staging_path: str,
    tiles_path: str,
    checkpoint_path: str,
    split: int = 8,
    layers: list[str] | None = None,
):
    """Consume a streaming patches source ``(cx, cy, e, <layers...>, patch_id)``.

    Per micro-batch — IDEMPOTENT under foreachBatch's at-least-once
    delivery (a retried batch REPLACES its own ``batch_id`` partition of
    the staging table instead of appending duplicates), so with the
    checkpoint the pipeline is effectively exactly-once:
    1. land raw patch rows in the ``batch_id`` slot of the staging table
       (Builder.Save analogue) via dynamic partition overwrite,
    2. recompute ONLY the tiles touched by this batch (dynamic partition
       overwrite on the tile key) — incremental rebuild, not full rebuild;
       a pure overwrite derived from (1), idempotent by construction.
    """
    lyrs = layers or [c for c in patch_stream.columns if c not in ("cx", "cy", "e", "patch_id")]

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        (
            batch.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(staging_path)
        )
        touched = (
            with_tile_key(batch, split)
            .select("tile_cx", "tile_cy", "tile_e")
            .distinct()
        )
        staged = with_tile_key(
            spark.read.parquet(staging_path).drop("batch_id"), split
        )
        affected = staged.join(F.broadcast(touched), ["tile_cx", "tile_cy", "tile_e"], "left_semi")
        from ..operators.merge import merge_layers

        rebuilt = merge_layers(affected, lyrs)
        (
            with_tile_key(rebuilt, split)
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("tile_e", "tile_cx", "tile_cy")
            .parquet(tiles_path)
        )

    writer = (
        patch_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
    )
    # exposed for failure-injection tests: re-invoking with the same
    # batch_id must be a no-op (the at-least-once retry contract)
    writer._qt_process = _process
    return writer


def start_block_ingest_stream(
    pages_stream: DataFrame,
    points_path: str,
    blocks_path: str,
    checkpoint_path: str,
    extent: float = 1024.0,
    e: int = 0,
    bits: int = 8,
    part_shift: int = 4,
):
    """Incremental crawl ingest onto the BLOCK staging path (the streaming
    analogue of ``pages_to_points`` -> ``points_to_blocks``).

    Per micro-batch — IDEMPOTENT under foreachBatch's at-least-once
    delivery, so the pipeline is effectively exactly-once end-to-end:

    1. the batch's pages project to geocoded INT points (the only
       string-touching step, same contract as the batch ingest) and land
       in a ``batch_id=<id>``-partitioned slot of the durable points table
       via DYNAMIC PARTITION OVERWRITE — a retried micro-batch (append
       succeeded, checkpoint commit did not) REPLACES its own partition
       instead of appending a duplicate, which would otherwise silently
       double-count every re-histogrammed block statistic;
    2. only the coarse PARTITIONS touched by this batch (``pbx = bx >>
       part_shift``) are re-histogrammed from the full points table
       (semi-join prune) and rewritten via dynamic partition overwrite —
       the rebuild granularity must equal the overwrite granularity, or
       untouched blocks sharing a partition with a touched one would
       vanish; cells aggregate correctly across batches because the
       histogram recomputes from ALL staged points of the touched
       partitions, never by merging partial histograms. Step 2 is a pure
       overwrite derived from step 1's table, so re-running it is
       idempotent by construction.

    The result at ``blocks_path`` is always equal to
    ``points_to_blocks(all points so far)`` restricted to written
    partitions — differential-tested against the batch path, including a
    same-``batch_id`` retry (failure injection) that must leave the
    blocks byte-identical.
    """
    from ..sources.webpages import geocode, pages_to_points, points_to_blocks

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        pts = pages_to_points(geocode(batch, extent=extent), e=e)
        (
            pts.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(points_path)
        )
        shift = bits + part_shift
        touched = pts.select(
            F.shiftright(F.col("cx"), shift).alias("pbx"),
            F.shiftright(F.col("cy"), shift).alias("pby"),
        ).distinct()
        staged = spark.read.parquet(points_path).select(
            "cx", "cy", "tl",
            F.shiftright(F.col("cx"), shift).alias("pbx"),
            F.shiftright(F.col("cy"), shift).alias("pby"),
        )
        affected = staged.join(
            F.broadcast(touched), ["pbx", "pby"], "left_semi"
        ).drop("pbx", "pby")
        rebuilt = points_to_blocks(affected, e=e, bits=bits)
        (
            rebuilt.withColumn("pbx", F.shiftright(F.col("bx"), part_shift))
            .withColumn("pby", F.shiftright(F.col("by"), part_shift))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("pbx", "pby")
            .parquet(blocks_path)
        )

    writer = (
        pages_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
    )
    # exposed for failure-injection tests: re-invoking with the same
    # batch_id must leave points AND blocks byte-identical
    writer._qt_process = _process
    return writer
