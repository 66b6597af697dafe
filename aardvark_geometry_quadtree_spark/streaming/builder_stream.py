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

    Per micro-batch (foreachBatch gives exactly-once with the checkpoint):
    1. append raw patch rows to the staging table (Builder.Save analogue),
    2. recompute ONLY the tiles touched by this batch (dynamic partition
       overwrite on the tile key) — incremental rebuild, not full rebuild.
    """
    lyrs = layers or [c for c in patch_stream.columns if c not in ("cx", "cy", "e", "patch_id")]

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch.write.mode("append").parquet(staging_path)
        touched = (
            with_tile_key(batch, split)
            .select("tile_cx", "tile_cy", "tile_e")
            .distinct()
        )
        staged = with_tile_key(spark.read.parquet(staging_path), split)
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

    return (
        patch_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
    )
