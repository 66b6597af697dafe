"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct; the
decode / feature-extract / resize / frame-sample kernels run as Arrow-batched
``mapInPandas`` so only the per-batch numpy code would change when a real
codec is available. The decode step itself is STUBBED (no image/audio libs in
this container): ``decode_image_batch`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded from the
payload bytes) exercises the full Spark-side path — schema, partitioning,
UDF signature, batch shape — identically to a real codec.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)


def synth_media(spark, n: int, kind: str = "image", rows_per_partition: int = 4096) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id.

    Partition count is sized to the row count: a tiny frame spread across 32
    default partitions pays 32x Python-worker + Arrow spin-up in the first
    mapInPandas it hits for ~6 rows each (this was >1/3 of the round-1 bench's
    total wall-clock). Real media payloads are large, so a few thousand rows
    per task is the right grain at scale too.
    """
    df = spark.range(0, n, numPartitions=max(1, -(-n // rows_per_partition)))
    payload = F.encode(F.concat(F.lit(f"{kind}-payload-"), F.md5(F.col("id").cast("string"))), "utf-8")
    return df.select(
        F.col("id").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(
            (F.pmod(F.col("id"), F.lit(4)) * 160 + 320).cast("int").alias("width"),
            (F.pmod(F.col("id"), F.lit(3)) * 120 + 240).cast("int").alias("height"),
            (F.pmod(F.col("id"), F.lit(10)) + 1).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def decode_image_batch(payloads: pd.Series, fake: bool) -> np.ndarray:
    """STUB: real decode needs an image codec (not in this container).

    The fake decoder is deterministic in the payload bytes so tests and
    benches are reproducible; swap this one function for PIL/libvips when
    available — the Spark plumbing around it is unchanged.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library; pass fake=True for the "
            "deterministic stub decoder"
        )
    out = np.empty((len(payloads), 8), dtype=np.float64)
    for i, p in enumerate(payloads):
        dig = hashlib.md5(bytes(p)).digest()
        out[i] = np.frombuffer(dig, dtype=np.uint8)[:8] / 255.0
    return out


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media -> (media_id, kind, feat array<double>, n_bytes): the
    feature-extraction stage, Arrow-batched, vectorized per batch."""

    def _extract(iterator):
        for pdf in iterator:
            feats = decode_image_batch(pdf["payload"], fake)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": list(feats),
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return media.mapInPandas(
        _extract, "media_id long, kind string, feat array<double>, n_bytes long"
    )


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling: explode frame indices 0..n_frames-1 step ``every`` —
    JVM-side sequence explode; the (stubbed) per-frame decode then maps over
    the exploded rows in batches."""
    return media.select(
        "media_id",
        "kind",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))).alias("frame_idx"),
    )


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (metadata-only: target dims + scale factor) — the
    numeric part of resize is plain Column math; the pixel work would live in
    the same mapInPandas slot as decode."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(float(max_side)) / w, F.lit(float(max_side)) / h, F.lit(1.0))
    return media.select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        F.round(scale, 6).alias("scale"),
        F.ceil(w * scale).cast("int").alias("target_w"),
        F.ceil(h * scale).cast("int").alias("target_h"),
    )
