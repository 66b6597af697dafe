"""Deterministic grid-fixture synthesis.

Mirrors the reference's test-data generators
(``Tests/Prelude.fs:14-53`` ``createQuadtree{,WithValue,WithRandomValues}`` and
``Tests/QueryTests.fs:12-23``): a ``w × h`` grid of sample cells at exponent
``e`` with origin ``(ox, oy)`` and a per-cell value pattern. Used by the golden
tests (FIXTURES.md §1) and by bench synthesis.

Generated distributed via ``spark.range`` — no driver-side row lists — so the
same generator scales to bench sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SAMPLES_KEY = ("cx", "cy", "e")


def grid(
    spark: SparkSession,
    ox: int,
    oy: int,
    w: int,
    h: int,
    e: int = 0,
    pattern: str = "xy",
    value: float = 0.0,
    seed: int = 42,
    patch_id: int = 0,
    layer: str = "height",
) -> DataFrame:
    """Samples DataFrame ``(cx, cy, e, <layer>, patch_id)`` for one grid patch.

    Patterns (FIXTURES.md §1):
      - ``xy``: value = x + y/100 (local indices, float32 rounding like the
        reference's ``float`` literals)
      - ``const``: value = ``value``
      - ``seq``: row-major index + 1 (1.0, 2.0, ... — StructureTests grids)
      - ``rand``: deterministic uniform in [-100, 100] (seeded, hash-based)
    """
    df = (
        spark.range(int(w) * int(h))
        .withColumn("x", (F.col("id") % w).cast("long"))
        .withColumn("y", (F.col("id") / w).cast("long"))
    )
    if pattern == "xy":
        val = (F.col("x") + F.col("y") / 100.0).cast("float").cast("double")
    elif pattern == "const":
        val = F.lit(float(value))
    elif pattern == "seq":
        val = (F.col("id") + 1).cast("double")
    elif pattern == "rand":
        # xxhash64 is deterministic across runs/partitionings
        val = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(200000)) / 1000.0) - 100.0
    else:
        raise ValueError(f"unknown pattern {pattern!r}")
    return df.select(
        (F.col("x") + ox).cast("long").alias("cx"),
        (F.col("y") + oy).cast("long").alias("cy"),
        F.lit(int(e)).cast("int").alias("e"),
        val.alias(layer),
        F.lit(int(patch_id)).cast("int").alias("patch_id"),
    )


def grid_with_values(
    spark: SparkSession,
    ox: int,
    oy: int,
    w: int,
    h: int,
    values: list[float],
    e: int = 0,
    patch_id: int = 0,
    layer: str = "height",
) -> DataFrame:
    """Grid with explicit row-major values (README 4×3 fixture and friends)."""
    assert len(values) == w * h
    rows = [
        (int(ox + i % w), int(oy + i // w), int(e), float(v), int(patch_id))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "cx long, cy long, e int, " + layer + " double, patch_id int"
    )
