"""Skew handling: salted two-stage aggregation for hot cells (north rule).

Dense geocode regions (viral sites, city centers) concentrate samples on few
tile keys; a plain ``groupBy(tile)`` then stalls on a handful of straggler
tasks. The standard fix: prepend a salt to the hot keys, aggregate partially
per (key, salt), then aggregate the partials — two balanced shuffles instead
of one skewed one. AQE's skew-join splitting covers joins; this covers
aggregations, which AQE does not rebalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_cell_agg(
    samples: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage mean+count aggregation by ``key_cols`` with salting.

    Stage 1 groups by (key, salt) — the salt shards each hot key across
    ``n_salts`` reducers; stage 2 merges the partial (sum, count) pairs.
    Exact same result as a direct groupBy, immune to key skew.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in samples.columns]), F.lit(n_salts))
    partial = (
        samples.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.sum(value_col).alias("_sum"),
            F.count(value_col).alias("_cnt"),
        )
    )
    return partial.groupBy(*key_cols).agg(
        (F.sum("_sum") / F.sum("_cnt")).alias(f"avg_{value_col}"),
        F.sum("_cnt").alias("n_samples"),
    )


def hot_keys(samples: DataFrame, key_cols: list[str], threshold_ratio: float = 10.0) -> DataFrame:
    """Diagnose skew: keys whose row count exceeds ``threshold_ratio`` x the
    mean per-key count (feeds the decision to salt / widen LSH bands; pairs
    with sources.store.lineage_metrics for the per-partition view)."""
    counts = samples.groupBy(*key_cols).count()
    mean = counts.agg(F.avg("count")).collect()[0][0] or 0.0
    return counts.filter(F.col("count") > mean * threshold_ratio)
