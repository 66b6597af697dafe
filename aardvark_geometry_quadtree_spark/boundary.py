"""Pluggable plan-truncation boundary for chained/multi-consumer operators.

Chained merges (and the two-sided dedup self-joins) need a point where the
logical plan is cut: without one, N chained merges stack joins + Python
kernels into an exponentially deep plan, and a frame consumed twice
recomputes its whole upstream per consumer.

The default cut is ``DataFrame.localCheckpoint()``. Its contract matters at
cluster scale: localCheckpoint TRUNCATES lineage, so a block lost with an
executor CANNOT be recomputed — the job fails and must be rerun from the
last durable boundary. (It does not corrupt results: row identity in the
merge path is the natural key, so a full rerun is deterministic.) On a
long-lived cluster run the right boundary is a DURABLE one: the persisted
staging table of :func:`aardvark_geometry_quadtree_spark.sources.store.stage`,
which both survives executor loss and makes the whole pipeline
checkpoint-resumable. :func:`store_boundary` builds exactly that, and
``set_default_boundary`` installs it process-wide; tests
(tests/test_merge.py) verify chained merges through the staged path match
the default path bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

Boundary = Callable[[DataFrame], DataFrame]


def local_boundary(df: DataFrame) -> DataFrame:
    """Default: in-memory lineage cut (fast; NOT durable — executor loss
    aborts the job back to the previous durable boundary)."""
    return df.localCheckpoint()


_default: Boundary = local_boundary


def set_default_boundary(fn: Boundary | None) -> None:
    """Install a process-wide boundary (None restores localCheckpoint)."""
    global _default
    _default = fn if fn is not None else local_boundary


def cut(df: DataFrame, boundary: Boundary | None = None) -> DataFrame:
    """Apply the given (or default) boundary to ``df``."""
    return (boundary or _default)(df)


def store_boundary(spark, root: str, prefix: str = "boundary") -> Boundary:
    """A DURABLE boundary: each cut writes through ``store.stage`` into
    ``root`` (parquet + _SUCCESS + per-partition lineage) and reads it back.
    Re-running the same pipeline resumes from completed cuts instead of
    recomputing them — the checkpoint-resume contract of the north rule.
    Stage names are sequential within this boundary instance; pass a fresh
    ``prefix``/root per logical pipeline."""
    from .sources.store import stage

    counter = {"n": 0}

    def _cut(df: DataFrame) -> DataFrame:
        name = f"{prefix}_{counter['n']:04d}"
        counter["n"] += 1
        out = stage(spark, name, root, lambda: df)
        return out.drop("_lineage")

    return _cut
