"""Multi-patch out-of-core build orchestration (reference S2/S6).

``Builder`` accumulates patches (Builder.Add, Builder.fs:299-359) and builds
either by the reference's merge strategy — patches grouped by sample
exponent, same-exponent groups painted first-writer-wins, then resolution
groups folded coarse -> fine with ``SecondDominates`` (Builder.fs:362-380) —
or by the flatten strategy of ``Build2`` (Builder.fs:113-290), which
supersamples everything to the finest exponent in one pass.

Patches persist to a staging table (Builder.Save/Load/Export/Import,
Serialization.fs:517-531) so builds are resumable and incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import Dominance, flatten_patches, merge_layers, merge_samples


class Builder:
    """Accumulates sample patches; thread-safety is the caller's concern in
    Spark (the reference locks, Builder.fs:313 — driver code is single-
    threaded here)."""

    def __init__(self, layers: list[str] | None = None):
        self._patches: list[DataFrame] = []
        self._layers = layers
        self._exponents: list[int | None] = []

    def add(self, patch: DataFrame, exponent: int | None = None) -> "Builder":
        """Builder.Add: register one patch ``(cx, cy, e, <layers...>)``;
        a patch_id reflecting insertion order is stamped if missing.
        ``exponent``: the patch's (single) sample exponent if the caller
        knows it — with every patch hinted, ``build`` runs zero metadata
        discovery jobs (ingest jobs always know their own resolution)."""
        if "patch_id" not in patch.columns:
            patch = patch.withColumn("patch_id", F.lit(len(self._patches)))
        self._patches.append(patch)
        self._exponents.append(exponent)
        return self

    def _union(self) -> DataFrame:
        out = self._patches[0]
        for p in self._patches[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    def _resolve_layers(self) -> list[str]:
        if self._layers:
            return self._layers
        cols: list[str] = []
        for p in self._patches:
            for c in p.columns:
                if c not in ("cx", "cy", "e", "patch_id") and c not in cols:
                    cols.append(c)
        return cols

    def build(self) -> DataFrame:
        """Builder.Build (Builder.fs:362-385): per-exponent first-writer
        paint, then fold resolution groups coarse -> fine with
        SecondDominates — finer data replaces coarser where it lands,
        coarser survives elsewhere (fragments)."""
        if not self._patches:
            raise ValueError("no patches added")
        layers = self._resolve_layers()
        u = self._union()
        if len(self._exponents) == len(self._patches) and all(
            e is not None for e in self._exponents
        ):
            exps = sorted(set(self._exponents), reverse=True)  # no discovery job
        else:
            exps = sorted((r[0] for r in u.select("e").distinct().collect()), reverse=True)
        result: DataFrame | None = None
        seen: list[int] = []
        for e in exps:
            level = merge_layers(u.filter(F.col("e") == e), layers).withColumn(
                "e", F.lit(e).cast(dict(u.dtypes)["e"])
            )
            if result is None:
                result = level
            else:
                # fragments can live at any exponent in (e, max(seen)); the
                # conservative contiguous superset keeps the hint exact-free
                # (empty ancestor branches prune to nothing)
                result = merge_samples(
                    result,
                    level,
                    Dominance.SecondDominates,
                    layers=layers,
                    first_exponents=list(range(min(seen + [e]), max(seen) + 1)),
                    second_exponents=[e],
                )
            seen.append(e)
        return result

    def build_flattened(self, target_e: int | None = None) -> DataFrame:
        """Builder.Build2 / build'' (Builder.fs:113-290): single flatten to
        the finest exponent — no mixed-resolution output."""
        if not self._patches:
            raise ValueError("no patches added")
        return flatten_patches(self._union(), self._resolve_layers(), target_e=target_e)

    # ------------------------------------------------------------------
    # persistence (S6)
    # ------------------------------------------------------------------

    def save(self, path: str) -> None:
        """Persist the patch list (Builder.Save: PatchIds + per-patch blobs)."""
        self._union().write.mode("overwrite").partitionBy("patch_id").parquet(path)

    @classmethod
    def load(cls, spark: SparkSession, path: str, layers: list[str] | None = None) -> "Builder":
        """Builder.Load: restore patches from the staging table."""
        df = spark.read.parquet(path)
        b = cls(layers=layers)
        for pid in sorted(r[0] for r in df.select("patch_id").distinct().collect()):
            b._patches.append(df.filter(F.col("patch_id") == pid))
            b._exponents.append(None)  # resolution unknown after reload
        return b
