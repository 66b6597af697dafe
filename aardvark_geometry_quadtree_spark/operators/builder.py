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
        # each entry may hold one or many patch_ids (Builder.load restores
        # the whole staging table as ONE entry — a single pruned read, not
        # one filtered scan per patch); per-entry exponent sets drive the
        # zero-discovery build path
        self._patches: list[DataFrame] = []
        self._layers = layers
        self._exponents: list[set[int] | None] = []
        self._next_id = 0

    def add(self, patch: DataFrame, exponent: int | None = None) -> "Builder":
        """Builder.Add: register one patch ``(cx, cy, e, <layers...>)``;
        a patch_id reflecting insertion order is stamped if missing.
        ``exponent``: the patch's (single) sample exponent if the caller
        knows it — with every patch hinted, ``build`` runs zero metadata
        discovery jobs (ingest jobs always know their own resolution)."""
        if "patch_id" not in patch.columns:
            patch = patch.withColumn("patch_id", F.lit(self._next_id))
        self._next_id += 1
        self._patches.append(patch)
        self._exponents.append({int(exponent)} if exponent is not None else None)
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

    def build(self, validate_hints: bool = True) -> DataFrame:
        """Builder.Build (Builder.fs:362-385): per-exponent first-writer
        paint, then fold resolution groups coarse -> fine with
        SecondDominates — finer data replaces coarser where it lands,
        coarser survives elsewhere (fragments).

        When every patch carried an exponent hint the level set comes from
        the hints alone (zero discovery jobs). A wrong hint would silently
        drop the rows at unhinted exponents, so by default the hint contract
        is asserted IN the plan: the exponent column is wrapped in a
        non-foldable ``assert_true`` that errors the first level job on any
        out-of-set row — no extra validation job. The wrapper blocks parquet
        predicate pushdown on ``e`` for parquet-backed patches, so a trusted
        ingest pipeline may pass ``validate_hints=False`` to restore
        row-group pruning per level."""
        if not self._patches:
            raise ValueError("no patches added")
        layers = self._resolve_layers()
        u = self._union()
        if self._exponents and all(e is not None for e in self._exponents):
            hinted: set[int] = set()
            for s in self._exponents:
                hinted |= s  # type: ignore[arg-type]
            exps = sorted(hinted, reverse=True)  # no discovery job
            if validate_hints:
                ok = F.col("e").isin([int(x) for x in exps])
                msg = F.concat(
                    F.lit("Builder hint violation: row at unhinted exponent e="),
                    F.col("e").cast("string"),
                )
                # otherwise-branch unreachable (assert_true is null or throws)
                # but keeps branches distinct so the conditional survives
                # optimization; every level's e-filter evaluates it per row
                u = u.withColumn(
                    "e",
                    F.when(F.assert_true(ok, msg).isNull(), F.col("e")).otherwise(
                        F.lit(None)
                    ),
                )
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
        """Persist the patch list (Builder.Save: PatchIds + per-patch blobs).
        A small JSON manifest records the per-entry exponent hints so a
        reloaded builder keeps the zero-discovery build path.

        ``path`` may be any Hadoop-visible URI (local, hdfs://, s3a://,
        ...): the parquet write goes through Spark and the manifest goes
        through the same Hadoop FileSystem API (``sources.fsio``), so
        nothing here is local-FS-only."""
        from ..sources import fsio

        self._union().write.mode("overwrite").partitionBy("patch_id").parquet(path)
        manifest = {
            "exponent_sets": [sorted(s) if s is not None else None for s in self._exponents],
            "next_id": self._next_id,
        }
        fsio.write_json(fsio.join(path, "_builder_manifest.json"), manifest)

    @classmethod
    def load(cls, spark: SparkSession, path: str, layers: list[str] | None = None) -> "Builder":
        """Builder.Load: restore the staging table as ONE builder entry —
        a single (partition-pruned) read instead of one filtered scan per
        patch; patch ordering survives in the ``patch_id`` column, which is
        all ``merge_layers``/``flatten_patches`` need. Exponent hints are
        restored from the save-time manifest when complete. ``path`` may be
        any Hadoop-visible URI (manifest + directory listing go through the
        Hadoop FileSystem API, ``sources.fsio``)."""
        from ..sources import fsio

        df = spark.read.parquet(path)
        b = cls(layers=layers)
        exps: set[int] | None = None
        next_id = None
        man = fsio.read_json(fsio.join(path, "_builder_manifest.json"))
        if man is not None:
            sets = man.get("exponent_sets", [])
            if sets and all(s is not None for s in sets):
                exps = {int(x) for s in sets for x in s}
            next_id = man.get("next_id")
        if next_id is None:
            # fall back to partition-directory names (no Spark job), then to
            # a distinct query only if the layout is not patch-partitioned
            pids = [
                int(d.split("=", 1)[1])
                for d in fsio.list_names(path)
                if d.startswith("patch_id=")
            ]
            if not pids:
                pids = [r[0] for r in df.select("patch_id").distinct().collect()]
            next_id = max(pids) + 1 if pids else 0
        b._patches.append(df)
        b._exponents.append(exps)
        b._next_id = next_id
        return b
