"""LoD pyramid build (A1) and supersampling (A2).

The reference downsamples 2x2 -> 1 per layer type (Sampling.fs:16-135) when
generating LoD layers; the pyramid over the cell hierarchy is exactly a
rollup: ``groupBy(cx >> 1, cy >> 1, e + 1).agg(<per-type mean>)`` iterated
per level. Each level is one shuffle over a 4x smaller key set, so the whole
pyramid costs ~1.33x the base aggregation (geometric series) — the same
"slightly more than 1/3" overhead the reference claims for LoD storage
(README.md:137).

Supersample duplicates a value into its 4 children with no interpolation
(Layer.fs:210-241); subsampling via resample is explicitly unsupported in
the reference (Layer.fs:249-250) and likewise not offered here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..registry import SEMANTICS, Semantic


def _semantic_for(col: str, semantics: dict[str, Semantic] | None) -> Semantic:
    reg = semantics or SEMANTICS
    if col in reg:
        return reg[col]
    return Semantic(col, "double", float("nan"))


def downsample_once(
    samples: DataFrame,
    layers: list[str] | None = None,
    semantics: dict[str, Semantic] | None = None,
) -> DataFrame:
    """One pyramid level: aggregate each 2x2 block of cells into its parent.

    Averages the *defined* children per layer (NaN holes normalized to NULL
    first, so avg ignores them) — matching the reference resamplers'
    per-type means (Sampling.fs:18-74) with partial map-side aggregation.
    """
    layers = layers or [c for c in samples.columns if c not in ("cx", "cy", "e", "patch_id")]
    aggs = []
    for name in layers:
        sem = _semantic_for(name, semantics)
        aggs.append(sem.downsample(sem.normalize(F.col(name))).alias(name))
    return (
        samples.groupBy(
            F.shiftright("cx", 1).alias("cx"),
            F.shiftright("cy", 1).alias("cy"),
            (F.col("e") + 1).cast("int").alias("e"),
        )
        .agg(*aggs)
    )


def build_pyramid(
    samples: DataFrame,
    levels: int,
    layers: list[str] | None = None,
    semantics: dict[str, Semantic] | None = None,
    include_base: bool = True,
    stage: str = "none",
) -> DataFrame:
    """Base samples + ``levels`` coarser LoD levels, unioned into one frame.

    Driver loop, one shuffle per level (Quadtree LoD generation inverted
    bottom-up; SURVEY.md §2.5 A1). The result is the multi-level samples
    table queried with ``lod_cut`` / ``min_exponent``.
    """
    out = samples if include_base else None
    lvl = samples
    for _ in range(levels):
        lvl = downsample_once(lvl, layers, semantics)
        # 'checkpoint' stages each level eagerly so no level's lineage embeds
        # the aggregation chain below it — the analogue of a real build's
        # per-level write into the tiles table. 'none' (default) leaves one
        # declarative plan; measured locally the staged variants are NOT
        # faster (level shuffles are overhead-bound at test scale), and the
        # single-shuffle scale path is build_pyramid_blocked below.
        if stage == "checkpoint":
            lvl = lvl.localCheckpoint()
        elif stage == "persist":
            lvl = lvl.persist()
        out = lvl if out is None else out.unionByName(lvl, allowMissingColumns=True)
    return out


def build_pyramid_mixed(
    samples: DataFrame,
    levels: int | None = None,
    layers: list[str] | None = None,
    semantics: dict[str, Semantic] | None = None,
    include_base: bool = True,
    exponents: list[int] | None = None,
) -> DataFrame:
    """LoD pyramid over a MIXED-exponent samples set (a merged tree).

    The reference generates inner-node LoD layers by averaging children,
    whether those children are original data or themselves LoD
    (StructureTests level goldens, e.g. 23.875 = avg(1, 92.5, 1, 1) where
    92.5 is itself a derived level). Per level e: rows(e) = original rows at
    e UNION downsample(rows at e-1); originals never collide with derived
    cells (the merged set is non-overlapping). ``levels`` defaults to
    reaching one row above the coarsest original exponent. ``exponents``:
    caller-known exponent set of the input — skips the discovery scan.
    """
    layers = layers or [c for c in samples.columns if c not in ("cx", "cy", "e", "patch_id")]
    if exponents is not None:
        exps = sorted(set(exponents))
    else:
        exps = sorted(r[0] for r in samples.select("e").distinct().collect())
    if levels is None:
        levels = (exps[-1] - exps[0]) + 1
    out = samples.select("cx", "cy", "e", *layers) if include_base else None
    cur = samples.filter(F.col("e") == exps[0]).select("cx", "cy", "e", *layers)
    for i in range(levels):
        e_next = exps[0] + i + 1
        derived = downsample_once(cur, layers, semantics).select("cx", "cy", "e", *layers)
        orig = samples.filter(F.col("e") == e_next).select("cx", "cy", "e", *layers)
        # originals already live in the base union — accumulate ONLY the
        # derived rows, but feed both into the next level's downsample
        cur = derived.unionByName(orig)
        out = derived if out is None else out.unionByName(derived)
    return out


def build_pyramid_blocked(
    samples: DataFrame,
    levels: int,
    layers: list[str] | None = None,
    include_base: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """All ``levels`` LoD levels in ONE shuffle (uniform-exponent base,
    mean-resampled scalar layers).

    Repartitioning by the COARSEST level's block key ``(cx >> levels,
    cy >> levels)`` co-locates every descendant of each level-``levels``
    cell, so every intermediate parent (level k <= levels) is fully
    contained in one partition and the whole pyramid reduces to
    partition-local aggregation — one Arrow pass with vectorized pandas
    group-means per level, no per-level shuffle.

    vs the per-level ``build_pyramid``: shuffle volume drops from
    base*(1 + 1/4 + ...) rows across L exchanges to base rows across one,
    and L stage barriers become zero. This is the build-job formulation for
    the 100 TB tiles table (levels land partition-aligned, ready for a
    partitionBy('e') write); semantics are exactly avg-of-defined-children
    per level (NaN holes skipped — pandas mean semantics match the
    NULL-normalized Catalyst path). Restriction: mean-family resamplers
    only; exotic semantics (normals, byte colors) go through
    ``build_pyramid``, whose per-level expressions come from the registry.
    """
    import pandas as pd

    layers = layers or [c for c in samples.columns if c not in ("cx", "cy", "e", "patch_id")]
    cols = ["cx", "cy", "e", *layers]
    src = samples.select(*cols)
    nparts = num_partitions or src.sparkSession.sparkContext.defaultParallelism
    blocked = src.repartition(
        nparts, F.shiftright("cx", levels), F.shiftright("cy", levels)
    )
    schema = ", ".join(f"{n} {t}" for n, t in src.dtypes)

    def _levels(iterator):
        parts = list(iterator)  # whole partition: block-complete by repartition
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        cur = pdf
        for _ in range(levels):
            # arithmetic right shift on int64 floors correctly for negatives
            g = cur.assign(cx=cur["cx"].values >> 1, cy=cur["cy"].values >> 1,
                           e=cur["e"] + 1)
            cur = g.groupby(["cx", "cy", "e"], as_index=False, sort=False)[layers].mean()
            yield cur[["cx", "cy", "e", *layers]]

    derived = blocked.mapInPandas(_levels, schema)
    return src.unionByName(derived) if include_base else derived


def supersample_once(samples: DataFrame) -> DataFrame:
    """Duplicate every sample into its 4 children (Layer.fs:210-241) —
    a JVM-side explode, each child keeps the parent's value."""
    q = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("q")
    df = samples.select("*", q)
    return (
        df.withColumn("cx", F.shiftleft("cx", 1) + F.pmod("q", F.lit(2)))
        .withColumn("cy", F.shiftleft("cy", 1) + (F.col("q") / 2).cast("long"))
        .withColumn("e", (F.col("e") - 1).cast("int"))
        .drop("q")
    )


def supersample_to(
    samples: DataFrame, target_e: int, exponents: list[int] | None = None
) -> DataFrame:
    """Supersample every row down to ``target_e`` (rows already at or below
    pass through unchanged only if exactly at target; finer input is an
    error, mirroring Layer.Resample's unsupported-subsample rule).
    ``exponents``: caller-known exponent set — skips the discovery scan."""
    exps = (
        list(exponents)
        if exponents is not None
        else [r[0] for r in samples.select("e").distinct().collect()]
    )
    if min(exps) < target_e:
        raise ValueError("cannot subsample finer data to a coarser target")
    out = samples.filter(F.col("e") == target_e)
    for e in sorted(set(exps)):
        if e == target_e:
            continue
        lvl = samples.filter(F.col("e") == e)
        for _ in range(e - target_e):
            lvl = supersample_once(lvl)
        out = out.unionByName(lvl)
    return out
