"""Persistence, export, and checkpoint-resumable stages (S3-S8).

The reference persists nodes to a key/value blob store with id-dedup
(Serialization.fs:496-515) and loads lazily via OutOfCoreNode thunks
(:151-164). Spark-side: a tiles/samples table written as Parquet partitioned
by exponent + bucketed tile hash; "lazy children" = partitions never touched
by a pruned scan; structural sharing ~ immutable snapshot directories.

Checkpoint-resume (north rule): every pipeline stage runs through
:func:`stage`, which skips recomputation when the stage's output already
exists (_SUCCESS marker) — a job killed mid-pipeline resumes from the last
completed stage. Each stage stamps per-partition lineage
(stage name, input partition id, row count) queryable via
:func:`lineage_metrics`.

Iceberg note (north rule names Iceberg tables; no Iceberg runtime ships in
this container): the layout here is the plain-filesystem isomorph —
partitioned parquet + a JSON manifest standing in for table metadata, and
immutable per-stage directories standing in for snapshots. Swapping in a
real catalog is mechanical: ``df.writeTo(table).partitionedBy(...)`` replaces
``write.partitionBy(...).parquet(path)`` and snapshot ids replace _SUCCESS
markers; no operator logic changes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fsio

MANIFEST = "_quadtree_manifest.json"


def save_samples(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("e",),
    n_buckets: int | None = None,
    mode: str = "overwrite",
    meta: dict | None = None,
) -> None:
    """Persist a samples/tiles frame as Parquet partitioned by exponent
    (Quadtree.Save analogue, Serialization.fs:496-515).

    Partitioning by ``e`` + optional hash bucket over (cx, cy) gives the
    same pruning the reference gets from bbox checks: exponent-aligned
    queries touch one directory; Parquet min/max stats on cx/cy prune
    row groups within it.
    """
    out = df
    if n_buckets:
        out = out.withColumn(
            "bucket", F.pmod(F.xxhash64("cx", "cy"), F.lit(n_buckets)).cast("int")
        )
        partition_cols = (*partition_cols, "bucket")
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    manifest = {"partition_cols": list(partition_cols), "columns": df.columns}
    manifest.update(meta or {})
    fsio.write_json(fsio.join(path, MANIFEST), manifest)


def load_samples(spark: SparkSession, path: str) -> DataFrame:
    """Quadtree.Load analogue — a lazy pruned scan (Serialization.fs:551-557)."""
    return spark.read.parquet(path)


def load_manifest(path: str) -> dict:
    man = fsio.read_json(fsio.join(path, MANIFEST))
    if man is None:
        raise FileNotFoundError(fsio.join(path, MANIFEST))
    return man


def save_packed(
    samples: DataFrame,
    path: str,
    split: int | None = None,
    layers: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist the PACKED tile format — one row per leaf tile with row-major
    array payloads + per-layer masks (the real 100 TB storage layout; the
    analogue of the reference's serialized QNode buffers,
    Serialization.fs:318-335 / Tests/SerializationTests.fs:110-188).

    Compared to exploded samples rows this stores one array cell per sample
    instead of one parquet row (no per-row key overhead), while partition-by-
    exponent + tile-key min/max stats keep the same pruning.
    """
    from ..operators.build import DEFAULT_SPLIT, pack_tiles, packable_layer_types

    split = DEFAULT_SPLIT if split is None else split
    layers = layers or [c for c in samples.columns if c not in ("cx", "cy", "e", "patch_id")]
    # validates layer types up front (loud error on array/struct/string
    # layers) and records the exact per-layer Spark type — the manifest
    # analogue of the reference's typed per-semantic serialization
    # (Defs.fs / Serialization.fs:318-335); load casts buffers back
    layer_types = packable_layer_types(samples, layers)
    tiles = pack_tiles(samples, split, layers)
    tiles.write.mode(mode).partitionBy("e").parquet(path)
    manifest = {
        "format": "packed",
        "split": split,
        "layers": layers,
        "layer_types": layer_types,
        "partition_cols": ["e"],
    }
    fsio.write_json(fsio.join(path, MANIFEST), manifest)


def load_packed_tiles(spark: SparkSession, path: str) -> DataFrame:
    """The packed tiles table as stored (lazy pruned scan)."""
    return spark.read.parquet(path)


def load_packed(spark: SparkSession, path: str) -> DataFrame:
    """Load a packed store back as a samples frame (unpack is a JVM-side
    posexplode per tile row; layer holes come back as canonical NULL and
    each layer is cast back to its manifest-recorded source type)."""
    from ..operators.build import unpack_tiles

    man = load_manifest(path)
    return unpack_tiles(
        spark.read.parquet(path), man["layers"], man.get("layer_types")
    )


def enumerate_keys(spark: SparkSession, path: str) -> DataFrame:
    """Distinct stored cell keys (Quadtree.EnumerateKeys, Serialization.fs:598-610)."""
    return load_samples(spark, path).select("cx", "cy", "e").distinct()


def export_store(spark: SparkSession, src: str, dst: str, mode: str = "overwrite") -> int:
    """Copy a stored tree store-to-store with count check
    (Quadtree.Export, Serialization.fs:613-642). Returns rows copied."""
    df = load_samples(spark, src)
    man = load_manifest(src)
    part = [c for c in man.get("partition_cols", []) if c in df.columns]
    w = df.write.mode(mode)
    if part:
        w = w.partitionBy(*part)
    w.parquet(dst)
    fsio.write_json(fsio.join(dst, MANIFEST), man)
    return load_samples(spark, dst).count()


# ---------------------------------------------------------------------------
# pluggable store bindings (S5): the reference's SerializationOptions is a
# TryGet/Add pair over a keyed blob store, with an in-memory binding for
# tests (Serialization.fs:19-66 NewInMemoryStore) and disk/db bindings for
# real stores. Same protocol here: add/try_get/exists over named frames.
# ---------------------------------------------------------------------------

class InMemoryStore:
    """Dict-backed store binding (SerializationOptions.NewInMemoryStore
    parity). Frames are held as driver-side Arrow/pandas tables — intended
    for tests and tiny exports, exactly like the reference's in-memory
    store; production data goes through :class:`ParquetStore`."""

    def __init__(self) -> None:
        self._frames: dict[str, object] = {}

    def add(self, key: str, df: DataFrame) -> None:
        self._frames[key] = df.toPandas()

    def try_get(self, spark: SparkSession, key: str) -> DataFrame | None:
        pdf = self._frames.get(key)
        return None if pdf is None else spark.createDataFrame(pdf)

    def exists(self, key: str) -> bool:
        return key in self._frames

    def keys(self) -> list[str]:
        return sorted(self._frames)


class ParquetStore:
    """Directory-of-parquet store binding (the scale path: each key is a
    partitioned parquet dataset; TryGet is a lazy pruned scan)."""

    def __init__(self, root: str) -> None:
        self.root = root

    def _path(self, key: str) -> str:
        return fsio.join(self.root, key)

    def add(self, key: str, df: DataFrame, partition_cols: tuple[str, ...] = ()) -> None:
        w = df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(self._path(key))

    def add_if_absent(
        self, key: str, df: DataFrame, partition_cols: tuple[str, ...] = ()
    ) -> bool:
        """Key-granularity save-dedup (Serialization.fs:499-506 parity): a
        blob whose key already exists is never rewritten — the incremental-
        crawl write path, where re-exporting a tree touches only new keys.
        Returns True iff this call wrote."""
        if self.exists(key):
            return False
        self.add(key, df, partition_cols)
        return True

    def try_get(self, spark: SparkSession, key: str) -> DataFrame | None:
        return spark.read.parquet(self._path(key)) if self.exists(key) else None

    def exists(self, key: str) -> bool:
        return fsio.exists(fsio.join(self._path(key), "_SUCCESS"))

    def keys(self) -> list[str]:
        return sorted(
            k for k in fsio.list_names(self.root)
            if fsio.exists(fsio.join(self.root, k, "_SUCCESS"))
        )


def export_between_stores(
    spark: SparkSession,
    src: "ParquetStore",
    dst: "ParquetStore",
    keys: list[str] | None = None,
) -> list[str]:
    """Store-to-store export that SKIPS keys the destination already holds
    (Quadtree.Export + the id-dedup of Serialization.fs:499-506): an
    incremental crawl exported twice writes nothing the second time.
    Returns the keys actually copied."""
    copied = []
    for k in keys if keys is not None else src.keys():
        df = src.try_get(spark, k)
        if df is not None and dst.add_if_absent(k, df):
            copied.append(k)
    return copied


# ---------------------------------------------------------------------------
# checkpoint-resumable stages with per-partition lineage
# ---------------------------------------------------------------------------

def _done(path: str) -> bool:
    return fsio.exists(fsio.join(path, "_SUCCESS"))


def with_lineage(df: DataFrame, stage_name: str) -> DataFrame:
    """Stamp per-partition lineage: which stage produced the row and from
    which task partition — the north rule's per-partition lineage column."""
    return df.withColumn(
        "_lineage",
        F.struct(
            F.lit(stage_name).alias("stage"),
            F.spark_partition_id().alias("part"),
        ),
    )


def stage(
    spark: SparkSession,
    name: str,
    path: str,
    fn: Callable[[], DataFrame],
    partition_cols: tuple[str, ...] = (),
    force: bool = False,
) -> DataFrame:
    """Run (or resume) one checkpointed pipeline stage.

    If ``path`` already holds a completed write, the stage is skipped and the
    stored result is returned — crash-resume without recomputation. Otherwise
    ``fn()`` is computed, lineage-stamped, and written atomically (_SUCCESS
    marks completion; a partial write without it is overwritten on retry).
    """
    out_dir = fsio.join(path, name)
    if not force and _done(out_dir):
        return spark.read.parquet(out_dir)
    df = with_lineage(fn(), name)
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(out_dir)
    return spark.read.parquet(out_dir)


def lineage_metrics(df: DataFrame) -> DataFrame:
    """Tile-assignment metrics per producing partition (north rule):
    rows per (stage, partition) — the skew diagnostic for salting decisions."""
    return (
        df.groupBy("_lineage.stage", "_lineage.part")
        .agg(F.count("*").alias("rows"))
        .orderBy(F.desc("rows"))
    )
