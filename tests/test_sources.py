"""Web-pages synth/geocode, store roundtrip, checkpoint-resume, multimodal."""

import os

import pytest
from pyspark.sql import functions as F

from aardvark_geometry_quadtree_spark.operators.multimodal import (
    decode_image_batch,
    extract_features,
    resize_meta,
    sample_frames,
    synth_media,
)
from aardvark_geometry_quadtree_spark.sources import store as ST
from aardvark_geometry_quadtree_spark.sources.webpages import (
    geocode,
    pages_to_samples,
    synth_webpages,
    text_hash_check,
)


@pytest.fixture(scope="module")
def pages(spark):
    return synth_webpages(spark, 2000, nsites=50, skew=1.5).cache()


def test_webpages_deterministic(spark, pages):
    again = synth_webpages(spark, 2000, nsites=50, skew=1.5)
    assert text_hash_check(pages, again) == 0  # byte-identical text per url
    assert pages.count() == 2000
    assert pages.select("url").distinct().count() == 2000


def test_geocode_bounds_and_determinism(spark, pages):
    xy = geocode(pages, extent=256.0)
    row = xy.agg(F.min("x"), F.max("x"), F.min("y"), F.max("y")).collect()[0]
    assert 0 <= row[0] and row[1] < 256 and 0 <= row[2] and row[3] < 256
    s = pages_to_samples(xy, e=0)
    assert s.agg(F.sum("n_pages")).collect()[0][0] == 2000


def test_store_roundtrip(spark, q10x7, tmp_path):
    path = str(tmp_path / "tiles")
    ST.save_samples(q10x7, path, partition_cols=("e",), meta={"split": 2})
    back = ST.load_samples(spark, path)
    assert back.count() == 70
    assert ST.load_manifest(path)["split"] == 2
    assert ST.enumerate_keys(spark, path).count() == 70
    dst = str(tmp_path / "export")
    assert ST.export_store(spark, path, dst) == 70


def test_stage_resume(spark, q10x7, tmp_path):
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return q10x7

    base = str(tmp_path / "stages")
    df1 = ST.stage(spark, "s1", base, compute)
    assert calls["n"] == 1 and df1.count() == 70
    # resume: same stage skips recomputation
    df2 = ST.stage(spark, "s1", base, compute)
    assert calls["n"] == 1 and df2.count() == 70
    # lineage metrics present
    m = ST.lineage_metrics(df2)
    assert m.agg(F.sum("rows")).collect()[0][0] == 70
    # partial write without _SUCCESS is recomputed
    os.remove(os.path.join(base, "s1", "_SUCCESS"))
    ST.stage(spark, "s1", base, compute)
    assert calls["n"] == 2


def test_multimodal_features(spark):
    media = synth_media(spark, 50)
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r["feat"]) == 8 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["feat"])


def test_multimodal_decode_stub_raises():
    import pandas as pd

    with pytest.raises(NotImplementedError):
        decode_image_batch(pd.Series([b"x"]), fake=False)


def test_frame_sampling_and_resize(spark):
    media = synth_media(spark, 10)
    frames = sample_frames(media, every=2)
    n = frames.count()
    assert n == sum((r["meta"]["n_frames"] + 1) // 2 for r in media.collect())
    rz = resize_meta(media, max_side=256).collect()
    for r in rz:
        assert max(r["target_w"], r["target_h"]) <= 256 or r["scale"] == 1.0


def test_packed_store_roundtrip(spark, tmp_path):
    """Packed-tile persistence (Serialization.fs:318-335 payload roundtrip;
    Tests/SerializationTests.fs:110-188): samples -> packed tiles on disk ->
    samples, exact, including NULL layer holes and per-layer masks."""
    from aardvark_geometry_quadtree_spark.sources.store import (
        load_packed, load_packed_tiles, save_packed)

    rows = [
        (x, y, -1, float(x * 10 + y) if (x + y) % 3 else None, float(x))
        for x in range(-4, 4)
        for y in range(-4, 4)
    ]
    samples = spark.createDataFrame(rows, "cx long, cy long, e int, height double, slope double")
    path = str(tmp_path / "packed")
    save_packed(samples, path, split=2)
    back = load_packed(spark, path)
    a = {(r.cx, r.cy, r.e, r.height, r.slope) for r in samples.collect()}
    b = {(r.cx, r.cy, r.e, r.height, r.slope) for r in back.collect()}
    assert a == b

    tiles = load_packed_tiles(spark, path)
    t = tiles.collect()
    # per-layer Mask1b: the height mask has holes where (x+y)%3==0, the
    # slope mask is everywhere the occupancy mask is set
    for r in t:
        assert len(r["height_arr"]) == r["win_sx"] * r["win_sy"]
        assert len(r["height_mask"]) == len(r["mask"])
        assert all((not m) or c for m, c in zip(r["height_mask"], r["mask"]))
        assert [m and c for m, c in zip([True] * len(r["mask"]), r["mask"])] == list(r["slope_mask"])
    n_holes = sum(sum(1 for c, m in zip(r["mask"], r["height_mask"]) if c and not m) for r in t)
    assert n_holes == sum(1 for x in range(-4, 4) for y in range(-4, 4) if (x + y) % 3 == 0)


def test_store_bindings(spark, tmp_path):
    """S5 pluggable stores: the TryGet/Add protocol with the in-memory
    binding (SerializationOptions.NewInMemoryStore, Serialization.fs:19-66)
    and the parquet binding behave identically."""
    from aardvark_geometry_quadtree_spark.sources.store import InMemoryStore, ParquetStore

    df = spark.createDataFrame(
        [(0, 0, 0, 1.5), (1, 0, 0, 2.5)], "cx long, cy long, e int, height double"
    )
    for store in (InMemoryStore(), ParquetStore(str(tmp_path / "store"))):
        assert store.try_get(spark, "tree-a") is None
        assert not store.exists("tree-a")
        store.add("tree-a", df)
        assert store.exists("tree-a")
        got = store.try_get(spark, "tree-a")
        assert {(r.cx, r.height) for r in got.collect()} == {(0, 1.5), (1, 2.5)}
        assert store.keys() == ["tree-a"]


def test_upgrade_semantic_on_load_workflow(spark, tmp_path):
    """SerializationTests 'Workflow. upgrade old semantic on load from
    store': save under an old semantic, load, UpdateLayerSemantic to the
    new name, query — values unchanged under the new name."""
    from aardvark_geometry_quadtree_spark.operators.layers import update_layer_semantic
    from aardvark_geometry_quadtree_spark.operators.query import inside_box
    from aardvark_geometry_quadtree_spark.sources.store import load_samples, save_samples

    df = spark.createDataFrame(
        [(x, y, 0, float(x * 10 + y)) for x in range(4) for y in range(4)],
        "cx long, cy long, e int, Heights1f double",
    )
    path = str(tmp_path / "oldsem")
    save_samples(df, path)
    loaded = load_samples(spark, path)
    upgraded = update_layer_semantic(loaded, "Heights1f", "Heights1d")
    assert "Heights1d" in upgraded.columns and "Heights1f" not in upgraded.columns
    got = {(r.cx, r.cy): r.Heights1d for r in inside_box(upgraded, 0, 0, 2, 2).collect()}
    assert got == {(0, 0): 0.0, (1, 0): 10.0, (0, 1): 1.0, (1, 1): 11.0}


def test_packed_store_typed_layers_roundtrip(spark, tmp_path):
    """Round-2 advice: int/long layers must round-trip with their exact type
    (typed buffers + manifest types, Defs.fs typed-serialization parity),
    and non-scalar layers must fail loudly, not crash the kernel."""
    import pytest

    from aardvark_geometry_quadtree_spark.sources.store import (
        load_manifest, load_packed, save_packed)

    rows = [
        (x, y, 0, float(x + y), x * 1000 + y if (x + y) % 3 else None, (x + y) % 2 == 0)
        for x in range(0, 6)
        for y in range(0, 5)
    ]
    samples = spark.createDataFrame(
        rows, "cx long, cy long, e int, height double, n bigint, flag boolean"
    )
    path = str(tmp_path / "typed")
    save_packed(samples, path, split=2)
    man = load_manifest(path)
    assert man["layer_types"] == {"height": "double", "n": "bigint", "flag": "boolean"}
    back = load_packed(spark, path)
    assert dict(back.dtypes) == dict(samples.dtypes)
    a = {tuple(r) for r in samples.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b

    # array layer -> loud error before any kernel runs
    bad = samples.withColumn("vec", F.array(F.lit(1.0), F.lit(2.0)))
    with pytest.raises(ValueError, match="unsupported type"):
        save_packed(bad, str(tmp_path / "bad"), split=2)


def test_add_if_absent_and_incremental_export(spark, tmp_path):
    """Serialization.fs:499-506 parity: existing keys are never rewritten;
    a second export of the same tree writes nothing."""
    import os

    from aardvark_geometry_quadtree_spark.sources.store import (
        ParquetStore, export_between_stores)

    df1 = spark.createDataFrame([(0, 0, 0, 1.0)], "cx long, cy long, e int, height double")
    df2 = spark.createDataFrame([(9, 9, 0, 9.0)], "cx long, cy long, e int, height double")
    src = ParquetStore(str(tmp_path / "src"))
    src.add("k1", df1)
    assert src.add_if_absent("k1", df2) is False  # not rewritten
    assert {(r.cx,) for r in src.try_get(spark, "k1").collect()} == {(0,)}
    assert src.add_if_absent("k2", df2) is True

    dst = ParquetStore(str(tmp_path / "dst"))
    assert export_between_stores(spark, src, dst) == ["k1", "k2"]
    # capture write times; second export must be a no-op at key granularity
    mtimes = {k: os.path.getmtime(os.path.join(dst.root, k, "_SUCCESS")) for k in dst.keys()}
    assert export_between_stores(spark, src, dst) == []
    assert mtimes == {
        k: os.path.getmtime(os.path.join(dst.root, k, "_SUCCESS")) for k in dst.keys()
    }
    # and the store still sees exactly one copy per key
    assert dst.try_get(spark, "k1").count() == 1


def test_store_file_uri_roundtrip(spark, tmp_path):
    """Store manifests and _SUCCESS probes go through the Hadoop FS API:
    save/load/export and the ParquetStore binding must work on an explicit
    file: URI (plain open()/os.listdir cannot touch one)."""
    from aardvark_geometry_quadtree_spark.sources import store as S
    from aardvark_geometry_quadtree_spark.sources.grids import grid

    g = grid(spark, 0, 0, 4, 4, e=0, pattern="seq")
    root = "file:" + str(tmp_path / "store_uri")
    S.save_samples(g, root + "/t1")
    man = S.load_manifest(root + "/t1")
    assert man["partition_cols"] == ["e"]
    back = S.load_samples(spark, root + "/t1")
    assert back.count() == 16
    n = S.export_store(spark, root + "/t1", root + "/t2")
    assert n == 16 and S.load_manifest(root + "/t2")["partition_cols"] == ["e"]
    ps = S.ParquetStore(root + "/kv")
    assert ps.add_if_absent("a", g) is True
    assert ps.add_if_absent("a", g) is False  # dedup via FS-API _SUCCESS probe
    assert ps.keys() == ["a"]
    assert ps.try_get(spark, "a").count() == 16
