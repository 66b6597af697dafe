"""Builder (S2) goldens — the cpunz 2023-10-17 fixture (cpunz.fs:1141-1245):
3x5 zero grid at e0 (split 10) + four 2x2 subcells at e=-2 + one at e=-1,
chained SecondDominates. Expected sets derived from the merge semantics
(FIXTURES.md §2 'builder patches': 33 resolved cells)."""

import pytest
from pyspark.sql import functions as F

from aardvark_geometry_quadtree_spark.operators.builder import Builder
from aardvark_geometry_quadtree_spark.operators.query import inside_polygon
from aardvark_geometry_quadtree_spark.sources.grids import grid


@pytest.fixture(scope="module")
def punz_builder(spark):
    b = Builder(layers=["height"])
    b.add(grid(spark, 0, 0, 3, 5, e=0, pattern="const", value=0.0))
    for i, (ox, oy) in enumerate([(0, 0), (2, 0), (2, 2), (0, 2)]):
        b.add(grid(spark, ox, oy, 2, 2, e=-2, pattern="const", value=2.0, patch_id=i + 1))
    b.add(grid(spark, 2, 6, 2, 2, e=-1, pattern="const", value=1.0, patch_id=5))
    return b


def test_builder_merge_build(spark, punz_builder):
    m = punz_builder.build().cache()
    rows = {(r["cx"], r["cy"], r["e"]): r["height"] for r in m.collect()}
    # 15 base cells - 2 fully replaced + 16 e-2 + 4 e-1 = 33
    assert len(rows) == 33
    assert (0, 0, 0) not in rows and (1, 3, 0) not in rows
    assert sum(1 for (cx, cy, e) in rows if e == -2) == 16
    assert sum(1 for (cx, cy, e) in rows if e == -1) == 4
    assert all(v == 2.0 for (cx, cy, e), v in rows.items() if e == -2)
    assert all(v == 1.0 for (cx, cy, e), v in rows.items() if e == -1)
    assert all(v == 0.0 for (cx, cy, e), v in rows.items() if e == 0)

    # the 2023-10-17 polygon query over the merged tree (cpunz.fs:1215)
    poly = [(0.26, 0.26), (2.25, 0.26), (2.25, 3.51), (0.26, 3.51)]
    got = inside_polygon(m, poly)
    counts = {r["e"]: r["n"] for r in got.groupBy("e").agg(F.count("*").alias("n")).collect()}
    assert counts == {-2: 9, 0: 6, -1: 2}


def test_builder_flatten_build(spark, punz_builder):
    flat = punz_builder.build_flattened()
    # everything supersampled to e=-2: 3x5 cells x 16 children = 240 cells
    assert flat.count() == 240
    rows = {(r["cx"], r["cy"]): r["height"] for r in flat.collect()}
    assert rows[(0, 0)] == 2.0       # replaced quadrant
    assert rows[(5, 13)] == 1.0      # e-1 patch area: x in [4,8), y in [12,16) at e-2
    assert rows[(10, 2)] == 0.0      # untouched base area (cell (2,0,0))


def test_builder_save_load_roundtrip(spark, punz_builder, tmp_path):
    path = str(tmp_path / "patches")
    punz_builder.save(path)
    again = Builder.load(spark, path, layers=["height"])
    a = {(r["cx"], r["cy"], r["e"]): r["height"] for r in punz_builder.build().collect()}
    b = {(r["cx"], r["cy"], r["e"]): r["height"] for r in again.build().collect()}
    assert a == b


def test_builder_with_exponent_hints_matches_unhinted(spark):
    """add(patch, exponent=...) on every patch skips the discovery job and
    must produce the identical tree."""
    from aardvark_geometry_quadtree_spark.sources.grids import grid

    def mk(hinted):
        b = Builder(layers=["height"])
        p0 = grid(spark, 0, 0, 2, 2, e=1, pattern="const", value=5.0, patch_id=0)
        p1 = grid(spark, 0, 0, 2, 2, e=0, pattern="const", value=7.0, patch_id=1)
        p2 = grid(spark, 1, 1, 2, 2, e=-1, pattern="const", value=9.0, patch_id=2)
        if hinted:
            b.add(p0, exponent=1).add(p1, exponent=0).add(p2, exponent=-1)
        else:
            b.add(p0).add(p1).add(p2)
        return {(r.cx, r.cy, r.e): r.height for r in b.build().collect()}

    assert mk(True) == mk(False)


def test_builder_hint_guard_fails_loudly(spark):
    from aardvark_geometry_quadtree_spark.sources.grids import grid_with_values

    b = Builder()
    b.add(grid_with_values(spark, 0, 0, 2, 1, [1.0, 2.0], e=0), exponent=0)
    # wrong hint: rows live at e=1 but the hint says 0 -> without the guard
    # these rows would silently vanish from the built tree
    b.add(grid_with_values(spark, 0, 0, 1, 1, [9.0], e=1), exponent=0)
    with pytest.raises(Exception, match="hint violation"):
        b.build().collect()
    # trusted-pipeline escape hatch keeps the old (silent) behavior
    assert b.build(validate_hints=False).count() == 2


def test_builder_load_restores_hints_single_read(spark, tmp_path):
    from aardvark_geometry_quadtree_spark.sources.grids import grid_with_values

    b = Builder()
    # drop the fixture's patch_id so Builder.add stamps the sequence itself
    b.add(grid_with_values(spark, 0, 0, 2, 2, [1.0, 2.0, 3.0, 4.0], e=1).drop("patch_id"), exponent=1)
    b.add(grid_with_values(spark, 2, 0, 2, 2, [-1.0, -2.0, -3.0, -4.0], e=0).drop("patch_id"), exponent=0)
    expect = {(r["cx"], r["cy"], r["e"]): r["height"] for r in b.build().collect()}
    path = str(tmp_path / "staging")
    b.save(path)

    b2 = Builder.load(spark, path)
    # manifest restored the hints: zero discovery jobs AND one frame entry
    assert len(b2._patches) == 1
    assert b2._exponents == [{0, 1}]
    got = {(r["cx"], r["cy"], r["e"]): r["height"] for r in b2.build().collect()}
    assert got == expect
    # adding after load continues the patch-id sequence without collision
    b2.add(grid_with_values(spark, 9, 9, 1, 1, [7.0], e=0).drop("patch_id"), exponent=0)
    ids = sorted(r[0] for r in b2._union().select("patch_id").distinct().collect())
    assert ids == [0, 1, 2]


def test_builder_save_load_file_uri(spark, punz_builder, tmp_path):
    """Builder manifests go through the Hadoop FileSystem API: an explicit
    file: URI (which plain open()/os.listdir cannot touch) must round-trip,
    including the manifest-restored exponent hints."""
    from aardvark_geometry_quadtree_spark.sources import fsio

    path = "file:" + str(tmp_path / "patches_uri")
    punz_builder.save(path)
    # the manifest was written AND reads back through the FS API on the URI
    man = fsio.read_json(path + "/_builder_manifest.json")
    assert man is not None and man["next_id"] == punz_builder._next_id
    again = Builder.load(spark, path, layers=["height"])
    assert again._next_id == punz_builder._next_id
    a = {(r["cx"], r["cy"], r["e"]): r["height"] for r in punz_builder.build().collect()}
    b = {(r["cx"], r["cy"], r["e"]): r["height"] for r in again.build().collect()}
    assert a == b
