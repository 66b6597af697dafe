"""Build/tiling goldens — Tests/QuadtreeTests.fs:40-82 structure counts."""

from pyspark.sql import functions as F

from aardvark_geometry_quadtree_spark.operators import build as B
from aardvark_geometry_quadtree_spark.sources.grids import grid


def test_build1_leaf_count(spark, q10x7):
    # 10x7 e0 split2 -> 6 leaves (QuadtreeTests.fs:41-50)
    st = B.tree_stats(q10x7, split=2)
    assert st.leaf_count == 6
    assert st.node_count == st.inner_count + st.leaf_count
    assert (st.root.cx, st.root.cy, st.root.e, st.root.centered) == (0, 0, 4, False)


def test_build_centered_a(spark):
    q = grid(spark, -2, -2, 4, 4, e=0, pattern="xy")
    st = B.tree_stats(q, split=2)
    assert (st.node_count, st.inner_count, st.leaf_count) == (1, 0, 1)
    assert st.root.centered and st.root.e == 2


def test_build_centered_b(spark):
    q = grid(spark, -2, -2, 4, 4, e=0, pattern="xy")
    st = B.tree_stats(q, split=1)
    assert (st.node_count, st.inner_count, st.leaf_count) == (5, 1, 4)


def test_build_centered_c(spark):
    q = grid(spark, -1, -1, 2, 2, e=0, pattern="xy")
    st = B.tree_stats(q, split=0)
    assert (st.node_count, st.inner_count, st.leaf_count) == (5, 1, 4)


def test_tile_stats(q10x7):
    t = B.build_tiles(q10x7, split=2)
    assert t.count() == 6
    # ebb of tile (0,0): [0,4)x[0,4)
    r = t.filter((F.col("tile_cx") == 0) & (F.col("tile_cy") == 0)).collect()[0]
    assert (r["ebb_min_cx"], r["ebb_min_cy"], r["ebb_max_cx"], r["ebb_max_cy"]) == (0, 0, 4, 4)
    assert r["n_samples"] == 16
    # boundary tile (2,1): cx in [8,10), cy in [4,7) -> 6 samples
    r = t.filter((F.col("tile_cx") == 2) & (F.col("tile_cy") == 1)).collect()[0]
    assert r["n_samples"] == 6


def test_pack_unpack_roundtrip(q10x7):
    packed = B.pack_tiles(q10x7, split=2, layers=["height"])
    assert packed.count() == 6
    back = B.unpack_tiles(packed, layers=["height"])
    assert back.count() == 70
    orig = {(r["cx"], r["cy"], r["e"]): r["height"] for r in q10x7.collect()}
    got = {(r["cx"], r["cy"], r["e"]): r["height"] for r in back.collect()}
    assert got.keys() == orig.keys()
    for k in orig:
        assert abs(got[k] - orig[k]) < 1e-6
