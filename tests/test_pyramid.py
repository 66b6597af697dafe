"""LoD pyramid goldens — downsample means from the reference's commented
LoD expectations (StructureTests.fs Level 0/1 blocks, Sampling.fs rules)."""

import pytest
from pyspark.sql import functions as F

from aardvark_geometry_quadtree_spark.operators.pyramid import (
    build_pyramid,
    downsample_once,
    supersample_once,
    supersample_to,
)
from aardvark_geometry_quadtree_spark.sources.grids import grid_with_values


def test_downsample_mean(spark):
    # 2x2 at e=-1 with 91..94 -> parent (2,0,0) = 92.5 (StructureTests golden
    # comment fs:1040 "(2,0,0), 92.5")
    c = grid_with_values(spark, 4, 0, 2, 2, [91.0, 92.0, 93.0, 94.0], e=-1)
    up = downsample_once(c, ["height"])
    rows = up.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["cx"], r["cy"], r["e"]) == (2, 0, 0)
    assert r["height"] == pytest.approx(92.5)


def test_downsample_partial_block_averages_defined(spark):
    # only 1 of 4 children present -> parent = that value (avg of defined)
    c = grid_with_values(spark, 0, 0, 1, 1, [7.0], e=0)
    r = downsample_once(c, ["height"]).collect()[0]
    assert (r["cx"], r["cy"], r["e"], r["height"]) == (0, 0, 1, 7.0)


def test_downsample_nan_normalized(spark):
    nan = float("nan")
    c = grid_with_values(spark, 0, 0, 2, 2, [1.0, nan, 3.0, nan], e=0)
    r = downsample_once(c, ["height"]).collect()[0]
    assert r["height"] == pytest.approx(2.0)


def test_build_pyramid_levels(spark, q10x7):
    pyr = build_pyramid(q10x7, levels=2, layers=["height"])
    counts = {r["e"]: r["n"] for r in pyr.groupBy("e").agg(F.count("*").alias("n")).collect()}
    # e0: 70; e1: 5x4=20; e2: 3x2=6
    assert counts == {0: 70, 1: 20, 2: 6}


def test_supersample_once(spark):
    c = grid_with_values(spark, 1, 1, 1, 1, [5.0], e=1)
    kids = supersample_once(c)
    got = {(r["cx"], r["cy"], r["e"]): r["height"] for r in kids.collect()}
    assert got == {(2, 2, 0): 5.0, (3, 2, 0): 5.0, (2, 3, 0): 5.0, (3, 3, 0): 5.0}


def test_supersample_to_rejects_subsampling(spark):
    c = grid_with_values(spark, 0, 0, 1, 1, [5.0], e=0)
    with pytest.raises(ValueError):
        supersample_to(c, 1)  # Layer.fs:249-250: subsample unsupported


def test_blocked_pyramid_matches_per_level(spark):
    """build_pyramid_blocked (single-shuffle scale path) must equal the
    per-level Catalyst pyramid exactly — incl. NaN/NULL holes, negative
    coordinates, and cells straddling block boundaries."""
    import math

    from aardvark_geometry_quadtree_spark.operators.pyramid import (
        build_pyramid, build_pyramid_blocked)

    rows = []
    for x in range(-20, 20):
        for y in range(-20, 20):
            v = None if (x * y) % 11 == 0 else float(x * 3 + y)
            rows.append((x, y, -2, v))
    samples = spark.createDataFrame(rows, "cx long, cy long, e int, height double")
    a = build_pyramid(samples, 4, ["height"]).collect()
    b = build_pyramid_blocked(samples, 4, ["height"]).collect()

    def key(rs):
        return {
            (r.cx, r.cy, r.e): None if r.height is None or (isinstance(r.height, float) and math.isnan(r.height)) else round(r.height, 9)
            for r in rs
        }

    ka, kb = key(a), key(b)
    assert ka == kb
    assert len(a) == len(b)
