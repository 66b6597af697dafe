"""Dominance probe goldens from Tests/MergeTests.fs:122-398: merged trees
sampled at probe positions via the point-lookup join (Sample.PositionTyped)."""

import pytest

from aardvark_geometry_quadtree_spark.operators.merge import Dominance, merge_samples
from aardvark_geometry_quadtree_spark.operators.query import sample_positions
from aardvark_geometry_quadtree_spark.sources.grids import grid


def _probe(spark, merged, px, py):
    pos = spark.createDataFrame([(0, float(px), float(py))], "pid int, px double, py double")
    rows = sample_positions(merged, pos).collect()
    assert len(rows) == 1
    return rows[0]["height"]


def test_overlapping_same_depth(spark):
    # MergeTests.fs:122-133: identical 1x1 -> 1 cell survives
    a = grid(spark, 0, 0, 1, 1, e=0, pattern="const", value=1.0)
    b = grid(spark, 0, 0, 1, 1, e=0, pattern="const", value=2.0, patch_id=1)
    m = merge_samples(a, b, Dominance.SecondDominates)
    assert m.count() == 1
    assert _probe(spark, m, 0.5, 0.5) == 2.0


def test_different_depth_first_more_detailed(spark):
    # MergeTests.fs:137-151: fine(4 cells)=10 FirstDominates coarse=20 -> 4 cells, probe=10
    a = grid(spark, 0, 0, 2, 2, e=-1, pattern="const", value=10.0)
    b = grid(spark, 0, 0, 1, 1, e=0, pattern="const", value=20.0, patch_id=1)
    m = merge_samples(a, b, Dominance.FirstDominates)
    assert m.count() == 4
    assert _probe(spark, m, 0.5, 0.5) == 10.0


def test_different_depth_second_more_detailed(spark):
    # MergeTests.fs:154-169
    a = grid(spark, 0, 0, 1, 1, e=0, pattern="const", value=10.0)
    b = grid(spark, 0, 0, 2, 2, e=-1, pattern="const", value=20.0, patch_id=1)
    m = merge_samples(b, a, Dominance.FirstDominates)
    assert m.count() == 4
    assert _probe(spark, m, 0.5, 0.5) == 20.0


def test_same_depth_first_dominates_partial_overlap(spark):
    # MergeTests.fs:172-230: 2x2 vs 1x1 at e=-1, both orders
    a = grid(spark, 0, 0, 2, 2, e=-1, pattern="const", value=10.0)
    b = grid(spark, 0, 0, 1, 1, e=-1, pattern="const", value=20.0, patch_id=1)
    m = merge_samples(a, b, Dominance.FirstDominates)
    assert _probe(spark, m, 0.25, 0.25) == 10.0
    assert m.count() == 4
    m2 = merge_samples(b, a, Dominance.FirstDominates)
    assert _probe(spark, m2, 0.25, 0.25) == 20.0
    assert m2.count() == 4  # b wins its cell; a's other 3 cells survive


def test_more_detailed_probe_all_positions(spark):
    # MoreDetailedOrFirst: the fine region reads fine values, elsewhere coarse
    coarse = grid(spark, 0, 0, 2, 2, e=1, pattern="const", value=5.0)  # [0,4)^2
    fine = grid(spark, 0, 0, 2, 2, e=0, pattern="const", value=7.0, patch_id=1)  # [0,2)^2
    m = merge_samples(coarse, fine, Dominance.MoreDetailedOrFirst)
    assert _probe(spark, m, 1.0, 1.0) == 7.0
    assert _probe(spark, m, 3.0, 3.0) == 5.0
    # coarse cells partially covered fragment to e0; total cells:
    # fine 4 + coarse clear 3 + fragments 0 (fine covers (0,0,1) exactly)
    assert m.count() == 7
