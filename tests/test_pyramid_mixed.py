"""LoD-over-merged-tree goldens — the reference's commented level
expectations in StructureTests.fs (92.5 / 23.875 / 20.875 blocks): derived
levels average original and already-derived children alike."""

import pytest
from pyspark.sql import functions as F

from aardvark_geometry_quadtree_spark.operators.merge import Dominance, merge_samples
from aardvark_geometry_quadtree_spark.operators.pyramid import build_pyramid_mixed
from aardvark_geometry_quadtree_spark.sources.grids import grid_with_values


def _level(df, e):
    return {(r["cx"], r["cy"]): r["height"] for r in df.filter(F.col("e") == e).collect()}


def test_lod_over_merged_a_c(spark):
    # StructureTests ~:940-1008 commented levels: a(2x2@e1) ∘S c(2x2@e-1 at (2,0))
    a = grid_with_values(spark, 0, 0, 2, 2, [1.0, 2.0, 3.0, 4.0], e=1, patch_id=0)
    c = grid_with_values(spark, 2, 0, 2, 2, [91.0, 92.0, 93.0, 94.0], e=-1, patch_id=1)
    m = merge_samples(a, c, Dominance.SecondDominates)
    pyr = build_pyramid_mixed(m, layers=["height"]).cache()
    l0 = _level(pyr, 0)
    assert l0[(1, 0)] == pytest.approx(92.5)  # avg of c's 4 cells
    assert l0[(0, 0)] == 1.0 and l0[(0, 1)] == 1.0 and l0[(1, 1)] == 1.0
    l1 = _level(pyr, 1)
    assert l1[(0, 0)] == pytest.approx(23.875)  # avg(1, 92.5, 1, 1)
    assert l1[(1, 0)] == 2.0 and l1[(0, 1)] == 3.0 and l1[(1, 1)] == 4.0
    l2 = _level(pyr, 2)
    assert l2[(0, 0)] == pytest.approx((23.875 + 2.0 + 3.0 + 4.0) / 4)


def test_lod_over_sm_2020_12_07(spark):
    # sm-2020-12-07 commented Level 1 golden: ((1,0,1), 20.875)
    a = grid_with_values(spark, 0, 0, 2, 2, [1.0, 2.0, 3.0, 4.0], e=1, patch_id=0)
    b = grid_with_values(spark, 2, 0, 2, 2, [-1.0, -2.0, -3.0, -4.0], e=0, patch_id=1)
    c = grid_with_values(spark, 4, 0, 2, 2, [91.0, 92.0, 93.0, 94.0], e=-1, patch_id=2)
    m = merge_samples(merge_samples(a, b, Dominance.SecondDominates), c, Dominance.SecondDominates)
    pyr = build_pyramid_mixed(m, layers=["height"]).cache()
    l0 = _level(pyr, 0)
    assert l0[(2, 0)] == pytest.approx(92.5)
    l1 = _level(pyr, 1)
    assert l1[(1, 0)] == pytest.approx(20.875)  # avg(92.5, -2, -3, -4)
    assert l1[(0, 0)] == 1.0
