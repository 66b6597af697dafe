"""Real-world regression goldens ported from Tests/cpunz.fs (customer bug
cases 2020-2024): NaN-hole rasters merged with finer patches, and the README
4x3 worked example. Values use the scalar first component of the reference's
VolumesBilinear4f payloads (the merge semantics are value-type-agnostic)."""

import math

import pytest
from pyspark.sql import functions as F

from aardvark_geometry_quadtree_spark.operators import query as Q
from aardvark_geometry_quadtree_spark.operators.merge import Dominance, merge_samples
from aardvark_geometry_quadtree_spark.sources.grids import grid_with_values

NAN = float("nan")
HOR1, OBL, HOR3 = 1.0, 1.5, 3.0


def _as_map(df):
    return {(r["cx"], r["cy"], r["e"]): r["height"] for r in df.collect()}


def _check(got, expect):
    assert got.keys() == expect.keys(), (sorted(got), sorted(expect))
    for k, v in expect.items():
        if isinstance(v, float) and math.isnan(v):
            # the engine's canonical undefined encoding is SQL NULL
            # (registry convention; reference encodes the same holes as NaN)
            assert got[k] is None or math.isnan(got[k]), k
        else:
            assert got[k] == pytest.approx(v), k


@pytest.fixture(scope="module")
def main_tree(spark):
    # createQuadTreePlanesWithNaN (cpunz.fs:488-505): 3x3 at e0 with NaN holes
    return grid_with_values(
        spark, 0, 0, 3, 3,
        [NAN, NAN, NAN, HOR1, OBL, NAN, HOR1, OBL, NAN],
        e=0, patch_id=0,
    )


def test_punz_double_merge_volume(spark, main_tree):
    # cpunz.fs:511-614: merge one finer cell, then a 2x2 even-finer patch
    sub = grid_with_values(spark, 4, 4, 1, 1, [HOR3], e=-1, patch_id=1)
    m1 = merge_samples(main_tree, sub, Dominance.SecondDominates)
    expect1 = {
        (0, 0, 0): NAN, (1, 0, 0): NAN, (2, 0, 0): NAN, (2, 1, 0): NAN,
        (0, 1, 0): HOR1, (0, 2, 0): HOR1, (1, 1, 0): OBL, (1, 2, 0): OBL,
        (4, 4, -1): HOR3,                                  # dominating cell
        (5, 4, -1): NAN, (4, 5, -1): NAN, (5, 5, -1): NAN,  # fragments of (2,2,0)
    }
    got1 = _as_map(m1)
    assert len(got1) == 12
    _check(got1, expect1)

    # second merge: 2x2 at e=-2 replacing a sub-quadrant of (0,1,0)
    sub4 = grid_with_values(spark, 2, 4, 2, 2, [1.1, 1.2, 1.3, 1.4], e=-2, patch_id=2)
    m2 = merge_samples(m1, sub4, Dominance.SecondDominates)
    expect2 = dict(expect1)
    del expect2[(0, 1, 0)]  # fragmented
    expect2.update({
        (0, 2, -1): HOR1, (0, 3, -1): HOR1, (1, 3, -1): HOR1,  # fragments
        (2, 4, -2): 1.1, (3, 4, -2): 1.2, (2, 5, -2): 1.3, (3, 5, -2): 1.4,
    })
    got2 = _as_map(m2)
    assert len(got2) == 18
    _check(got2, expect2)


def test_punz_merge_very_small_into_coarse(spark, main_tree):
    # cpunz.fs:645-745: a single e=-2 cell (2 exponents finer) replaces a
    # sub-sub-quadrant -> 15 cells incl. two levels of fragments
    sub = grid_with_values(spark, 4, 4, 1, 1, [HOR3], e=-2, patch_id=1)
    m = merge_samples(main_tree, sub, Dominance.SecondDominates)
    got = _as_map(m)
    expect = {
        (0, 0, 0): NAN, (1, 0, 0): NAN, (2, 0, 0): NAN, (2, 1, 0): NAN, (2, 2, 0): NAN,
        (0, 1, 0): HOR1, (0, 2, 0): HOR1, (1, 2, 0): OBL,
        # fragments of (1,1,0) at e-1 (sibling quadrants of the hit)
        (3, 2, -1): OBL, (2, 3, -1): OBL, (3, 3, -1): OBL,
        # fragments of (2,2,-1) at e-2 around the dominating cell
        (5, 4, -2): OBL, (4, 5, -2): OBL, (5, 5, -2): OBL,
        (4, 4, -2): HOR3,
    }
    assert len(got) == 15
    _check(got, expect)


def test_readme_4x3_near_line(spark):
    # README.md:16-61: 4x3 heights at origin (500000, 2000, 0); samples
    # within 0.5 of the diagonal line -> values [1, 1.6, 2]
    heights = [1.0, 1.0, 2.0, 2.0, 1.5, 1.6, 1.7, 1.8, 1.6, 1.7, 2.0, 2.2]
    g = grid_with_values(spark, 500000, 2000, 4, 3, heights, e=0)
    s = math.sqrt(0.5)
    r = Q.near_line(g, 500000.0, 2000.0, s, s, 0.5)
    rows = sorted(r.collect(), key=lambda x: (x["cx"], x["cy"]))
    assert [x["height"] for x in rows] == pytest.approx([1.0, 1.6, 2.0])
    assert [(x["cx"] - 500000, x["cy"] - 2000) for x in rows] == [(0, 0), (1, 1), (2, 2)]


def test_query_on_merged_nan_tree(spark, main_tree):
    # queries over merged sets must carry NaN holes through untouched
    sub = grid_with_values(spark, 4, 4, 1, 1, [HOR3], e=-1, patch_id=1)
    m = merge_samples(main_tree, sub, Dominance.SecondDominates)
    inside = Q.inside_box(m, 0.0, 0.0, 3.0, 3.0)
    assert inside.count() == 12
    n_undef = inside.filter(F.col("height").isNull() | F.isnan("height")).count()
    assert n_undef == 7
