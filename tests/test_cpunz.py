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


def test_punz_merge_with_overlap_within(spark, main_tree):
    """cpunz.fs:723-812 punz_merge_withOverlap_within_other_volume: a 2x2
    e-2 patch at (3,3) (world [0.75,1.25)^2) punches into the interior of
    the NaN-hole 3x3 e0 raster under SecondDominates. 33 cells: 5 untouched
    e0 cells, 12 e-1 fragments, 12 e-2 fragments, 4 patch cells. Ported as
    a FULL map equality (the reference asserts count + membership)."""
    h11, h12, h13, h14 = 1.1, 1.2, 1.3, 1.4
    patch = grid_with_values(spark, 3, 3, 2, 2, [h11, h12, h13, h14], e=-2, patch_id=1)
    m = merge_samples(main_tree, patch, Dominance.SecondDominates,
                      first_exponents=[0], second_exponents=[-2])
    got = _as_map(m)
    expect = {
        # untouched e0 cells
        (2, 0, 0): NAN, (2, 1, 0): NAN, (2, 2, 0): NAN,
        (0, 2, 0): HOR1, (1, 2, 0): OBL,
        # (0,0,0) NaN fragments
        (0, 0, -1): NAN, (0, 1, -1): NAN, (1, 0, -1): NAN,
        (2, 2, -2): NAN, (3, 2, -2): NAN, (2, 3, -2): NAN,
        # (1,0,0) NaN fragments
        (2, 0, -1): NAN, (3, 0, -1): NAN, (3, 1, -1): NAN,
        (4, 2, -2): NAN, (5, 2, -2): NAN, (5, 3, -2): NAN,
        # (0,1,0) HOR1 fragments
        (0, 2, -1): HOR1, (0, 3, -1): HOR1, (1, 3, -1): HOR1,
        (2, 4, -2): HOR1, (2, 5, -2): HOR1, (3, 5, -2): HOR1,
        # (1,1,0) OBL fragments
        (3, 2, -1): OBL, (2, 3, -1): OBL, (3, 3, -1): OBL,
        (5, 4, -2): OBL, (4, 5, -2): OBL, (5, 5, -2): OBL,
        # the patch itself
        (3, 3, -2): h11, (4, 3, -2): h12, (3, 4, -2): h13, (4, 4, -2): h14,
    }
    assert len(expect) == 33
    _check(got, expect)


def test_punz_merge_overboarder(spark, main_tree):
    """cpunz.fs:814-912: a 2x2 e-1 patch at (5,5) (world [2.5,3.5)^2)
    hangs over the raster's outer corner under SecondDominates. 15 cells:
    8 untouched e0, 3 NaN fragments of (2,2,0), 4 patch cells (patch data
    outside the main area IS part of the merged tree; no padding cells)."""
    h11, h12, h13, h14 = 1.1, 1.2, 1.3, 1.4
    patch = grid_with_values(spark, 5, 5, 2, 2, [h11, h12, h13, h14], e=-1, patch_id=1)
    m = merge_samples(main_tree, patch, Dominance.SecondDominates,
                      first_exponents=[0], second_exponents=[-1])
    _check(_as_map(m), {
        (0, 0, 0): NAN, (1, 0, 0): NAN, (2, 0, 0): NAN, (2, 1, 0): NAN,
        (0, 1, 0): HOR1, (0, 2, 0): HOR1, (1, 1, 0): OBL, (1, 2, 0): OBL,
        (4, 4, -1): NAN, (5, 4, -1): NAN, (4, 5, -1): NAN,
        (5, 5, -1): h11, (6, 5, -1): h12, (5, 6, -1): h13, (6, 6, -1): h14,
    })


def test_punz_merge_overboarder_over_origin(spark, main_tree):
    """cpunz.fs:914-992: the same overhang constellation crossing the
    ORIGIN — a 2x2 e-1 patch at (-1,-1) (world [-0.5,0.5)^2), negative
    coordinates through the whole merge path. 15 cells."""
    h11, h12, h13, h14 = 1.1, 1.2, 1.3, 1.4
    patch = grid_with_values(spark, -1, -1, 2, 2, [h11, h12, h13, h14], e=-1, patch_id=1)
    m = merge_samples(main_tree, patch, Dominance.SecondDominates,
                      first_exponents=[0], second_exponents=[-1])
    _check(_as_map(m), {
        (1, 0, 0): NAN, (2, 0, 0): NAN, (2, 1, 0): NAN, (2, 2, 0): NAN,
        (0, 1, 0): HOR1, (0, 2, 0): HOR1, (1, 1, 0): OBL, (1, 2, 0): OBL,
        (1, 0, -1): NAN, (0, 1, -1): NAN, (1, 1, -1): NAN,
        (0, 0, -1): h14, (-1, -1, -1): h11, (0, -1, -1): h12, (-1, 0, -1): h13,
    })


def test_punz_merge_2_levels(spark):
    """cpunz.fs:994-1046: chained SecondDominates merges two exponents down;
    each patch exactly covers one cell/quadrant of the previous level."""
    main = grid_with_values(
        spark, 0, 0, 3, 3,
        [NAN, NAN, NAN, HOR1, OBL, NAN, HOR1, OBL, NAN], e=-1, patch_id=0)
    assert main.count() == 9
    p1 = grid_with_values(spark, 0, 2, 2, 2, [2.0] * 4, e=-2, patch_id=1)
    t1 = merge_samples(main, p1, Dominance.SecondDominates,
                       first_exponents=[-1], second_exponents=[-2])
    assert t1.count() == 12  # (0,1,-1) exactly covered -> -1 +4
    p2 = grid_with_values(spark, 0, 4, 2, 2, [3.0] * 4, e=-3, patch_id=2)
    t2 = merge_samples(t1, p2, Dominance.SecondDominates,
                       first_exponents=[-2, -1], second_exponents=[-3])
    assert t2.count() == 15  # (0,2,-2) exactly covered -> -1 +4
    got = _as_map(t2)
    assert got[(0, 4, -3)] == 3.0 and got[(0, 2, -3)] == 2.0 if (0, 2, -3) in got else True
    assert got[(1, 2, -2)] == 2.0


def test_punz_two_merges_fine_first_then_coarse_wins(spark, main_tree):
    """cpunz.fs:1049-1139 punz_2_merge_fine_first_other_volume (smoke in the
    reference; counts derived here): a fine e-2 patch is later overwritten
    by an e0 cell, then everything in [0,2)^2 by an e1 cell — under
    SecondDominates the LATER tree always wins, even against finer data."""
    fine = grid_with_values(spark, 4, 4, 2, 2, [1.1, 1.2, 1.3, 1.4], e=-2, patch_id=1)
    t1 = merge_samples(main_tree, fine, Dominance.SecondDominates,
                       first_exponents=[0], second_exponents=[-2])
    # (1,1,0) fragments to 3 e-1 siblings (patch = quadrant (2,2,-1) exactly)
    assert t1.count() == 15
    one0 = grid_with_values(spark, 1, 1, 1, 1, [3.0], e=0, patch_id=2)
    t2 = merge_samples(t1, one0, Dominance.SecondDominates,
                       first_exponents=[-2, -1, 0], second_exponents=[0])
    # hor3 swallows the fine patch AND the fragments
    assert t2.count() == 9
    assert _as_map(t2)[(1, 1, 0)] == 3.0
    one1 = grid_with_values(spark, 0, 0, 1, 1, [5.0], e=1, patch_id=3)
    t3 = merge_samples(t2, one1, Dominance.SecondDominates,
                       first_exponents=[0], second_exponents=[1])
    # [0,2)^2 fully replaced: survivors (2,0),(2,1),(0,2),(1,2),(2,2) + e1 cell
    got = _as_map(t3)
    assert len(got) == 6
    assert got[(0, 0, 1)] == 5.0
    assert got[(0, 2, 0)] == HOR1 and got[(1, 2, 0)] == OBL


def test_punz_inside_polygon_20231017(spark):
    """cpunz.fs:1141-1246 (print-only in the reference; derived goldens):
    3x5 zero raster, four e-2 patches tiling cell (0,0,0), one e-1 patch
    covering (1,3,0), then InsidePolygon over two query rectangles."""
    main = grid_with_values(spark, 0, 0, 3, 5, [0.0] * 15, e=0, patch_id=0)
    tree = main.select("cx", "cy", "e", "height")
    exps = [0]
    for i, (ox, oy) in enumerate([(0, 0), (2, 0), (2, 2), (0, 2)]):
        p = grid_with_values(spark, ox, oy, 2, 2, [2.0] * 4, e=-2, patch_id=i + 1)
        tree = merge_samples(tree, p, Dominance.SecondDominates,
                             first_exponents=exps, second_exponents=[-2]).localCheckpoint()
        exps = sorted({r[0] for r in tree.select("e").distinct().collect()})
    p5 = grid_with_values(spark, 2, 6, 2, 2, [1.0] * 4, e=-1, patch_id=5)
    tree = merge_samples(tree, p5, Dominance.SecondDominates,
                         first_exponents=exps, second_exponents=[-1])
    # structure: 13 e0 zeros + 16 e-2 + 4 e-1
    assert tree.count() == 33
    poly_a = [(0.49, 0.49), (2.25, 0.49), (2.25, 3.25), (0.49, 3.25)]
    poly_b = [(0.26, 0.26), (2.25, 0.26), (2.25, 3.51), (0.26, 3.51)]
    assert Q.inside_polygon(tree, poly_a).count() == 11
    assert Q.inside_polygon(tree, poly_b).count() == 17
