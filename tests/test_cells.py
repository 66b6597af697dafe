"""Cell algebra units — truth tables from the reference's Prelude.fs /
Tests/PreludeTests.fs behaviors."""

import numpy as np
from pyspark.sql import functions as F

from aardvark_geometry_quadtree_spark.functions import cells as C
from aardvark_geometry_quadtree_spark.functions import cells_np as N
from aardvark_geometry_quadtree_spark.operators.build import root_cell_of_bbox, grow_root


def test_cell_coord_np():
    # floor(p / 2^e), negatives included (DataMapping.fs:122-130)
    assert N.cell_coord([0.0, 0.5, 1.0, -0.5, -1.0, 3.99], 0).tolist() == [0, 0, 1, -1, -1, 3]
    assert N.cell_coord([0.0, 1.0, 2.0, -1.0, -2.0, -3.0], 1).tolist() == [0, 0, 1, -1, -1, -2]
    assert N.cell_coord([0.25, -0.25], -1).tolist() == [0, -1]


def test_parent_negative_np():
    # arithmetic shift = floor division for negatives (Prelude.fs:23-31)
    assert N.parent_coord([-1, -2, -3, 0, 1, 2, 3]).tolist() == [-1, -1, -2, 0, 0, 1, 1]


def test_ancestor_np():
    assert N.is_ancestor_or_equal(2, 1, 0, 4, 2, -1)  # (4,2,-1) child of (2,1,0)
    assert N.is_ancestor_or_equal(0, 0, 3, 7, 6, 0)
    assert not N.is_ancestor_or_equal(0, 0, 3, 8, 0, 0)
    assert not N.is_ancestor_or_equal(4, 2, -1, 2, 1, 0)  # finer can't contain coarser
    assert N.is_ancestor_or_equal(2, 1, 0, 2, 1, 0)  # equal counts
    # negative coords
    assert N.is_ancestor_or_equal(-1, -1, 1, -2, -1, 0)
    assert not N.is_ancestor_or_equal(0, 0, 1, -1, -1, 0)


def test_cell_columns_match_numpy(spark):
    df = spark.createDataFrame(
        [(x,) for x in [-8.0, -1.2, -0.5, 0.0, 0.7, 5.0, 123.4]], "p double"
    )
    for e in (-2, 0, 3):
        got = [r[0] for r in df.select(C.cell_coord(F.col("p"), e)).collect()]
        exp = N.cell_coord(np.array([-8.0, -1.2, -0.5, 0.0, 0.7, 5.0, 123.4]), e).tolist()
        assert got == exp


def test_shift_right_column_amount(spark):
    df = spark.createDataFrame([(-5, 1), (-5, 2), (7, 1), (7, 3)], "c long, k int")
    got = [r[0] for r in df.select(C.shift_right(F.col("c"), F.col("k"))).collect()]
    assert got == [-3, -2, 3, 0]


def test_bounds(spark):
    df = spark.range(1)
    r = df.select(
        C.bounds_min(F.lit(0), 3, 0).alias("mn"),
        C.bounds_max_excl(F.lit(0), 3, 0).alias("mx"),
    ).collect()[0]
    assert (r["mn"], r["mx"]) == (0, 8)


def test_root_cell():
    # Build1 grid: bbox [0,10)x[0,7) -> Cell2d(0,0,4) (Tests/QuadtreeTests.fs:40-50)
    rc = root_cell_of_bbox(0, 0, 10, 7)
    assert (rc.cx, rc.cy, rc.e, rc.centered) == (0, 0, 4, False)
    # straddles origin -> centered Cell2d(2) covers [-2,2)^2
    rc = root_cell_of_bbox(-2, -2, 2, 2)
    assert (rc.e, rc.centered) == (2, True)
    rc = root_cell_of_bbox(-1, -1, 1, 1)
    assert (rc.e, rc.centered) == (1, True)
    # growth (Quadtree.fs:249-255)
    rc = grow_root(root_cell_of_bbox(0, 0, 2, 2), 8)
    assert (rc.cx, rc.cy, rc.e) == (0, 0, 8)
