"""Per-semantic LoD resampler goldens (Sampling.fs:16-135; build-per-type
coverage mirroring Tests/QuadtreeTests.fs:87-225).

Every registered semantic is exercised through downsample_once; the value
goldens are hand-computed from the reference resamplers:
  - ints: (a+b+c+d)/4 with TRUNCATING division (resampleInt32/64)
  - floats: (a+b+c+d)*0.25
  - byte colors: per-channel truncating integer mean, C4b includes alpha
    (resampleC3b/C4b, Sampling.fs:50-61)
  - float colors: per-channel 0.25 mean, C4f includes alpha
  - normals: mean then re-normalize (resampleV3fNorm)
  - bilinear/vector payloads: element-wise 0.25 mean (resampleV4*)
"""

import math

import pytest

from aardvark_geometry_quadtree_spark.operators.pyramid import downsample_once
from aardvark_geometry_quadtree_spark.registry import SEMANTICS


def _quad(spark, typ, values):
    """2x2 block of cells (children of cell (0,0,1)) with the given values."""
    rows = [(x, y, 0, v) for (x, y), v in zip([(0, 0), (1, 0), (0, 1), (1, 1)], values)]
    return spark.createDataFrame(rows, f"cx long, cy long, e int, {{}} {typ}".format("v"))


def _down(spark, sem_name, typ, values):
    df = _quad(spark, typ, values).withColumnRenamed("v", sem_name)
    out = downsample_once(df, [sem_name]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["cx"], r["cy"], r["e"]) == (0, 0, 1)
    return r[sem_name]


def test_intensities_int_truncating(spark):
    assert _down(spark, "Intensities1i", "int", [1, 2, 3, 5]) == 2  # 11/4 -> 2
    # negative sums truncate toward zero (F# '/'), not floor
    assert _down(spark, "Intensities1i", "int", [-1, -1, -1, -2]) == -1  # -5/4 -> -1
    assert _down(spark, "Intensities1l", "long", [10, 10, 10, 13]) == 10  # 43/4 -> 10


def test_heights_float_mean(spark):
    assert _down(spark, "Heights1d", "double", [1.0, 2.0, 3.0, 5.0]) == pytest.approx(2.75)
    assert _down(spark, "Heights1f", "float", [1.0, 2.0, 3.0, 5.0]) == pytest.approx(2.75)
    assert _down(spark, "HeightStdDevs1d", "double", [0.5, 0.5, 0.5, 0.5]) == pytest.approx(0.5)
    assert _down(spark, "Volumes1d", "double", [4.0, 4.0, 4.0, 0.0]) == pytest.approx(3.0)


def test_heights_nan_hole_ignored(spark):
    # NaN is the undefined marker (Layer.fs:587-600) -> normalized to NULL,
    # mean over the defined children only
    nan = float("nan")
    assert _down(spark, "Heights1d", "double", [1.0, 3.0, nan, nan]) == pytest.approx(2.0)


def test_normals_renormalize(spark):
    got = _down(
        spark,
        "Normals3d",
        "array<double>",
        [[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]],
    )
    # mean = (0.25, 0, 0.75); |mean| = sqrt(0.625)
    n = math.sqrt(0.625)
    assert got[0] == pytest.approx(0.25 / n)
    assert got[1] == pytest.approx(0.0)
    assert got[2] == pytest.approx(0.75 / n)
    assert math.hypot(*got) == pytest.approx(1.0)


def test_colors4b_truncating_with_alpha(spark):
    got = _down(
        spark,
        "Colors4b",
        "array<int>",
        [[255, 10, 0, 9], [0, 11, 1, 10], [0, 10, 2, 10], [0, 10, 2, 10]],
    )
    # sums (255, 41, 5, 39) / 4 truncating -> (63, 10, 1, 9): alpha averaged
    assert got == [63, 10, 1, 9]


def test_colors3b_truncating(spark):
    got = _down(
        spark,
        "Colors3b",
        "array<int>",
        [[255, 255, 255], [255, 255, 255], [255, 255, 255], [0, 1, 2]],
    )
    assert got == [191, 191, 191]  # 765/4=191.25 -> 191 truncating


def test_colors3f_three_channels(spark):
    got = _down(
        spark,
        "Colors3f",
        "array<double>",
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 1.0, 1.0]],
    )
    assert len(got) == 3  # regression: _avg_vec(4) used to NULL the array
    assert got == pytest.approx([0.5, 0.5, 0.5])


def test_colors4f_alpha_mean(spark):
    got = _down(
        spark,
        "Colors4f",
        "array<double>",
        [[1.0, 0.0, 0.0, 1.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0], [1.0, 1.0, 1.0, 1.0]],
    )
    assert got == pytest.approx([0.5, 0.5, 0.5, 0.5])


def test_bilinear_elementwise_mean(spark):
    got = _down(
        spark,
        "HeightsBilinear4d",
        "array<double>",
        [[1.0, 2.0, 3.0, 4.0], [1.0, 2.0, 3.0, 4.0], [3.0, 2.0, 1.0, 0.0], [3.0, 2.0, 1.0, 0.0]],
    )
    assert got == pytest.approx([2.0, 2.0, 2.0, 2.0])


_SAMPLE_VALUES = {
    "int": [1, 2, 3, 5],
    "long": [1, 2, 3, 5],
    "float": [1.0, 2.0, 3.0, 5.0],
    "double": [1.0, 2.0, 3.0, 5.0],
    "array<float>": [[1.0, 0.0, 0.5, 0.25]] * 4,
    "array<double>": [[1.0, 0.0, 0.5, 0.25]] * 4,
    "array<int>": [[10, 20, 30, 40]] * 4,
}


def test_every_registered_semantic_downsamples(spark):
    """Smoke coverage for ALL registry entries (the round-1 gap: only scalar
    'height' was exercised; two color entries were actually wrong)."""
    for name, sem in SEMANTICS.items():
        vals = _SAMPLE_VALUES[sem.spark_type]
        got = _down(spark, name, sem.spark_type, vals)
        assert got is not None, name
        if isinstance(got, list):
            assert all(v is not None for v in got), (name, got)


def test_bilinear_eval_contract(spark):
    """F4: s(x,y) = A + Bx + Cy + Dxy (README.md:113 contract) evaluated as
    a Column expression over bilinear-params layers."""
    from pyspark.sql import functions as F

    from aardvark_geometry_quadtree_spark.registry import bilinear_eval

    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0, 4.0, 0.5, 0.25)],
        "a double, b double, c double, d double, x double, y double",
    )
    got = df.select(
        bilinear_eval(F.col("a"), F.col("b"), F.col("c"), F.col("d"),
                      F.col("x"), F.col("y")).alias("s")
    ).collect()[0]["s"]
    assert got == pytest.approx(1.0 + 2.0 * 0.5 + 3.0 * 0.25 + 4.0 * 0.5 * 0.25)
