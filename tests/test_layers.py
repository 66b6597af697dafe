"""Layer operator units (P1-P5) — behaviors from Layer.fs / Node.fs and
Tests/QuadtreeTests.fs:275-389 (UpdateLayerSemantic)."""

import pytest

from aardvark_geometry_quadtree_spark.operators import layers as L
from aardvark_geometry_quadtree_spark.sources.grids import grid, grid_with_values


def test_with_window(q10x7):
    w = L.with_window(q10x7, 2, 1, 5, 4)
    assert w.count() == 9  # 3x3 block
    # empty intersection -> empty frame (WithWindow returns None upstream)
    assert L.with_window(q10x7, 100, 100, 110, 110).count() == 0


def test_with_window_cross_exponent(spark):
    g = grid_with_values(spark, 0, 0, 1, 1, [5.0], e=2)  # covers [0,4)^2
    # window [1,2)x[1,2) at e=0 overlaps the coarse cell's area
    assert L.with_window(g, 1, 1, 2, 2, e=0).count() == 1
    assert L.with_window(g, 5, 5, 6, 6, e=0).count() == 0


def test_materialize_noop(q10x7):
    assert L.materialize(q10x7).count() == 70


def test_layer_lookup_and_rename(q10x7):
    assert L.contains_layer(q10x7, "height")
    assert not L.contains_layer(q10x7, "colors")
    assert L.get_layer(q10x7, "height").columns == ["cx", "cy", "e", "height"]
    with pytest.raises(KeyError):
        L.get_layer(q10x7, "nope")
    assert L.try_get_layer(q10x7, "nope") is None
    renamed = L.update_layer_semantic(q10x7, "height", "heights1f")
    assert "heights1f" in renamed.columns and "height" not in renamed.columns
    # no-op for identical ids (QuadtreeTests.fs:275-389 semantics)
    assert L.update_layer_semantic(q10x7, "height", "height") is q10x7
    with pytest.raises(ValueError):
        L.update_layer_semantic(q10x7, "height", "patch_id")
    with pytest.raises(KeyError):
        L.update_layer_semantic(q10x7, "gone", "x")


def test_get_sample_border_modes(spark, q10x7):
    # inside: value = x + y/100 at the containing cell
    assert L.get_sample(q10x7, 2.5, 1.5, "height") == pytest.approx(2.01, abs=1e-6)
    with pytest.raises(LookupError):
        L.get_sample(q10x7, -5.0, 0.5, "height")
    assert L.get_sample(q10x7, -5.0, 0.5, "height", "clamp_to_border", -1.0) == -1.0
    # clamp_to_edge snaps onto the nearest edge cell (0, 0)
    v = L.get_sample(q10x7, -5.0, 0.5, "height", "clamp_to_edge")
    assert v == pytest.approx(0.0, abs=1e-6)
    v2 = L.get_sample(q10x7, 100.0, 100.0, "height", "clamp_to_edge")
    assert v2 == pytest.approx(9.06, abs=1e-6)  # cell (9,6)


def test_get_sample_coarser_parent_fallback(spark):
    fine = grid(spark, 0, 0, 2, 2, e=0, pattern="const", value=1.0)
    coarse = grid_with_values(spark, 1, 1, 1, 1, [9.0], e=1)  # covers [2,4)^2
    both = fine.unionByName(coarse)
    assert L.get_sample(both, 0.5, 0.5, "height") == 1.0
    # position only covered by the coarser sample -> parent fallback
    assert L.get_sample(both, 3.5, 3.5, "height") == 9.0
