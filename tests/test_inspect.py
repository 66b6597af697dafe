"""Inspection operators (D1/W3/M5)."""

from aardvark_geometry_quadtree_spark.operators.inspect import (
    enumerate_nodes,
    link,
    print_structure,
)


def test_link(spark, q10x7):
    link(q10x7, "linked_tree")
    assert spark.sql("SELECT count(*) FROM linked_tree").collect()[0][0] == 70


def test_enumerate_nodes(q10x7):
    dfs = enumerate_nodes(q10x7, split=2, order="dfs").collect()
    bfs = enumerate_nodes(q10x7, split=2, order="bfs").collect()
    assert len(dfs) == len(bfs) == 6
    assert {(r["tile_cx"], r["tile_cy"]) for r in dfs} == {
        (0, 0), (1, 0), (2, 0), (0, 1), (1, 1), (2, 1)
    }


def test_print_structure(q10x7):
    out = print_structure(q10x7, split=2)
    assert out.count("tile (") == 6
    assert "samples=16" in out


def test_html_debug_view(spark, tmp_path):
    """D2 parity (PrettyPrint.fs:132-216): per-level HTML grids."""
    from aardvark_geometry_quadtree_spark.operators.inspect import html_debug_view

    df = spark.createDataFrame(
        [(0, 0, 0, 1.5), (1, 0, 0, 2.5), (0, 0, 1, 9.0)],
        "cx long, cy long, e int, height double",
    )
    out = str(tmp_path / "dbg.html")
    html = html_debug_view(df, title="probe", path=out)
    assert "<h1>probe</h1>" in html
    assert "level e=1" in html and "level e=0" in html
    assert "(1, 0, 0)<br/>height=2.5" in html
    assert open(out).read() == html
    import pytest as _pytest

    big = spark.range(20).selectExpr("id as cx", "0 as cy", "0 as e", "1.0 as height")
    with _pytest.raises(ValueError):
        html_debug_view(big, max_cells=10)


def test_html_debug_view_bounds_grid_extent(spark):
    import pytest
    from aardvark_geometry_quadtree_spark.operators.inspect import html_debug_view

    # two samples, astronomically far apart: row guard passes, extent guard
    # must refuse to render a ~10^12-cell table
    df = spark.createDataFrame(
        [(0, 0, 0, 1.0), (1_000_000, 1_000_000, 0, 2.0)], "cx long, cy long, e int, height double"
    )
    with pytest.raises(ValueError, match="extent"):
        html_debug_view(df)
