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
