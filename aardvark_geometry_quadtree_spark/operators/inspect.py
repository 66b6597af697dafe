"""Inspection/debug operators (reference D1/W3/M5).

Cheap utilities over the samples/tiles model: structure pretty-print,
node enumeration orders, and tree linking (aliasing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .build import DEFAULT_SPLIT, with_tile_key


def link(samples: DataFrame, name: str) -> DataFrame:
    """Quadtree.Link (Quadtree.fs:268-269): expose a tree under a chosen id.
    A snapshot alias: registers a temp view and returns the frame."""
    samples.createOrReplaceTempView(name)
    return samples


def enumerate_nodes(samples: DataFrame, split: int = DEFAULT_SPLIT, order: str = "dfs") -> DataFrame:
    """Leaf-node enumeration in DFS (coarse-first within a branch is
    meaningless for leaves; key order stands in) or BFS (by exponent) order —
    EnumerateNodes / EnumerateNodesBreadthFirst (Quadtree.fs:35-102)."""
    tiles = with_tile_key(samples, split).select("tile_cx", "tile_cy", "tile_e").distinct()
    if order == "bfs":
        return tiles.orderBy(F.col("tile_e").desc(), "tile_cx", "tile_cy")
    if order == "dfs":
        return tiles.orderBy("tile_cx", "tile_cy", F.col("tile_e").desc())
    raise ValueError(f"unknown order: {order}")


def print_structure(samples: DataFrame, split: int = DEFAULT_SPLIT, max_rows: int = 50) -> str:
    """Quadtree.PrintStructure (Quadtree.fs:162-188): textual tile report."""
    from .build import build_tiles

    t = build_tiles(samples, split=split)
    rows = t.orderBy(F.col("tile_e").desc(), "tile_cx", "tile_cy").take(max_rows)
    lines = [
        f"tile ({r['tile_cx']}, {r['tile_cy']}, e={r['tile_e']}) "
        f"samples={r['n_samples']} ebb=[{r['ebb_min_cx']},{r['ebb_min_cy']})-"
        f"[{r['ebb_max_cx']},{r['ebb_max_cy']})"
        for r in rows
    ]
    out = "\n".join(lines)
    print(out)
    return out
