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


def html_debug_view(
    samples,
    layers: list[str] | None = None,
    title: str = "quadtree",
    max_cells: int = 10_000,
    path: str | None = None,
) -> str:
    """D2: HTML debug view (PrettyPrint.fs:132-216 parity) — per-exponent
    grids of sample cells, level-colored, coarsest level first.

    Driver-side BY DESIGN (like the reference, which renders to a temp HTML
    file): guarded by ``max_cells`` so it cannot be pointed at a production
    table by accident. Returns the HTML string; writes it to ``path`` if
    given.
    """
    from pyspark.sql import functions as F

    layers = layers or [c for c in samples.columns if c not in ("cx", "cy", "e", "patch_id")]
    rows = samples.select("cx", "cy", "e", *layers).limit(max_cells + 1).collect()
    if len(rows) > max_cells:
        raise ValueError(f"html_debug_view is a debug tool; got >{max_cells} cells")

    def color(e: int) -> str:
        palette = ["#ffffff", "#e8f0fe", "#d2e3fc", "#aecbfa", "#8ab4f8", "#669df6"]
        return palette[abs(e) % len(palette)]

    by_e: dict[int, list] = {}
    for r in rows:
        by_e.setdefault(r["e"], []).append(r)
    parts = [f"<html><body><h1>{title}</h1>"]
    for e in sorted(by_e, reverse=True):  # coarsest level first
        grp = by_e[e]
        xs = [r["cx"] for r in grp]
        ys = [r["cy"] for r in grp]
        x0, x1, y0, y1 = min(xs), max(xs), min(ys), max(ys)
        # the guard above bounds ROWS; the rendered grid is the bbox extent,
        # so two far-apart samples could still drive a huge table — bound it
        extent = (x1 - x0 + 1) * (y1 - y0 + 1)
        if extent > max_cells * 100:
            raise ValueError(
                f"html_debug_view grid extent {extent} cells at e={e} exceeds "
                f"{max_cells * 100}; this is a debug tool for compact windows"
            )
        cell = {(r["cx"], r["cy"]): r for r in grp}
        parts.append(f"<h2>level e={e} ({len(grp)} samples)</h2>")
        parts.append('<table border="1" style="border-collapse:collapse">')
        for y in range(y1, y0 - 1, -1):  # world y grows upward
            tds = []
            for x in range(x0, x1 + 1):
                r = cell.get((x, y))
                if r is None:
                    tds.append("<td></td>")
                else:
                    vals = "<br/>".join(f"{n}={r[n]}" for n in layers)
                    tds.append(
                        f'<td style="background:{color(e)}">({x}, {y}, {e})<br/>{vals}</td>'
                    )
            parts.append("<tr>" + "".join(tds) + "</tr>")
        parts.append("</table>")
    parts.append("</body></html>")
    html = "\n".join(parts)
    if path:
        with open(path, "w") as f:
            f.write(html)
    return html
