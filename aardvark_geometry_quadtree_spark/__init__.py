"""aardvark_geometry_quadtree_spark — a PySpark-native tiling + spatial-join engine.

A from-scratch re-expression of the query/data-processing semantics of
``aardvark-platform/aardvark.geometry.quadtree`` (an F# persistent-quadtree
raster library) as partition-parallel cell tiling over Spark DataFrames:

- the quadtree *is* a DataFrame of sample cells ``(cx, cy, e, <layers...>)``
  plus a packed tiles view; inner/LoD levels are rows at coarser exponents,
- queries are two-phase spatial joins (coarse Catalyst range predicates,
  fine vectorized kernels),
- merges are dominance-aware union+refine jobs resolved eagerly at build
  time instead of lazily at query time (semantics-preserving inversion of
  the reference's ``InMemoryMerge``; see SURVEY.md §2.4/J11).

No code is ported from the reference; file:line citations in docstrings
point at the *behavior* each element reproduces.
"""

__version__ = "0.1.0"
