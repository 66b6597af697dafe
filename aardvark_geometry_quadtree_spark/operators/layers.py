"""Layer/projection operators (reference P1-P5, SURVEY.md §2.2).

On the samples model a "layer" is a column, a "window" is a cell-index range
predicate, and semantic rename is a checked column rename — all pure
Catalyst. Point sampling with border policies is the one piece with real
logic (clamping and the coarser-parent fallback of Layer.GetSample,
Layer.fs:109-150).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KEY = ("cx", "cy", "e")


def with_window(
    samples: DataFrame, min_cx: int, min_cy: int, max_cx: int, max_cy: int, e: int | None = None
) -> DataFrame:
    """Restrict to a sub-window of cell indices (max-exclusive, the Box2l
    convention) — Layer.WithWindow / QNode.WithWindow (Layer.fs:77-79,
    Node.fs:85-91). Zero-copy: a Catalyst range filter, pushed to the scan.
    When ``e`` is given, window indices are interpreted at that exponent and
    coarser/finer samples are clipped by area overlap."""
    if e is None:
        return samples.filter(
            (F.col("cx") >= min_cx) & (F.col("cx") < max_cx)
            & (F.col("cy") >= min_cy) & (F.col("cy") < max_cy)
        )
    side = F.pow(F.lit(2.0), F.col("e"))
    lo_x, hi_x = F.col("cx") * side, (F.col("cx") + 1) * side
    lo_y, hi_y = F.col("cy") * side, (F.col("cy") + 1) * side
    s = 2.0 ** e
    return samples.filter(
        (hi_x > min_cx * s) & (lo_x < max_cx * s) & (hi_y > min_cy * s) & (lo_y < max_cy * s)
    )


def materialize(samples: DataFrame) -> DataFrame:
    """Layer.Materialize (Layer.fs:152-180): copy a windowed view into a
    tight buffer. On DataFrames the window *is* the data (no backing buffer),
    so this is a no-op passthrough — the reference's fast path
    (Layer.fs:153-154) — kept for API parity."""
    return samples


def contains_layer(samples: DataFrame, semantic: str) -> bool:
    """ContainsLayer (Node.fs:227-237)."""
    return semantic in samples.columns


def get_layer(samples: DataFrame, semantic: str) -> DataFrame:
    """GetLayer (Quadtree.fs:283-301): throws on missing semantic."""
    if not contains_layer(samples, semantic):
        raise KeyError(f"layer semantic not present: {semantic}")
    return samples.select(*KEY, semantic)


def try_get_layer(samples: DataFrame, semantic: str) -> DataFrame | None:
    """TryGetLayer (Node.fs:319-362): None on missing."""
    return get_layer(samples, semantic) if contains_layer(samples, semantic) else None


def update_layer_semantic(samples: DataFrame, old: str, new: str) -> DataFrame:
    """UpdateLayerSemantic (Node.fs:269-316, Quadtree.fs:303-308): rename a
    layer across the whole tree; error if target exists; error if source
    missing (the reference returns unchanged only for old==new)."""
    if old == new:
        return samples
    if new in samples.columns:
        raise ValueError(f"target semantic already exists: {new}")
    if old not in samples.columns:
        raise KeyError(f"source semantic not present: {old}")
    return samples.withColumnRenamed(old, new)


# ---------------------------------------------------------------------------
# P5: point sampling with border modes (Layer.fs:109-150, Sampling.fs:11-14)
# ---------------------------------------------------------------------------

def get_sample(
    samples: DataFrame,
    px: float,
    py: float,
    layer: str,
    border: str = "fail",
    border_value: float | None = None,
):
    """Value of the sample containing world position (px, py).

    Border modes (Sampling.fs:11-14):
      - ``fail``: raise if the position hits no sample;
      - ``clamp_to_border``: return ``border_value`` instead;
      - ``clamp_to_edge``: snap the position onto the nearest cell of the
        data's exact bounding box, then sample.
    Coarser-parent fallback is inherent: the containing sample is searched
    across all exponents, finest first (Layer.fs:114-116).
    """
    exps = [r[0] for r in samples.select("e").distinct().collect()]
    hit = None
    for e in sorted(exps):
        cx, cy = int(px // (2.0 ** e)), int(py // (2.0 ** e))
        rows = samples.filter(
            (F.col("e") == e) & (F.col("cx") == cx) & (F.col("cy") == cy)
        ).select(layer).take(1)
        if rows:
            hit = rows[0][0]
            break
    if hit is not None:
        return hit
    if border == "fail":
        raise LookupError(f"no sample at ({px}, {py})")
    if border == "clamp_to_border":
        return border_value
    if border == "clamp_to_edge":
        bb = samples.agg(
            F.min(C_minx()), F.min(C_miny()), F.max(C_maxx()), F.max(C_maxy())
        ).collect()[0]
        eps = 1e-9
        qx = min(max(px, bb[0]), bb[2] - eps)
        qy = min(max(py, bb[1]), bb[3] - eps)
        return get_sample(samples, qx, qy, layer, border="fail")
    raise ValueError(f"unknown border mode: {border}")


def C_minx() -> Column:
    return F.col("cx") * F.pow(F.lit(2.0), F.col("e"))


def C_miny() -> Column:
    return F.col("cy") * F.pow(F.lit(2.0), F.col("e"))


def C_maxx() -> Column:
    return (F.col("cx") + 1) * F.pow(F.lit(2.0), F.col("e"))


def C_maxy() -> Column:
    return (F.col("cy") + 1) * F.pow(F.lit(2.0), F.col("e"))
