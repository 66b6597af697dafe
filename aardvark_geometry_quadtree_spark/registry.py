"""Layer-semantic registry.

The reference's extension point is a GUID registry: a ``Durable.Def`` per
layer semantic plus a builder (Layer.fs:259-289), a per-type downsample
function (Sampling.fs:76-123), and a per-type "undefined" value
(Layer.fs:587-600). Here the same registry is a dict mapping semantic name ->
(Spark type, undefined value, downsample/undefine expression builders).
Users extend the engine by registering a semantic — no engine change (F7).

All 22 reference semantics (Defs.fs:44-117) are representable; the common
ones are pre-registered below. Vector/color payloads use array<T> columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _avg(c: Column) -> Column:
    """Default downsample: mean of the defined child samples
    (ints/floats/volumes/stddevs: Sampling.fs:18-26)."""
    return F.avg(c)


def _avg_int(c: Column) -> Column:
    """Integer mean (a+b+c+d)/4 with TRUNCATING division (F# ``/`` on ints,
    Sampling.fs:18-20). double->long cast truncates toward zero in Spark,
    matching F# for negative sums where floor() would not."""
    return (F.sum(c) / F.count(c)).cast("long")


def _avg_vec(n: int) -> Callable[[Column], Column]:
    """Element-wise mean of an n-element array payload (resampleV2/V3/V4,
    Sampling.fs:26-48 non-Norm variants; bilinear params and float colors)."""

    def agg(c: Column) -> Column:
        return F.array(*[F.avg(F.element_at(c, i + 1)) for i in range(n)])

    return agg


def _avg_normal(c: Column) -> Column:
    """Normals: average then re-normalize (resampleV3fNorm/V3dNorm,
    Sampling.fs:35-39).

    Degenerate case — exactly cancelling children (zero sum): the
    reference's ``.Normalized`` yields a NaN vector, i.e. an unusable
    value. This engine's canonical undefined encoding is NULL, so the
    result is a LAYER HOLE instead (deliberate, documented deviation: the
    reference NaN-poisons coarser levels, we drop the cell and coarser
    levels average the remaining defined children). Under ANSI mode the
    raw 0/0 would error, so the guard is also required for execution."""
    ax, ay, az = (F.avg(F.element_at(c, i + 1)) for i in range(3))
    norm = F.sqrt(ax * ax + ay * ay + az * az)
    return F.when(norm != 0, F.array(ax / norm, ay / norm, az / norm))


def _avg_color(n: int) -> Callable[[Column], Column]:
    """Byte colors: per-channel integer mean with TRUNCATING division
    (resampleC3b/C4b, Sampling.fs:50-61). C4b averages the alpha channel
    too — n parameterizes the channel count."""

    def agg(c: Column) -> Column:
        return F.array(
            *[
                (F.sum(F.element_at(c, i + 1)) / F.count(F.element_at(c, i + 1))).cast("int")
                for i in range(n)
            ]
        )

    return agg


@dataclass
class Semantic:
    """One layer semantic: Spark column type, undefined value, downsample agg.

    ``undefined`` is the value that marks a hole *in the payload encoding*
    (NaN / INT_MIN / black, Layer.fs:587-600); the engine normalizes it to
    SQL NULL at ingest so winner rules and aggregates treat holes uniformly.
    """

    name: str
    spark_type: str
    undefined: object
    downsample: Callable[[Column], Column] = field(default=lambda c: _avg(c))

    def normalize(self, c: Column) -> Column:
        """Encode the reference's undefined value as NULL."""
        if self.undefined is None:
            return c
        if isinstance(self.undefined, float) and self.undefined != self.undefined:
            return F.when(F.isnan(c), F.lit(None)).otherwise(c)
        return F.when(c == F.lit(self.undefined), F.lit(None)).otherwise(c)


NAN = float("nan")
INT_MIN = -(2**31)
LONG_MIN = -(2**63)

SEMANTICS: dict[str, Semantic] = {}


def register(s: Semantic) -> Semantic:
    SEMANTICS[s.name] = s
    return s


# reference Defs.fs:44-117 families
register(Semantic("Heights1f", "float", NAN))
register(Semantic("Heights1d", "double", NAN))
register(Semantic("HeightStdDevs1f", "float", NAN))
register(Semantic("HeightStdDevs1d", "double", NAN))
register(Semantic("Intensities1i", "int", INT_MIN, _avg_int))
register(Semantic("Intensities1l", "long", LONG_MIN, _avg_int))
register(Semantic("Intensities1f", "float", NAN))
register(Semantic("Intensities1d", "double", NAN))
register(Semantic("Volumes1f", "float", NAN))
register(Semantic("Volumes1d", "double", NAN))
register(Semantic("Normals3f", "array<float>", None, _avg_normal))
register(Semantic("Normals3d", "array<double>", None, _avg_normal))
register(Semantic("HeightsBilinear4f", "array<float>", None, _avg_vec(4)))
register(Semantic("HeightsBilinear4d", "array<double>", None, _avg_vec(4)))
register(Semantic("BilinearParams4f", "array<float>", None, _avg_vec(4)))
register(Semantic("BilinearParams4d", "array<double>", None, _avg_vec(4)))
register(Semantic("VolumesBilinear4f", "array<float>", None, _avg_vec(4)))
register(Semantic("VolumesBilinear4d", "array<double>", None, _avg_vec(4)))
register(Semantic("Colors3b", "array<int>", None, _avg_color(3)))
register(Semantic("Colors4b", "array<int>", None, _avg_color(4)))
register(Semantic("Colors3f", "array<float>", None, _avg_vec(3)))
register(Semantic("Colors4f", "array<float>", None, _avg_vec(4)))
# default plain column used by tests/bench
register(Semantic("height", "double", NAN))


def bilinear_eval(a: Column, b: Column, c: Column, d: Column, x: Column, y: Column) -> Column:
    """s(x,y) = A + Bx + Cy + Dxy — the documented bilinear-params contract
    (reference README.md:113, Defs.fs:47,53)."""
    return a + b * x + c * y + d * x * y
