"""Numpy twins of the Column cell algebra (for pandas-UDF kernels and tests).

Same conventions as :mod:`.cells` (reference Prelude.fs:23-133,
DataMapping.fs:122-130): half-open cells, arithmetic-shift parents.
"""

from __future__ import annotations

import numpy as np


def cell_coord(p, e):
    """floor(p / 2^e) as int64 (vectorized)."""
    return np.floor(np.asarray(p, dtype=np.float64) * (2.0 ** -e)).astype(np.int64)


def parent_coord(c, levels=1):
    return np.right_shift(np.asarray(c, dtype=np.int64), levels)


def quadrant(cx, cy):
    return (np.asarray(cx) & 1) | ((np.asarray(cy) & 1) << 1)


def bounds_min(c, e, target_e):
    return np.asarray(c, dtype=np.int64) << (e - target_e)


def bounds_max_excl(c, e, target_e):
    return (np.asarray(c, dtype=np.int64) + 1) << (e - target_e)


def sample_pos(c, e, rel=0.5):
    return (np.asarray(c, dtype=np.float64) + rel) * (2.0 ** e)


def is_ancestor_or_equal(acx, acy, ae, dcx, dcy, de):
    """Vectorized: cell A contains-or-equals cell D."""
    acx, acy = np.asarray(acx, np.int64), np.asarray(acy, np.int64)
    dcx, dcy = np.asarray(dcx, np.int64), np.asarray(dcy, np.int64)
    k = np.asarray(ae, np.int64) - np.asarray(de, np.int64)
    ok = k >= 0
    kk = np.where(ok, k, 0)
    return ok & (np.right_shift(dcx, kk) == acx) & (np.right_shift(dcy, kk) == acy)
