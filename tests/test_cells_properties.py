"""Property-based cell-algebra checks (hypothesis over the numpy twins —
no Spark session, so these run in milliseconds and explore the coordinate
space far beyond the hand-written goldens in test_cells.py).

The Spark Column expressions and the numpy twins are equivalence-tested in
test_cells.py; these properties therefore transfer to the Column algebra.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from aardvark_geometry_quadtree_spark.functions import cells_np as C

coords = st.integers(min_value=-(2**40), max_value=2**40)
exps = st.integers(min_value=-20, max_value=20)
levels = st.integers(min_value=0, max_value=12)


@settings(max_examples=300, deadline=None)
@given(coords, levels)
def test_parent_of_children_is_identity(c, k):
    # every descendant k levels down maps back to c
    child_lo = C.bounds_min(c, k, 0)
    child_hi = C.bounds_max_excl(c, k, 0)
    probes = np.unique(np.clip(
        np.array([child_lo, child_lo + 1, (child_lo + child_hi) // 2, child_hi - 1]),
        child_lo, child_hi - 1))
    assert (C.parent_coord(probes, k) == c).all()


@settings(max_examples=300, deadline=None)
@given(coords, exps)
def test_position_roundtrip(c, e):
    # center position of a cell geocodes back to the cell (float64 limits:
    # keep |c * 2^e| within exact double range)
    if abs(c) * (2.0 ** e) > 2**52:
        return
    pos = (np.float64(c) + 0.5) * (2.0 ** e)
    assert C.cell_coord(pos, e)[()] == c


@settings(max_examples=300, deadline=None)
@given(coords, coords, levels)
def test_bounds_cover_exactly_the_descendants(cx, cy, k):
    lo, hi = int(C.bounds_min(cx, k, 0)), int(C.bounds_max_excl(cx, k, 0))
    assert hi - lo == 2**k
    # one-past-the-end is NOT a descendant
    assert C.parent_coord(np.array([hi]), k)[0] == cx + 1
    assert C.parent_coord(np.array([lo - 1]), k)[0] == cx - 1 or k == 0


@settings(max_examples=300, deadline=None)
@given(coords, coords)
def test_quadrant_matches_parent_child_relation(cx, cy):
    q = int(C.quadrant(cx, cy))
    px, py = int(C.parent_coord(cx)), int(C.parent_coord(cy))
    assert (px * 2 + (q & 1), py * 2 + (q >> 1)) == (cx, cy)
