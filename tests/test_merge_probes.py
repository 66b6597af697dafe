"""Dominance probe goldens from Tests/MergeTests.fs:122-398: merged trees
sampled at probe positions via the point-lookup join (Sample.PositionTyped)."""

import pytest

from aardvark_geometry_quadtree_spark.operators.merge import Dominance, merge_samples
from aardvark_geometry_quadtree_spark.operators.query import sample_positions
from aardvark_geometry_quadtree_spark.sources.grids import grid


def _probe(spark, merged, px, py):
    pos = spark.createDataFrame([(0, float(px), float(py))], "pid int, px double, py double")
    rows = sample_positions(merged, pos).collect()
    assert len(rows) == 1
    return rows[0]["height"]


def test_overlapping_same_depth(spark):
    # MergeTests.fs:122-133: identical 1x1 -> 1 cell survives
    a = grid(spark, 0, 0, 1, 1, e=0, pattern="const", value=1.0)
    b = grid(spark, 0, 0, 1, 1, e=0, pattern="const", value=2.0, patch_id=1)
    m = merge_samples(a, b, Dominance.SecondDominates)
    assert m.count() == 1
    assert _probe(spark, m, 0.5, 0.5) == 2.0


def test_different_depth_first_more_detailed(spark):
    # MergeTests.fs:137-151: fine(4 cells)=10 FirstDominates coarse=20 -> 4 cells, probe=10
    a = grid(spark, 0, 0, 2, 2, e=-1, pattern="const", value=10.0)
    b = grid(spark, 0, 0, 1, 1, e=0, pattern="const", value=20.0, patch_id=1)
    m = merge_samples(a, b, Dominance.FirstDominates)
    assert m.count() == 4
    assert _probe(spark, m, 0.5, 0.5) == 10.0


def test_different_depth_second_more_detailed(spark):
    # MergeTests.fs:154-169
    a = grid(spark, 0, 0, 1, 1, e=0, pattern="const", value=10.0)
    b = grid(spark, 0, 0, 2, 2, e=-1, pattern="const", value=20.0, patch_id=1)
    m = merge_samples(b, a, Dominance.FirstDominates)
    assert m.count() == 4
    assert _probe(spark, m, 0.5, 0.5) == 20.0


def test_same_depth_first_dominates_partial_overlap(spark):
    # MergeTests.fs:172-230: 2x2 vs 1x1 at e=-1, both orders
    a = grid(spark, 0, 0, 2, 2, e=-1, pattern="const", value=10.0)
    b = grid(spark, 0, 0, 1, 1, e=-1, pattern="const", value=20.0, patch_id=1)
    m = merge_samples(a, b, Dominance.FirstDominates)
    assert _probe(spark, m, 0.25, 0.25) == 10.0
    assert m.count() == 4
    m2 = merge_samples(b, a, Dominance.FirstDominates)
    assert _probe(spark, m2, 0.25, 0.25) == 20.0
    assert m2.count() == 4  # b wins its cell; a's other 3 cells survive


def test_more_detailed_probe_all_positions(spark):
    # MoreDetailedOrFirst: the fine region reads fine values, elsewhere coarse
    coarse = grid(spark, 0, 0, 2, 2, e=1, pattern="const", value=5.0)  # [0,4)^2
    fine = grid(spark, 0, 0, 2, 2, e=0, pattern="const", value=7.0, patch_id=1)  # [0,2)^2
    m = merge_samples(coarse, fine, Dominance.MoreDetailedOrFirst)
    assert _probe(spark, m, 1.0, 1.0) == 7.0
    assert _probe(spark, m, 3.0, 3.0) == 5.0
    # coarse cells partially covered fragment to e0; total cells:
    # fine 4 + coarse clear 3 + fragments 0 (fine covers (0,0,1) exactly)
    assert m.count() == 7


# ---------------------------------------------------------------------------
# Centered / cross-origin constellations (MergeTests.fs:306-360): grids that
# straddle the origin — the reference models these with centered root cells;
# the samples model handles them as plain negative-coordinate rows.
# ---------------------------------------------------------------------------

def test_both_centered_different_depth_second_more_detailed(spark):
    # MergeTests.fs:307-315: a = 2x2 e0 from (-1,-1), b = 4x4 e-1 from (-2,-2)
    a = grid(spark, -1, -1, 2, 2, e=0, pattern="const", value=10.0)
    b = grid(spark, -2, -2, 4, 4, e=-1, pattern="const", value=20.0, patch_id=1)
    m = merge_samples(a, b, Dominance.MoreDetailedOrSecond)
    assert _probe(spark, m, 0.25, 0.25) == 20.0
    # b is strictly finer and fully covers a -> only b's 16 cells survive
    assert m.count() == 16


def test_both_centered_different_depth_first_more_detailed(spark):
    # MergeTests.fs:317-327: same constellation, operands flipped
    a = grid(spark, -1, -1, 2, 2, e=0, pattern="const", value=10.0)
    b = grid(spark, -2, -2, 4, 4, e=-1, pattern="const", value=20.0, patch_id=1)
    m = merge_samples(b, a, Dominance.MoreDetailedOrSecond)
    assert _probe(spark, m, 0.25, 0.25) == 20.0
    assert m.count() == 16


def test_both_centered_same_detail_all_dominances(spark):
    # MergeTests.fs:329-360: identical centered 2x2 grids under all dominances
    a = grid(spark, -1, -1, 2, 2, e=0, pattern="const", value=10.0)
    b = grid(spark, -1, -1, 2, 2, e=0, pattern="const", value=20.0, patch_id=1)
    m1 = merge_samples(a, b, Dominance.FirstDominates)
    assert _probe(spark, m1, 0.25, 0.25) == 10.0
    assert m1.count() == 4
    m2 = merge_samples(a, b, Dominance.SecondDominates)
    assert _probe(spark, m2, 0.25, 0.25) == 20.0
    assert m2.count() == 4
    # MoreDetailedOrSecond ties on exponent -> second wins (probe at origin
    # corner sample, MergeTests.fs:354-360)
    m3 = merge_samples(a, b, Dominance.MoreDetailedOrSecond)
    assert _probe(spark, m3, 0.0, 0.0) == 20.0
    m4 = merge_samples(a, b, Dominance.MoreDetailedOrFirst)
    assert _probe(spark, m4, 0.0, 0.0) == 10.0


def test_cross_origin_partial_overlap_fragments(spark):
    # cross-origin: coarse centered 2x2 at e1 ([-2,2)^2) vs fine 2x2 at e-1
    # anchored in one quadrant ([0,1)^2) -> the (0,0,e1) coarse cell fragments
    a = grid(spark, -1, -1, 2, 2, e=1, pattern="const", value=5.0)
    b = grid(spark, 0, 0, 2, 2, e=-1, pattern="const", value=7.0, patch_id=1)
    m = merge_samples(a, b, Dominance.MoreDetailedOrFirst)
    assert _probe(spark, m, 0.25, 0.25) == 7.0     # fine region
    assert _probe(spark, m, -1.0, -1.0) == 5.0     # untouched coarse quadrant
    assert _probe(spark, m, 1.5, 1.5) == 5.0       # fragment of (0,0,1)
    # coarse survivors 3 + fine 4 + fragments of (0,0,1): quadrants at e0
    # except [0,1)^2 (3 cells) + its sub-quadrants at e-1 except b's 4 (0)
    # (0,0,1) splits: e0 children {(0,0),(1,0),(0,1),(1,1)}; (0,0,0) is
    # exactly covered by b's 2x2 at e-1 -> drops; 3 e0 fragments survive
    assert m.count() == 3 + 4 + 3
    # non-overlap invariant: no surviving cell is an ancestor of another
    rows = [(r.cx, r.cy, r.e) for r in m.select("cx", "cy", "e").collect()]
    cells = set(rows)
    assert len(rows) == len(cells)
    for (cx, cy, e) in cells:
        for (dx, dy, de) in cells:
            if de < e and (dx >> (e - de), dy >> (e - de)) == (cx, cy):
                raise AssertionError(f"overlap: ({cx},{cy},{e}) contains ({dx},{dy},{de})")


def test_mask_hole_disables_winner_shortcut(spark):
    """Merge.winner parity (Merge.fs:80-88): the bbox-containment shortcut is
    DISABLED when a side has occupancy holes (HasMask) — a dominated sample
    under a hole must survive even though the dominating side's bounding box
    covers it. In the samples model holes are absent rows, so the per-sample
    covered-join gets this exactly; this probe pins it."""
    # first: 3x3 at e0 covering [0,3)^2 with the center cell (1,1) MISSING
    first = grid(spark, 0, 0, 3, 3, e=0, pattern="const", value=10.0).filter(
        "NOT (cx = 1 AND cy = 1)"
    )
    second = grid(spark, 0, 0, 3, 3, e=0, pattern="const", value=20.0, patch_id=1)
    m = merge_samples(first, second, Dominance.FirstDominates)
    # bbox(first) contains bbox(second), but the hole lets second's (1,1) through
    assert m.count() == 9
    assert _probe(spark, m, 1.5, 1.5) == 20.0
    assert _probe(spark, m, 0.5, 0.5) == 10.0


def test_mask_hole_fine_side(spark):
    """Same rule cross-resolution: a fine dominating patch with a missing
    cell leaves the coarse sample's fragment visible under the hole."""
    coarse = grid(spark, 0, 0, 1, 1, e=1, pattern="const", value=5.0)  # [0,2)^2
    fine = grid(spark, 0, 0, 2, 2, e=0, pattern="const", value=7.0, patch_id=1).filter(
        "NOT (cx = 0 AND cy = 0)"
    )
    m = merge_samples(coarse, fine, Dominance.MoreDetailedOrFirst)
    # fine 3 cells + the coarse fragment at the hole
    assert m.count() == 4
    assert _probe(spark, m, 0.5, 0.5) == 5.0
    assert _probe(spark, m, 1.5, 1.5) == 7.0


@pytest.mark.parametrize("dom", list(Dominance))
def test_random_chained_merges_keep_invariants(spark, dom):
    """Randomized chained merges (MergeTests.fs:534-605 smoke matrix, seeded):
    after each merge the samples set must stay non-overlapping (no cell is an
    ancestor of another) and every value must originate from an input patch."""
    import random as _random

    rng = _random.Random(hash(dom.value) & 0xFFFF)
    tree = grid(spark, 0, 0, 1, 1, e=0, pattern="const", value=1000.0)
    vals = {1000.0}
    exps = [0]
    for i in range(1, 5):
        e = rng.randrange(-3, 4)
        ox = rng.randrange(-8, 8)
        oy = rng.randrange(-8, 8)
        w, h = rng.randrange(1, 5), rng.randrange(1, 5)
        v = 1000.0 + i
        patch = grid(spark, ox, oy, w, h, e=e, pattern="const", value=v, patch_id=i)
        vals.add(v)
        tree = merge_samples(
            tree, patch, dom, first_exponents=exps, second_exponents=[e]
        ).localCheckpoint()
        exps = sorted({r[0] for r in tree.select("e").distinct().collect()})
        rows = [(r.cx, r.cy, r.e, r.height) for r in tree.collect()]
        cells = {(cx, cy, e_) for cx, cy, e_, _ in rows}
        assert len(rows) == len(cells), f"duplicate cells after merge {i} ({dom})"
        assert all(hv in vals for _, _, _, hv in rows)
        by_e: dict[int, set] = {}
        for cx, cy, e_, _ in rows:
            by_e.setdefault(e_, set()).add((cx, cy))
        es = sorted(by_e)
        for fi, fe in enumerate(es):
            for ce in es[fi + 1:]:
                k = ce - fe
                shadows = {(cx >> k, cy >> k) for cx, cy in by_e[fe]}
                overlap = shadows & by_e[ce]
                assert not overlap, f"overlap {overlap} between e{fe} and e{ce} ({dom})"


@pytest.mark.parametrize("dom", [Dominance.FirstDominates, Dominance.SecondDominates])
def test_random_chain_point_values_match_fold_oracle(spark, dom):
    """Differential check (randomized analogue of MergeTests.fs:534-605 with
    a VALUE oracle): for First/SecondDominates the fold semantics at any
    point are exactly 'first/last patch covering the point wins' — no
    fragment-exponent reasoning needed — so chain-merge results can be
    verified point-by-point against a trivial Python resolver."""
    import random as _random

    rng = _random.Random(97 if dom == Dominance.FirstDominates else 131)
    specs = []
    for i in range(6):
        e = rng.randrange(-2, 3)
        specs.append((rng.randrange(-6, 6), rng.randrange(-6, 6),
                      rng.randrange(1, 5), rng.randrange(1, 5), e, 100.0 + i))

    tree = None
    exps: list[int] = []
    for i, (ox, oy, w, h, e, v) in enumerate(specs):
        patch = grid(spark, ox, oy, w, h, e=e, pattern="const", value=v, patch_id=i)
        if tree is None:
            tree = patch.select("cx", "cy", "e", "height")
            exps = [e]
        else:
            tree = merge_samples(
                tree, patch, dom, first_exponents=exps, second_exponents=[e]
            ).localCheckpoint()
            exps = sorted({r[0] for r in tree.select("e").distinct().collect()})

    def covers(spec, px, py):
        ox, oy, w, h, e, _ = spec
        side = 2.0 ** e
        return (ox * side <= px < (ox + w) * side) and (oy * side <= py < (oy + h) * side)

    def oracle(px, py):
        order = specs if dom == Dominance.SecondDominates else list(reversed(specs))
        # SecondDominates: later patch beats the accumulated tree -> last
        # covering patch wins; FirstDominates: accumulated beats -> first
        hit = None
        for s_ in order:
            if covers(s_, px, py):
                hit = s_[5]
        return hit

    pts = [(rng.uniform(-8, 8), rng.uniform(-8, 8)) for _ in range(40)]
    pos = spark.createDataFrame(
        [(i, float(px), float(py)) for i, (px, py) in enumerate(pts)],
        "pid int, px double, py double",
    )
    got = {r["pid"]: r["height"] for r in sample_positions(tree, pos).collect()}
    for i, (px, py) in enumerate(pts):
        want = oracle(px, py)
        assert got.get(i) == want, (dom, i, (px, py), got.get(i), want)


def test_deep_fragment_refinement_conserves_area(spark):
    """Adversarial exponent gap: one coarse cell (e=6) vs a single fine cell
    (e=-2) eight levels down. The dominated coarse cell refines through all
    8 levels; the result must tile the coarse square exactly — total area
    conserved, no overlaps, fine value visible only in its own cell."""
    coarse = grid(spark, 0, 0, 1, 1, e=6, pattern="const", value=1.0)   # [0,64)^2
    fine = grid(spark, 5, 9, 1, 1, e=-2, pattern="const", value=2.0, patch_id=1)
    m = merge_samples(coarse, fine, Dominance.MoreDetailedOrSecond,
                      first_exponents=[6], second_exponents=[-2])
    rows = [(r.cx, r.cy, r.e, r.height) for r in m.collect()]
    # 3 sibling fragments at each of the 8 levels + the fine cell itself
    assert len(rows) == 3 * 8 + 1
    area = sum(4.0 ** e for _, _, e, _ in rows)
    assert area == 4.0 ** 6
    vals = {h for _, _, _, h in rows}
    assert vals == {1.0, 2.0}
    assert sum(1 for *_, h in rows if h == 2.0) == 1
    # probe: the fine point reads 2.0, a sibling fragment point reads 1.0
    assert _probe(spark, m, 5 * 0.25 + 0.1, 9 * 0.25 + 0.1) == 2.0
    assert _probe(spark, m, 40.0, 40.0) == 1.0


def _world_ebb(df):
    from pyspark.sql import functions as F

    r = df.select(
        F.min(F.col("cx") * F.pow(F.lit(2.0), F.col("e"))).alias("x0"),
        F.min(F.col("cy") * F.pow(F.lit(2.0), F.col("e"))).alias("y0"),
        F.max((F.col("cx") + 1) * F.pow(F.lit(2.0), F.col("e"))).alias("x1"),
        F.max((F.col("cy") + 1) * F.pow(F.lit(2.0), F.col("e"))).alias("y1"),
    ).collect()[0]
    return (r.x0, r.y0, r.x1, r.y1)


@pytest.mark.parametrize("dom", [Dominance.FirstDominates, Dominance.SecondDominates])
def test_merged_exact_bounding_boxes(spark, dom):
    """StructureTests.fs:100-226 'boundingbox: merged' matrix: the merged
    tree's ExactBoundingBox is the union of the surviving samples' boxes —
    identical under both dominances for every constellation."""
    cases = [
        # (a=(ox,oy,w,h,e), b=(...), expected (x0,y0,x1,y1))
        ((1, 2, 7, 14, 0), (3, 8, 3, 2, 0), (1.0, 2.0, 8.0, 16.0)),       # e0/e0 contained
        ((0, 0, 7, 14, 0), (3, 8, 3, 2, -2), (0.0, 0.0, 7.0, 14.0)),      # e0/e-2 contained
        ((1, 2, 7, 14, 0), (5, 1, 5, 3, 0), (1.0, 1.0, 10.0, 16.0)),      # e0/e0 partial
        ((1, 2, 7, 14, 0), (5, 2, 5, 3, -2), (1.0, 0.5, 8.0, 16.0)),      # e0/e-2 partial
        ((1, 2, 7, 14, 0), (8, 4, 5, 3, 0), (1.0, 2.0, 13.0, 16.0)),      # e0/e0 adjacent
        ((0, 0, 1, 1, 0), (4, 0, 4, 4, -2), (0.0, 0.0, 2.0, 1.0)),        # e0/e-2 adjacent
        ((7, 11, 1, 1, 0), (3, 5, 1, 1, 0), (3.0, 5.0, 8.0, 12.0)),       # e0/e0 islands
        ((7, 11, 1, 1, 0), (3, 5, 1, 1, -2), (0.75, 1.25, 8.0, 12.0)),    # e0/e-2 islands
    ]
    for (aox, aoy, aw, ah, ae), (box, boy, bw, bh, be), want in cases:
        a = grid(spark, aox, aoy, aw, ah, e=ae, pattern="const", value=1.0)
        b = grid(spark, box, boy, bw, bh, e=be, pattern="const", value=2.0, patch_id=1)
        m = merge_samples(a, b, dom, first_exponents=[ae], second_exponents=[be])
        assert _world_ebb(m) == want, ((aox, aoy, aw, ah, ae), (box, boy, bw, bh, be), dom)
