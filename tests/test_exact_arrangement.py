"""Exact rational slab-decomposition oracle for polygon pairs.

The strongest relate/setops oracles so far cover box x box, segment x
box and point x box operands (tests/test_properties.py).  This module
generalizes them: a vertical slab decomposition of the combined edge
arrangement, computed entirely in Fraction arithmetic, yields EXACT

  * areas of intersection / union / difference / symmetric_difference
  * the full DE-9IM matrix

for ARBITRARY even-odd polygons (non-convex, with holes), refereeing
the float sweep kernels in geopandas_spark.geom.algos on inputs no
other suite can certify.  Reference semantics: geopandas base.py
relate/intersection/union (GEOS); the oracle is independent of both the
engine and GEOS.
"""
import math
from fractions import Fraction as Fr

import numpy as np
import pytest
from hypothesis import assume, given, settings, strategies as st_

from geopandas_spark.geom import algos, wkt


# ---------------------------------------------------------------- oracle

def _ring_segments(rings):
    segs = []
    for r in rings:
        for i in range(len(r) - 1):
            p = (Fr(r[i][0]), Fr(r[i][1]))
            q = (Fr(r[i + 1][0]), Fr(r[i + 1][1]))
            if p != q:
                segs.append((p, q))
    return segs


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _seg_params(s1, s2):
    """(t, u) of the intersection of the supporting lines, or None if
    parallel."""
    (p1, p2), (q1, q2) = s1, s2
    d1 = (p2[0] - p1[0], p2[1] - p1[1])
    d2 = (q2[0] - q1[0], q2[1] - q1[1])
    den = d1[0] * d2[1] - d1[1] * d2[0]
    if den == 0:
        return None
    w = (q1[0] - p1[0], q1[1] - p1[1])
    t = (w[0] * d2[1] - w[1] * d2[0]) / den
    u = (w[0] * d1[1] - w[1] * d1[0]) / den
    return t, u


def _collinear_overlap(s1, s2):
    """(lo, hi) parameters on s1 of a positive-length collinear overlap
    with s2, else None."""
    (p1, p2), (q1, q2) = s1, s2
    d1 = (p2[0] - p1[0], p2[1] - p1[1])
    d2 = (q2[0] - q1[0], q2[1] - q1[1])
    if d1[0] * d2[1] - d1[1] * d2[0] != 0:
        return None
    if _cross(p1, p2, q1) != 0:
        return None
    den = d1[0] * d1[0] + d1[1] * d1[1]
    ta = ((q1[0] - p1[0]) * d1[0] + (q1[1] - p1[1]) * d1[1]) / den
    tb = ((q2[0] - p1[0]) * d1[0] + (q2[1] - p1[1]) * d1[1]) / den
    lo, hi = min(ta, tb), max(ta, tb)
    lo, hi = max(lo, Fr(0)), min(hi, Fr(1))
    if lo < hi:
        return lo, hi
    return None


def _y_at(seg, x):
    (p, q) = seg
    return p[1] + (x - p[0]) * (q[1] - p[1]) / (q[0] - p[0])


def _point_on_segment(m, seg):
    p, q = seg
    if _cross(p, q, m) != 0:
        return False
    return (min(p[0], q[0]) <= m[0] <= max(p[0], q[0])
            and min(p[1], q[1]) <= m[1] <= max(p[1], q[1]))


def _even_odd_inside(m, segs):
    """Exact even-odd membership of point m w.r.t. the edge set, using
    the half-open vertical-ray rule (counts edges whose x-span contains
    m.x half-open and whose y at m.x is above m).  m must NOT lie on
    any segment."""
    cnt = 0
    for (p, q) in segs:
        if p[0] == q[0]:
            continue
        (lo, hi) = (p, q) if p[0] < q[0] else (q, p)
        if lo[0] <= m[0] < hi[0]:
            if _y_at((p, q), m[0]) > m[1]:
                cnt += 1
    return cnt % 2 == 1


def _slab_areas(segs_a, segs_b):
    """Exact areas (A, B, A^B) of the two even-odd regions and their
    intersection via vertical slab decomposition."""
    xs = set()
    for (p, q) in segs_a + segs_b:
        xs.add(p[0])
        xs.add(q[0])
    allsegs = segs_a + segs_b
    for i in range(len(allsegs)):
        for j in range(i + 1, len(allsegs)):
            tu = _seg_params(allsegs[i], allsegs[j])
            if tu is None:
                continue
            t, u = tu
            if 0 <= t <= 1 and 0 <= u <= 1:
                (p, q) = allsegs[i]
                xs.add(p[0] + t * (q[0] - p[0]))
    xs = sorted(xs)
    area_a = area_b = area_i = Fr(0)
    for k in range(len(xs) - 1):
        x0, x1 = xs[k], xs[k + 1]
        if x0 == x1:
            continue
        xm = (x0 + x1) / 2
        crossing = []          # (y_mid, y_left, y_right, is_a)
        for tag, segs in ((True, segs_a), (False, segs_b)):
            for seg in segs:
                (p, q) = seg
                lo, hi = min(p[0], q[0]), max(p[0], q[0])
                if lo < xm < hi:
                    crossing.append((_y_at(seg, xm), _y_at(seg, x0),
                                     _y_at(seg, x1), tag))
        crossing.sort(key=lambda c: c[0])
        in_a = in_b = False
        w = x1 - x0
        for idx in range(len(crossing) - 1):
            ym, yl, yr, tag = crossing[idx]
            if tag:
                in_a = not in_a
            else:
                in_b = not in_b
            nxt = crossing[idx + 1]
            gap = w * ((nxt[1] - yl) + (nxt[2] - yr)) / 2
            if in_a:
                area_a += gap
            if in_b:
                area_b += gap
            if in_a and in_b:
                area_i += gap
    return area_a, area_b, area_i


def _split_points(seg, others):
    """Sorted parameters (incl. 0, 1) where seg meets any segment in
    others."""
    ts = {Fr(0), Fr(1)}
    for o in others:
        tu = _seg_params(seg, o)
        if tu is not None:
            t, u = tu
            if 0 <= t <= 1 and 0 <= u <= 1:
                ts.add(t)
        else:
            ov = _collinear_overlap(seg, o)
            if ov is not None:
                ts.add(ov[0])
                ts.add(ov[1])
    return sorted(ts)


def _boundary_pieces_vs(segs_self, segs_other):
    """('1' flags) whether self's boundary has positive-length pieces in
    other's interior / on other's boundary / in other's exterior."""
    in_int = on_bnd = in_ext = False
    for seg in segs_self:
        ts = _split_points(seg, segs_other)
        (p, q) = seg
        for a, b in zip(ts[:-1], ts[1:]):
            if a == b:
                continue
            tm = (a + b) / 2
            m = (p[0] + tm * (q[0] - p[0]), p[1] + tm * (q[1] - p[1]))
            if any(_point_on_segment(m, o) for o in segs_other):
                on_bnd = True
            elif _even_odd_inside(m, segs_other):
                in_int = True
            else:
                in_ext = True
    return in_int, on_bnd, in_ext


def exact_de9im(rings_a, rings_b):
    """Full DE-9IM of two even-odd polygons with integer/rational
    vertices, exactly."""
    sa, sb = _ring_segments(rings_a), _ring_segments(rings_b)
    area_a, area_b, area_i = _slab_areas(sa, sb)

    ii = "2" if area_i > 0 else "F"
    ie = "2" if area_a > area_i else "F"
    ei = "2" if area_b > area_i else "F"

    # boundary x boundary: 1 if any positive-length collinear overlap,
    # else 0 if the edge sets touch at all, else F
    bb_dim = -1
    for s1 in sa:
        for s2 in sb:
            if _collinear_overlap(s1, s2) is not None:
                bb_dim = 1
                break
            tu = _seg_params(s1, s2)
            if tu is not None:
                t, u = tu
                if 0 <= t <= 1 and 0 <= u <= 1:
                    bb_dim = max(bb_dim, 0)
            else:
                # parallel non-overlapping or touching at one point
                p, q = s2
                if _point_on_segment(p, s1) or _point_on_segment(q, s1):
                    bb_dim = max(bb_dim, 0)
        if bb_dim == 1:
            break
    bb = "F" if bb_dim < 0 else str(bb_dim)

    a_in_b, _, a_out_b = _boundary_pieces_vs(sa, sb)
    b_in_a, _, b_out_a = _boundary_pieces_vs(sb, sa)
    ib = "1" if b_in_a else "F"     # interior(A) x boundary(B)
    bi = "1" if a_in_b else "F"     # boundary(A) x interior(B)
    be = "1" if a_out_b else "F"
    eb = "1" if b_out_a else "F"

    mat = ii + ib + ie + bi + bb + be + ei + eb + "2"
    return mat, (area_a, area_b, area_i)


# ------------------------------------------------------------ generators

def _star_ring(draw, lo=0, hi=24, nmin=4, nmax=9):
    """Simple star-shaped polygon ring with integer vertices: random
    integer points sorted by exact angle around their centroid, one
    point (max radius) per direction."""
    n = draw(st_.integers(nmin, nmax))
    pts = set()
    for _ in range(n):
        pts.add((draw(st_.integers(lo, hi)), draw(st_.integers(lo, hi))))
    pts = sorted(pts)
    assume(len(pts) >= 3)
    cx = Fr(sum(p[0] for p in pts), len(pts))
    cy = Fr(sum(p[1] for p in pts), len(pts))
    dirs = {}
    for (x, y) in pts:
        dx, dy = Fr(x) - cx, Fr(y) - cy
        if dx == 0 and dy == 0:
            continue
        g = math.gcd(dx.numerator * dy.denominator,
                     dy.numerator * dx.denominator)
        key_n = (dx.numerator * dy.denominator // g if g else 0,
                 dy.numerator * dx.denominator // g if g else 0)
        r2 = dx * dx + dy * dy
        if key_n not in dirs or r2 > dirs[key_n][0]:
            dirs[key_n] = (r2, (x, y))
    assume(len(dirs) >= 3)

    # sort directions CCW: split into the upper half-plane (ny>0, or
    # ny==0 with nx>0, i.e. angle in [0, pi)) and the lower; within a
    # half, -cot(theta) = -nx/ny increases monotonically with theta
    items = list(dirs.items())

    def cmp_key(k):
        nx, ny = k
        half = 0 if (ny > 0 or (ny == 0 and nx > 0)) else 1
        return (half, Fr(-nx, ny) if ny != 0 else Fr(-10**18))

    items.sort(key=lambda kv: cmp_key(kv[0]))
    ring = [kv[1][1] for kv in items]
    ring.append(ring[0])
    # reject zero-area degenerations (all directions collinear)
    tw = Fr(0)
    for i in range(len(ring) - 1):
        tw += (Fr(ring[i][0]) * Fr(ring[i + 1][1])
               - Fr(ring[i + 1][0]) * Fr(ring[i][1]))
    assume(tw != 0)
    if tw < 0:
        ring = ring[::-1]
    return ring


star_ring = st_.composite(_star_ring)


def _ring_wkt(ring):
    return ", ".join(f"{x} {y}" for (x, y) in ring)


def _poly_wkt(rings):
    return ("POLYGON (" +
            ", ".join("(" + _ring_wkt(r) + ")" for r in rings) + ")")


# ----------------------------------------------------------------- tests

@settings(max_examples=120, deadline=None)
@given(star_ring(), star_ring())
def test_setops_areas_match_exact_slab_oracle(ra, rb):
    """intersection/union/difference/symmetric_difference areas of two
    random non-convex star polygons vs the exact Fraction slab
    decomposition."""
    ga = wkt.parse_array([_poly_wkt([ra])])
    gb = wkt.parse_array([_poly_wkt([rb])])
    _, (A, B, I) = exact_de9im([ra], [rb])
    got_i = algos.area(algos.intersection(ga, gb))[0]
    got_u = algos.area(algos.union(ga, gb))[0]
    got_d = algos.area(algos.difference(ga, gb))[0]
    got_x = algos.area(algos.symmetric_difference(ga, gb))[0]
    tol = 1e-6
    assert abs(got_i - float(I)) < tol, (ra, rb, got_i, float(I))
    assert abs(got_u - float(A + B - I)) < tol, (ra, rb, got_u,
                                                 float(A + B - I))
    assert abs(got_d - float(A - I)) < tol, (ra, rb, got_d, float(A - I))
    assert abs(got_x - float(A + B - 2 * I)) < tol, (ra, rb, got_x,
                                                     float(A + B - 2 * I))


@settings(max_examples=120, deadline=None)
@given(star_ring(), star_ring())
def test_relate_star_polygons_match_exact_oracle(ra, rb):
    """Full DE-9IM of two random star polygons vs the exact oracle —
    the first relate referee beyond box/segment/point operands."""
    ga = wkt.parse_array([_poly_wkt([ra])])
    gb = wkt.parse_array([_poly_wkt([rb])])
    want, _ = exact_de9im([ra], [rb])
    got = algos.relate(ga, gb)[0]
    assert got == want, (_poly_wkt([ra]), _poly_wkt([rb]), got, want)


@settings(max_examples=60, deadline=None)
@given(star_ring(lo=0, hi=30, nmin=5, nmax=9),
       st_.integers(8, 14), st_.integers(8, 14))
def test_relate_holed_box_vs_star_matches_exact_oracle(rb, hx, hy):
    """Box-with-hole vs star polygon: the even-odd oracle handles holes
    natively; checks hole-aware interior classification in relate and
    the boolean area kernels."""
    shell = [(0, 0), (30, 0), (30, 30), (0, 30), (0, 0)]
    hole = [(hx, hy), (hx + 6, hy), (hx + 6, hy + 6), (hx, hy + 6),
            (hx, hy)][::-1]
    rings_a = [shell, hole]
    ga = wkt.parse_array([_poly_wkt(rings_a)])
    gb = wkt.parse_array([_poly_wkt([rb])])
    want, (A, B, I) = exact_de9im(rings_a, [rb])
    got = algos.relate(ga, gb)[0]
    assert got == want, (_poly_wkt(rings_a), _poly_wkt([rb]), got, want)
    got_i = algos.area(algos.intersection(ga, gb))[0]
    assert abs(got_i - float(I)) < 1e-6


@settings(max_examples=150, deadline=None)
@given(star_ring(lo=0, hi=6, nmin=4, nmax=8),
       star_ring(lo=0, hi=6, nmin=4, nmax=8))
def test_relate_tight_grid_star_polygons_exact(ra, rb):
    """Stars drawn from a 7x7 integer grid: shared vertices, collinear
    edge overlaps, corner touches and exact containment all become
    likely — the degenerate-contact band the float kernels snap-round
    through."""
    ga = wkt.parse_array([_poly_wkt([ra])])
    gb = wkt.parse_array([_poly_wkt([rb])])
    want, (A, B, I) = exact_de9im([ra], [rb])
    got = algos.relate(ga, gb)[0]
    assert got == want, (_poly_wkt([ra]), _poly_wkt([rb]), got, want)
    got_i = algos.area(algos.intersection(ga, gb))[0]
    got_x = algos.area(algos.symmetric_difference(ga, gb))[0]
    assert abs(got_i - float(I)) < 1e-6
    assert abs(got_x - float(A + B - 2 * I)) < 1e-6


@settings(max_examples=60, deadline=None)
@given(star_ring(), star_ring(),
       st_.sampled_from([-20_000_000, -3_000_000, 17_000_000]))
def test_setops_web_mercator_offset_matches_exact(ra, rb, off):
    """Same star pairs translated to web-mercator magnitudes: the
    engine's snap grid is ~1e-9 relative, one double ulp at 2e7 is
    ~4e-9 absolute, so areas must still track the exact oracle (which
    shifts exactly) to a magnitude-scaled tolerance."""
    ra2 = [(x + off, y + off) for (x, y) in ra]
    rb2 = [(x + off, y + off) for (x, y) in rb]
    ga = wkt.parse_array([_poly_wkt([ra2])])
    gb = wkt.parse_array([_poly_wkt([rb2])])
    _, (A, B, I) = exact_de9im([ra], [rb])   # translation-invariant
    got_i = algos.area(algos.intersection(ga, gb))[0]
    got_u = algos.area(algos.union(ga, gb))[0]
    tol = 1e-4     # ulp(2e7)^1 * perimeter-scale slack
    assert abs(got_i - float(I)) < tol, (ra2, rb2, got_i, float(I))
    assert abs(got_u - float(A + B - I)) < tol


@settings(max_examples=120, deadline=None)
@given(star_ring(lo=0, hi=8, nmin=4, nmax=8),
       star_ring(lo=0, hi=8, nmin=4, nmax=8))
def test_binary_predicates_consistent_with_exact_de9im(ra, rb):
    """The 10 binary predicates have fast paths independent of
    relate(); each must agree with what the exact DE-9IM oracle
    implies for area/area operands (reference base.py predicate
    definitions via the standard matrix patterns)."""
    ga = wkt.parse_array([_poly_wkt([ra])])
    gb = wkt.parse_array([_poly_wkt([rb])])
    m, _ = exact_de9im([ra], [rb])
    ii, ib, ie, bi, bb, be, ei, eb, _ee = m
    disjoint = ii == "F" and ib == "F" and bi == "F" and bb == "F"
    want = {
        "intersects": not disjoint,
        "disjoint": disjoint,
        "touches": (not disjoint) and ii == "F",
        "overlaps": ii == "2" and ie == "2" and ei == "2",
        "crosses": False,                      # undefined for area/area
        "contains": ii != "F" and ei == "F" and eb == "F",
        "within": ii != "F" and ie == "F" and be == "F",
        "covers": ei == "F" and eb == "F" and not disjoint,
        "covered_by": ie == "F" and be == "F" and not disjoint,
        "geom_equals": (ie == "F" and be == "F"
                        and ei == "F" and eb == "F"),
    }
    for name, expect in want.items():
        got = bool(getattr(algos, name)(ga, gb)[0])
        assert got == expect, (name, _poly_wkt([ra]), _poly_wkt([rb]),
                               m, got, expect)


def _chaos_ring(draw, lo=0, hi=12, nmin=4, nmax=8):
    """Closed ring over random integer points in DRAW order — almost
    always self-intersecting."""
    n = draw(st_.integers(nmin, nmax))
    pts = []
    seen = set()
    for _ in range(n):
        p = (draw(st_.integers(lo, hi)), draw(st_.integers(lo, hi)))
        if p not in seen:
            seen.add(p)
            pts.append(p)
    assume(len(pts) >= 3)
    pts.append(pts[0])
    return pts


chaos_ring = st_.composite(_chaos_ring)


@settings(max_examples=150, deadline=None)
@given(chaos_ring())
def test_make_valid_linework_area_matches_even_odd_oracle(ring):
    """make_valid(method='linework') re-nests faces by even-odd parity
    (GEOS MakeValid linework semantics), so the repaired area of ANY
    closed ring — bowties, multi-loops, spike retraces — must equal
    the exact even-odd area of its noded linework."""
    ga = wkt.parse_array([_poly_wkt([ring])])
    fixed = algos.make_valid(ga, method="linework")
    got = algos.area(fixed)[0]
    _, (A, _B, _I) = exact_de9im([ring], [[(100, 100), (101, 100),
                                           (101, 101), (100, 100)]])
    assert abs(got - float(A)) < 1e-6, (_poly_wkt([ring]), got, float(A))
    assert got == 0.0 or bool(algos.is_valid(fixed)[0]), \
        (_poly_wkt([ring]), wkt.format_array(fixed)[0],
         algos.is_valid_reason(fixed)[0])


@settings(max_examples=80, deadline=None)
@given(chaos_ring(), chaos_ring(lo=2, hi=10, nmin=3, nmax=6))
def test_make_valid_linework_two_rings_even_odd_oracle(r1, r2):
    """Polygon with two chaotic rings (roles discarded by linework):
    repaired area = exact even-odd area of the COMBINED linework. The
    oracle computes it as area(R1) + area(R2) - 2*area(R1^R2) since
    even-odd of a union of edge sets is the symmetric difference of
    the two even-odd regions."""
    ga = wkt.parse_array([_poly_wkt([r1, r2])])
    fixed = algos.make_valid(ga, method="linework")
    got = algos.area(fixed)[0]
    _, (A, B, I) = exact_de9im([r1], [r2])
    want = float(A + B - 2 * I)
    assert abs(got - want) < 1e-6, (_poly_wkt([r1, r2]), got, want)
    assert got == 0.0 or bool(algos.is_valid(fixed)[0]), \
        (_poly_wkt([r1, r2]), wkt.format_array(fixed)[0],
         algos.is_valid_reason(fixed)[0])


def test_make_valid_linework_merges_edge_adjacent_holes():
    """Two even-parity faces separated by a doubled collinear ring edge
    both classify as holes of the same shell; the shared edge crosses
    depth by 2, so it must cancel — r13 find: the outer ring's edges
    (1 4)-(3 2) and (3 2)-(0 5) both cover (2 3)-(3 2), and make_valid
    emitted two hole triangles sharing that edge (invalid output)."""
    w = "POLYGON ((5 2, 1 4, 3 2, 0 5, 0 0, 5 2), (2 2, 2 3, 4 2, 2 2))"
    fixed = algos.make_valid(wkt.parse_array([w]), method="linework")
    assert bool(algos.is_valid(fixed)[0]), algos.is_valid_reason(fixed)[0]
    assert abs(algos.area(fixed)[0] - 10.5) < 1e-9
    # exactly one merged hole survives
    parts = fixed.geom_slices(0)
    assert len(parts) == 1 and len(parts[0]) == 2


def _slab_multi_areas(ring_sets):
    """Exact (per-set areas, union area, intersect-all area) of N
    even-odd regions via one vertical slab decomposition."""
    seg_sets = [_ring_segments(rs) for rs in ring_sets]
    allsegs = [s for ss in seg_sets for s in ss]
    xs = set()
    for (p, q) in allsegs:
        xs.add(p[0])
        xs.add(q[0])
    for i in range(len(allsegs)):
        for j in range(i + 1, len(allsegs)):
            tu = _seg_params(allsegs[i], allsegs[j])
            if tu is None:
                continue
            t, u = tu
            if 0 <= t <= 1 and 0 <= u <= 1:
                (p, q) = allsegs[i]
                xs.add(p[0] + t * (q[0] - p[0]))
    xs = sorted(xs)
    n = len(seg_sets)
    areas = [Fr(0)] * n
    a_union = Fr(0)
    a_inter = Fr(0)
    for k in range(len(xs) - 1):
        x0, x1 = xs[k], xs[k + 1]
        if x0 == x1:
            continue
        xm = (x0 + x1) / 2
        crossing = []
        for si, ss in enumerate(seg_sets):
            for seg in ss:
                (p, q) = seg
                lo, hi = min(p[0], q[0]), max(p[0], q[0])
                if lo < xm < hi:
                    crossing.append((_y_at(seg, xm), _y_at(seg, x0),
                                     _y_at(seg, x1), si))
        crossing.sort(key=lambda c: c[0])
        inside = [False] * n
        w = x1 - x0
        for idx in range(len(crossing) - 1):
            _ym, yl, yr, si = crossing[idx]
            inside[si] = not inside[si]
            nxt = crossing[idx + 1]
            gap = w * ((nxt[1] - yl) + (nxt[2] - yr)) / 2
            for sj in range(n):
                if inside[sj]:
                    areas[sj] += gap
            if any(inside):
                a_union += gap
            if all(inside):
                a_inter += gap
    return areas, a_union, a_inter


@settings(max_examples=60, deadline=None)
@given(st_.lists(star_ring(lo=0, hi=14, nmin=4, nmax=7),
                 min_size=2, max_size=5))
def test_union_all_intersection_all_match_multi_slab_oracle(rs):
    """union_all / intersection_all over N star polygons vs the N-way
    exact slab oracle — referees the sweep union kernel that dissolve
    and overlay build on."""
    from geopandas_spark.geom.array import GeometryArray  # noqa: F401
    ga = wkt.parse_array([_poly_wkt([r]) for r in rs])
    _areas, a_union, a_inter = _slab_multi_areas([[r] for r in rs])
    got_u = algos.area(algos.union_all(ga))[0]
    assert abs(got_u - float(a_union)) < 1e-6, \
        ([_poly_wkt([r]) for r in rs], got_u, float(a_union))
    got_i = algos.area(algos.intersection_all(ga))[0]
    assert abs(got_i - float(a_inter)) < 1e-6, \
        ([_poly_wkt([r]) for r in rs], got_i, float(a_inter))


def _slab_enclosed_masks(ring_sets):
    """Exact ENCLOSED-region masks (union of bounded faces of each
    set's own segments) over the combined arrangement's slab-gap
    decomposition. Returns (gap_areas, masks) where masks[i][gap] is
    True iff the gap lies in a bounded face of set i. Connectivity per
    set: gaps merge across separators belonging to OTHER sets and
    across slab boundaries on positive uncovered overlap; anything
    reaching the unbounded frame is outside."""
    seg_sets = [_ring_segments(rs) for rs in ring_sets]
    allsegs = [s for ss in seg_sets for s in ss]
    xs = set()
    ybound = Fr(0)
    for (p, q) in allsegs:
        xs.add(p[0])
        xs.add(q[0])
        ybound = max(ybound, abs(p[1]), abs(q[1]))
    for i in range(len(allsegs)):
        for j in range(i + 1, len(allsegs)):
            tu = _seg_params(allsegs[i], allsegs[j])
            if tu is not None:
                t, u = tu
                if 0 <= t <= 1 and 0 <= u <= 1:
                    (p, q) = allsegs[i]
                    xs.add(p[0] + t * (q[0] - p[0]))
    xs = sorted(xs)
    BIG = ybound + 1
    n = len(seg_sets)

    # per-slab crossing tables: (y_mid, y_left, y_right, set_id)
    slabs = []
    for k in range(len(xs) - 1):
        x0, x1 = xs[k], xs[k + 1]
        if x0 == x1:
            continue
        xm = (x0 + x1) / 2
        crossing = []
        for si, ss in enumerate(seg_sets):
            for seg in ss:
                (p, q) = seg
                lo, hi = min(p[0], q[0]), max(p[0], q[0])
                if lo < xm < hi:
                    crossing.append((_y_at(seg, xm), _y_at(seg, x0),
                                     _y_at(seg, x1), si))
        crossing.sort(key=lambda c: c[0])
        slabs.append((x0, x1, crossing))

    # gap ids: (slab, g) for g in 0..len(crossing) — g=0 below all,
    # g=len(crossing) above all (sentinels, unbounded)
    parent = [{} for _ in range(n)]

    def find(i, a):
        pr = parent[i]
        while pr.get(a, a) != a:
            pr[a] = pr.get(pr[a], pr[a])
            a = pr[a]
        return a

    def union(i, a, b):
        ra, rb = find(i, a), find(i, b)
        if ra != rb:
            parent[i][ra] = rb

    UNB = ("U",)
    for si in range(n):
        for k, (_x0, _x1, crossing) in enumerate(slabs):
            ng = len(crossing) + 1
            union(si, (k, 0), UNB)
            union(si, (k, ng - 1), UNB)
            # vertical merge across other-set separators
            for g in range(ng - 1):
                if crossing[g][3] != si:
                    union(si, (k, g), (k, g + 1))
        # frame connections: a slab-0 gap open on the left boundary
        # (positive interval not fully covered by a set-si vertical
        # segment there) escapes to the outside; same on the right
        if slabs:
            for side, k, xb, idx in (("L", 0, slabs[0][0], 1),
                                     ("R", len(slabs) - 1,
                                      slabs[-1][1], 2)):
                crossing = slabs[k][2]
                cuts = [-BIG] + [c[idx] for c in crossing] + [BIG]
                blocks = []
                for (p, q) in seg_sets[si]:
                    if p[0] == q[0] == xb:
                        blocks.append((min(p[1], q[1]),
                                       max(p[1], q[1])))
                for g in range(len(cuts) - 1):
                    lo, hi = cuts[g], cuts[g + 1]
                    if hi <= lo:
                        continue
                    pieces = [(lo, hi)]
                    for (b0, b1) in blocks:
                        nxt = []
                        for (p0, p1) in pieces:
                            if b1 <= p0 or b0 >= p1:
                                nxt.append((p0, p1))
                            else:
                                if p0 < b0:
                                    nxt.append((p0, b0))
                                if b1 < p1:
                                    nxt.append((b1, p1))
                        pieces = nxt
                    if any(p1 > p0 for (p0, p1) in pieces):
                        union(si, (k, g), UNB)
        # horizontal connections at each interior boundary
        for k in range(len(slabs) - 1):
            xb = slabs[k][1]
            if slabs[k + 1][0] != xb:
                # slabs not adjacent (zero-width slab skipped) — the
                # region between is empty, still adjacent
                pass
            crL = slabs[k][2]
            crR = slabs[k + 1][2]
            # boundary y-intervals: left slab uses y_right, right slab
            # uses y_left; sentinels use +-BIG
            cutsL = [-BIG] + [c[2] for c in crL] + [BIG]
            cutsR = [-BIG] + [c[1] for c in crR] + [BIG]
            # set-si vertical segments exactly at xb block overlap
            blocks = []
            for (p, q) in seg_sets[si]:
                if p[0] == q[0] == xb:
                    blocks.append((min(p[1], q[1]), max(p[1], q[1])))
            for ga in range(len(cutsL) - 1):
                la, lb = cutsL[ga], cutsL[ga + 1]
                if lb <= la:
                    continue
                for gb in range(len(cutsR) - 1):
                    ra_, rb_ = cutsR[gb], cutsR[gb + 1]
                    lo, hi = max(la, ra_), min(lb, rb_)
                    if hi <= lo:
                        continue
                    # subtract blocking intervals
                    pieces = [(lo, hi)]
                    for (b0, b1) in blocks:
                        nxt = []
                        for (p0, p1) in pieces:
                            if b1 <= p0 or b0 >= p1:
                                nxt.append((p0, p1))
                            else:
                                if p0 < b0:
                                    nxt.append((p0, b0))
                                if b1 < p1:
                                    nxt.append((b1, p1))
                        pieces = nxt
                    if any(p1 > p0 for (p0, p1) in pieces):
                        union(si, (k, ga), (k + 1, gb))

    gap_areas = {}
    masks = [dict() for _ in range(n)]
    for k, (x0, x1, crossing) in enumerate(slabs):
        w = x1 - x0
        for g in range(len(crossing) + 1):
            if g == 0 or g == len(crossing):
                continue       # sentinels: unbounded, no finite area
            yl0, yr0 = crossing[g - 1][1], crossing[g - 1][2]
            yl1, yr1 = crossing[g][1], crossing[g][2]
            gap_areas[(k, g)] = w * ((yl1 - yl0) + (yr1 - yr0)) / 2
            for si in range(n):
                masks[si][(k, g)] = find(si, (k, g)) != find(si, UNB)
    return gap_areas, masks


@settings(max_examples=80, deadline=None)
@given(chaos_ring(lo=0, hi=14, nmin=4, nmax=8),
       chaos_ring(lo=2, hi=12, nmin=3, nmax=6))
def test_make_valid_structure_two_rings_oracle(r1, r2):
    """make_valid(method='structure') repairs each ring to ALL its
    enclosed faces (a pentagram keeps its center — unlike linework's
    even-odd), unions the shell faces and subtracts the hole faces:
    repaired area = area(enclosed(r1) \\ enclosed(r2)), exactly, from
    the bounded-face flood fill over the slab-gap graph."""
    ga = wkt.parse_array([_poly_wkt([r1, r2])])
    fixed = algos.make_valid(ga, method="structure")
    got = algos.area(fixed)[0]
    gap_areas, masks = _slab_enclosed_masks([[r1], [r2]])
    want = float(sum(a for gid, a in gap_areas.items()
                     if masks[0][gid] and not masks[1][gid]))
    assert abs(got - want) < 1e-6, (_poly_wkt([r1, r2]), got, want)
    assert got == 0.0 or bool(algos.is_valid(fixed)[0]), \
        (_poly_wkt([r1, r2]), wkt.format_array(fixed)[0],
         algos.is_valid_reason(fixed)[0])


@settings(max_examples=100, deadline=None)
@given(chaos_ring(lo=0, hi=14, nmin=4, nmax=9))
def test_make_valid_structure_single_ring_enclosed_oracle(ring):
    """Single chaotic ring: structure keeps the UNION of all bounded
    faces (enclosed region), not the even-odd region."""
    ga = wkt.parse_array([_poly_wkt([ring])])
    fixed = algos.make_valid(ga, method="structure")
    got = algos.area(fixed)[0]
    gap_areas, masks = _slab_enclosed_masks([[ring]])
    want = float(sum(a for gid, a in gap_areas.items() if masks[0][gid]))
    assert abs(got - want) < 1e-6, (_poly_wkt([ring]), got, want)
    assert got == 0.0 or bool(algos.is_valid(fixed)[0]), \
        (_poly_wkt([ring]), wkt.format_array(fixed)[0],
         algos.is_valid_reason(fixed)[0])


def _monotone_line(draw, lo=0, hi=20, nmin=3, nmax=6):
    """Simple (x-monotone, distinct integer x) polyline."""
    n = draw(st_.integers(nmin, nmax))
    xs = sorted({draw(st_.integers(lo, hi)) for _ in range(n)})
    assume(len(xs) >= 2)
    return [(x, draw(st_.integers(lo, hi))) for x in xs]


monotone_line = st_.composite(_monotone_line)


def _line_wkt(pts):
    return "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"


def _line_clip_lengths(line, ring):
    """Exact (inside_closed, outside) lengths of a polyline vs an
    even-odd polygon: split each line segment at every polygon-edge
    intersection, classify piece midpoints (boundary-collinear counts
    as inside — intersection with a CLOSED region)."""
    segs_p = _ring_segments([ring])
    l_in = l_out = 0.0
    for i in range(len(line) - 1):
        p = (Fr(line[i][0]), Fr(line[i][1]))
        q = (Fr(line[i + 1][0]), Fr(line[i + 1][1]))
        if p == q:
            continue
        seg = (p, q)
        ts = _split_points(seg, segs_p)
        seg_len = math.hypot(float(q[0] - p[0]), float(q[1] - p[1]))
        for a, b in zip(ts[:-1], ts[1:]):
            if a == b:
                continue
            tm = (a + b) / 2
            m = (p[0] + tm * (q[0] - p[0]), p[1] + tm * (q[1] - p[1]))
            piece = float(b - a) * seg_len
            if (any(_point_on_segment(m, o) for o in segs_p)
                    or _even_odd_inside(m, segs_p)):
                l_in += piece
            else:
                l_out += piece
    return l_in, l_out


@settings(max_examples=120, deadline=None)
@given(monotone_line(), star_ring(lo=2, hi=18, nmin=4, nmax=8))
def test_line_polygon_clip_lengths_exact(line, ring):
    """intersection/difference of a polyline with a polygon: total
    lengths must match the exact split-and-classify oracle (boundary-
    collinear runs belong to the intersection — closed region)."""
    gl = wkt.parse_array([_line_wkt(line)])
    gp = wkt.parse_array([_poly_wkt([ring])])
    want_in, want_out = _line_clip_lengths(line, ring)
    got_in = algos.length(algos.intersection(gl, gp))[0]
    got_out = algos.length(algos.difference(gl, gp))[0]
    assert abs(got_in - want_in) < 1e-9 * max(1.0, want_in), \
        (_line_wkt(line), _poly_wkt([ring]), got_in, want_in)
    assert abs(got_out - want_out) < 1e-9 * max(1.0, want_out), \
        (_line_wkt(line), _poly_wkt([ring]), got_out, want_out)


def _slab_parity_masks(ring_sets):
    """(gap_areas, masks): per-gap even-odd membership flags for each
    ring set over the combined arrangement — the per-gap version of
    _slab_multi_areas."""
    seg_sets = [_ring_segments(rs) for rs in ring_sets]
    allsegs = [s for ss in seg_sets for s in ss]
    xs = set()
    for (p, q) in allsegs:
        xs.add(p[0])
        xs.add(q[0])
    for i in range(len(allsegs)):
        for j in range(i + 1, len(allsegs)):
            tu = _seg_params(allsegs[i], allsegs[j])
            if tu is not None:
                t, u = tu
                if 0 <= t <= 1 and 0 <= u <= 1:
                    (p, q) = allsegs[i]
                    xs.add(p[0] + t * (q[0] - p[0]))
    xs = sorted(xs)
    n = len(seg_sets)
    gap_areas = {}
    masks = [dict() for _ in range(n)]
    gid = 0
    for k in range(len(xs) - 1):
        x0, x1 = xs[k], xs[k + 1]
        if x0 == x1:
            continue
        xm = (x0 + x1) / 2
        crossing = []
        for si, ss in enumerate(seg_sets):
            for seg in ss:
                (p, q) = seg
                lo, hi = min(p[0], q[0]), max(p[0], q[0])
                if lo < xm < hi:
                    crossing.append((_y_at(seg, xm), _y_at(seg, x0),
                                     _y_at(seg, x1), si))
        crossing.sort(key=lambda c: c[0])
        inside = [False] * n
        w = x1 - x0
        for idx in range(len(crossing) - 1):
            _ym, yl, yr, si = crossing[idx]
            inside[si] = not inside[si]
            nxt = crossing[idx + 1]
            gap = w * ((nxt[1] - yl) + (nxt[2] - yr)) / 2
            gap_areas[gid] = gap
            for sj in range(n):
                masks[sj][gid] = inside[sj]
            gid += 1
    return gap_areas, masks


def _rng_star(rnd, lo, hi, nmin, nmax):
    """Deterministic star polygon for non-hypothesis tests."""
    import math as _m
    while True:
        pts = {(rnd.randint(lo, hi), rnd.randint(lo, hi))
               for _ in range(rnd.randint(nmin, nmax))}
        if len(pts) < 3:
            continue
        cx = sum(p[0] for p in pts) / len(pts)
        cy = sum(p[1] for p in pts) / len(pts)
        best = {}
        for (x, y) in pts:
            a = _m.atan2(y - cy, x - cx)
            r2 = (x - cx) ** 2 + (y - cy) ** 2
            k = round(a, 12)
            if k not in best or r2 > best[k][0]:
                best[k] = (r2, (x, y))
        if len(best) < 3:
            continue
        ring = [v[1] for _, v in sorted(best.items())]
        ring.append(ring[0])
        tw = sum(ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
                 for i in range(len(ring) - 1))
        if tw == 0:
            continue
        return ring if tw > 0 else ring[::-1]


def test_overlay_operator_star_polygons_match_slab_oracle(spark):
    """DataFrame-level overlay (intersection + union fragments) over
    two layers of random star polygons, refereed fragment-by-fragment
    by the exact parity-mask oracle: I_ij per intersecting pair, and
    residues A_i \\ union(B) / B_j \\ union(A) for the union how."""
    import random
    from pyspark.sql import functions as F
    from geopandas_spark import st
    from geopandas_spark.operators import overlay

    rnd = random.Random(20260816)
    A = [_rng_star(rnd, 0, 20, 4, 8) for _ in range(6)]
    B = [_rng_star(rnd, 4, 24, 4, 8) for _ in range(6)]
    ga_areas, masks = _slab_parity_masks([[r] for r in A + B])
    nA = len(A)

    def _mass(pred):
        return float(sum(a for g, a in ga_areas.items() if pred(g)))

    dfa = spark.createDataFrame(
        [(i, _poly_wkt([r])) for i, r in enumerate(A)], ["ida", "wkt"]) \
        .select("ida", st.geom_from_text("wkt").alias("geom"))
    dfb = spark.createDataFrame(
        [(j, _poly_wkt([r])) for j, r in enumerate(B)], ["idb", "wkt"]) \
        .select("idb", st.geom_from_text("wkt").alias("geom"))

    inter = overlay(dfa, dfb, "intersection", strategy="broadcast") \
        .select("ida", "idb", st.area("geom").alias("a")).collect()
    got = {(r.ida, r.idb): r.a for r in inter}
    for i in range(nA):
        for j in range(len(B)):
            want = _mass(lambda g: masks[i][g] and masks[nA + j][g])
            have = got.get((i, j), 0.0)
            assert abs(have - want) < 1e-6, (i, j, have, want)

    uni = overlay(dfa, dfb, "union", strategy="broadcast") \
        .select("ida", "idb", st.area("geom").alias("a")).collect()
    for r in uni:
        if r.ida is not None and r.idb is None:
            i = r.ida
            want = _mass(lambda g: masks[i][g]
                         and not any(masks[nA + j][g]
                                     for j in range(len(B))))
            assert abs(r.a - want) < 1e-6, ("residue A", i, r.a, want)
        elif r.ida is None and r.idb is not None:
            j = r.idb
            want = _mass(lambda g: masks[nA + j][g]
                         and not any(masks[i][g] for i in range(nA)))
            assert abs(r.a - want) < 1e-6, ("residue B", j, r.a, want)


def test_dissolve_operator_star_polygons_match_union_oracle(spark):
    """Operator-level dissolve over groups of random star polygons:
    each group's dissolved area must equal the exact N-way slab union
    (exercises the two-phase dissolve plan with overlapping and
    degenerate-contact members, not just disjoint boxes)."""
    import random
    from geopandas_spark import st
    from geopandas_spark.operators import dissolve

    rnd = random.Random(99)
    rows = []
    groups = {}
    for g in range(4):
        members = [_rng_star(rnd, g * 3, g * 3 + 16, 4, 8)
                   for _ in range(5)]
        groups[g] = members
        rows += [(g, _poly_wkt([r])) for r in members]
    df = spark.createDataFrame(rows, ["grp", "wkt"]) \
        .select("grp", st.geom_from_text("wkt").alias("geom"))
    out = dissolve(df, by="grp") \
        .select("grp", st.area("geom").alias("a")).collect()
    got = {r.grp: r.a for r in out}
    for g, members in groups.items():
        _areas, a_union, _ai = _slab_multi_areas([[m] for m in members])
        assert abs(got[g] - float(a_union)) < 1e-6, \
            (g, got[g], float(a_union))


@settings(max_examples=100, deadline=None)
@given(st_.lists(st_.tuples(st_.integers(0, 40), st_.integers(0, 40)),
                 min_size=3, max_size=10, unique=True))
def test_minimum_bounding_circle_exact_optimality(pts):
    """Exact optimality oracle: the minimum enclosing circle is
    determined by 2 points (diameter) or 3 points (circumcircle), and
    every candidate's squared radius is RATIONAL for integer sites —
    enumerate all O(n^3) candidates in Fractions, keep the smallest
    that contains all points, and the engine's circle must match its
    radius."""
    import itertools
    P = [(Fr(x), Fr(y)) for (x, y) in pts]

    def contains_all(cx, cy, r2):
        return all((x - cx) ** 2 + (y - cy) ** 2 <= r2 for (x, y) in P)

    best = None
    for a, b in itertools.combinations(P, 2):
        cx, cy = (a[0] + b[0]) / 2, (a[1] + b[1]) / 2
        r2 = (a[0] - cx) ** 2 + (a[1] - cy) ** 2
        if contains_all(cx, cy, r2) and (best is None or r2 < best):
            best = r2
    for a, b, c in itertools.combinations(P, 3):
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                 + c[0] * (a[1] - b[1]))
        if d == 0:
            continue
        ux = ((a[0] ** 2 + a[1] ** 2) * (b[1] - c[1])
              + (b[0] ** 2 + b[1] ** 2) * (c[1] - a[1])
              + (c[0] ** 2 + c[1] ** 2) * (a[1] - b[1])) / d
        uy = ((a[0] ** 2 + a[1] ** 2) * (c[0] - b[0])
              + (b[0] ** 2 + b[1] ** 2) * (a[0] - c[0])
              + (c[0] ** 2 + c[1] ** 2) * (b[0] - a[0])) / d
        r2 = (a[0] - ux) ** 2 + (a[1] - uy) ** 2
        if contains_all(ux, uy, r2) and (best is None or r2 < best):
            best = r2
    assume(best is not None and best > 0)
    mp = "MULTIPOINT (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"
    ga = wkt.parse_array([mp])
    circ = algos.minimum_bounding_circle(ga)
    got_r = algos.minimum_bounding_radius(ga)[0]
    want_r = math.sqrt(float(best))
    assert abs(got_r - want_r) < 1e-9 * max(1.0, want_r), \
        (mp, got_r, want_r)
    # the circle polygon's area is consistent with the radius
    got_area = algos.area(circ)[0]
    assert got_area <= math.pi * want_r ** 2 * (1 + 1e-9)


@settings(max_examples=100, deadline=None)
@given(st_.lists(st_.tuples(st_.integers(0, 40), st_.integers(0, 40)),
                 min_size=3, max_size=10, unique=True))
def test_minimum_rotated_rectangle_exact_optimality(pts):
    """Exact optimality oracle: the minimum-area enclosing rectangle
    has a side collinear with a convex-hull edge, and for each edge
    direction (dx, dy) the rectangle area is ((max-min proj) *
    (max-min perp)) / (dx^2+dy^2) — rational for integer sites.
    Enumerate all point-pair directions exactly; the engine's MRR area
    must equal the minimum."""
    import itertools
    P = [(Fr(x), Fr(y)) for (x, y) in pts]
    best = None
    for a, b in itertools.combinations(P, 2):
        dx, dy = b[0] - a[0], b[1] - a[1]
        if dx == 0 and dy == 0:
            continue
        proj = [x * dx + y * dy for (x, y) in P]
        perp = [-x * dy + y * dx for (x, y) in P]
        area = ((max(proj) - min(proj)) * (max(perp) - min(perp))
                / (dx * dx + dy * dy))
        if best is None or area < best:
            best = area
    assume(best is not None and best > 0)
    mp = "MULTIPOINT (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"
    ga = wkt.parse_array([mp])
    mrr = algos.minimum_rotated_rectangle(ga)
    got = algos.area(mrr)[0]
    assert abs(got - float(best)) < 1e-6 * max(1.0, float(best)), \
        (mp, got, float(best))


@pytest.mark.parametrize("predicate", ["intersects", "within",
                                       "overlaps", "touches"])
def test_sjoin_operator_star_polygons_match_exact_oracle(spark, predicate):
    """Operator-level sjoin (grid AND broadcast strategies) over two
    layers of star polygons: the returned pair set must equal the
    brute-force pair set derived from the exact DE-9IM oracle —
    including degenerate contact (touches/overlaps) the float grid
    candidate path has to refine correctly."""
    import random
    from geopandas_spark import st
    from geopandas_spark.operators import sjoin

    rnd = random.Random(777 + len(predicate))
    A = [_rng_star(rnd, 0, 18, 4, 7) for _ in range(10)]
    B = [_rng_star(rnd, 3, 21, 4, 7) for _ in range(10)]

    want = set()
    for i, ra in enumerate(A):
        for j, rb in enumerate(B):
            m, _ = exact_de9im([ra], [rb])
            ii, ib, ie, bi, bb, be, ei, eb, _ee = m
            disjoint = (ii == "F" and ib == "F" and bi == "F"
                        and bb == "F")
            ok = {
                "intersects": not disjoint,
                "within": ii != "F" and ie == "F" and be == "F",
                "overlaps": ii == "2" and ie == "2" and ei == "2",
                "touches": (not disjoint) and ii == "F",
            }[predicate]
            if ok:
                want.add((i, j))

    dfa = spark.createDataFrame(
        [(i, _poly_wkt([r])) for i, r in enumerate(A)], ["ida", "wkt"]) \
        .select("ida", st.geom_from_text("wkt").alias("geom"))
    dfb = spark.createDataFrame(
        [(j, _poly_wkt([r])) for j, r in enumerate(B)], ["idb", "wkt"]) \
        .select("idb", st.geom_from_text("wkt").alias("geom"))
    for strategy in ("broadcast", "grid"):
        out = sjoin(dfa, dfb, predicate=predicate, strategy=strategy)
        got = {(r.ida, r.idb) for r in out.select("ida", "idb").collect()}
        assert got == want, (predicate, strategy,
                             sorted(got - want), sorted(want - got))


@settings(max_examples=120, deadline=None)
@given(st_.lists(st_.tuples(st_.integers(0, 50), st_.integers(0, 50)),
                 min_size=3, max_size=14, unique=True))
def test_convex_hull_exact_vertex_set(pts):
    """Engine convex hull vs an exact Andrew monotone chain in integer
    arithmetic: identical vertex SETS (collinear boundary points are
    not hull vertices in GEOS's strict hull)."""
    P = sorted(pts)

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(P)
    upper = half(P[::-1])
    hull = lower[:-1] + upper[:-1]
    assume(len(hull) >= 3)
    mp = "MULTIPOINT (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"
    ga = wkt.parse_array([mp])
    got = algos.convex_hull(ga)
    ring = got.geom_slices(0)[0][0]
    got_set = {(float(x), float(y)) for x, y in ring[:-1]}
    want_set = {(float(x), float(y)) for x, y in hull}
    assert got_set == want_set, (mp, sorted(got_set), sorted(want_set))


def _seg_seg_dist2(p, q, r, s):
    """Exact-rational squared distance between two segments (both as
    Fraction pairs): min over the 4 point-segment distances and 0 if
    they intersect."""
    def pt_seg(a, p0, p1):
        d = (p1[0] - p0[0], p1[1] - p0[1])
        L2 = d[0] * d[0] + d[1] * d[1]
        if L2 == 0:
            dx, dy = a[0] - p0[0], a[1] - p0[1]
            return dx * dx + dy * dy
        t = ((a[0] - p0[0]) * d[0] + (a[1] - p0[1]) * d[1]) / L2
        t = max(Fr(0), min(Fr(1), t))
        cx, cy = p0[0] + t * d[0], p0[1] + t * d[1]
        dx, dy = a[0] - cx, a[1] - cy
        return dx * dx + dy * dy

    tu = _seg_params((p, q), (r, s))
    if tu is not None:
        t, u = tu
        if 0 <= t <= 1 and 0 <= u <= 1:
            return Fr(0)
    elif _collinear_overlap((p, q), (r, s)) is not None:
        return Fr(0)
    return min(pt_seg(p, r, s), pt_seg(q, r, s),
               pt_seg(r, p, q), pt_seg(s, p, q))


def _poly_poly_dist2(ra, rb):
    """Exact squared distance between two polygons' CLOSED regions:
    0 if they intersect (exact DE-9IM), else min segment-pair d2."""
    m, _ = exact_de9im([ra], [rb])
    if not (m[0] == "F" and m[1] == "F" and m[3] == "F" and m[4] == "F"):
        return Fr(0)
    sa, sb = _ring_segments([ra]), _ring_segments([rb])
    return min(_seg_seg_dist2(p, q, r, s)
               for (p, q) in sa for (r, s) in sb)


def test_sjoin_nearest_operator_star_polygons_exact(spark):
    """sjoin_nearest (broadcast + grid) over star-polygon layers: each
    left row's matched partner set must be exactly the argmin of the
    exact rational squared distances (ties keep ALL co-nearest rows,
    reference sjoin_nearest semantics), and the reported distance must
    match sqrt(exact d2)."""
    import random
    from geopandas_spark import st
    from geopandas_spark.operators.sjoin import sjoin_nearest

    rnd = random.Random(5150)
    A = [_rng_star(rnd, 0, 12, 4, 7) for _ in range(8)]
    B = [_rng_star(rnd, 14, 30, 4, 7) for _ in range(8)]

    want = {}
    for i, ra in enumerate(A):
        d2s = [_poly_poly_dist2(ra, rb) for rb in B]
        mn = min(d2s)
        want[i] = ({j for j, d in enumerate(d2s) if d == mn},
                   math.sqrt(float(mn)))

    dfa = spark.createDataFrame(
        [(i, _poly_wkt([r])) for i, r in enumerate(A)], ["ida", "wkt"]) \
        .select("ida", st.geom_from_text("wkt").alias("geom"))
    dfb = spark.createDataFrame(
        [(j, _poly_wkt([r])) for j, r in enumerate(B)], ["idb", "wkt"]) \
        .select("idb", st.geom_from_text("wkt").alias("geom"))
    for strategy in ("broadcast", "grid"):
        out = sjoin_nearest(dfa, dfb, distance_col="d",
                            strategy=strategy) \
            .select("ida", "idb", "d").collect()
        got = {}
        for r in out:
            got.setdefault(r.ida, set()).add(r.idb)
            assert abs(r.d - want[r.ida][1]) < 1e-9 * max(1.0,
                                                          want[r.ida][1]), \
                (strategy, r.ida, r.idb, r.d, want[r.ida][1])
        for i in want:
            assert got.get(i) == want[i][0], (strategy, i, got.get(i),
                                              want[i][0])


@pytest.mark.parametrize("level", [1, 2, 3, 5, 6])
def test_hilbert_curve_bijection_and_unit_steps(level):
    """Defining properties of the Hilbert curve, exactly: on the
    2^level grid, xy->d is a bijection onto 0..4^level-1 and
    consecutive d values are Manhattan-adjacent cells (the locality
    guarantee the spatial partitioner and the geoparquet clustered
    write rely on)."""
    from geopandas_spark.geom.algos import hilbert_xy_to_d
    side = 2 ** level
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    d = hilbert_xy_to_d(xs.ravel().astype(np.int64),
                        ys.ravel().astype(np.int64), level)
    n = side * side
    assert sorted(d.tolist()) == list(range(n))
    order = np.argsort(d)
    ox, oy = xs.ravel()[order], ys.ravel()[order]
    steps = np.abs(np.diff(ox)) + np.abs(np.diff(oy))
    assert (steps == 1).all(), \
        (level, int((steps != 1).sum()), "non-unit steps")


@settings(max_examples=60, deadline=None)
@given(chaos_ring(lo=0, hi=14, nmin=4, nmax=7),
       chaos_ring(lo=2, hi=12, nmin=3, nmax=6),
       chaos_ring(lo=1, hi=13, nmin=3, nmax=6))
def test_make_valid_linework_three_rings_even_odd_oracle(r1, r2, r3):
    """Three chaotic rings: linework area = exact XOR-of-parities mass
    over the combined arrangement (deeper nesting forests than any
    two-ring case can produce)."""
    ga = wkt.parse_array([_poly_wkt([r1, r2, r3])])
    fixed = algos.make_valid(ga, method="linework")
    got = algos.area(fixed)[0]
    gaps, masks = _slab_parity_masks([[r1], [r2], [r3]])
    want = float(sum(a for g, a in gaps.items()
                     if (masks[0][g] + masks[1][g] + masks[2][g]) % 2))
    assert abs(got - want) < 1e-6 * max(1.0, want), \
        (_poly_wkt([r1, r2, r3]), got, want)
    assert got == 0.0 or bool(algos.is_valid(fixed)[0]), \
        (_poly_wkt([r1, r2, r3]), wkt.format_array(fixed)[0],
         algos.is_valid_reason(fixed)[0])


@settings(max_examples=120, deadline=None)
@given(star_ring(lo=0, hi=16, nmin=4, nmax=8), st_.data())
def test_setops_clip_edge_through_subject_vertex_exact(ra, data):
    """Targeted degeneracy: the clip triangle has an edge whose LINE
    passes exactly through a subject vertex — the configuration whose
    ulp-off parametric split broke sweep-status ordering and silently
    dropped whole DIFFERENCE/UNION regions (r10 find, now endpoint-
    snapped). All four set-op areas vs the exact oracle."""
    v = ra[data.draw(st_.integers(0, len(ra) - 2))]
    dx = data.draw(st_.integers(-4, 4))
    dy = data.draw(st_.integers(-4, 4))
    assume(dx != 0 or dy != 0)
    k1 = data.draw(st_.integers(1, 3))
    k2 = data.draw(st_.integers(1, 3))
    p1 = (v[0] - k1 * dx, v[1] - k1 * dy)
    p2 = (v[0] + k2 * dx, v[1] + k2 * dy)
    p3 = (p1[0] + data.draw(st_.integers(-8, 8)),
          p1[1] + data.draw(st_.integers(-8, 8)))
    tw = ((p2[0] - p1[0]) * (p3[1] - p1[1])
          - (p2[1] - p1[1]) * (p3[0] - p1[0]))
    assume(tw != 0)
    rb = [p1, p2, p3, p1]
    _, (A, B, I) = exact_de9im([ra], [rb])
    ga = wkt.parse_array([_poly_wkt([ra])])
    gb = wkt.parse_array([_poly_wkt([rb])])
    for name, got, want in (
            ("I", algos.area(algos.intersection(ga, gb))[0], float(I)),
            ("U", algos.area(algos.union(ga, gb))[0], float(A + B - I)),
            ("D", algos.area(algos.difference(ga, gb))[0], float(A - I)),
            ("X", algos.area(algos.symmetric_difference(ga, gb))[0],
             float(A + B - 2 * I))):
        assert abs(got - want) < 1e-6, \
            (name, _poly_wkt([ra]), _poly_wkt([rb]), got, want)


@settings(max_examples=80, deadline=None)
@given(chaos_ring(lo=0, hi=12, nmin=3, nmax=8),
       chaos_ring(lo=1, hi=12, nmin=3, nmax=8))
def test_repair_then_setops_pipeline_exact(ra, rb):
    """End-to-end repair → boolean pipeline: make_valid(linework) each
    chaotic ring, then all four set ops between the repaired
    geometries must match the exact even-odd oracle of the ORIGINAL
    rings (linework preserves the even-odd region, so the pipeline
    composes). This is the documented caller contract for
    clipping.boolean_op: rings individually simple — raw
    self-intersecting operands are undefined there, as for GEOS."""
    ga = algos.make_valid(wkt.parse_array([_poly_wkt([ra])]),
                          method="linework")
    gb = algos.make_valid(wkt.parse_array([_poly_wkt([rb])]),
                          method="linework")
    _, (A, B, I) = exact_de9im([ra], [rb])
    assume(A > 0 and B > 0)
    for name, got, want in (
            ("I", algos.area(algos.intersection(ga, gb))[0], float(I)),
            ("U", algos.area(algos.union(ga, gb))[0], float(A + B - I)),
            ("D", algos.area(algos.difference(ga, gb))[0], float(A - I)),
            ("X", algos.area(algos.symmetric_difference(ga, gb))[0],
             float(A + B - 2 * I))):
        assert abs(got - want) < 1e-6 * max(1.0, want), \
            (name, _poly_wkt([ra]), _poly_wkt([rb]), got, want)


def test_exact_oracle_self_check_unit_boxes():
    """Sanity anchors for the oracle itself (disjoint / touch / overlap
    / nested / equal boxes with known matrices and areas)."""
    box = lambda x, y, w, h: [(x, y), (x + w, y), (x + w, y + h),
                              (x, y + h), (x, y)]
    m, (A, B, I) = exact_de9im([box(0, 0, 2, 2)], [box(5, 5, 2, 2)])
    assert m == "FF2FF1212" and I == 0 and A == 4 and B == 4
    m, (_, _, I) = exact_de9im([box(0, 0, 2, 2)], [box(2, 0, 2, 2)])
    assert m == "FF2F11212" and I == 0
    m, (_, _, I) = exact_de9im([box(0, 0, 2, 2)], [box(1, 1, 2, 2)])
    assert m == "212101212" and I == 1
    m, (_, _, I) = exact_de9im([box(0, 0, 4, 4)], [box(1, 1, 2, 2)])
    assert m == "212FF1FF2" and I == 4
    m, (_, _, I) = exact_de9im([box(0, 0, 2, 2)], [box(0, 0, 2, 2)])
    assert m == "2FFF1FFF2" and I == 4
    # corner touch
    m, (_, _, I) = exact_de9im([box(0, 0, 2, 2)], [box(2, 2, 2, 2)])
    assert m == "FF2F01212" and I == 0


def test_boolean_op_ulp_twin_vertex_weld():
    """Regression: a subject vertex a couple of ulps from the clip-box
    corner, on an edge collinear with the box bottom, used to corrupt
    the sweep status (the endpoint snap treated the twin points as one
    while the exact comparators kept them distinct), making INTERSECTION
    return empty for BOTH bbox halves of a concave polygon (r13
    subdivide fuzz find, seed 22732). The pre-sweep ulp-twin weld must
    restore the crossing."""
    from geopandas_spark.geom import clipping

    tri = [(8.417, 15.5), (12.999999999999998, 15.5), (17.0, 22.0)]
    box = [(6.0, 15.5), (13.0, 15.5), (13.0, 27.0), (6.0, 27.0)]
    out = clipping.boolean_op([np.array(tri)], [np.array(box)],
                              clipping.INTERSECTION)
    got = 0.0
    for poly in out:
        for ring in poly:
            r = np.asarray(ring)
            x, y = r[:, 0], r[:, 1]
            got += 0.5 * abs(np.dot(x, np.roll(y, -1)) -
                             np.dot(y, np.roll(x, -1)))
    # exact clipped area: triangle cut by x<=13 (vertex is ~at 13)
    want = 7.953237708
    assert abs(got - want) < 1e-6, (got, want)
    # and subdivide of the original fuzz star must preserve area:
    # both bbox halves of the triangle tile it exactly.
    lo = clipping.boolean_op(
        [np.array(tri)],
        [np.array([(6.0, 15.5), (13.0, 15.5), (13.0, 27.0), (6.0, 27.0)])],
        clipping.INTERSECTION)
    hi = clipping.boolean_op(
        [np.array(tri)],
        [np.array([(13.0, 15.5), (17.5, 15.5), (17.5, 27.0), (13.0, 27.0)])],
        clipping.INTERSECTION)
    tot = 0.0
    for polys in (lo, hi):
        for poly in polys:
            for ring in poly:
                r = np.asarray(ring)
                x, y = r[:, 0], r[:, 1]
                tot += 0.5 * abs(np.dot(x, np.roll(y, -1)) -
                                 np.dot(y, np.roll(x, -1)))
    tri_area = 0.5 * abs((12.999999999999998 - 8.417) * (22.0 - 15.5))
    assert abs(tot - tri_area) < 1e-6, (tot, tri_area)


def test_is_valid_endpoint_vertex_gemv_ulp_guard():
    """r14 fuzz find: a ring vertex bit-equal to an edge ENDPOINT must not
    read as a T-touch. _ring_vertex_on_edge computes the parametric t as
    (w @ d) / (d @ d); for the closing edge of triangle
    (0.8 0.8, 0 0, 4 0) the BLAS gemv numerator and the dot-product
    denominator round the same exact value differently, so t landed one
    ulp inside (0, 1) and the valid triangle flunked is_valid — and
    make_valid(linework)'s own bowtie output was declared invalid."""
    tri = wkt.parse_array(["POLYGON ((0.8 0.8, 0 0, 4 0, 0.8 0.8))"])
    assert bool(algos.is_valid(tri)[0]), algos.is_valid_reason(tri)[0]
    # the full bowtie repair that surfaced it
    ga = wkt.parse_array(["POLYGON ((4 0, 0 0, 1 1, 0 1, 4 0))"])
    fixed = algos.make_valid(ga, method="linework")
    assert bool(algos.is_valid(fixed)[0]), algos.is_valid_reason(fixed)[0]
    # guard must not weaken the T-touch detection: vertex (2,2) revisits
    # the interior of no edge here, but (2,0) sits strictly inside
    # (0 0)-(4 0) on the spike retrace ring
    bad = wkt.parse_array(
        ["POLYGON ((0 0, 2 0, 2 2, 2 0, 4 0, 4 4, 0 4, 0 0))"])
    assert not bool(algos.is_valid(bad)[0])
