"""Metamorphic referee for DE-9IM on GEOMETRYCOLLECTION operands
(r12, VERDICT r11 #6a — `_relate_gc_pointwise` had no independent
check).

The pointwise set-op assembly must agree with the natively-computed
matrices on every input where a GC is semantically equal to a plain
geometry:

* singleton collapse — relate(GC(X), Y) == relate(X, Y);
* homogeneous collapse — relate(GC(X1..Xk), Y) == relate(MULTI(X1..Xk),
  Y) for disjoint single-type children (a valid multi-geometry);
* transpose symmetry — relate(A, B) is the matrix transpose of
  relate(B, A), GC on either or both sides.

The native (non-GC) matrices are themselves refereed by the exact
rational slab oracle (test_exact_arrangement.py), so agreement here
extends that referee to the GC path.
"""

import numpy as np
import pytest

from geopandas_spark.geom import algos, wkt


def _rand_poly(rng, cx, cy, r=2.5):
    k = int(rng.integers(3, 8))
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    rad = rng.uniform(0.8, r, k)
    xs = cx + rad * np.cos(ang)
    ys = cy + rad * np.sin(ang)
    pts = ", ".join(f"{x:.4f} {y:.4f}" for x, y in zip(xs, ys))
    return f"(({pts}, {xs[0]:.4f} {ys[0]:.4f}))"


def _rand_line(rng, cx, cy):
    k = int(rng.integers(2, 5))
    xs = cx + rng.uniform(-3, 3, k)
    ys = cy + rng.uniform(-3, 3, k)
    return "(" + ", ".join(f"{x:.4f} {y:.4f}"
                           for x, y in zip(xs, ys)) + ")"


def _partner(rng):
    u = rng.random()
    c = rng.uniform(2, 10, 2)
    if u < 0.34:
        return f"POINT ({c[0]:.4f} {c[1]:.4f})"
    if u < 0.67:
        return "LINESTRING " + _rand_line(rng, *c)
    return "POLYGON " + _rand_poly(rng, *c)


def _transpose(m):
    order = [0, 3, 6, 1, 4, 7, 2, 5, 8]
    return "".join(m[i] for i in order)


def _rel(wa, wb):
    return algos.relate(wkt.parse_array([wa]), wkt.parse_array([wb]))[0]


class TestRelateGCSingleton:
    def test_singleton_gc_equals_bare_child(self):
        rng = np.random.default_rng(42)
        for _ in range(60):
            child = _partner(rng)
            other = _partner(rng)
            want = _rel(child, other)
            got = _rel(f"GEOMETRYCOLLECTION ({child})", other)
            assert got == want, (child, other)
            # and on the right-hand side
            got_r = _rel(other, f"GEOMETRYCOLLECTION ({child})")
            assert got_r == _rel(other, child), (child, other)

    def test_transpose_symmetry_gc(self):
        rng = np.random.default_rng(7)
        for _ in range(40):
            a = f"GEOMETRYCOLLECTION ({_partner(rng)}, {_partner(rng)})"
            b = _partner(rng)
            assert _rel(a, b) == _transpose(_rel(b, a)), (a, b)
        # GC on both sides
        for _ in range(20):
            a = f"GEOMETRYCOLLECTION ({_partner(rng)})"
            b = f"GEOMETRYCOLLECTION ({_partner(rng)}, {_partner(rng)})"
            assert _rel(a, b) == _transpose(_rel(b, a)), (a, b)


class TestRelateGCHomogeneous:
    def test_disjoint_polygon_children_collapse_to_multipolygon(self):
        rng = np.random.default_rng(11)
        for _ in range(30):
            # two polygons in disjoint 6-wide cells -> valid multipolygon
            pa = _rand_poly(rng, 3, 3)
            pb = _rand_poly(rng, 13, 3)
            other = _partner(rng)
            gc = (f"GEOMETRYCOLLECTION (POLYGON {pa}, POLYGON {pb})")
            mp = f"MULTIPOLYGON ({pa}, {pb})"
            assert _rel(gc, other) == _rel(mp, other), (gc, other)

    def test_disjoint_line_children_collapse_to_multilinestring(self):
        rng = np.random.default_rng(13)
        for _ in range(30):
            la = _rand_line(rng, 3, 3)
            lb = _rand_line(rng, 30, 3)
            other = _partner(rng)
            gc = (f"GEOMETRYCOLLECTION (LINESTRING {la}, "
                  f"LINESTRING {lb})")
            ml = f"MULTILINESTRING ({la}, {lb})"
            assert _rel(gc, other) == _rel(ml, other), (gc, other)

    def test_point_children_collapse_to_multipoint(self):
        rng = np.random.default_rng(17)
        for _ in range(30):
            a = rng.uniform(0, 10, 2)
            b = rng.uniform(0, 10, 2)
            if np.allclose(a, b):
                continue
            other = _partner(rng)
            gc = (f"GEOMETRYCOLLECTION (POINT ({a[0]:.4f} {a[1]:.4f}), "
                  f"POINT ({b[0]:.4f} {b[1]:.4f}))")
            mp = (f"MULTIPOINT (({a[0]:.4f} {a[1]:.4f}), "
                  f"({b[0]:.4f} {b[1]:.4f}))")
            assert _rel(gc, other) == _rel(mp, other), (gc, other)


class TestRelateGCPinnedCases:
    @pytest.mark.parametrize("a,b,want", [
        # point inside a GC's polygon child
        ("GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)))",
         "POINT (2 2)", "0F2FF1FF2"),
        # mixed-dimension GC vs crossing line
        ("GEOMETRYCOLLECTION (POINT (10 10), "
         "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)))",
         "LINESTRING (-1 2, 5 2)", "1F20F1102"),
    ])
    def test_pinned(self, a, b, want):
        got = _rel(a, b)
        assert got == want, got
