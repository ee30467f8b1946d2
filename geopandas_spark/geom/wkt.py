"""WKT codec: text ⇄ GeometryArray.

Output formatting matches shapely 2.x / GEOS ``trim=True`` behavior for the
values we produce: integral doubles print without a decimal point
("POINT (3 7)"), other values print with the shortest round-trip repr.
(reference ingest path: geopandas/array.py:255-290 from_wkt/to_wkt.)
"""

from __future__ import annotations

import re
import numpy as np

from geopandas_spark.geom.array import (
    GT_MISSING, GT_POINT, GT_LINESTRING, GT_POLYGON, GT_MULTIPOINT,
    GT_MULTILINESTRING, GT_MULTIPOLYGON, WKT_TYPE_NAMES,
    GeometryArray, GeometryBuilder,
)

_TYPE_BY_NAME = {v: k for k, v in WKT_TYPE_NAMES.items()}
_NUM = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")
_HEAD = re.compile(r"\s*([A-Za-z]+)\s*(Z|M|ZM)?\s*(EMPTY)?\s*", re.IGNORECASE)


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_coords(arr) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in arr)


def format_one(ga: GeometryArray, i: int):
    t = int(ga.types[i])
    if t == GT_MISSING:
        return None
    name = WKT_TYPE_NAMES[t]
    parts = ga.geom_slices(i)
    if not parts or (t == GT_POINT and len(parts[0][0]) == 0):
        return f"{name} EMPTY"
    if t == GT_POINT:
        return f"{name} ({_fmt_coords(parts[0][0])})"
    if t == GT_LINESTRING:
        return f"{name} ({_fmt_coords(parts[0][0])})"
    if t == GT_POLYGON:
        rings = ", ".join(f"({_fmt_coords(r)})" for r in parts[0])
        return f"{name} ({rings})"
    if t == GT_MULTIPOINT:
        pts = ", ".join(f"({_fmt_coords(p[0])})" for p in parts)
        return f"{name} ({pts})"
    if t == GT_MULTILINESTRING:
        ls = ", ".join(f"({_fmt_coords(p[0])})" for p in parts)
        return f"{name} ({ls})"
    if t == GT_MULTIPOLYGON:
        polys = ", ".join(
            "(" + ", ".join(f"({_fmt_coords(r)})" for r in p) + ")" for p in parts)
        return f"{name} ({polys})"
    raise ValueError(f"cannot format geometry type {t}")


def format_array(ga: GeometryArray) -> list:
    return [format_one(ga, i) for i in range(len(ga))]


class _Cursor:
    __slots__ = ("s", "pos")

    def __init__(self, s):
        self.s = s
        self.pos = 0

    def skip_ws(self):
        while self.pos < len(self.s) and self.s[self.pos] in " \t\n\r":
            self.pos += 1

    def expect(self, ch):
        self.skip_ws()
        if self.pos >= len(self.s) or self.s[self.pos] != ch:
            raise ValueError(f"WKT parse error at {self.pos}: expected {ch!r} "
                             f"in {self.s[:80]!r}")
        self.pos += 1

    def peek(self):
        self.skip_ws()
        return self.s[self.pos] if self.pos < len(self.s) else ""

    def number(self):
        self.skip_ws()
        m = _NUM.match(self.s, self.pos)
        if not m:
            raise ValueError(f"WKT parse error at {self.pos}: expected number")
        self.pos = m.end()
        return float(m.group(0))


def _parse_coord_seq(c: _Cursor, dim: int):
    """Parse '(' x y, x y, ... ')' → (k,2) array (extra dims dropped)."""
    c.expect("(")
    pts = []
    while True:
        vals = [c.number(), c.number()]
        # optional Z/M values
        while c.peek() not in ",)":
            c.number()
        pts.append(vals)
        if c.peek() == ",":
            c.expect(",")
            continue
        break
    c.expect(")")
    return np.array(pts, dtype=np.float64)


def _parse_rings(c: _Cursor, dim: int):
    c.expect("(")
    rings = []
    while True:
        rings.append(_parse_coord_seq(c, dim))
        if c.peek() == ",":
            c.expect(",")
            continue
        break
    c.expect(")")
    return rings


def parse_one(s: str, builder: GeometryBuilder):
    m = _HEAD.match(s)
    if not m:
        raise ValueError(f"invalid WKT: {s[:80]!r}")
    name = m.group(1).upper()
    if name not in _TYPE_BY_NAME:
        raise ValueError(f"unsupported WKT type {name!r}")
    t = _TYPE_BY_NAME[name]
    dim = 2 + (len(m.group(2) or ""))
    c = _Cursor(s)
    c.pos = m.end(2) if m.group(2) else m.end(1)
    if m.group(3):  # EMPTY
        builder.append_empty(t)
        return
    if t == GT_POINT:
        pts = _parse_coord_seq(c, dim)
        builder.append_point(pts[0, 0], pts[0, 1])
    elif t == GT_LINESTRING:
        builder.append(t, [[_parse_coord_seq(c, dim)]])
    elif t == GT_POLYGON:
        builder.append(t, [_parse_rings(c, dim)])
    elif t == GT_MULTIPOINT:
        c.expect("(")
        parts = []
        while True:
            if c.peek() == "(":
                parts.append([_parse_coord_seq(c, dim)])
            else:  # bare "x y" form
                x, y = c.number(), c.number()
                parts.append([np.array([[x, y]])])
            if c.peek() == ",":
                c.expect(",")
                continue
            break
        c.expect(")")
        builder.append(t, parts)
    elif t == GT_MULTILINESTRING:
        c.expect("(")
        parts = []
        while True:
            parts.append([_parse_coord_seq(c, dim)])
            if c.peek() == ",":
                c.expect(",")
                continue
            break
        c.expect(")")
        builder.append(t, parts)
    elif t == GT_MULTIPOLYGON:
        c.expect("(")
        parts = []
        while True:
            parts.append(_parse_rings(c, dim))
            if c.peek() == ",":
                c.expect(",")
                continue
            break
        c.expect(")")
        builder.append(t, parts)
    else:
        raise NotImplementedError(f"WKT type {name} not supported")


def parse_array(values) -> GeometryArray:
    b = GeometryBuilder()
    for v in values:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            b.append_null()
        else:
            parse_one(str(v), b)
    return b.finish()
