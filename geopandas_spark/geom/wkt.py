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
    GT_MULTILINESTRING, GT_MULTIPOLYGON, GT_GEOMETRYCOLLECTION,
    WKT_TYPE_NAMES, GeometryArray, GeometryBuilder,
)

_TYPE_BY_NAME = {v: k for k, v in WKT_TYPE_NAMES.items()}
_NUM = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")
_HEAD = re.compile(r"\s*([A-Za-z]+)\s*(ZM|Z|M)?\s*(EMPTY)?\s*", re.IGNORECASE)


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_coords(arr) -> str:
    return ", ".join(" ".join(_fmt(v) for v in pt) for pt in arr)


def _format_plain(t: int, parts) -> str:
    """One 2-D geometry from nested parts (GC child formatter)."""
    name = WKT_TYPE_NAMES[t]
    if not parts or (t == GT_POINT and len(parts[0][0]) == 0):
        return f"{name} EMPTY"
    if t in (GT_POINT, GT_LINESTRING):
        return f"{name} ({_fmt_coords(parts[0][0])})"
    if t == GT_POLYGON:
        return f"{name} (" + ", ".join(
            f"({_fmt_coords(r)})" for r in parts[0]) + ")"
    if t == GT_MULTIPOINT:
        return f"{name} (" + ", ".join(
            f"({_fmt_coords(p[0])})" for p in parts) + ")"
    if t == GT_MULTILINESTRING:
        return f"{name} (" + ", ".join(
            f"({_fmt_coords(p[0])})" for p in parts) + ")"
    return f"{name} (" + ", ".join(
        "(" + ", ".join(f"({_fmt_coords(r)})" for r in p) + ")"
        for p in parts) + ")"


def format_one(ga: GeometryArray, i: int):
    t = int(ga.types[i])
    if t == GT_MISSING:
        return None
    name = WKT_TYPE_NAMES[t]
    if t == GT_GEOMETRYCOLLECTION:
        children = ga.children_of(i)
        if not children:
            return f"{name} EMPTY"
        return f"{name} (" + ", ".join(
            _format_plain(ct, cparts) for ct, cparts in children) + ")"
    parts = ga.geom_slices(i)
    zs = ga.dim_slice(ga.z, i) if ga.z is not None else None
    ms = ga.dim_slice(ga.m, i) if ga.m is not None else None
    if zs is not None or ms is not None:
        tag = ("Z" if zs is not None else "") + ("M" if ms is not None else "")
        name = f"{name} {tag}"
        pos = 0
        wparts = []
        for p in parts:
            wr = []
            for ring in p:
                k = len(ring)
                cols = [ring]
                if zs is not None:
                    cols.append(zs[pos:pos + k, None])
                if ms is not None:
                    cols.append(ms[pos:pos + k, None])
                wr.append(np.hstack(cols))
                pos += k
            wparts.append(wr)
        parts = wparts
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
    """Parse '(' x y [z] [m], ... ')' → (k, width) array; Z/M kept."""
    c.expect("(")
    pts = []
    while True:
        vals = [c.number(), c.number()]
        while c.peek() not in ",)":
            vals.append(c.number())
        pts.append(vals)
        if c.peek() == ",":
            c.expect(",")
            continue
        break
    c.expect(")")
    w = max(len(p) for p in pts)
    if any(len(p) != w for p in pts):
        pts = [p + [np.nan] * (w - len(p)) for p in pts]
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
    c = _Cursor(s)
    _parse_geom(c, builder)


def _parse_geom(c: _Cursor, builder: GeometryBuilder):
    """Parse one geometry at the cursor (recursive for collections)."""
    s = c.s
    m = _HEAD.match(s, c.pos)
    if not m:
        raise ValueError(f"invalid WKT: {s[c.pos:c.pos + 80]!r}")
    name = m.group(1).upper()
    if name not in _TYPE_BY_NAME:
        raise ValueError(f"unsupported WKT type {name!r}")
    t = _TYPE_BY_NAME[name]
    tag = (m.group(2) or "").upper()
    dim = 2 + len(tag)
    c.pos = m.end(2) if m.group(2) else m.end(1)
    if m.group(3):  # EMPTY
        c.pos = m.end(3)
        builder.append_empty(t)
        return
    if t == GT_GEOMETRYCOLLECTION:
        c.expect("(")
        sub = GeometryBuilder()
        while True:
            _parse_geom(c, sub)
            if c.peek() == ",":
                c.expect(",")
                continue
            break
        c.expect(")")
        ga = sub.finish()
        children = []
        for i in range(len(ga)):
            children.extend(ga.children_of(i))
        if not children:
            builder.append_empty(t)
        else:
            builder.append_collection(children)
        return

    def _zm_of(width: int) -> str:
        """Z/M layout: explicit tag wins; bare width 3 → Z, 4 → ZM."""
        if tag:
            return tag.lower() if width >= dim else ""
        return {3: "z", 4: "zm"}.get(width, "")

    def _append_parts(parts):
        widths = {r.shape[1] for rings in parts for r in rings}
        w = max(widths)
        zm = _zm_of(w)
        # malformed WKT with mixed ring widths degrades the whole row to
        # 2-D (rows are uniformly dimensioned; zero-padding would invent
        # Z=0 coordinate values that were never in the input)
        if len(zm) + 2 < w or len(widths) > 1:
            parts = [[r[:, :2] for r in rings] for rings in parts]
            zm = ""
        builder.append(t, parts, zm=zm)

    if t == GT_POINT:
        pts = _parse_coord_seq(c, dim)
        w = pts.shape[1]
        zm = _zm_of(w)
        builder.append_point(
            pts[0, 0], pts[0, 1],
            z=pts[0, 2] if "z" in zm else None,
            m=pts[0, 2 + ("z" in zm)] if "m" in zm and w > 2 + ("z" in zm)
            else None)
    elif t == GT_LINESTRING:
        _append_parts([[_parse_coord_seq(c, dim)]])
    elif t == GT_POLYGON:
        _append_parts([_parse_rings(c, dim)])
    elif t == GT_MULTIPOINT:
        c.expect("(")
        parts = []
        while True:
            if c.peek() == "(":
                parts.append([_parse_coord_seq(c, dim)])
            else:  # bare "x y [z [m]]" form
                vals = [c.number(), c.number()]
                while c.peek() not in ",)":
                    vals.append(c.number())
                parts.append([np.array([vals])])
            if c.peek() == ",":
                c.expect(",")
                continue
            break
        c.expect(")")
        _append_parts(parts)
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
        _append_parts(parts)
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
        _append_parts(parts)
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
