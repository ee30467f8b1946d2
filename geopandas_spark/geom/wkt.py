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

    def _check_rings(rings):
        """GEOS WKT-reader parity (r12 malformed-input fuzz): polygon
        rings must close and carry >= 4 points — the kernel's ring
        kernels assume closure (ring[:-1] bodies), so silently
        accepting an open ring corrupts areas instead of failing the
        ingest actionably."""
        for ring in rings:
            if len(ring) < 4:
                raise ValueError(
                    f"WKT polygon ring must have >= 4 points, got "
                    f"{len(ring)} in {s[:80]!r}")
            if ring[0][0] != ring[-1][0] or ring[0][1] != ring[-1][1]:
                raise ValueError(
                    f"WKT polygon ring is not closed (starts "
                    f"{ring[0][:2].tolist()}, ends "
                    f"{ring[-1][:2].tolist()}) in {s[:80]!r}")

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
        rings = _parse_rings(c, dim)
        _check_rings(rings)
        _append_parts([rings])
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
            rings = _parse_rings(c, dim)
            _check_rings(rings)
            parts.append(rings)
            if c.peek() == ",":
                c.expect(",")
                continue
            break
        c.expect(")")
        _append_parts(parts)
    else:
        raise NotImplementedError(f"WKT type {name} not supported")


# ---------------------------------------------------------------------------
# Vectorized batch fast path (r12): the cursor parser costs ~14 µs/row —
# fine for odd rows, ruinous for WKT ingest at scale (a 60M-row text
# import would spend 500+ core-seconds in _Cursor.number). The fast path
# parses a WHOLE batch with ~20 numpy passes over one concatenated byte
# blob: char-class masks find number tokens, one np.fromstring call
# converts every coordinate, and paren-depth prefix sums recover the
# ring/part structure. It is ALL-OR-NOTHING per batch: any row that is
# null-free-unrepresentable (Z/M tags, EMPTY, MULTIPOINT's two spellings,
# GEOMETRYCOLLECTION, stray characters, unbalanced parens, odd token
# counts, wrong nesting depth) bails the whole batch to the exact
# cursor parser, so semantics and ERROR MESSAGES are unchanged — the
# fast path only ever accepts inputs the slow parser would parse to the
# same geometry. ~20-40x per core on homogeneous batches.
# ---------------------------------------------------------------------------

_FAST_DEPTH = {GT_POINT: 1, GT_LINESTRING: 1, GT_POLYGON: 2,
               GT_MULTILINESTRING: 2, GT_MULTIPOLYGON: 3}

_NUMCHARS = np.zeros(256, dtype=bool)
for _c in b"0123456789.+-eE":
    _NUMCHARS[_c] = True
_BODYCHARS = _NUMCHARS.copy()
for _c in b" \t\r\n(),":
    _BODYCHARS[_c] = True
# letters for the stray-letter-in-body check — 'e'/'E' excluded (legal
# in scientific-notation numbers; a stray bare 'e' in the body still
# bails via the token-count/fromstring mismatch)
_LETTERS = np.zeros(256, dtype=bool)
for _c in range(65, 91):
    _LETTERS[_c] = True
    _LETTERS[_c + 32] = True
_LETTERS[0x45] = _LETTERS[0x65] = False
_FAST_NAMES = [(GT_POINT, b"POINT"), (GT_LINESTRING, b"LINESTRING"),
               (GT_POLYGON, b"POLYGON"),
               (GT_MULTILINESTRING, b"MULTILINESTRING"),
               (GT_MULTIPOLYGON, b"MULTIPOLYGON")]
# non-e/E letter count of each fast name, indexed by geometry type
_NAME_LETTERS = np.zeros(8, dtype=np.int64)
for _t, _nm in _FAST_NAMES:
    _NAME_LETTERS[_t] = sum(1 for _ch in _nm if _ch not in (0x45, 0x65))


def _parse_array_fast(values):
    """Vectorized parse of a whole batch; None → caller falls back."""
    n = len(values)
    strs = []
    for v in values:
        if isinstance(v, str):
            strs.append(v)
        elif v is None or (isinstance(v, float) and np.isnan(v)):
            strs.append("")
        else:
            strs.append(str(v))
    blob = "\n".join(strs)
    if not blob.isascii():
        return None
    arr = np.frombuffer(blob.encode("ascii"), dtype=np.uint8)
    lens = np.fromiter(map(len, strs), dtype=np.int64, count=n)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    live = lens > 0
    if not live.any() or len(arr) == 0:
        return None
    # --- vectorized header recognition (no per-row regex; the per-row
    # _HEAD.match loop alone cost 1.6 us/row) --- name = chars from the
    # row's first non-space to the last non-space before its first '('
    # — verified byte-exact (case-folded) against the five fast type
    # names, so Z/M/EMPTY tags, unknown names, or any letter outside a
    # name span fail the match or the letter-count check and fall back
    # to the cursor parser
    opos = np.nonzero(arr == 0x28)[0]
    oi = np.searchsorted(opos, starts)
    if (oi[live] >= len(opos)).any():
        return None                      # a live row without '('
    fo = np.zeros(n, dtype=np.int64)
    fo[live] = opos[np.minimum(oi, len(opos) - 1)][live]
    if ((fo > starts + lens) & live).any():
        return None                      # '(' belongs to a later row
    ns = starts.copy()
    top = len(arr) - 1
    for _ in range(24):                  # strip leading whitespace
        m_ = live & (ns < fo) & np.isin(arr[np.minimum(ns, top)],
                                        (0x20, 0x09))
        if not m_.any():
            break
        ns[m_] += 1
    ne = fo.copy()
    for _ in range(24):                  # strip whitespace before '('
        m_ = live & (ne > ns) & np.isin(arr[np.maximum(ne - 1, 0)],
                                        (0x20, 0x09))
        if not m_.any():
            break
        ne[m_] -= 1
    nl = np.where(live, ne - ns, 0)
    if (live & (nl <= 0)).any() or nl.max() > 24:
        return None
    types = np.zeros(n, dtype=np.uint8)
    matched = ~live
    for t, name in _FAST_NAMES:
        L = len(name)
        cand = np.nonzero(live & (nl == L))[0]
        if len(cand) == 0:
            continue
        g = arr[ns[cand, None] + np.arange(L)[None, :]]
        g = np.where((g >= 97) & (g <= 122), g - 32, g)   # case-fold
        ok = (g == np.frombuffer(name, dtype=np.uint8)[None, :]).all(axis=1)
        types[cand[ok]] = t
        matched[cand[ok]] = True
    if not matched.all():
        return None
    # every letter in the blob must sit inside a verified name span
    # (counted E-free on both sides: _LETTERS skips e/E)
    if int(_LETTERS[arr].sum()) != int(_NAME_LETTERS[types].sum()):
        return None
    d0 = (arr == 0x28).astype(np.int64)
    d0 -= arr == 0x29
    dep = np.cumsum(d0)
    if dep.min() < 0:
        return None
    row_end = starts + lens - 1
    if not (dep[row_end[live]] == 0).all():
        return None
    # blank the (short) header spans, then token-scan the body: names
    # contain 'E'/'e', which would otherwise read as numeric chars
    K = int(nl.max())
    mat = ns[live][:, None] + np.arange(K)[None, :]
    harr = mat[np.arange(K)[None, :] < nl[live][:, None]]
    barr = arr.copy()
    barr[harr] = 0x20
    if not _BODYCHARS[barr].all():
        return None
    isnum = _NUMCHARS[barr]
    prev = np.empty_like(isnum)
    prev[0] = False
    prev[1:] = isnum[:-1]
    ts = np.nonzero(isnum & ~prev)[0]
    if len(ts) == 0:
        return None                      # all-empty fast batch: rare, punt
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore", DeprecationWarning)
        np.copyto(barr, 0x20, where=~isnum)
        vals = np.fromstring(barr.tobytes().decode("ascii"),
                             dtype=np.float64, sep=" ")
    if len(vals) != len(ts) or not np.isfinite(vals).all():
        return None
    op = arr == 0x28
    cl = arr == 0x29
    expd = np.zeros(n, dtype=np.int32)
    for t, d in _FAST_DEPTH.items():
        expd[types == t] = d
    trow = np.searchsorted(starts, ts, side="right") - 1
    if not (dep[ts] == expd[trow]).all():
        return None
    # ring spans: '(' raising depth to the row's coordinate depth
    allpos = np.nonzero(op | cl)[0]
    prow_all = np.searchsorted(starts, allpos, side="right") - 1
    pd_ = dep[allpos]
    is_open = op[allpos]
    ro = allpos[is_open & (pd_ == expd[prow_all])]
    if len(ro) == 0:
        return None
    rt = np.searchsorted(ro, ts, side="right") - 1
    if rt[0] < 0:
        return None
    nrings = len(ro)
    rc = np.bincount(rt, minlength=nrings)
    if (rc % 2).any() or (rc == 0).any():
        return None
    ring_row = np.searchsorted(starts, ro, side="right") - 1
    # comma structure: commas at coordinate depth separate points
    # (count must be points-1 per ring); at depth expd-1 they separate
    # rings (PG/MLS: rings-1 per row; MPG: handled via parts below) —
    # anything else is malformed and falls back for the exact error
    commas = np.nonzero(arr == 0x2C)[0]
    cd = dep[commas]
    crow = np.searchsorted(starts, commas, side="right") - 1
    pt_c = commas[cd == expd[crow]]
    cring = np.searchsorted(ro, pt_c, side="right") - 1
    if cring.min(initial=0) < 0:
        return None
    cc = np.bincount(cring, minlength=nrings)
    if not (cc == rc // 2 - 1).all():
        return None
    # per-row ring counts & type-shape validation
    rr = np.bincount(ring_row, minlength=n)
    tpr = types[ring_row]
    if ((types == GT_POINT) & (rr != 1)).any() or \
       ((types == GT_LINESTRING) & (rr != 1)).any() or \
       (live & (rr == 0)).any():
        return None
    if (rc[tpr == GT_POINT] != 2).any():
        return None
    # part structure
    first_of_row = np.empty(nrings, dtype=bool)
    first_of_row[0] = True
    first_of_row[1:] = ring_row[1:] != ring_row[:-1]
    mpg = tpr == GT_MULTIPOLYGON
    new_part = np.ones(nrings, dtype=bool)
    if mpg.any():
        po = allpos[is_open & (pd_ == expd[prow_all] - 1) &
                    (types[prow_all] == GT_MULTIPOLYGON)]
        pidx = np.searchsorted(po, ro, side="right") - 1
        if (pidx[mpg] < 0).any():
            return None
        npfirst = np.empty(nrings, dtype=bool)
        npfirst[0] = True
        npfirst[1:] = pidx[1:] != pidx[:-1]
        new_part[mpg] = npfirst[mpg]
    pg = tpr == GT_POLYGON
    new_part[pg] = first_of_row[pg]
    part_id = np.cumsum(new_part) - 1
    parts_per_row = np.bincount(ring_row[new_part], minlength=n)
    rings_per_part = np.bincount(part_id)
    # separator commas must match structure exactly (a fast-path accept
    # must parse to the same geometry the cursor parser would produce):
    # depth expd-1 separates rings within a container (PG/MLS: rings-1
    # per row; MPG: rings-parts per row), depth expd-2 (MPG only)
    # separates parts (parts-1 per row)
    ring_c = commas[(cd == expd[crow] - 1) & (expd[crow] >= 2)]
    rcrow = np.searchsorted(starts, ring_c, side="right") - 1
    rcc = np.bincount(rcrow, minlength=n)
    exp_rc = np.where(types == GT_MULTIPOLYGON, rr - parts_per_row,
                      np.maximum(rr - 1, 0))
    exp_rc[~live] = 0
    exp_rc[(types == GT_POINT) | (types == GT_LINESTRING)] = 0
    if not (rcc == exp_rc).all():
        return None
    part_c = commas[(cd == expd[crow] - 2) & (expd[crow] >= 3)]
    pcrow = np.searchsorted(starts, part_c, side="right") - 1
    pcc = np.bincount(pcrow, minlength=n)
    exp_pc = np.where(types == GT_MULTIPOLYGON,
                      np.maximum(parts_per_row - 1, 0), 0)
    if not (pcc == exp_pc).all():
        return None
    geom_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(parts_per_row, out=geom_offsets[1:])
    part_offsets = np.zeros(len(rings_per_part) + 1, dtype=np.int64)
    np.cumsum(rings_per_part, out=part_offsets[1:])
    ring_offsets = np.zeros(nrings + 1, dtype=np.int64)
    np.cumsum(rc // 2, out=ring_offsets[1:])
    coords = vals.reshape(-1, 2)
    # polygon rings must close with >= 4 points (same rule the cursor
    # parser enforces) — violations bail so the fallback raises the
    # actionable error
    pring = np.isin(tpr, (GT_POLYGON, GT_MULTIPOLYGON))
    if pring.any():
        if (rc[pring] // 2 < 4).any():
            return None
        f = coords[ring_offsets[:-1][pring]]
        last = coords[ring_offsets[1:][pring] - 1]
        if (f != last).any():
            return None
    return GeometryArray(types, geom_offsets, part_offsets, ring_offsets,
                         coords)


def parse_array(values) -> GeometryArray:
    values = list(values)
    if len(values) >= 32:       # fixed costs dominate tiny batches
        try:
            fast = _parse_array_fast(values)
        except Exception:
            fast = None
        if fast is not None:
            return fast
    b = GeometryBuilder()
    for v in values:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            b.append_null()
        else:
            parse_one(str(v), b)
    return b.finish()
