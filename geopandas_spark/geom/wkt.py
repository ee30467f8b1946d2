"""WKT codec: text ⇄ GeometryArray.

Output formatting matches shapely 2.x / GEOS ``trim=True`` behavior for the
values we produce: integral doubles print without a decimal point
("POINT (3 7)"), other values print with the shortest round-trip repr.
(reference ingest path: geopandas/array.py:255-290 from_wkt/to_wkt.)
"""

from __future__ import annotations

import re
import numpy as np

try:                                    # worker-side fast float parse
    import pyarrow as _pa
    import pyarrow.compute as _pc
except Exception:                       # pragma: no cover - pyarrow ships
    _pa = _pc = None                    # with pyspark; belt-and-braces

from geopandas_spark.geom.array import (
    GT_MISSING, GT_POINT, GT_LINESTRING, GT_POLYGON, GT_MULTIPOINT,
    GT_MULTILINESTRING, GT_MULTIPOLYGON, GT_GEOMETRYCOLLECTION,
    WKT_TYPE_NAMES, GeometryArray, GeometryBuilder,
)

_TYPE_BY_NAME = {v: k for k, v in WKT_TYPE_NAMES.items()}
_NUM = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")
_HEAD = re.compile(r"\s*([A-Za-z]+)\s*(ZM|Z|M)?\s*(EMPTY)?\s*", re.IGNORECASE)


def _fmt(v: float) -> str:
    # inf/nan coords are representable (strtod accepts '1e500' → inf);
    # guard before int() which overflows on them (r13 fuzz find)
    if np.isfinite(v) and v == int(v) and abs(v) < 1e15:
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
    # GEOS WKT-reader parity (r13): trailing non-whitespace after the
    # geometry is a parse error ("POINT (1 2) junk", "POLYGON ((..)),").
    # Both parse paths share this rule — the vectorized fast path routes
    # such rows here so the error text has one home.
    c.skip_ws()
    if c.pos != len(c.s):
        raise ValueError(
            f"WKT parse error at {c.pos}: unexpected trailing characters "
            f"in {s[:80]!r}")


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
# Vectorized batch fast path (r12, split-batch r13): the cursor parser
# costs ~14 µs/row — fine for odd rows, ruinous for WKT ingest at scale
# (a 60M-row text import would spend 500+ core-seconds in
# _Cursor.number). The fast path parses a WHOLE batch with ~20 numpy
# passes over one concatenated byte blob: char-class masks find number
# tokens, one np.fromstring call converts every coordinate, and
# paren-depth prefix sums recover the ring/part structure.
#
# r13: dirt is localized PER ROW instead of bailing the whole batch.
# Every conformance check attributes its violations to rows (bad rows'
# bytes are blanked out of the blob; structural elements — parens,
# commas, number tokens — are verified to attribute within their own
# row, so one dirty row can never corrupt or mask a neighbor). The
# conforming subset parses vectorized; the caller routes only the dirty
# rows through the exact cursor parser, so semantics and ERROR MESSAGES
# are unchanged — the fast path only ever accepts inputs the slow
# parser would parse to the same geometry. A handful of failure modes
# that cannot be pinned to a row (np.fromstring drift the token-grammar
# scan cannot explain) still fall back wholesale. ~20-40x per core on
# homogeneous batches; a 1%-dirty batch keeps most of that (the
# masking branches only execute when violations exist).
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


def _blank_rows(bufs, rows, starts, lens, total):
    """Overwrite the byte spans of `rows` with spaces in each buffer.

    Cost is proportional to the DIRTY bytes, not the blob: the span
    positions are materialized directly (expand trick) instead of a
    full-blob mask cumsum. Only runs when dirt exists — clean batches
    never pay for it."""
    rows = rows[lens[rows] > 0]
    if len(rows) == 0:
        return
    rl = lens[rows]
    tot = int(rl.sum())
    within = np.arange(tot, dtype=np.int64) - \
        np.repeat(np.cumsum(rl) - rl, rl)
    pos = np.repeat(starts[rows], rl) + within
    for buf in bufs:
        buf[pos] = 0x20


def _invalid_token_rows(barr, ts, te, trow):
    """Rows whose number tokens are not valid float literals.

    Called only when np.fromstring returned a different value count
    than the token scan found. Token grammar (same language _NUM and
    strtod accept in full): ``[+-]? (d+ (.d*)? | .d+) ([eE] [+-]? d+)?``
    — verified with char-class prefix sums over each token span.
    Returns unique row indices, or an empty array if every token is
    grammatical (caller then falls back wholesale)."""
    def cum(mask):
        out = np.zeros(len(mask) + 1, dtype=np.int64)
        np.cumsum(mask, out=out[1:])
        return out

    dig = (barr >= 0x30) & (barr <= 0x39)
    eE = (barr == 0x45) | (barr == 0x65)
    cd, cdot, ce, cs = (cum(dig), cum(barr == 0x2E), cum(eE),
                        cum((barr == 0x2B) | (barr == 0x2D)))
    n_e = ce[te] - ce[ts]
    badt = n_e > 1
    # mantissa ends at the (single) e/E, else at the token end
    epos_all = np.nonzero(eE)[0]
    if len(epos_all):
        ei = np.minimum(np.searchsorted(epos_all, ts), len(epos_all) - 1)
        me = np.where(n_e == 1, epos_all[ei], te)
    else:
        me = te.copy()
    badt |= (cd[me] - cd[ts]) < 1            # mantissa needs a digit
    badt |= (cdot[me] - cdot[ts]) > 1        # at most one '.'
    badt |= (cdot[te] - cdot[me]) > 0        # no '.' in exponent
    has_e = n_e == 1
    badt |= has_e & ((cd[te] - cd[np.minimum(me + 1, te)]) < 1)
    # signs: only at the token start and right after the e/E
    scount = cs[te] - cs[ts]
    sgn = (barr == 0x2B) | (barr == 0x2D)
    allowed = sgn[ts].astype(np.int64)
    allowed += (has_e & sgn[np.minimum(me + 1, len(barr) - 1)] &
                (me + 1 < te)).astype(np.int64)
    badt |= scount != allowed
    return np.unique(trow[badt])


def _concat_rows(a: GeometryArray, b: GeometryArray) -> GeometryArray:
    """Row-wise concatenation (offset-shifted); Z/M NaN-padded when only
    one side carries the buffer; gc_meta lists concatenated."""
    za, zb, ma, mb = a.z, b.z, a.m, b.m
    z = m = None
    if za is not None or zb is not None:
        z = np.concatenate([
            za if za is not None else np.full(a.n_coords, np.nan),
            zb if zb is not None else np.full(b.n_coords, np.nan)])
    if ma is not None or mb is not None:
        m = np.concatenate([
            ma if ma is not None else np.full(a.n_coords, np.nan),
            mb if mb is not None else np.full(b.n_coords, np.nan)])
    gc = None
    if a.gc_meta is not None or b.gc_meta is not None:
        gc = (list(a.gc_meta) if a.gc_meta is not None
              else [None] * len(a)) + \
             (list(b.gc_meta) if b.gc_meta is not None
              else [None] * len(b))
    return GeometryArray(
        np.concatenate([a.types, b.types]),
        np.concatenate([a.geom_offsets,
                        b.geom_offsets[1:] + a.geom_offsets[-1]]),
        np.concatenate([a.part_offsets,
                        b.part_offsets[1:] + a.part_offsets[-1]]),
        np.concatenate([a.ring_offsets,
                        b.ring_offsets[1:] + a.ring_offsets[-1]]),
        np.concatenate([a.coords, b.coords]), z=z, m=m, gc_meta=gc)


def _vals_arrow_cast(barr, isnum, ts, tok_keep):
    """Token buffer → float64 via Arrow's string→double cast.

    Both converters are correctly rounded (Arrow uses fast_float,
    np.fromstring wraps strtod), so accepted values are bit-identical;
    the cast runs ~4x faster than the fromstring pass (0.31 vs 1.2-1.5
    µs/WKT-row on the distance_pairs LINESTRING shape) because it skips
    the tobytes+decode copies and strtod's locale machinery. Returns
    None on ANY irregularity — missing pyarrow, a token the cast
    rejects (e.g. bare '+'/'1e'), byte-count drift — and the caller
    falls back to the np.fromstring path with its per-row drift
    localization, so acceptance/rejection behavior is unchanged.
    """
    if _pa is None:
        return None
    nxt = np.empty_like(isnum)
    nxt[-1] = False
    nxt[:-1] = isnum[1:]
    te = np.nonzero(isnum & ~nxt)[0] + 1
    lens = (te - ts)[tok_keep]
    # bad-row token bytes were blanked to 0x20 in barr (a live token
    # byte is never 0x20), so this keeps exactly the kept tokens' bytes
    compact = barr[isnum & (barr != 0x20)]
    if int(lens.sum()) != len(compact) or len(compact) > 2**31 - 8:
        return None
    ntok = len(lens)
    offsets = np.zeros(ntok + 1, dtype=np.int32)
    np.cumsum(lens.astype(np.int32), out=offsets[1:])
    try:
        sa = _pa.StringArray.from_buffers(
            ntok, _pa.py_buffer(offsets), _pa.py_buffer(compact))
        return _pc.cast(sa, _pa.float64()).to_numpy(zero_copy_only=False)
    except Exception:
        return None


def _parse_array_fast(values):
    """Vectorized batch parse with per-row dirt localization.

    Returns ``(ga, bad)`` where ``ga`` is a GeometryArray over ALL rows
    (input nulls and dirty rows are NULL placeholders) and ``bad`` holds
    the int64 indices the caller must route through the cursor parser
    (empty on a fully clean batch) — or ``(None, None)`` when the batch
    can't be localized and the caller should fall back wholesale."""
    n = len(values)
    bad = np.zeros(n, dtype=bool)
    # common case first (r13): a batch of all-str all-ascii rows joins
    # and encodes in two C calls — the per-row isinstance/isascii loop
    # below cost ~1 µs/row, about 40% of the whole fast path on clean
    # batches (cProfile, 20k-row LINESTRING batch). join raises
    # TypeError on any non-str row and encode raises UnicodeEncodeError
    # on any non-ascii one; both fall to the per-row classification.
    strs = None
    try:
        blob = "\n".join(values)
        blob.encode("ascii")
        strs = values if isinstance(values, list) else list(values)
    except (TypeError, UnicodeEncodeError):
        pass
    if strs is None:
        strs = []
        for i, v in enumerate(values):
            if isinstance(v, str):
                s = v
            elif v is None or (isinstance(v, float) and np.isnan(v)):
                strs.append("")
                continue
            else:
                s = str(v)
            if s.isascii():
                strs.append(s)
            else:
                bad[i] = True           # cursor parser owns non-ascii
                strs.append("")
        blob = "\n".join(strs)
    # copy-on-write: the blob stays a zero-copy frombuffer view until a
    # blanking pass actually needs to mutate it (clean batches never do)
    arr = np.frombuffer(blob.encode("ascii"), dtype=np.uint8)
    arr_mut = False
    total = len(arr)
    lens = np.fromiter(map(len, strs), dtype=np.int64, count=n)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    live = lens > 0                     # bad-ascii rows are "" → not live
    if not live.any() or total == 0:
        return None, None               # all-null batch: rare, punt
    row_end = starts + lens - 1

    # --- header recognition (vectorized; no per-row regex) --- name =
    # chars from the row's first non-space to the last non-space before
    # its first '(' — verified byte-exact (case-folded) against the five
    # fast type names, so Z/M/EMPTY tags, MULTIPOINT, collections,
    # unknown names, or any letter outside a name span mark the row
    # dirty and route it to the cursor parser
    opos = np.nonzero(arr == 0x28)[0]
    oi = np.searchsorted(opos, starts)
    has = live & (oi < len(opos))
    fo = np.zeros(n, dtype=np.int64)
    if len(opos):
        fo[has] = opos[np.minimum(oi, len(opos) - 1)][has]
    nb = live & (~has | (fo > row_end))      # no '(' in this row
    bad |= nb
    live &= ~nb
    ns = starts.copy()
    top = total - 1
    for _ in range(24):                 # strip leading whitespace
        m_ = live & (ns < fo) & np.isin(arr[np.minimum(ns, top)],
                                        (0x20, 0x09))
        if not m_.any():
            break
        ns[m_] += 1
    ne = fo.copy()
    for _ in range(24):                 # strip whitespace before '('
        m_ = live & (ne > ns) & np.isin(arr[np.maximum(ne - 1, 0)],
                                        (0x20, 0x09))
        if not m_.any():
            break
        ne[m_] -= 1
    nl = np.where(live, ne - ns, 0)
    nb = live & ((nl <= 0) | (nl > 24))
    bad |= nb
    live &= ~nb
    nl[~live] = 0
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
    nb = ~matched
    bad |= nb
    live &= ~nb
    # every letter in a row must sit inside its verified name span
    # (counted E-free on both sides: _LETTERS skips e/E) — checked with
    # one global sum on clean batches, localized per row only when the
    # totals disagree, so one 'POINT Z (…)' no longer sinks its
    # neighbors and a clean batch pays a single reduction
    lmask = _LETTERS[arr]
    if int(lmask.sum()) != int(_NAME_LETTERS[types[live]].sum()):
        lcnt = np.add.reduceat(lmask.view(np.uint8).astype(np.int64),
                               np.minimum(starts, total - 1))
        lcnt[starts >= total] = 0
        nb = live & (lcnt != _NAME_LETTERS[types])
        # letters inside ALREADY-bad rows (not yet blanked) explain the
        # rest of the global mismatch; any remainder on live rows marks
        # those rows dirty
        bad |= nb
        live &= ~nb
        if not live.any():
            return None, None
    if bad.any():
        if not arr_mut:
            arr = arr.copy()
            arr_mut = True
        _blank_rows([arr], np.nonzero(bad)[0], starts, lens, total)

    # blank the (short) header spans, then the body must be made of
    # number/paren/comma/space characters only — violations are per-row
    liv = np.nonzero(live)[0]
    K = int(nl[liv].max())
    mat = ns[liv][:, None] + np.arange(K)[None, :]
    harr = mat[np.arange(K)[None, :] < nl[liv][:, None]]
    barr = arr.copy()
    barr[harr] = 0x20
    vio = np.nonzero(~_BODYCHARS[barr])[0]
    if len(vio):
        vrow = np.unique(np.searchsorted(starts, vio, side="right") - 1)
        bad[vrow] = True
        live[vrow] = False
        if not live.any():
            return None, None
        if not arr_mut:
            arr = arr.copy()
            arr_mut = True
        _blank_rows([arr, barr], vrow, starts, lens, total)

    # paren depth: per-row balance and non-negativity (depth is made
    # row-local by subtracting the pre-row cumulative balance, so an
    # unbalanced row can't shift its neighbors' depths)
    d0 = (arr == 0x28).astype(np.int64)
    d0 -= arr == 0x29
    dep = np.cumsum(d0)
    # clean batches pass the two global checks and skip the per-row
    # balance localization entirely
    if dep.min() < 0 or not (dep[row_end[live]] == 0).all():
        base = np.zeros(n, dtype=np.int64)
        base[1:] = dep[starts[1:] - 1]
        segmin = np.minimum.reduceat(dep, np.minimum(starts, total - 1)) - base
        endbal = dep[row_end] - base
        nb = live & ((endbal != 0) | (segmin < 0))
        bad |= nb
        live &= ~nb
        if not live.any():
            return None, None
        if not arr_mut:
            arr = arr.copy()
            arr_mut = True
        _blank_rows([arr, barr], np.nonzero(nb)[0], starts, lens, total)
        d0 = (arr == 0x28).astype(np.int64)
        d0 -= arr == 0x29
        dep = np.cumsum(d0)
    # from here every remaining byte belongs to a balanced row, so the
    # global cumsum IS the row-local depth and every structural element
    # (paren, comma, token) sits between its own row's parens

    op = arr == 0x28
    expd = np.zeros(n, dtype=np.int32)
    for t, d in _FAST_DEPTH.items():
        expd[types == t] = d
    allpos = np.nonzero(op | (arr == 0x29))[0]
    prow_all = np.searchsorted(starts, allpos, side="right") - 1
    pd_ = dep[allpos]
    is_open = op[allpos]
    sb = np.zeros(n, dtype=bool)        # structural badness, merged below
    # every '(' must be the row's first paren, a ring open, or (MPG) a
    # part open — balanced-but-unclassifiable groups like
    # 'POLYGON ((..)) ()' are dirt, not silently ignored
    opens_pos = allpos[is_open]
    orow = prow_all[is_open]
    od = pd_[is_open]
    okopen = (opens_pos == fo[orow]) | (od == expd[orow]) | \
             ((od == expd[orow] - 1) & (types[orow] == GT_MULTIPOLYGON))
    sb[orow[~okopen]] = True
    # ring spans: '(' raising depth to the row's coordinate depth
    ro = allpos[is_open & (pd_ == expd[prow_all])]
    if len(ro) == 0:
        return None, None
    ring_row = np.searchsorted(starts, ro, side="right") - 1
    nrings = len(ro)

    # number tokens
    isnum = _NUMCHARS[barr]
    prev = np.empty_like(isnum)
    prev[0] = False
    prev[1:] = isnum[:-1]
    ts = np.nonzero(isnum & ~prev)[0]
    if len(ts) == 0:
        return None, None
    trow = np.searchsorted(starts, ts, side="right") - 1
    dep_ok = dep[ts] == expd[trow]
    sb[trow[~dep_ok]] = True
    # token → ring attribution. Own-row attribution is GUARANTEED for
    # depth-conforming tokens: to sit at depth expd inside a balanced
    # row, some '(' within the row raised to expd before the token, and
    # that '(' is a ring open of the same row — so the nearest ro at or
    # before the token can never belong to a neighbor. Wrong-depth
    # tokens CAN attribute across rows, so they are excluded from the
    # counts (their own row is already marked dirty above) and the
    # neighboring row's tallies stay pure.
    rt = np.searchsorted(ro, ts, side="right") - 1
    rc = np.bincount(rt[dep_ok], minlength=nrings)

    # comma structure: every comma must separate points (row depth),
    # rings (depth-1) or MPG parts (depth-2); anything else is dirt
    commas = np.nonzero(arr == 0x2C)[0]
    if len(commas):
        crow = np.searchsorted(starts, commas, side="right") - 1
        cd = dep[commas]
        is_pt = cd == expd[crow]
        is_rc = (cd == expd[crow] - 1) & (expd[crow] >= 2)
        is_pc = (cd == expd[crow] - 2) & (expd[crow] >= 3)
        sb[crow[~(is_pt | is_rc | is_pc)]] = True
        pt_c = commas[is_pt]
        # point-separator commas sit at depth expd by construction, so
        # (same argument as tokens) they attribute within their own row
        cring = np.searchsorted(ro, pt_c, side="right") - 1
        cc = np.bincount(cring, minlength=nrings)
        rcc = np.bincount(crow[is_rc], minlength=n)
        pcc = np.bincount(crow[is_pc], minlength=n)
    else:
        cc = np.zeros(nrings, dtype=np.int64)
        rcc = np.zeros(n, dtype=np.int64)
        pcc = np.zeros(n, dtype=np.int64)

    # per-ring counts: token parity, emptiness, point-separator commas
    sb[ring_row[(rc % 2 != 0) | (rc == 0)]] = True
    sb[ring_row[cc != rc // 2 - 1]] = True
    # per-row ring counts & type-shape validation
    rr = np.bincount(ring_row, minlength=n)
    tpr = types[ring_row]
    sb |= live & (((types == GT_POINT) | (types == GT_LINESTRING)) &
                  (rr != 1))
    sb |= live & (rr == 0)
    sb[ring_row[(tpr == GT_POINT) & (rc != 2)]] = True
    # part structure
    first_of_row = np.empty(nrings, dtype=bool)
    first_of_row[0] = True
    first_of_row[1:] = ring_row[1:] != ring_row[:-1]
    mpg = tpr == GT_MULTIPOLYGON
    new_part = np.ones(nrings, dtype=bool)
    if mpg.any():
        po = allpos[is_open & (pd_ == expd[prow_all] - 1) &
                    (types[prow_all] == GT_MULTIPOLYGON)]
        # an MPG ring open at depth expd has its own row's part open
        # (depth expd-1) before it by the same continuity argument, so
        # pidx attribution is own-row; raw -1s (non-MPG rings before
        # any part open) only feed the != comparison below
        pidx = np.searchsorted(po, ro, side="right") - 1
        npfirst = np.empty(nrings, dtype=bool)
        npfirst[0] = True
        npfirst[1:] = pidx[1:] != pidx[:-1]   # raw pidx: -1 ≠ 0 matters
        new_part[mpg] = npfirst[mpg]
    pg = tpr == GT_POLYGON
    new_part[pg] = first_of_row[pg]
    parts_per_row = np.bincount(ring_row[new_part], minlength=n)
    # separator commas must match structure exactly (a fast-path accept
    # must parse to the same geometry the cursor parser would produce)
    exp_rc = np.where(types == GT_MULTIPOLYGON, rr - parts_per_row,
                      np.maximum(rr - 1, 0))
    exp_rc[(types == GT_POINT) | (types == GT_LINESTRING)] = 0
    sb |= live & (rcc != exp_rc)
    exp_pc = np.where(types == GT_MULTIPOLYGON,
                      np.maximum(parts_per_row - 1, 0), 0)
    sb |= live & (pcc != exp_pc)

    bad |= sb
    live &= ~sb
    if not live.any():
        return None, None
    if bad.any():
        _blank_rows([barr], np.nonzero(bad)[0], starts, lens, total)

    # one np.fromstring pass converts every kept token; in-place blank
    # of the non-number chars is safe (token bytes are all _NUMCHARS)
    tok_keep = ~bad[trow]
    ts_f, trow_f = ts[tok_keep], trow[tok_keep]
    np.copyto(barr, 0x20, where=~isnum)
    import warnings as _w

    def _vals_of():
        with _w.catch_warnings():
            _w.simplefilter("ignore", DeprecationWarning)
            return np.fromstring(barr.tobytes().decode("ascii"),
                                 dtype=np.float64, sep=" ")

    vals = _vals_arrow_cast(barr, isnum, ts, tok_keep)
    if vals is None:
        vals = _vals_of()
    if len(vals) != len(ts_f):
        # token ends only needed for grammar localization — derive lazily
        nxt = np.empty_like(isnum)
        nxt[-1] = False
        nxt[:-1] = isnum[1:]
        te = np.nonzero(isnum & ~nxt)[0] + 1
        vr = _invalid_token_rows(barr, ts_f, te[tok_keep], trow_f)
        if len(vr) == 0:
            return None, None           # drift we can't explain: punt
        bad[vr] = True
        live &= ~bad
        if not live.any():
            return None, None
        _blank_rows([barr], vr, starts, lens, total)
        tok_keep = ~bad[trow]
        ts_f, trow_f = ts[tok_keep], trow[tok_keep]
        vals = _vals_of()
        if len(vals) != len(ts_f):
            return None, None
    nonfin = ~np.isfinite(vals)
    if nonfin.any():
        bad[np.unique(trow_f[nonfin])] = True
        live &= ~bad
        if not live.any():
            return None, None
        keep = ~bad[trow_f]
        vals, trow_f = vals[keep], trow_f[keep]

    # ring-level filter + offsets
    ring_keep = ~bad[ring_row]
    ring_row_f = ring_row[ring_keep]
    rc_f = rc[ring_keep]
    new_part_f = new_part[ring_keep]
    if int(rc_f.sum()) != len(vals):
        return None, None               # defensive: alignment lost
    ring_offsets = np.zeros(len(rc_f) + 1, dtype=np.int64)
    np.cumsum(rc_f // 2, out=ring_offsets[1:])
    coords = vals.reshape(-1, 2)
    # polygon rings must close with >= 4 points (same rule the cursor
    # parser enforces) — violations route to the fallback so it raises
    # the actionable error
    tpr_f = types[ring_row_f]
    pring = np.isin(tpr_f, (GT_POLYGON, GT_MULTIPOLYGON))
    if pring.any():
        small = pring & (rc_f // 2 < 4)
        ok4 = np.nonzero(pring & ~small)[0]
        f = coords[ring_offsets[:-1][ok4]]
        last = coords[ring_offsets[1:][ok4] - 1]
        openr = (f != last).any(axis=1)
        viol = np.concatenate([ring_row_f[small], ring_row_f[ok4[openr]]])
        if len(viol):
            bad[np.unique(viol)] = True
            live &= ~bad
            if not live.any():
                return None, None
            keep = ~bad[trow_f]
            vals, trow_f = vals[keep], trow_f[keep]
            rkeep = ~bad[ring_row_f]
            ring_row_f = ring_row_f[rkeep]
            rc_f = rc_f[rkeep]
            new_part_f = new_part_f[rkeep]
            ring_offsets = np.zeros(len(rc_f) + 1, dtype=np.int64)
            np.cumsum(rc_f // 2, out=ring_offsets[1:])
            coords = vals.reshape(-1, 2)

    # assembly over ALL rows; bad rows (and input nulls) are NULL
    if len(new_part_f) and not new_part_f[0]:
        return None, None               # defensive: orphan ring
    parts_per_row_f = np.bincount(ring_row_f[new_part_f], minlength=n)
    part_id_f = np.cumsum(new_part_f) - 1
    rings_per_part = (np.bincount(part_id_f) if len(part_id_f)
                      else np.zeros(0, dtype=np.int64))
    out_types = np.where(bad, 0, types).astype(np.uint8)
    geom_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(parts_per_row_f, out=geom_offsets[1:])
    part_offsets = np.zeros(len(rings_per_part) + 1, dtype=np.int64)
    np.cumsum(rings_per_part, out=part_offsets[1:])
    ga = GeometryArray(out_types, geom_offsets, part_offsets, ring_offsets,
                       coords)
    return ga, np.nonzero(bad)[0]


def parse_array(values) -> GeometryArray:
    values = list(values)
    if len(values) >= 32:       # fixed costs dominate tiny batches
        try:
            fast, badrows = _parse_array_fast(values)
        except Exception:
            fast, badrows = None, None
        if fast is not None:
            if badrows is None or len(badrows) == 0:
                return fast
            # cursor-parse only the dirty rows (ascending, so the first
            # malformed row raises exactly as a full cursor pass would),
            # then splice them back by position
            b = GeometryBuilder()
            for i in badrows:
                v = values[i]
                if v is None or (isinstance(v, float) and np.isnan(v)):
                    b.append_null()
                else:
                    parse_one(str(v), b)
            merged = _concat_rows(fast, b.finish())
            perm = np.arange(len(values), dtype=np.int64)
            perm[badrows] = len(values) + np.arange(len(badrows))
            return merged.take(perm)
    b = GeometryBuilder()
    for v in values:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            b.append_null()
        else:
            parse_one(str(v), b)
    return b.finish()
