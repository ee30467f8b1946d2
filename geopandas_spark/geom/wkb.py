"""WKB codec: bytes ⇄ GeometryArray.

ISO WKB, 2-D, little-endian on write; both endiannesses and EWKB SRID
flags accepted on read (SRID is dropped — CRS lives in column metadata, see
SURVEY.md §1.1). This is the on-the-wire format of every geometry column in
the engine (BinaryType), matching GeoParquet's WKB encoding so parquet
round-trips are zero-copy (reference: geopandas/io/arrow.py:385-448).

Fast paths:
- all-POINT batches decode via a single strided ``np.frombuffer`` pass —
  no per-row Python. Point-heavy workloads (the reference's own benchmark
  shapes, benchmarks/sjoin.py:9-35) never hit the generic parser.
- all-POINT encode likewise builds one bytes buffer and slices it.
"""

from __future__ import annotations

import struct
import numpy as np

from geopandas_spark.geom.array import (
    GT_MISSING, GT_POINT, GT_LINESTRING, GT_POLYGON, GT_MULTIPOINT,
    GT_MULTILINESTRING, GT_MULTIPOLYGON, GT_GEOMETRYCOLLECTION,
    GeometryArray, GeometryBuilder,
)

_POINT_HDR = b"\x01\x01\x00\x00\x00"
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000
_ISO_Z = 1000
_ISO_M = 2000


def _parse_header(buf, pos):
    """Return (gtype, has_z, has_m, new_pos, endian_char)."""
    byteorder = buf[pos]
    e = "<" if byteorder == 1 else ">"
    (raw,) = struct.unpack_from(e + "I", buf, pos + 1)
    pos += 5
    has_z = has_m = False
    if raw & _EWKB_SRID:
        raw &= ~_EWKB_SRID
        pos += 4  # skip SRID
    if raw & _EWKB_Z:
        has_z = True
        raw &= ~_EWKB_Z
    if raw & _EWKB_M:
        has_m = True
        raw &= ~_EWKB_M
    if raw >= _ISO_M:
        has_m = True
        raw -= _ISO_M
    if raw >= _ISO_Z:
        has_z = True
        raw -= _ISO_Z
    return raw, has_z, has_m, pos, e


def _read_coords(buf, pos, n, e, dim):
    arr = np.frombuffer(buf, dtype=np.dtype(e + "f8"), count=n * dim, offset=pos)
    pos += n * dim * 8
    return arr.reshape(n, dim)[:, :2], pos


def _parse_one(buf, pos, builder: GeometryBuilder):
    gtype, has_z, has_m, pos, e = _parse_header(buf, pos)
    dim = 2 + has_z + has_m
    u32 = e + "I"
    if gtype == GT_POINT:
        c, pos = _read_coords(buf, pos, 1, e, dim)
        if np.isnan(c[0, 0]) and np.isnan(c[0, 1]):
            builder.append_empty(GT_POINT)
        else:
            builder.append_point(c[0, 0], c[0, 1])
        return pos
    if gtype == GT_LINESTRING:
        (n,) = struct.unpack_from(u32, buf, pos); pos += 4
        c, pos = _read_coords(buf, pos, n, e, dim)
        if n == 0:
            builder.append_empty(GT_LINESTRING)
        else:
            builder.append(GT_LINESTRING, [[c]])
        return pos
    if gtype == GT_POLYGON:
        (nr,) = struct.unpack_from(u32, buf, pos); pos += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(u32, buf, pos); pos += 4
            c, pos = _read_coords(buf, pos, n, e, dim)
            rings.append(c)
        if nr == 0:
            builder.append_empty(GT_POLYGON)
        else:
            builder.append(GT_POLYGON, [rings])
        return pos
    if gtype in (GT_MULTIPOINT, GT_MULTILINESTRING, GT_MULTIPOLYGON):
        (np_,) = struct.unpack_from(u32, buf, pos); pos += 4
        sub = GeometryBuilder()
        for _ in range(np_):
            pos = _parse_one(buf, pos, sub)
        ga = sub.finish()
        parts = []
        for i in range(len(ga)):
            for p in ga.geom_slices(i):
                parts.append(p)
        if not parts:
            builder.append_empty(gtype)
        else:
            builder.append(gtype, parts)
        return pos
    if gtype == GT_GEOMETRYCOLLECTION:
        raise NotImplementedError(
            "GEOMETRYCOLLECTION is not supported by the columnar kernel yet")
    raise ValueError(f"unsupported WKB geometry type code {gtype}")


def decode(values) -> GeometryArray:
    """Decode an iterable of (bytes | None) into a GeometryArray."""
    vals = list(values)
    n = len(vals)
    # fast path: every row a 2-D LE point of 21 bytes
    if n and all(v is not None and len(v) == 21 and v[:5] == _POINT_HDR
                 for v in vals):
        buf = b"".join(vals)
        raw = np.frombuffer(buf, dtype=np.uint8).reshape(n, 21)
        coords = raw[:, 5:].copy().view("<f8").reshape(n, 2)
        ar = np.arange(n + 1, dtype=np.int64)
        return GeometryArray(np.full(n, GT_POINT, np.uint8), ar, ar.copy(),
                             ar.copy(), np.ascontiguousarray(coords))
    b = GeometryBuilder()
    for v in vals:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            b.append_null()
        else:
            _parse_one(bytes(v), 0, b)
    return b.finish()


def _encode_ring(out, ring):
    out.append(struct.pack("<I", len(ring)))
    out.append(np.ascontiguousarray(ring, dtype="<f8").tobytes())


def encode(ga: GeometryArray) -> list:
    """Encode to a list of (bytes | None), little-endian ISO WKB 2-D."""
    n = len(ga)
    types = ga.types
    # fast path: all points, non-empty
    if n and (types == GT_POINT).all() and ga.n_coords == n:
        coords = np.ascontiguousarray(ga.coords, dtype="<f8")
        body = coords.view(np.uint8).reshape(n, 16)
        hdr = np.frombuffer(_POINT_HDR, dtype=np.uint8)
        rows = np.empty((n, 21), dtype=np.uint8)
        rows[:, :5] = hdr
        rows[:, 5:] = body
        flat = rows.tobytes()
        return [flat[i * 21:(i + 1) * 21] for i in range(n)]
    out = []
    for i in range(n):
        t = int(types[i])
        if t == GT_MISSING:
            out.append(None)
            continue
        parts = ga.geom_slices(i)
        buf = [struct.pack("<BI", 1, t)]
        if t == GT_POINT:
            if not parts:
                buf.append(struct.pack("<dd", np.nan, np.nan))
            else:
                buf.append(np.ascontiguousarray(parts[0][0], dtype="<f8").tobytes())
        elif t == GT_LINESTRING:
            _encode_ring(buf, parts[0][0] if parts else np.empty((0, 2)))
        elif t == GT_POLYGON:
            rings = parts[0] if parts else []
            buf.append(struct.pack("<I", len(rings)))
            for r in rings:
                _encode_ring(buf, r)
        elif t in (GT_MULTIPOINT, GT_MULTILINESTRING, GT_MULTIPOLYGON):
            buf.append(struct.pack("<I", len(parts)))
            sub_t = {GT_MULTIPOINT: GT_POINT, GT_MULTILINESTRING: GT_LINESTRING,
                     GT_MULTIPOLYGON: GT_POLYGON}[t]
            for p in parts:
                buf.append(struct.pack("<BI", 1, sub_t))
                if sub_t == GT_POINT:
                    buf.append(np.ascontiguousarray(p[0], dtype="<f8").tobytes())
                elif sub_t == GT_LINESTRING:
                    _encode_ring(buf, p[0])
                else:
                    buf.append(struct.pack("<I", len(p)))
                    for r in p:
                        _encode_ring(buf, r)
        else:
            raise ValueError(f"cannot encode geometry type {t}")
        out.append(b"".join(buf))
    return out


def encode_ewkb(ga: GeometryArray, srid: int) -> list:
    """PostGIS-flavor EWKB: the top-level header carries the SRID flag +
    a 4-byte SRID (reference _convert_to_ewkb, geopandas/io/sql.py:300-313).
    Nested sub-geometry headers stay plain, per PostGIS convention."""
    out = []
    tail = struct.pack("<I", int(srid))
    for b in encode(ga):
        if b is None:
            out.append(None)
            continue
        (gtype,) = struct.unpack_from("<I", b, 1)
        out.append(b[:1] + struct.pack("<I", gtype | _EWKB_SRID) +
                   tail + b[5:])
    return out
