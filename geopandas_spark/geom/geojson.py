"""GeoJSON geometry codec: JSON geometry objects ⇄ GeometryArray.

Reference ingest/egress paths: ``GeoDataFrame.from_features``
(geopandas/geodataframe.py:747) and ``to_json``/``iterfeatures``
(geopandas/geodataframe.py:984-1276). Only the geometry-object level lives
here; FeatureCollection framing is handled by the io layer (and by native
``to_json``/``from_json`` on the Spark side).
"""

from __future__ import annotations

import json

import numpy as np

from geopandas_spark.geom.array import (
    GT_MISSING, GT_POINT, GT_LINESTRING, GT_POLYGON, GT_MULTIPOINT,
    GT_MULTILINESTRING, GT_MULTIPOLYGON, GT_GEOMETRYCOLLECTION,
    GeometryArray, GeometryBuilder,
)

_GJ_NAMES = {
    GT_POINT: "Point", GT_LINESTRING: "LineString", GT_POLYGON: "Polygon",
    GT_MULTIPOINT: "MultiPoint", GT_MULTILINESTRING: "MultiLineString",
    GT_MULTIPOLYGON: "MultiPolygon",
}
_GJ_TYPES = {v: k for k, v in _GJ_NAMES.items()}


def _num(v: float):
    return int(v) if v == int(v) and abs(v) < 1e15 else float(v)


def _ring_coords(r) -> list:
    return [[_num(x), _num(y)] for x, y in r]


def format_one(ga: GeometryArray, i: int):
    """Row i → GeoJSON geometry dict (None for missing)."""
    t = int(ga.types[i])
    if t == GT_MISSING:
        return None
    if t == GT_GEOMETRYCOLLECTION:
        kids = []
        for ct, cparts in ga.children_of(i):
            cb = GeometryBuilder()
            cb.append(ct, cparts)
            kids.append(format_one(cb.finish(), 0))
        return {"type": "GeometryCollection", "geometries": kids}
    parts = ga.geom_slices(i)
    name = _GJ_NAMES[t]
    if t == GT_POINT:
        if not parts:
            return {"type": name, "coordinates": []}
        c = parts[0][0][0]
        return {"type": name, "coordinates": [_num(c[0]), _num(c[1])]}
    if t == GT_LINESTRING:
        coords = _ring_coords(parts[0][0]) if parts else []
    elif t == GT_POLYGON:
        coords = [_ring_coords(r) for r in parts[0]] if parts else []
    elif t == GT_MULTIPOINT:
        coords = [[_num(p[0][0, 0]), _num(p[0][0, 1])] for p in parts]
    elif t == GT_MULTILINESTRING:
        coords = [_ring_coords(p[0]) for p in parts]
    else:  # MULTIPOLYGON
        coords = [[_ring_coords(r) for r in p] for p in parts]
    return {"type": name, "coordinates": coords}


def format_array(ga: GeometryArray) -> list:
    """→ list of GeoJSON strings (None for missing rows)."""
    out = []
    for i in range(len(ga)):
        d = format_one(ga, i)
        out.append(None if d is None else json.dumps(d, separators=(",", ":")))
    return out


def _parse_obj(obj, b: GeometryBuilder):
    if obj is None:
        b.append_null()
        return
    t = _GJ_TYPES.get(obj.get("type"))
    if t is None:
        if obj.get("type") == "GeometryCollection":
            # children parse through a scratch builder and keep their
            # (possibly Multi*) type — same GC layout as the WKT/WKB
            # codecs; nested collections flatten one level (GEOS also
            # normalizes nested GCs on most write paths)
            children = []
            for child in obj.get("geometries") or ():
                cb = GeometryBuilder()
                _parse_obj(child, cb)
                row = cb.finish()
                ct = int(row.types[0])
                if ct == GT_MISSING:
                    continue
                if ct == GT_GEOMETRYCOLLECTION:
                    children.extend(row.children_of(0))
                    continue
                children.append((ct, row.geom_slices(0)))
            if children:
                b.append_collection(children)
            else:
                b.append_empty(GT_GEOMETRYCOLLECTION)
            return
        raise ValueError(f"unknown GeoJSON type {obj.get('type')!r}")
    c = obj.get("coordinates")
    if c is None or len(c) == 0:
        b.append_empty(t)
        return
    arr = lambda seq: np.asarray(seq, dtype=np.float64)[:, :2]  # noqa: E731
    if t == GT_POINT:
        b.append_point(float(c[0]), float(c[1]))
    elif t == GT_LINESTRING:
        b.append(t, [[arr(c)]])
    elif t == GT_POLYGON:
        b.append(t, [[arr(r) for r in c]])
    elif t == GT_MULTIPOINT:
        b.append(t, [[arr([p])] for p in c])
    elif t == GT_MULTILINESTRING:
        b.append(t, [[arr(l)] for l in c])
    else:  # MULTIPOLYGON
        b.append(t, [[arr(r) for r in p] for p in c])


def parse_array(values) -> GeometryArray:
    """list of GeoJSON strings/dicts (None → missing) → GeometryArray."""
    b = GeometryBuilder()
    for v in values:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            b.append_null()
            continue
        _parse_obj(json.loads(v) if isinstance(v, str) else v, b)
    return b.finish()
