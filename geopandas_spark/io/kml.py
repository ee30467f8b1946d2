"""KML source/sink (reference: geopandas read_file/to_file with the
LIBKML/KML OGR driver, geopandas/io/file.py:197-339, 614-795 — here a
clean-room stdlib ``xml.etree`` implementation, no OGR).

Read: KML files are single XML documents, so the parse unit is a file —
``spark.read.format("binaryFile")`` distributes the file list across
executors and each file's Placemarks are parsed in a ``mapInPandas`` batch
(namespace-agnostic local-name matching; Point / LineString / Polygon with
holes / MultiGeometry; ``lon,lat[,alt]`` coordinate tuples, altitude → Z).
Many small files parallelize perfectly; one giant file is bounded by the
same driver-style ceiling as a GeoJSON FeatureCollection and is guarded.

Write: Placemark fragments are rendered *distributed* (one mapInPandas
batch pass: WKB decode → KML geometry XML); the driver only streams the
fragments into the single output document via ``toLocalIterator`` (one
partition in memory at a time) — a single .kml file is inherently one
document, same single-writer shape as the reference."""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (BinaryType, StringType, StructField,
                               StructType)

from geopandas_spark.geom import wkb
from geopandas_spark.geom.array import (GT_LINESTRING, GT_MULTILINESTRING,
                                        GT_MULTIPOINT, GT_MULTIPOLYGON,
                                        GT_POINT, GT_POLYGON,
                                        GeometryBuilder)

_KML_MAX_BYTES = 512 * 1024 * 1024


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_coords(text: str) -> np.ndarray:
    """KML coordinates: whitespace-separated ``lon,lat[,alt]`` tuples →
    (n, 2 or 3) float array."""
    rows = []
    width = 2
    for tok in (text or "").split():
        parts = tok.split(",")
        x, y = float(parts[0]), float(parts[1])
        if len(parts) >= 3:
            rows.append((x, y, float(parts[2])))
            width = 3
        else:
            rows.append((x, y, np.nan))
    if not rows:
        return np.empty((0, 2), dtype=np.float64)
    arr = np.array(rows, dtype=np.float64)
    return arr if width == 3 else arr[:, :2]


def _child(el, name):
    for c in el:
        if _local(c.tag) == name:
            return c
    return None


def _children(el, name):
    return [c for c in el if _local(c.tag) == name]


def _parse_geom_el(el):
    """KML geometry element → (type_code, parts, zm) or list of such for
    MultiGeometry (parts in GeometryBuilder format)."""
    t = _local(el.tag)
    if t == "Point":
        c = _parse_coords(getattr(_child(el, "coordinates"), "text", ""))
        zm = "z" if c.shape[1] == 3 else ""
        return [(GT_POINT, [[c]], zm)]
    if t == "LineString":
        c = _parse_coords(getattr(_child(el, "coordinates"), "text", ""))
        zm = "z" if c.shape[1] == 3 else ""
        return [(GT_LINESTRING, [[c]], zm)]
    if t == "Polygon":
        rings = []
        width = 2
        ob = _child(el, "outerBoundaryIs")
        if ob is not None:
            lr = _child(ob, "LinearRing")
            r = _parse_coords(getattr(_child(lr, "coordinates"), "text", ""))
            width = max(width, r.shape[1])
            rings.append(r)
        for ib in _children(el, "innerBoundaryIs"):
            lr = _child(ib, "LinearRing")
            r = _parse_coords(getattr(_child(lr, "coordinates"), "text", ""))
            width = max(width, r.shape[1])
            rings.append(r)
        rings = [r if r.shape[1] == width else
                 np.column_stack([r, np.full(len(r), np.nan)])
                 for r in rings]
        return [(GT_POLYGON, [rings], "z" if width == 3 else "")]
    if t == "MultiGeometry":
        out = []
        for c in el:
            out.extend(_parse_geom_el(c))
        return out
    return []


_MULTI = {GT_POINT: GT_MULTIPOINT, GT_LINESTRING: GT_MULTILINESTRING,
          GT_POLYGON: GT_MULTIPOLYGON}


def _append_geoms(b: GeometryBuilder, geoms):
    """0/1/n parsed leaf geometries → one builder row (multi-promotion for
    same-type MultiGeometry, GC for mixed)."""
    if not geoms:
        b.append_null()
    elif len(geoms) == 1:
        t, parts, zm = geoms[0]
        b.append(t, parts, zm=zm)
    elif len({g[0] for g in geoms}) == 1:
        t = geoms[0][0]
        zm = "z" if any(g[2] for g in geoms) else ""
        parts = []
        for _, p, gzm in geoms:
            for part in p:
                parts.append([
                    r if (("z" in zm) == ("z" in gzm)) else (
                        np.column_stack([r, np.full(len(r), np.nan)])
                        if "z" in zm else r[:, :2])
                    for r in part])
        b.append(_MULTI[t], parts, zm=zm)
    else:
        b.append_collection(
            [(t, [[r[:, :2] for r in part] for part in parts])
             for t, parts, _ in geoms])


def _parse_kml_bytes(data: bytes):
    """One KML document → list of (name, description, props_json, wkb)."""
    import json

    root = ET.fromstring(data)
    rows = []
    for pm in root.iter():
        if _local(pm.tag) != "Placemark":
            continue
        name = getattr(_child(pm, "name"), "text", None)
        desc = getattr(_child(pm, "description"), "text", None)
        props = {}
        for ed in _children(pm, "ExtendedData"):
            for d in ed.iter():
                lt = _local(d.tag)
                if lt == "Data":
                    v = _child(d, "value")
                    props[d.get("name")] = v.text if v is not None else None
                elif lt == "SimpleData":
                    props[d.get("name")] = d.text
        geoms = []
        for c in pm:
            if _local(c.tag) in ("Point", "LineString", "Polygon",
                                 "MultiGeometry"):
                geoms.extend(_parse_geom_el(c))
        b = GeometryBuilder()
        _append_geoms(b, geoms)
        enc = wkb.encode(b.finish())[0]
        rows.append((name, desc,
                     json.dumps(props) if props else None, enc))
    return rows


def read_kml(spark: SparkSession, path: str, *, geom: str = "geom",
             expand_properties: bool = True,
             max_file_bytes: int = _KML_MAX_BYTES) -> DataFrame:
    """Read KML Placemarks into (name, description, [property cols], geom).

    Parallelism unit = file; ExtendedData fields expand into typed columns
    via the same sampled-schema from_json pass as the GeoJSON reader."""
    from geopandas_spark.io.geojson import _input_bytes

    nbytes = _input_bytes(spark, path)
    if nbytes > max_file_bytes:
        raise ValueError(
            f"KML input is {nbytes >> 20} MiB, above the "
            f"{max_file_bytes >> 20} MiB per-document ceiling (a KML file "
            "is one XML document — the parse cannot distribute within a "
            "file). Split the export into multiple .kml files, or raise "
            "max_file_bytes= explicitly.")

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    schema = StructType([
        StructField("name", StringType()),
        StructField("description", StringType()),
        StructField("properties", StringType()),
        StructField(geom, BinaryType()),
    ])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for data in pdf["content"]:
                out.extend(_parse_kml_bytes(bytes(data)))
            yield pd.DataFrame(out, columns=["name", "description",
                                             "properties", geom])

    out = files.mapInPandas(parse, schema)
    if expand_properties:
        sample = [r[0] for r in out.select("properties")
                  .filter(F.col("properties").isNotNull()).limit(200)
                  .collect()]
        if sample:
            pschema = spark.read.json(
                spark.sparkContext.parallelize(sample, 1)).schema
            fields = [f for f in pschema.fields
                      if not f.name.startswith("_corrupt")]
            if fields:
                return (out.withColumn(
                    "__p__", F.from_json("properties", StructType(fields)))
                    .select("name", "description", "__p__.*", geom))
        out = out.drop("properties")
    return out


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;"))


def _coords_str(ring, zs=None) -> str:
    if zs is not None:
        return " ".join(f"{x:.10g},{y:.10g},{z:.10g}"
                        for (x, y), z in zip(ring, zs))
    return " ".join(f"{x:.10g},{y:.10g}" for x, y in ring)


def _kml_geom(ga, i: int) -> str:
    """Row i of a GeometryArray → KML geometry XML."""
    t = int(ga.types[i])
    zbuf = ga.dim_slice(ga.z, i)
    parts = ga.geom_slices(i)
    pos = [0]

    def nxt(ring):
        if zbuf is None:
            return None
        s = zbuf[pos[0]:pos[0] + len(ring)]
        pos[0] += len(ring)
        return s

    def one(t1, prt):
        if t1 == GT_POINT:
            r = prt[0]
            return (f"<Point><coordinates>{_coords_str(r, nxt(r))}"
                    "</coordinates></Point>")
        if t1 == GT_LINESTRING:
            r = prt[0]
            return (f"<LineString><coordinates>{_coords_str(r, nxt(r))}"
                    "</coordinates></LineString>")
        s = ["<Polygon>"]
        for k, r in enumerate(prt):
            tag = "outerBoundaryIs" if k == 0 else "innerBoundaryIs"
            s.append(f"<{tag}><LinearRing><coordinates>"
                     f"{_coords_str(r, nxt(r))}"
                     f"</coordinates></LinearRing></{tag}>")
        s.append("</Polygon>")
        return "".join(s)

    from geopandas_spark.geom.array import (GT_GEOMETRYCOLLECTION,
                                            SINGLE_OF)
    if t == GT_GEOMETRYCOLLECTION:
        frags = [one(ct, part) for ct, cparts in ga.children_of(i)
                 for part in cparts]
        return "<MultiGeometry>" + "".join(frags) + "</MultiGeometry>"
    base = SINGLE_OF.get(t, t)
    frags = [one(base, prt) for prt in parts]
    if len(frags) == 1 and t == base:
        return frags[0]
    return "<MultiGeometry>" + "".join(frags) + "</MultiGeometry>"


def to_kml(df: DataFrame, path: str, *, geom: str = "geom",
           name_col: str = None, document_name: str = None):
    """Write a single KML document. Fragment rendering (WKB → Placemark
    XML) runs distributed in one mapInPandas pass; the driver streams the
    fragments into the file via toLocalIterator (bounded by one partition
    of rendered strings, not the dataset)."""
    props = [c for c in df.columns if c != geom]
    if name_col is None and "name" in props:
        name_col = "name"

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ga = wkb.decode(pdf[geom].tolist())
            frags = []
            for i in range(len(ga)):
                s = ["<Placemark>"]
                if name_col is not None:
                    v = pdf[name_col].iloc[i]
                    if v is not None and not (isinstance(v, float)
                                              and np.isnan(v)):
                        s.append(f"<name>{_xml_escape(str(v))}</name>")
                ext = []
                for c in props:
                    if c == name_col:
                        continue
                    v = pdf[c].iloc[i]
                    if v is None or (isinstance(v, float) and np.isnan(v)):
                        continue
                    ext.append(f'<Data name="{_xml_escape(c)}"><value>'
                               f"{_xml_escape(str(v))}</value></Data>")
                if ext:
                    s.append("<ExtendedData>" + "".join(ext)
                             + "</ExtendedData>")
                if int(ga.types[i]) != 0:
                    s.append(_kml_geom(ga, i))
                s.append("</Placemark>")
                frags.append("".join(s))
            yield pd.DataFrame({"frag": frags})

    frags = df.mapInPandas(render,
                           StructType([StructField("frag", StringType())]))
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n'
                '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>')
        if document_name:
            f.write(f"<name>{_xml_escape(document_name)}</name>")
        for row in frags.toLocalIterator(prefetchPartitions=True):
            f.write(row["frag"])
        f.write("</Document></kml>\n")
