"""Sources & sinks (SURVEY.md §2.1).

GeoParquet read/write with spec ``geo`` metadata + covering bbox pruning,
and GeoJSON / newline-delimited GeoJSONSeq interchange.
"""

from geopandas_spark.io.geoparquet import (  # noqa: F401
    read_parquet, to_parquet,
)
from geopandas_spark.io.geojson import (  # noqa: F401
    read_geojson, to_geojson,
)
from geopandas_spark.io.feather import (  # noqa: F401
    from_arrow, read_feather, to_arrow, to_feather,
)
from geopandas_spark.io.sql import (  # noqa: F401
    read_postgis, to_postgis,
)
from geopandas_spark.io.shapefile import (  # noqa: F401
    read_shapefile, to_shapefile,
)
from geopandas_spark.io.gpkg import (  # noqa: F401
    read_gpkg, to_gpkg,
)
from geopandas_spark.io.kml import (  # noqa: F401
    read_kml, to_kml,
)
from geopandas_spark.io.gml import (  # noqa: F401
    read_gml, to_gml,
)
from geopandas_spark.io.fgb import (  # noqa: F401
    read_fgb, to_fgb,
)


def _apply_read_kwargs(df, geom, bbox=None, mask=None, columns=None,
                       rows=None):
    """Reference read_file's pushdown kwargs (geopandas/io/file.py:197-339)
    re-expressed as native plan operations after the distributed scan:

    - ``bbox=(xmin, ymin, xmax, ymax)``: envelope-intersects prefilter —
      plain range predicates over st_bounds, so Catalyst keeps it next to
      the scan and prunes before any downstream shuffle
    - ``mask=<WKT str | WKB bytes>``: exact intersects filter against one
      geometry (applied after the bbox of the mask as a cheap prefilter)
    - ``columns=[...]``: projection (geometry column always kept)
    - ``rows=N``: limit
    """
    from pyspark.sql import functions as F

    from geopandas_spark.functions import st

    if bbox is not None:
        xmin, ymin, xmax, ymax = (float(v) for v in bbox)
        b = st.bounds(geom)
        df = df.filter((b["xmin"] <= xmax) & (b["xmax"] >= xmin) &
                       (b["ymin"] <= ymax) & (b["ymax"] >= ymin))
    if mask is not None:
        mg = (st.geom_from_text(F.lit(mask)) if isinstance(mask, str)
              else F.lit(mask))
        df = df.filter(st.intersects(F.col(geom), mg))
    if columns is not None:
        keep = list(columns)
        if geom not in keep:
            keep.append(geom)
        df = df.select(*[c for c in keep if c in df.columns])
    if rows is not None:
        df = df.limit(int(rows))
    return df


_PUSHDOWN_KEYS = ("bbox", "mask", "columns", "rows")


def read_file(spark, path, **kw):
    """Format-dispatching reader (reference read_file,
    geopandas/io/file.py:197-339): extension picks the source. Supports
    the reference's ``bbox=``, ``mask=``, ``columns=`` and ``rows=``
    pushdown kwargs on every format (parquet additionally prunes at the
    row-group level via its covering bbox stats)."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext in ("parquet", "pq"):
        # read_parquet implements bbox/columns natively (stats pruning)
        mask = kw.pop("mask", None)
        rows = kw.pop("rows", None)
        df = read_parquet(spark, path, **kw)
        return _apply_read_kwargs(df, kw.get("geom") or "geom",
                                  mask=mask, rows=rows)
    push = {k: kw.pop(k, None) for k in _PUSHDOWN_KEYS}
    if ext == "shp":
        df = read_shapefile(spark, path, **kw)
    elif ext == "gpkg":
        df = read_gpkg(spark, path, **kw)
    elif ext in ("geojson", "json", "geojsonl", "ndjson"):
        df = read_geojson(spark, path, **kw)
    elif ext in ("feather", "arrow", "ipc"):
        df = read_feather(spark, path, **kw)
    elif ext == "kml":
        df = read_kml(spark, path, **kw)
    elif ext == "gml":
        df = read_gml(spark, path, **kw)
    elif ext == "fgb":
        # bbox pushes down into the packed Hilbert R-tree (index-pruned
        # scan); the residual kwargs apply as native plan ops
        df = read_fgb(spark, path, bbox=push.pop("bbox"), **kw)
    else:
        raise ValueError(f"unsupported file extension: .{ext}")
    return _apply_read_kwargs(df, kw.get("geom", "geom"), **push)


def list_layers(path):
    """Layers of a datasource as (name, geometry_type) pairs (reference
    list_layers, geopandas/io/file.py:867-895). GeoPackage enumerates its
    registry tables; single-layer formats report the file stem."""
    import os
    ext = path.rsplit(".", 1)[-1].lower()
    stem = os.path.splitext(os.path.basename(path))[0]
    if ext == "gpkg":
        import sqlite3
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            rows = con.execute(
                "SELECT c.table_name, g.geometry_type_name "
                "FROM gpkg_contents c "
                "JOIN gpkg_geometry_columns g ON c.table_name = g.table_name "
                "WHERE c.data_type = 'features' ORDER BY c.table_name"
            ).fetchall()
        finally:
            con.close()
        pretty = {"GEOMETRY": "Unknown", "POINT": "Point",
                  "LINESTRING": "LineString", "POLYGON": "Polygon",
                  "MULTIPOINT": "MultiPoint",
                  "MULTILINESTRING": "MultiLineString",
                  "MULTIPOLYGON": "MultiPolygon",
                  "GEOMETRYCOLLECTION": "GeometryCollection"}
        return [(name, pretty.get(gt.upper(), gt)) for name, gt in rows]
    if ext == "shp":
        import struct as _s
        with open(path, "rb") as f:
            hdr = f.read(36)
        stype = _s.unpack_from("<i", hdr, 32)[0]
        names = {0: "Unknown", 1: "Point", 3: "LineString", 5: "Polygon",
                 8: "MultiPoint", 11: "Point", 13: "LineString",
                 15: "Polygon"}
        return [(stem, names.get(stype, "Unknown"))]
    if ext == "fgb":
        import struct as _s
        from geopandas_spark.io.fgb import _parse_header
        with open(path, "rb") as f:
            f.read(8)
            (hs,) = _s.unpack("<I", f.read(4))
            meta = _parse_header(f.read(hs))
        names = {0: "Unknown", 1: "Point", 2: "LineString", 3: "Polygon",
                 4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon",
                 7: "GeometryCollection"}
        return [(stem, names.get(meta["geometry_type"], "Unknown"))]
    if ext in ("geojson", "json", "geojsonl", "ndjson", "parquet", "pq",
               "feather", "arrow", "ipc", "kml", "gml"):
        return [(stem, "Unknown")]
    raise ValueError(f"unsupported file extension: .{ext}")


def to_file(df, path, **kw):
    """Format-dispatching writer (reference to_file,
    geopandas/io/file.py:614-795)."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "shp":
        return to_shapefile(df, path, **kw)
    if ext == "gpkg":
        return to_gpkg(df, path, **kw)
    if ext in ("geojson", "json", "geojsonl", "ndjson"):
        return to_geojson(df, path, **kw)
    if ext in ("parquet", "pq"):
        return to_parquet(df, path, **kw)
    if ext in ("feather", "arrow", "ipc"):
        return to_feather(df, path, **kw)
    if ext == "kml":
        return to_kml(df, path, **kw)
    if ext == "gml":
        return to_gml(df, path, **kw)
    if ext == "fgb":
        return to_fgb(df, path, **kw)
    raise ValueError(f"unsupported file extension: .{ext}")
