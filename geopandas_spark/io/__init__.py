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


def read_file(spark, path, **kw):
    """Format-dispatching reader (reference read_file,
    geopandas/io/file.py:197-339): extension picks the source."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "shp":
        return read_shapefile(spark, path, **kw)
    if ext == "gpkg":
        return read_gpkg(spark, path, **kw)
    if ext in ("geojson", "json", "geojsonl", "ndjson"):
        return read_geojson(spark, path, **kw)
    if ext in ("parquet", "pq"):
        return read_parquet(spark, path, **kw)
    if ext in ("feather", "arrow", "ipc"):
        return read_feather(spark, path, **kw)
    raise ValueError(f"unsupported file extension: .{ext}")


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
    if ext in ("geojson", "json", "geojsonl", "ndjson", "parquet", "pq",
               "feather", "arrow", "ipc"):
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
    raise ValueError(f"unsupported file extension: .{ext}")
