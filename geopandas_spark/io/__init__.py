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
