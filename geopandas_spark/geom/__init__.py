"""Pure-numpy columnar geometry kernel.

Replaces the reference's shapely/GEOS dependency (reference:
geopandas/array.py:346-372 wraps numpy object arrays of GEOS pointers) with
a GeoArrow-style ragged columnar layout that vectorizes across a whole Arrow
batch — no per-geometry heap objects at all.
"""

from geopandas_spark.geom.array import (  # noqa: F401
    GT_MISSING,
    GT_POINT,
    GT_LINESTRING,
    GT_POLYGON,
    GT_MULTIPOINT,
    GT_MULTILINESTRING,
    GT_MULTIPOLYGON,
    GT_GEOMETRYCOLLECTION,
    GeometryArray,
    GeometryBuilder,
)
from geopandas_spark.geom import wkb, wkt, algos  # noqa: F401
