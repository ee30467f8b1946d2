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
