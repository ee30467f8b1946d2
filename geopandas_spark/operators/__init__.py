"""Composed DataFrame plans: spatial joins, dissolve, clip, explode.

These are the engine's multi-row operators (SURVEY.md §2.4-2.5, §2.8) —
each is a declarative composition of native Spark operations plus the
minimal UDF refine step, so Catalyst keeps optimizing around them.
"""

from geopandas_spark.operators.sjoin import sjoin, sjoin_nearest  # noqa: F401
from geopandas_spark.operators.dissolve import dissolve, total_bounds  # noqa: F401
from geopandas_spark.operators.reshape import explode, get_coordinates_df  # noqa: F401
from geopandas_spark.operators.clip import clip  # noqa: F401
from geopandas_spark.operators.overlay import overlay  # noqa: F401
from geopandas_spark.operators.geocoding import (  # noqa: F401
    geocode, reverse_geocode,
)
from geopandas_spark.operators.partitioning import hilbert_repartition  # noqa: F401
from geopandas_spark.operators.coverage import (  # noqa: F401
    invalid_coverage_edges, simplify_coverage,
)
