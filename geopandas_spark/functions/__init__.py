"""Column-function surface of the engine (st_* namespace)."""

from geopandas_spark.functions import st
from geopandas_spark.functions.st import register_sql

__all__ = ["st", "register_sql"]
