"""Spatial partitioning: Hilbert-range repartitioning (SURVEY.md §4).

This is the engine's core physical strategy for locality: spatially close
rows land in the same partition, which makes downstream grid joins cheaper,
writes prunable (bbox column min/max stats become tight), and skew visible
to AQE."""

from __future__ import annotations

from pyspark.sql import DataFrame

from geopandas_spark.functions import st
from geopandas_spark.operators.dissolve import total_bounds


def hilbert_repartition(df: DataFrame, num_partitions: int, *,
                        geom: str = "geom", bounds=None,
                        keep_key: bool = False) -> DataFrame:
    """Repartition by range over the Hilbert key of each geometry's bbox
    midpoint. ``bounds`` (minx,miny,maxx,maxy) is computed with one agg
    when not given."""
    if bounds is None:
        bounds = total_bounds(df, geom)
    key = st.hilbert(geom, *bounds)
    out = (df.withColumn("__hilbert__", key)
             .repartitionByRange(num_partitions, "__hilbert__"))
    if not keep_key:
        out = out.drop("__hilbert__")
    return out
