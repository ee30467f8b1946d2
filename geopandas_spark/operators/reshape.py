"""explode / get_coordinates as DataFrame plans (SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from geopandas_spark.functions import st


def explode(df: DataFrame, *, geom: str = "geom",
            index_parts: bool = True) -> DataFrame:
    """Multi-part geometry → one row per part (reference:
    geopandas/geodataframe.py:2330-2440). The part ordinal lands in
    ``part_index`` when ``index_parts`` (the reference's MultiIndex level
    becomes an explicit column — SURVEY §1.3)."""
    exploded = df.select(
        "*", F.posexplode_outer(st.dump(geom)).alias("part_index", "__part__"))
    out = exploded.drop(geom).withColumnRenamed("__part__", geom)
    if not index_parts:
        out = out.drop("part_index")
    return out


def get_coordinates_df(df: DataFrame, *, geom: str = "geom") -> DataFrame:
    """One row per coordinate with x/y columns (reference: base.py:6242)."""
    return (df.select("*", F.posexplode_outer(st.dump_coordinates(geom))
                      .alias("coord_index", "__c__"))
              .withColumn("x", F.col("__c__.x"))
              .withColumn("y", F.col("__c__.y"))
              .drop("__c__", geom))
