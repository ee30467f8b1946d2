"""Set-theoretic overlay producing new geometries (SURVEY.md §2.4).

Reference parity: geopandas/tools/overlay.py:181-392 — hows
``intersection`` (:36), ``difference`` (:88), ``identity`` (:114),
``symmetric_difference`` (:138), ``union`` (:169), plus the
``keep_geom_type`` collection filtering of ``_collection_extract``
(:395-454) re-expressed as a per-row geometry-class predicate.

Plan shape (all composed from the engine's own primitives):

- the *intersection part* is an sjoin-intersects candidate plan (broadcast
  or grid — both shuffle-light, §2.4) followed by one ``st_intersection``
  refine UDF;
- the *difference part* groups the matched pairs per left row, unions the
  right geometries per group (``st_union_agg``, two-phase-able), and
  subtracts once — equivalent to the reference's pairwise
  ``reduce(difference)`` (overlay.py:99-104) but with one UDF call per row
  instead of one per pair;
- ``union`` / ``identity`` / ``symmetric_difference`` are unionByName
  compositions of those two parts, mirroring overlay.py:114-178.

At scale every step before the refine UDFs is native (codegen'd,
AQE-planned); the per-row keys are ``monotonically_increasing_id`` over the
(deterministic) source scans, used only inside the plan and dropped.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from geopandas_spark.functions import st
from geopandas_spark.operators.sjoin import sjoin

_HOWS = ("intersection", "union", "identity", "symmetric_difference",
         "difference")

_K1, _K2, _SUB = "__ov_k1__", "__ov_k2__", "__ov_sub__"


def _geom_class(col) -> F.Column:
    t = st.geometry_type(col)
    return (F.when(t.isin("Polygon", "MultiPolygon"), "area")
             .when(t.isin("LineString", "MultiLineString"), "line")
             .otherwise("point"))


def _suffix(df: DataFrame, overlap, suffix: str) -> DataFrame:
    for c in overlap:
        df = df.withColumnRenamed(c, f"{c}_{suffix}")
    return df


def _intersection_part(d1, d2, geom, keep_geom_type, strategy) -> DataFrame:
    pairs = sjoin(d1, d2, predicate="intersects", geom_left=geom,
                  geom_right=geom, lsuffix="1", rsuffix="2",
                  strategy=strategy)
    g1, g2 = f"{geom}_1", f"{geom}_2"
    res = pairs.withColumn("__ov_cls__", _geom_class(F.col(g1)))
    # keep_geom_type=False surfaces GEOS's full point-set output (shared
    # edges → LineStrings, touch points; mixed rows → GEOMETRYCOLLECTION),
    # matching the reference's _collection_extract pass-through
    # (tools/overlay.py:395-454). The polygonal-only kernel suffices when
    # the dimension filter would drop the residue anyway.
    res = res.withColumn(geom, st.intersection(F.col(g1), F.col(g2),
                                               mixed=not keep_geom_type))
    res = res.filter(~st.is_empty(geom))
    if keep_geom_type:
        res = res.filter(_geom_class(F.col(geom)) == F.col("__ov_cls__"))
    return res.drop(g1, g2, "__ov_cls__")


def _difference_part(d1, d2, geom, key, strategy) -> DataFrame:
    """d1 rows with geometry − union(intersecting d2 geometries)."""
    rsel = d2.select(F.col(geom).alias("__ov_g2__"))
    pairs = sjoin(d1.select(key, geom), rsel, predicate="intersects",
                  geom_left=geom, geom_right="__ov_g2__", strategy=strategy)
    subs = pairs.groupBy(key).agg(st.union_agg("__ov_g2__").alias(_SUB))
    out = (d1.join(subs, on=key, how="left")
             .withColumn(geom, F.when(F.col(_SUB).isNull(), F.col(geom))
                         .otherwise(st.difference(F.col(geom), F.col(_SUB))))
             .drop(_SUB)
             .filter(~st.is_empty(geom)))
    return out


def overlay(df1: DataFrame, df2: DataFrame, how: str = "intersection", *,
            geom: str = "geom", keep_geom_type: bool = True,
            strategy: Optional[str] = None) -> DataFrame:
    """Spatial overlay of two DataFrames carrying a WKB ``geom`` column.

    Output columns follow the reference: df1 attributes (suffixed ``_1`` on
    clash), df2 attributes (suffixed ``_2``), one ``geom`` column. Rows
    contributed only by one side carry NULLs for the other side's columns
    (reference: overlay.py:114-178 concat semantics).
    """
    if how not in _HOWS:
        raise ValueError(f"how must be one of {_HOWS}, got {how!r}")
    overlap = (set(df1.columns) & set(df2.columns)) - {geom}

    d1 = df1.withColumn(_K1, F.monotonically_increasing_id())
    d2 = df2.withColumn(_K2, F.monotonically_increasing_id())

    if how == "difference":
        return _difference_part(d1, d2, geom, _K1, strategy).drop(_K1)

    parts = []
    if how in ("intersection", "union", "identity"):
        parts.append(
            _intersection_part(d1, d2, geom, keep_geom_type, strategy)
            .drop(_K1, _K2))
    if how in ("union", "identity", "symmetric_difference"):
        parts.append(
            _suffix(_difference_part(d1, d2, geom, _K1, strategy).drop(_K1),
                    overlap, "1"))
    if how in ("union", "symmetric_difference"):
        parts.append(
            _suffix(_difference_part(d2, d1, geom, _K2, strategy).drop(_K2),
                    overlap, "2"))

    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p, allowMissingColumns=True)
    return res
