"""clip: filter + intersect against a mask (reference:
geopandas/tools/clip.py:109-268)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from geopandas_spark.functions import st
from geopandas_spark.geom import algos, wkb, wkt


def clip(df: DataFrame, mask, *, geom: str = "geom",
         keep_geom_type: bool = False) -> DataFrame:
    """Clip rows to ``mask`` (WKT string or WKB bytes of a single geometry).

    Plan: native bbox prefilter (prunable) → exact intersects filter →
    intersection. Rectangle masks take the clip_by_rect fast path, exactly
    like the reference (tools/clip.py:87-99); the mask is evaluated once
    driver-side and broadcast as a literal."""
    if isinstance(mask, str):
        mga = wkt.parse_array([mask])
    else:
        mga = wkb.decode([mask])
    mb = algos.bounds(mga)[0]
    blob = wkb.encode(mga)[0]

    pre = df.withColumn("__b__", st.bounds(geom)).filter(
        (F.col("__b__.xmin") <= float(mb[2])) &
        (F.col("__b__.xmax") >= float(mb[0])) &
        (F.col("__b__.ymin") <= float(mb[3])) &
        (F.col("__b__.ymax") >= float(mb[1]))).drop("__b__")

    is_rect = bool(
        int(mga.types[0]) == 3 and
        algos._is_axis_aligned_box(mga.geom_slices(0)[0][0]))
    pre = pre.filter(st.intersects(geom, F.lit(blob)))
    if is_rect:
        clipped = st.clip_by_rect(geom, mb[0], mb[1], mb[2], mb[3])
    else:
        clipped = st.intersection(geom, F.lit(blob))
    out = pre.withColumn(geom, clipped)
    if keep_geom_type:
        out = out.filter(~st.is_empty(geom))
    return out
