"""Streaming geospatial plans.

- ``enrich_stream``: stream-static spatial join — tags each streaming
  geometry with the attributes of the static polygons it intersects. The
  static side is collected once and probed per micro-batch inside the same
  vectorized mapInPandas harness the batch broadcast sjoin uses; the final
  attach is a stream-static broadcast equi-join (natively supported by
  Structured Streaming).
- ``windowed_union``: watermarked tumbling/sliding-window geometric union.
  GROUPED_AGG pandas UDFs are not allowed in streaming aggregates, so the
  plan collects WKB natively (state-store-backed, partial-aggregated) and
  reduces with one scalar ``st_union_array`` call per window.
- ``filter_stream_bbox``: predicate filtering against a literal box —
  pure column expression, here only to name the pattern.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from geopandas_spark.functions import st
from geopandas_spark.operators.sjoin import sjoin


def enrich_stream(stream: DataFrame, static: DataFrame, *,
                  predicate: str = "intersects", geom_left: str = "geom",
                  geom_right: str = "geom", how: str = "inner",
                  distance: Optional[float] = None) -> DataFrame:
    """Stream-static spatial join (streaming left, static right).

    Same physical shape as the batch broadcast sjoin: the static side is
    small by stream-static-join rules; per micro-batch each Arrow batch of
    the stream probes the in-closure geometry set with the vectorized bbox
    prefilter + exact refine.
    """
    if how not in ("inner", "left"):
        raise ValueError("stream-static sjoin supports how=inner/left")
    return sjoin(stream, static, predicate=predicate, how=how,
                 geom_left=geom_left, geom_right=geom_right,
                 distance=distance, strategy="broadcast")


def windowed_union(stream: DataFrame, time_col: str, window: str, *,
                   slide: Optional[str] = None, geom: str = "geom",
                   watermark: str = "10 minutes", extra_keys=()) -> DataFrame:
    """Watermarked windowed geometric union (+ count) per window.

    Late rows beyond the watermark are dropped by the engine; each closed
    window emits one row with the union of its geometries.
    """
    w = F.window(time_col, window, slide) if slide else \
        F.window(time_col, window)
    return (stream.withWatermark(time_col, watermark)
            .groupBy(w.alias("window"), *[F.col(k) for k in extra_keys])
            .agg(F.collect_list(geom).alias("__geoms__"),
                 F.count("*").alias("n"))
            .withColumn(geom, st.union_array("__geoms__"))
            .drop("__geoms__"))


def filter_stream_bbox(stream: DataFrame, bbox, *,
                       geom: str = "geom") -> DataFrame:
    """Keep rows intersecting a literal box (reference cx[] analogue,
    geopandas/base.py:6206-6240) — stateless, fully streaming-safe."""
    xmin, ymin, xmax, ymax = (float(v) for v in bbox)
    return stream.filter(st.intersects(
        F.col(geom), st.makebox(F.lit(xmin), F.lit(ymin), F.lit(xmax),
                                F.lit(ymax))))
