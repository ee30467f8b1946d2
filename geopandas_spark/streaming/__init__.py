"""Streaming geospatial ops (SURVEY.md §2.9 — engine-added surface).

The reference has no streaming capability (verified: no streaming module
anywhere under geopandas/). Because every elementwise operator in this
engine is a stateless column expression, the whole §2.2-2.3 surface works
on Structured Streaming inputs unchanged. This module adds the composed
pieces that need streaming-aware plans.
"""

from geopandas_spark.streaming.ops import (  # noqa: F401
    cell_stats_stream, dedup_stream, enrich_stream, filter_stream_bbox,
    lsh_dedup_stream,
    sjoin_stream_stream, windowed_union,
)
