"""GeoParquet source/sink (reference: geopandas/io/arrow.py).

Read path (reference :671-809): geometry arrives as WKB binary — Spark's
native parquet scan reads it with zero conversion; the spec ``geo``
key-value metadata is decoded driver-side from one footer. A ``bbox=``
filter becomes plain range predicates on the covering bbox struct
(reference builds the same pyarrow filter, :884-944) — Catalyst pushes
them to row-group min/max stats natively, so pruning is free and scales
to any number of files.

Write path (reference :385-448): the covering bbox struct column is
computed inside the plan (one vectorized UDF), the parquet files are
written natively (partitioned, any size), then the spec ``geo`` footer
metadata is attached per file. Footer attachment is a driver-side
metadata-only rewrite per part file; at cluster scale this step belongs in
a commit-protocol hook, which Spark only exposes JVM-side — documented
trade-off, the data path itself is fully distributed.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from geopandas_spark.functions import st

GEO_VERSION = "1.1.0"
BBOX_COL = "bbox"


def _geo_metadata(geom: str, geometry_types: Sequence[str], bbox,
                  crs: Optional[str], covering: bool) -> dict:
    col = {
        "encoding": "WKB",
        "geometry_types": sorted(set(geometry_types)),
        "crs": crs,
    }
    if bbox is not None:
        col["bbox"] = [float(v) for v in bbox]
    if covering:
        col["covering"] = {"bbox": {
            "xmin": [BBOX_COL, "xmin"], "ymin": [BBOX_COL, "ymin"],
            "xmax": [BBOX_COL, "xmax"], "ymax": [BBOX_COL, "ymax"]}}
    return {"version": GEO_VERSION, "primary_column": geom,
            "columns": {geom: col}}


def to_parquet(df: DataFrame, path: str, *, geom: str = "geom",
               crs: Optional[str] = None, write_covering_bbox: bool = True,
               mode: str = "overwrite", partition_by=None) -> dict:
    """Write a GeoParquet dataset; returns the ``geo`` metadata dict.

    The covering bbox column makes subsequent ``read_parquet(bbox=...)``
    scans prunable at the row-group level (reference arrow.py:182-190).
    """
    out = df
    if write_covering_bbox:
        out = out.withColumn(BBOX_COL, st.bounds(geom))
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    # dataset-level stats for the footer metadata (one native agg each)
    stats = df.select(st.geometry_type(geom).alias("t"),
                      st.bounds(geom).alias("b")).agg(
        F.collect_set("t").alias("types"),
        F.min("b.xmin").alias("xmin"), F.min("b.ymin").alias("ymin"),
        F.max("b.xmax").alias("xmax"), F.max("b.ymax").alias("ymax"),
    ).collect()[0]
    bbox = None
    if stats["xmin"] is not None:
        bbox = (stats["xmin"], stats["ymin"], stats["xmax"], stats["ymax"])
    meta = _geo_metadata(geom, [t for t in stats["types"] if t], bbox, crs,
                         write_covering_bbox)
    _attach_footer_metadata(path, meta)
    return meta


def _attach_footer_metadata(path: str, meta: dict):
    import pyarrow.parquet as pq

    payload = json.dumps(meta).encode()
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(root, fn)
            table = pq.read_table(fp)
            existing = table.schema.metadata or {}
            table = table.replace_schema_metadata(
                {**existing, b"geo": payload})
            pq.write_table(table, fp)
            crc = os.path.join(root, f".{fn}.crc")
            if os.path.exists(crc):  # stale Hadoop checksum sidecar
                os.remove(crc)


def read_geo_metadata(spark_or_path, path: Optional[str] = None) -> Optional[dict]:
    """Decode the ``geo`` footer metadata from the first parquet part file
    (reference arrow.py:625-639)."""
    p = path if path is not None else spark_or_path
    import pyarrow.parquet as pq

    for root, _dirs, files in os.walk(p):
        for fn in sorted(files):
            if fn.endswith(".parquet"):
                md = pq.read_schema(os.path.join(root, fn)).metadata or {}
                if b"geo" in md:
                    return json.loads(md[b"geo"])
                return None
    return None


def read_parquet(spark: SparkSession, path: str, *, bbox=None,
                 columns=None, geom: Optional[str] = None) -> DataFrame:
    """Read a GeoParquet dataset (reference arrow.py:671-809).

    ``bbox=(xmin, ymin, xmax, ymax)`` applies an intersects prefilter:
    native range predicates on the covering bbox struct when present
    (row-group pruning via parquet stats — check ``PushedFilters`` in
    ``.explain``), falling back to an exact ``st_intersects`` refine when
    not. ``columns`` prunes the scan (``ReadSchema``).
    """
    meta = read_geo_metadata(path)
    df = spark.read.parquet(path)
    gcol = geom or (meta or {}).get("primary_column", "geom")
    if bbox is not None:
        xmin, ymin, xmax, ymax = (float(v) for v in bbox)
        covering = ((meta or {}).get("columns", {})
                    .get(gcol, {}).get("covering"))
        if covering or BBOX_COL in df.columns:
            df = df.filter(
                (F.col(f"{BBOX_COL}.xmin") <= xmax) &
                (F.col(f"{BBOX_COL}.xmax") >= xmin) &
                (F.col(f"{BBOX_COL}.ymin") <= ymax) &
                (F.col(f"{BBOX_COL}.ymax") >= ymin))
        else:
            df = df.filter(st.intersects(
                F.col(gcol),
                st.makebox(F.lit(xmin), F.lit(ymin), F.lit(xmax),
                           F.lit(ymax))))
    if columns is not None:
        keep = list(columns)
        if gcol not in keep:
            keep.append(gcol)
        df = df.select(*[c for c in keep if c in df.columns])
    return df
