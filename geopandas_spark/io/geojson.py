"""GeoJSON source/sink (reference: geopandas/io/file.py read/to_file with
GeoJSON driver; geopandas/geodataframe.py:984-1276 to_json/from_features).

Two framings:

- **GeoJSONSeq / newline-delimited** (the scale path): one Feature per
  line. Read distributes natively over line splits (``spark.read.text``);
  parse is ``from_json`` (native) for the frame + one vectorized UDF for
  the geometry object. Write is the exact inverse — native ``to_json``
  over a struct column. Arbitrarily large datasets stream through.
- **FeatureCollection** (single JSON document): inherently one object —
  read/written driver-side for small files only (practical ceiling
  ~1M features / driver heap), mirroring the reference's single-machine
  behavior. Anything bigger belongs in GeoJSONSeq, the distributed
  framing above.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from geopandas_spark.functions import st


_FC_MAX_BYTES = 512 * 1024 * 1024  # FeatureCollection driver-read ceiling


def _input_bytes(spark: SparkSession, path: str) -> int:
    """Total size of the files matched by ``path`` (Hadoop glob), or -1 if
    the filesystem probe fails (non-fatal — caller skips the guard)."""
    try:
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        hp = jvm.org.apache.hadoop.fs.Path(path)
        fs = hp.getFileSystem(conf)
        statuses = fs.globStatus(hp) or []
        total = 0
        for s in statuses:
            if s.isDirectory():
                it = fs.listFiles(s.getPath(), True)
                while it.hasNext():
                    total += it.next().getLen()
            else:
                total += s.getLen()
        return total
    except Exception:
        return -1


def read_geojson(spark: SparkSession, path: str, *,
                 geom: str = "geom",
                 expand_properties: bool = True,
                 max_collection_bytes: int = _FC_MAX_BYTES) -> DataFrame:
    """Read GeoJSONSeq (one Feature per line) or a FeatureCollection file
    into a DataFrame with property columns + a WKB geometry column.

    ``expand_properties`` infers the property schema from a bounded sample
    of features (schemas are unioned over the sample, so properties absent
    from the first feature still get columns; features beyond the sample
    carrying *novel* properties lose them — documented limit) and expands
    it into top-level columns via native ``from_json`` — the reference's
    read_file returns one column per property
    (geopandas/io/file.py:197-339). Set False to keep the raw
    ``properties`` JSON string column."""
    first = spark.read.text(path).limit(1).collect()
    head = first[0][0].lstrip() if first else ""
    if head.startswith("{") and '"FeatureCollection"' in head:
        # single-document collection: driver-side parse (small files only
        # — a FeatureCollection is one JSON object, so the parse cannot
        # distribute; guard before pulling it onto the driver)
        nbytes = _input_bytes(spark, path)
        if nbytes > max_collection_bytes:
            raise ValueError(
                f"FeatureCollection input is {nbytes >> 20} MiB, above the "
                f"{max_collection_bytes >> 20} MiB driver-read ceiling. "
                "Convert to newline-delimited GeoJSON (GeoJSONSeq, one "
                "Feature per line) which reads distributed — e.g. "
                "`jq -c '.features[]' in.geojson > out.geojsonl` — or "
                "raise max_collection_bytes= explicitly.")
        sc_files = spark.sparkContext.wholeTextFiles(path).values().collect()
        feats = []
        for doc in sc_files:
            feats.extend(json.loads(doc).get("features", []))
        rows = [(json.dumps(f.get("properties", {})),
                 json.dumps(f.get("geometry"))) for f in feats]
        raw = spark.createDataFrame(
            rows, StructType([StructField("properties", StringType()),
                              StructField("__geojson__", StringType())]))
    else:
        lines = spark.read.text(path).withColumnRenamed("value", "line")
        raw = lines.select(
            F.get_json_object("line", "$.properties").alias("properties"),
            F.get_json_object("line", "$.geometry").alias("__geojson__"))
    out = (raw.withColumn(geom, st.geom_from_geojson("__geojson__"))
              .drop("__geojson__"))
    if expand_properties:
        # union the schema over a bounded sample (not just the first
        # feature) so rows whose first-feature properties are sparse still
        # surface every column seen in the sample
        sample = [r[0] for r in out.select("properties").filter(
            F.col("properties").isNotNull()).limit(200).collect()
            if r[0] and r[0] != "{}"]
        if sample:
            schema = spark.read.json(
                spark.sparkContext.parallelize(sample, 1)).schema
            fields = [f for f in schema.fields
                      if not f.name.startswith("_corrupt")]
            if fields:
                out = (out.withColumn(
                    "__p__", F.from_json("properties", StructType(fields)))
                    .select("__p__.*", geom))
            else:
                out = out.drop("properties")
        else:
            out = out.drop("properties")
    return out


def to_geojson(df: DataFrame, path: str, *, geom: str = "geom",
               mode: str = "overwrite"):
    """Write newline-delimited GeoJSON Features (GeoJSONSeq). Properties =
    every non-geometry column; framing is native ``to_json`` so the only
    Python step is the geometry serialization UDF."""
    props = [c for c in df.columns if c != geom]
    # properties framed with native to_json; the raw geometry JSON string
    # is spliced in directly (its ragged coordinate nesting has no static
    # Spark type)
    line = F.concat(
        F.lit('{"type": "Feature", "properties": '),
        F.coalesce(F.to_json(F.struct(
            *[F.col(c).alias(c) for c in props])), F.lit("{}")),
        F.lit(', "geometry": '),
        F.coalesce(st.as_geojson(geom), F.lit("null")),
        F.lit("}"))
    df.select(line.alias("value")).write.mode(mode).text(path)
