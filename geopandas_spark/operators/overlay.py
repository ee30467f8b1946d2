"""Set-theoretic overlay producing new geometries (SURVEY.md §2.4).

Reference parity: geopandas/tools/overlay.py:181-392 — hows
``intersection`` (:36), ``difference`` (:88), ``identity`` (:114),
``symmetric_difference`` (:138), ``union`` (:169), plus the
``keep_geom_type`` collection filtering of ``_collection_extract``
(:395-454) re-expressed as a per-row geometry-class predicate.

Plan shape (all composed from the engine's own primitives):

- single-family hows (``intersection``, ``difference``) run one
  sjoin-intersects candidate plan (broadcast or grid — both
  shuffle-light, §2.4) followed by one refine UDF;
- multi-family hows (``union``, ``identity``, ``symmetric_difference``)
  are three functions of the SAME intersects pair set, so the candidate
  join runs ONCE with ``how="full"`` and is localCheckpoint-ed; the
  branches then re-read the materialized pairs (r8 plan audit: the old
  3-sjoin union was 7 exchanges / 15 Python evals — the shared-pairs
  plan is 2 exchanges, one groupBy per residue family):
    * intersection pieces: map-only filter + ``st_intersection`` over
      matched pairs — NO shuffle;
    * each side's residues: ONE groupBy on that side's row key with
      ``st_union_agg`` of the other side's geometries — unmatched rows
      ride the same groupBy (their union input aggregates to NULL, so
      the original geometry passes through), equivalent to the
      reference's pairwise ``reduce(difference)`` (overlay.py:99-104)
      with one UDF call per row and no join-back or anti-join.

The checkpoint also pins the per-row ``monotonically_increasing_id``
keys (they can never be silently recomputed with different values), and
at cluster scale it materializes the pair list once instead of running
the candidate join three times. All steps around the refine UDFs are
native (codegen'd, AQE-planned).
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


def _intersection_part(d1, d2, geom, keep_geom_type, strategy) -> DataFrame:
    pairs = sjoin(d1, d2, predicate="intersects", geom_left=geom,
                  geom_right=geom, lsuffix="1", rsuffix="2",
                  strategy=strategy)
    return _intersection_branch(pairs, geom, keep_geom_type)


def _intersection_branch(pairs, geom, keep_geom_type) -> DataFrame:
    # ONE fused Arrow round trip: intersection + emptiness + (for
    # keep_geom_type) the geometry-class filter, with dropped pieces
    # returned as NULL. keep_geom_type=False surfaces GEOS's full
    # point-set output (shared edges → LineStrings, touch points; mixed
    # rows → GEOMETRYCOLLECTION), matching the reference's
    # _collection_extract pass-through (tools/overlay.py:395-454).
    g1, g2 = f"{geom}_1", f"{geom}_2"
    res = pairs.withColumn(geom, st.intersection_overlay(
        F.col(g1), F.col(g2), mixed=not keep_geom_type,
        keep=keep_geom_type))
    return res.filter(F.col(geom).isNotNull()).drop(g1, g2)


def _difference_part(d1, d2, geom, key, strategy) -> DataFrame:
    """d1 rows with geometry − union(intersecting d2 geometries)."""
    rsel = d2.select(F.col(geom).alias("__ov_g2__"))
    pairs = sjoin(d1.select(key, geom), rsel, predicate="intersects",
                  geom_left=geom, geom_right="__ov_g2__", strategy=strategy)
    subs = pairs.groupBy(key).agg(st.union_agg("__ov_g2__").alias(_SUB))
    out = (d1.join(subs, on=key, how="left")
             .withColumn(geom, st.difference_residue(F.col(geom),
                                                     F.col(_SUB)))
             .drop(_SUB)
             .filter(F.col(geom).isNotNull()))
    return out


def _ungroupable(dt) -> bool:
    """True for column types Spark cannot use as grouping keys (MapType,
    incl. nested inside arrays/structs)."""
    from pyspark.sql.types import ArrayType, MapType, StructType
    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _ungroupable(dt.elementType)
    if isinstance(dt, StructType):
        return any(_ungroupable(f.dataType) for f in dt.fields)
    return False


def _residue_branch(pairs, key, gown, gother, own_cols, geom) -> DataFrame:
    """One side's residues from the shared pair set: per own-row key,
    own geometry − union(other side's intersecting geometries). A row
    with no matches aggregates the other side's (all-NULL) geometries to
    a NULL union and keeps its original geometry — so matched residues
    and pass-through rows come out of the SAME single groupBy."""
    side = pairs.filter(F.col(key).isNotNull())
    # own-side attributes ride as grouping keys (they are functionally
    # dependent on the row key, and Spark cannot mix a GROUPED_AGG
    # pandas UDF with JVM aggregates like first() in one aggregation).
    # Ungroupable attribute types (MapType anywhere in the column type,
    # on Sparks without map-grouping normalization) ride the SAME
    # single-groupBy plan through a to_json encode / from_json decode
    # pair — the encoded string is a deterministic function of the row
    # key's value, so the groups are identical (r11, VERDICT r10 #3:
    # the former key-only groupBy + dedup join-back fallback shuffled
    # the full wide pair set twice and repeatably crashed Python
    # workers at the 200k×200k A/B scale — deleted).
    fields = {f.name: f.dataType for f in pairs.schema.fields}
    enc_cols = [c for c in own_cols if _ungroupable(fields[c])]
    if enc_cols:
        enc_names = {c: f"__ov_j{i}__" for i, c in enumerate(enc_cols)}
        keep = [c for c in own_cols if c not in enc_names]
        side = side.select(
            key, gown, gother, *keep,
            *[F.to_json(F.col(c)).alias(n) for c, n in enc_names.items()])
        grp = (side.groupBy(key, gown, *keep, *enc_names.values())
                   .agg(st.union_agg(gother).alias(_SUB)))
        for c, n in enc_names.items():
            grp = grp.withColumn(c, F.from_json(F.col(n), fields[c])) \
                     .drop(n)
    else:
        grp = (side.groupBy(key, gown, *own_cols)
                   .agg(st.union_agg(gother).alias(_SUB)))
    return (grp.withColumn(geom, st.difference_residue(F.col(gown),
                                                       F.col(_SUB)))
               .drop(_SUB, key, gown)
               .filter(F.col(geom).isNotNull()))


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
    if how == "intersection":
        return _intersection_part(d1, d2, geom, keep_geom_type,
                                  strategy).drop(_K1, _K2)

    # union / identity / symmetric_difference: ONE full spatial join,
    # checkpointed, feeds every branch (see module docstring)
    join_how = "left" if how == "identity" else "full"
    pairs = sjoin(d1, d2, predicate="intersects", how=join_how,
                  geom_left=geom, geom_right=geom, lsuffix="1",
                  rsuffix="2", strategy=strategy)
    pairs = pairs.localCheckpoint(eager=False)
    g1, g2 = f"{geom}_1", f"{geom}_2"

    def suffixed(cols):
        return [f"{c}_1" if c in overlap else c
                for c in cols if c != geom]

    d1_cols = suffixed(df1.columns)
    d2_cols = [f"{c}_2" if c in overlap else c
               for c in df2.columns if c != geom]

    parts = []
    if how in ("union", "identity"):
        matched = pairs.filter(F.col(_K1).isNotNull() &
                               F.col(_K2).isNotNull())
        parts.append(_intersection_branch(matched, geom, keep_geom_type)
                     .drop(_K1, _K2))
    parts.append(_residue_branch(pairs, _K1, g1, g2, d1_cols, geom))
    if how in ("union", "symmetric_difference"):
        parts.append(_residue_branch(pairs, _K2, g2, g1, d2_cols, geom))

    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p, allowMissingColumns=True)
    return res
