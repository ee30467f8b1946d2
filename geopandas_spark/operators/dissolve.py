"""dissolve / total_bounds: geometric aggregation (SURVEY.md §2.5).

Reference: GeoDataFrame.dissolve (geopandas/geodataframe.py:2172-2327) =
groupby over attribute columns + per-group geometric union.

Spark cannot mix a GROUPED_AGG pandas UDF with native aggregates in one
``agg``, so dissolve runs as a single ``applyInPandas`` per group: one
shuffle, geometry union + attribute aggs in the same pass (same cost shape
as the reference's groupby-apply closure, geodataframe.py:2310-2316).

Scale note: ``two_phase=True`` pre-aggregates per (key, input partition)
before the final per-key pass — union is associative/commutative, so this
is the map-side combine that bounds any single task's group size."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, DoubleType, LongType, StructField,
                               StructType)

from geopandas_spark.functions import st
from geopandas_spark.geom import algos, wkb

_PARTIAL = {"sum": "sum", "min": "min", "max": "max", "count": "sum",
            "first": "first"}


def _agg_out_field(field, fn):
    if fn == "count":
        return StructField(f"{field.name}_{fn}", LongType(), False)
    if fn in ("sum", "mean"):
        return StructField(f"{field.name}_{fn}", DoubleType(), True)
    return StructField(f"{field.name}_{fn}", field.dataType, True)


def _apply_aggs(pdf: pd.DataFrame, aggfunc: dict) -> dict:
    out = {}
    for c, fn in aggfunc.items():
        s = pdf[c]
        if fn == "count":
            out[f"{c}_{fn}"] = int(s.count())
        elif fn == "sum":
            out[f"{c}_{fn}"] = float(s.sum())
        elif fn == "mean":
            out[f"{c}_{fn}"] = float(s.mean())
        elif fn == "min":
            out[f"{c}_{fn}"] = s.min()
        elif fn == "max":
            out[f"{c}_{fn}"] = s.max()
        elif fn == "first":
            out[f"{c}_{fn}"] = s.iloc[0]
        else:
            raise ValueError(f"unsupported aggfunc {fn!r}")
    return out


def dissolve(df: DataFrame, by, aggfunc=None, *, geom: str = "geom",
             two_phase=None) -> DataFrame:
    """GroupBy ``by``, union geometries, aggregate other columns with
    ``aggfunc`` = {column: "sum"|"min"|"max"|"count"|"first"|"mean"}.

    ``two_phase`` pre-unions WITHIN each input partition (shuffle-free
    mapInPandas combine) before the final per-key merge, so one hot key
    never concentrates its whole group in a single task's memory — the
    scale-safe plan. Default ``None`` = auto: two-phase whenever the input
    has more than one partition (with a single partition the combine is
    pure overhead and the plans are identical). ``mean`` splits into
    sum+count partials and divides at the end."""
    if isinstance(by, str):
        by = [by]
    aggfunc = dict(aggfunc or {})
    if two_phase is None:
        try:
            two_phase = df.rdd.getNumPartitions() > 1
        except Exception:
            two_phase = True

    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [in_fields[k] for k in by] +
        [StructField(geom, BinaryType(), True)] +
        [_agg_out_field(in_fields[c], fn) for c, fn in aggfunc.items()])

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ga = wkb.decode(pdf[geom].tolist())
        u = wkb.encode(algos.union_all(ga))[0]
        row = {k: [v] for k, v in zip(by, key)}
        row[geom] = [u]
        for name, val in _apply_aggs(pdf, aggfunc).items():
            row[name] = [val]
        return pd.DataFrame(row)

    if not two_phase:
        return df.groupBy(*by).applyInPandas(merge, schema=out_schema)

    # -- phase 1: per (key, input-partition) combine ----------------------
    partial_fields = []
    for c, fn in aggfunc.items():
        if fn == "mean":
            partial_fields += [
                StructField(f"{c}__psum", DoubleType(), True),
                StructField(f"{c}__pcnt", LongType(), False)]
        else:
            partial_fields.append(_agg_out_field(in_fields[c], fn))
    partial_schema = StructType(
        [in_fields[k] for k in by] +
        [StructField(geom, BinaryType(), True)] + partial_fields)

    def partial(batches):
        # map-side combine: pandas groupby WITHIN each input partition —
        # no shuffle; the only shuffle in the whole plan is phase 2's
        # per-key merge of the (bounded) partials
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = {name: [] for name in
                    [*by, geom] + [f.name for f in partial_fields]}
            for key, grp in pdf.groupby(by, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                ga = wkb.decode(grp[geom].tolist())
                u = wkb.encode(algos.union_all(ga))[0]
                for k, v in zip(by, key):
                    rows[k].append(v)
                rows[geom].append(u)
                for c, fn in aggfunc.items():
                    s = grp[c]
                    if fn == "mean":
                        rows[f"{c}__psum"].append(float(s.sum()))
                        rows[f"{c}__pcnt"].append(int(s.count()))
                    else:
                        for k2, v2 in _apply_aggs(grp, {c: fn}).items():
                            rows[k2].append(v2)
            yield pd.DataFrame(rows)

    staged = df.mapInPandas(partial, schema=partial_schema)

    # -- phase 2: merge partials per key ----------------------------------
    def finish(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ga = wkb.decode(pdf[geom].tolist())
        parts, parent, _ = algos.get_parts(ga)
        u = wkb.encode(algos.union_all(parts))[0]
        row = {k: [v] for k, v in zip(by, key)}
        row[geom] = [u]
        for c, fn in aggfunc.items():
            if fn == "mean":
                cnt = pdf[f"{c}__pcnt"].sum()
                row[f"{c}_mean"] = [float(pdf[f"{c}__psum"].sum()) / cnt
                                    if cnt else float("nan")]
                continue
            name = f"{c}_{fn}"
            s = pdf[name]
            comb = _PARTIAL[fn]
            row[name] = [s.sum() if comb == "sum" else s.min()
                         if comb == "min" else s.max() if comb == "max"
                         else s.iloc[0]]
        return pd.DataFrame(row)

    return staged.groupBy(*by).applyInPandas(finish, schema=out_schema)


def total_bounds(df: DataFrame, geom: str = "geom"):
    """(minx, miny, maxx, maxy) over the whole frame (reference:
    base.py:5288) — a single native agg over the st_bounds struct."""
    r = (df.withColumn("__b__", st.bounds(geom))
           .agg(F.min("__b__.xmin").alias("minx"),
                F.min("__b__.ymin").alias("miny"),
                F.max("__b__.xmax").alias("maxx"),
                F.max("__b__.ymax").alias("maxy"))
           .collect()[0])
    return (r.minx, r.miny, r.maxx, r.maxy)
