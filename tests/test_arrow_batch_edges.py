"""r13: pathological Arrow batches through the r12 mapInArrow pair
generators (VERDICT r12 #7d).

The sjoin/sjoin_nearest pair UDFs switched from mapInPandas to
mapInArrow in r12 (NaN bit-exactness); this suite drives the new
boundary with the batch shapes that break naive Arrow code: empty
inputs, empty partitions, single-row batches, 64 MB string payloads
riding through take(), very wide attribute tuples, and unmatched-row
(outer) paths on those same shapes.
"""

import pytest
from pyspark.sql import functions as F

from geopandas_spark import st
from geopandas_spark.operators import sjoin
from geopandas_spark.operators.sjoin import sjoin_nearest


def _right(spark):
    return spark.createDataFrame([(10,), (11,)], ["rid"]).select(
        "rid",
        st.makebox((F.col("rid") % 10 * 20).cast("double"), F.lit(0.0),
                   (F.col("rid") % 10 * 20 + 10).cast("double"),
                   F.lit(10.0)).alias("geom"))


class TestArrowBatchEdges:
    def test_empty_left(self, spark):
        left = (spark.range(0)
                .select(F.col("id").alias("lid"),
                        st.point(F.lit(1.0), F.lit(1.0)).alias("geom")))
        for strat in ("broadcast", "grid"):
            out = sjoin(left, _right(spark), predicate="intersects",
                        strategy=strat)
            assert out.count() == 0
        out = sjoin(left, _right(spark), predicate="intersects",
                    strategy="broadcast", how="right")
        assert out.count() == 2          # unmatched rights survive

    def test_empty_partitions_and_single_rows(self, spark):
        # 3 rows spread over 16 partitions → most partitions empty,
        # populated ones hold exactly one row
        left = (spark.range(3).repartition(16)
                .select(F.col("id").alias("lid"),
                        st.point((F.col("id") * 5 + 2).cast("double"),
                                 F.lit(5.0)).alias("geom")))
        for strat in ("broadcast", "grid"):
            got = {(r.lid, r.rid) for r in sjoin(
                left, _right(spark), predicate="intersects",
                strategy=strat).select("lid", "rid").collect()}
            assert got == {(0, 10), (1, 10)}, (strat, got)
        # left outer keeps the unmatched single-row batches too
        got = {(r.lid, r.rid) for r in sjoin(
            left, _right(spark), predicate="intersects",
            strategy="broadcast", how="left").select("lid", "rid").collect()}
        assert got == {(0, 10), (1, 10), (2, None)}

    def test_huge_string_payload_rides_through(self, spark):
        # one 64 MB attribute value must survive the Arrow take() path
        # byte-for-byte (chunked large_binary offsets are the classic
        # failure mode)
        big = "x" * (64 * 1024 * 1024)
        small = "s" * 8
        left = spark.createDataFrame(
            [(0, big), (1, small), (2, small)], ["lid", "payload"]).select(
            "lid", "payload",
            st.point((F.col("lid") * 5 + 2).cast("double"),
                     F.lit(5.0)).alias("geom"))
        rows = (sjoin(left, _right(spark), predicate="intersects",
                      strategy="broadcast")
                .select("lid", F.length("payload").alias("n"))
                .orderBy("lid").collect())
        assert [(r.lid, r.n) for r in rows] == \
            [(0, len(big)), (1, len(small))]

    def test_wide_attribute_tuple(self, spark):
        cols = {f"c{i}": (F.col("id") * i).cast("double")
                for i in range(40)}
        left = (spark.range(4)
                .select(F.col("id").alias("lid"),
                        *[v.alias(k) for k, v in cols.items()],
                        st.point((F.col("id") * 5 + 2).cast("double"),
                                 F.lit(5.0)).alias("geom")))
        out = sjoin(left, _right(spark), predicate="intersects",
                    strategy="broadcast")
        rows = out.orderBy("lid").collect()
        assert len(rows) == 2
        assert rows[1].c39 == 39.0       # attributes intact post-take

    def test_nearest_on_empty_and_single(self, spark):
        right = _right(spark)
        empty = (spark.range(0)
                 .select(F.col("id").alias("lid"),
                         st.point(F.lit(1.0), F.lit(1.0)).alias("geom")))
        assert sjoin_nearest(empty, right, distance_col="d").count() == 0
        one = (spark.range(1).repartition(8)
               .select(F.col("id").alias("lid"),
                       st.point(F.lit(300.0), F.lit(300.0)).alias("geom")))
        r = sjoin_nearest(one, right, distance_col="d").collect()
        assert len(r) == 1 and r[0].rid == 11   # box 20..30 is closer
        # bounded grid strategy on the same degenerate shapes
        r2 = sjoin_nearest(one, right, distance_col="d",
                           strategy="grid", max_distance=1000.0).collect()
        assert len(r2) == 1 and r2[0].rid == 11
        assert r[0].d == pytest.approx(r2[0].d)

    def test_all_null_geometry_batch(self, spark):
        left = (spark.range(5).repartition(4)
                .select(F.col("id").alias("lid"),
                        F.lit(None).cast("binary").alias("geom")))
        for strat in ("broadcast", "grid"):
            assert sjoin(left, _right(spark), predicate="intersects",
                         strategy=strat).count() == 0
        out = sjoin(left, _right(spark), predicate="intersects",
                    strategy="broadcast", how="left")
        assert out.count() == 5          # null-geom rows kept unmatched
