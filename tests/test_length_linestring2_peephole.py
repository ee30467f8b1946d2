"""r13 peephole: st.length(st.geom_from_text(st.wkt_linestring2(...)))
strength-reduces to codegen'd sqrt((x1-x2)^2 + (y1-y2)^2) — no Python
evaluation anywhere in the plan — with values bit-identical to the
string-build -> parse -> length kernel path on every input class the
template can produce (finite doubles round-trip bit-exactly through
Spark's double->string cast and the correctly-rounded string->double
parse; non-finite coordinates are NULLed by the template on BOTH paths
because WKT has no NaN/Infinity token)."""

import math
import struct

import pytest
from pyspark.sql import functions as F

from geopandas_spark import st


def _fused(df):
    """The peephole composition: length over the exact Column instances
    wkt_linestring2 / geom_from_text returned."""
    return df.select(
        F.col("rid"),
        st.length(st.geom_from_text(
            st.wkt_linestring2("x1", "y1", "x2", "y2"))).alias("d"))


def _kernel(df):
    """Byte-identical template built WITHOUT the marker attributes: the
    same guarded concat expression, routed through the real parse +
    length kernels (geom_from_text over a foreign Column fuses to
    st_length_of_wkt; a materialized WKB column takes st_length)."""
    tmpl = st.wkt_linestring2("x1", "y1", "x2", "y2")
    # strip the identity marker: an expression-equal but foreign Column
    foreign = tmpl.alias("w")  # alias() returns a new Column instance
    foreign.__dict__.pop(st._LINESTRING2_ARGS_ATTR, None)
    return (df.withColumn("w", foreign)
              .withColumn("g", st.geom_from_text(F.col("w")))
              .select(F.col("rid"), st.length(F.col("g")).alias("d")))


_CASES = [
    # (x1, y1, x2, y2) — integers (the bench shape), fractions,
    # exponent-formatted magnitudes, subnormals, signed zero, NULLs
    (0.0, 0.0, 3.0, 4.0),
    (1.0, 2.0, 1.0, 2.0),                      # zero-length
    (0.1, 0.2, 0.3, 0.4),                      # non-representable decimals
    (-5.5, 7.25, 2.125, -3.0625),              # exact binary fractions
    (1e-7, 2.5e-8, -1.5e-7, 0.0),              # scientific string form
    (1e200, -1e200, 0.0, 0.0),                 # large magnitude
    (5e-324, 0.0, 0.0, 0.0),                   # subnormal
    (-0.0, 0.0, 0.0, -0.0),                    # signed zero
    (1.7976931348623157e308, 0.0,
     -1.7976931348623157e308, 0.0),            # overflow -> inf both paths
    (None, 1.0, 2.0, 3.0),                     # NULL coordinate
    (1.0, None, 2.0, 3.0),
    (float("nan"), 1.0, 2.0, 3.0),             # non-finite -> NULL template
    (1.0, float("inf"), 2.0, 3.0),
    (float("-inf"), 1.0, 2.0, 3.0),
]


@pytest.fixture(scope="module")
def coords_df(spark):
    rows = [(i, *c) for i, c in enumerate(_CASES)]
    return spark.createDataFrame(rows, ["rid", "x1", "y1", "x2", "y2"])


def test_peephole_fires_and_plan_is_pure_jvm(coords_df):
    fused = _fused(coords_df)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    # and the non-marked, expression-equal template must NOT fire it
    kern = _kernel(coords_df)
    kplan = kern._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in kplan


def _bits(v):
    return None if v is None else struct.pack("<d", v)


def test_values_bit_identical_to_kernel_path(coords_df):
    fused = {r.rid: r.d for r in _fused(coords_df).collect()}
    kern = {r.rid: r.d for r in _kernel(coords_df).collect()}
    assert set(fused) == set(kern) == set(range(len(_CASES)))
    for rid in fused:
        f, k = fused[rid], kern[rid]
        assert _bits(f) == _bits(k), (rid, _CASES[rid], f, k)
    # spot-check closed-form expectations
    assert fused[0] == 5.0
    assert fused[1] == 0.0
    assert fused[8] == math.inf          # overflow: inf on BOTH paths
    for rid in (9, 10, 11, 12, 13):      # NULL / NaN / +-inf -> NULL
        assert fused[rid] is None


def test_random_doubles_bit_identical(spark):
    import random

    rnd = random.Random(13)
    rows = []
    for i in range(400):
        def draw():
            # wide dynamic range incl. negative exponents
            return struct.unpack(
                "<d", struct.pack("<q", rnd.getrandbits(63) *
                                  (1 if rnd.random() < 0.5 else -1)))[0]
        c = [draw() for _ in range(4)]
        c = [v if math.isfinite(v) else rnd.uniform(-1e6, 1e6) for v in c]
        rows.append((i, *c))
    df = spark.createDataFrame(rows, ["rid", "x1", "y1", "x2", "y2"])
    fused = {r.rid: r.d for r in _fused(df).collect()}
    kern = {r.rid: r.d for r in _kernel(df).collect()}
    for rid in fused:
        assert _bits(fused[rid]) == _bits(kern[rid]), (rid, rows[rid])


def test_template_string_is_parse_clean(spark):
    """The guarded template only ever emits a parseable WKT string or
    NULL — so ANY consumer of the string column (not just the fused
    measure) sees parser-accepted input."""
    rows = [(0, 1.5, -2.5, 3.0, 4.0), (1, float("nan"), 0.0, 1.0, 1.0),
            (2, None, 0.0, 1.0, 1.0), (3, float("inf"), 0.0, 1.0, 1.0)]
    df = spark.createDataFrame(rows, ["rid", "x1", "y1", "x2", "y2"])
    out = {r.rid: r.w for r in df.select(
        F.col("rid"),
        st.wkt_linestring2("x1", "y1", "x2", "y2").alias("w")).collect()}
    assert out[0] == "LINESTRING (1.5 -2.5, 3.0 4.0)"
    assert out[1] is None and out[2] is None and out[3] is None
    # the emitted string parses to the identical geometry on the kernel
    from geopandas_spark.geom import wkt as wktm
    ga = wktm.parse_array([out[0]])
    assert list(ga.coords[:, 0]) == [1.5, 3.0]
    assert list(ga.coords[:, 1]) == [-2.5, 4.0]
