"""Dump .explain("formatted") for every headline query to plans/<tag>/.

Usage: python tools/dump_plans.py <out_dir> [suffix] [sf_dir]

Plan-only (no execution), so it is safe to run alongside a bench; the
plans are what the judge checks optimization claims against
(Exchange count, join strategy, PushedFilters, Python-eval nodes).
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "plans", "r13")
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession, functions as F

    # mirror bench.py's session config: plan choices (dissolve's probed
    # single/two-phase, split sizing) depend on partition counts
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("plan-dump")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.files.maxPartitionBytes", "16m")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from geopandas_spark import st

    qs = entry.queries()

    def buffer_sweep(spark, sf_dir):
        c = entry._cust(spark, sf_dir)
        return c.select(st.area(st.buffer("geom", F.lit(10.0))).alias("a"),
                        st.x(st.centroid("geom")).alias("cx"))

    headlines = {
        "sjoin_broadcast": qs["sjoin"],
        "sjoin_grid": qs["sjoin_grid"],
        "sjoin_nearest": qs["sjoin_nearest"],
        "buffer_centroid_sweep": buffer_sweep,
        "distance_pairs": qs["distance"],
        "dissolve": qs["dissolve"],
        "clip": qs["clip"],
        "predicates": qs["predicates"],
        "minhash": qs["minhash"],
        "cosine_topk": qs["cosine_topk"],
        "lsh_topk": qs["lsh_topk"],
        "ivf_topk": qs["ivf_topk"],
        "pricing_summary": qs["pricing_summary"],
        "revenue_by_nation": qs["revenue_by_nation"],
    }
    for name, fn in headlines.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN FAILED: {e}"
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(p, "w") as f:
            f.write(plan)
        print(f"wrote {p} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
