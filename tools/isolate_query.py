"""Time one headline query in isolation at a given data dir.

Usage: python tools/isolate_query.py <query> [runs] [sf_dir]

Mirrors bench.py's protocol exactly (noop sink, System.gc + bandwidth
canary outside the timed region, job labels for UI mapping) so numbers
are comparable with BENCH lines; prints per-run seconds.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    qname = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, ".bench", "scale100x")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import bench as _b
    _b._alloc_env()            # same worker-allocator pinning as bench.py

    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName(f"isolate-{qname}")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.driver.extraJavaOptions",
                     "-Xms48g -XX:+AlwaysPreTouch")
             .config("spark.sql.files.maxPartitionBytes", "16m")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    import __spark_entry__ as entry
    from geopandas_spark import st

    qs = entry.queries()

    def buffer_sweep(spark, sf_dir):
        c = entry._cust(spark, sf_dir)
        return c.select(st.area(st.buffer("geom", F.lit(10.0))).alias("a"),
                        st.x(st.centroid("geom")).alias("cx"))

    fn = buffer_sweep if qname == "buffer_centroid_sweep" else qs[qname]

    # warm the worker pool like bench.py does
    spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).count()
    try:
        entry.entry(spark).count()
    except Exception:
        pass

    for i in range(runs):
        try:
            spark._jvm.System.gc()
        except Exception:
            pass

        df = fn(spark, sf_dir)
        spark.sparkContext.setJobDescription(f"{qname} run {i}")
        t0 = time.time()
        bench._consume(df)
        print(f"run {i}: {time.time() - t0:.3f} s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
