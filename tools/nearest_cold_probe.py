"""Correlate sjoin_nearest 100x-tier run time with pre-run first-touch
bandwidth (VERDICT r12 #5: cold first run 11-17 s vs 2.5-3.2 s warm).

Hypothesis: the cold/warm spread is the r12 pressure mode (guest
first-touch allocation bandwidth collapses after memory-heavy work and
recovers with idle), i.e. SESSION state, not plan state. Protocol: one
session, N identical executions of the same plan; before each, measure
first-touch bandwidth (64 MB touch, small enough not to re-trigger the
collapse); report (pre_bw, seconds) pairs, plus the same for a pure-JVM
fixed-work calibration so JVM-side weather is visible separately.

Usage: python tools/nearest_cold_probe.py [runs] [sf_dir]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _bw():
    import numpy as np
    t0 = time.time()
    a = np.ones(8_000_000)          # 64 MB: reads the state w/o resetting it
    float(a[::1_000_000].sum())
    dt = time.time() - t0
    del a
    return 0.064 / dt


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".bench", "scale100x")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("nearest-cold-probe")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.files.maxPartitionBytes", "16m")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry
    import bench
    qs = entry.queries()
    spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).count()
    try:
        entry.entry(spark).count()
    except Exception:
        pass

    def calib():
        t0 = time.time()
        (spark.range(0, 50_000_000, 1, 32)
         .selectExpr("id % 97 AS k", "id AS v")
         .groupBy("k").sum("v").count())
        return time.time() - t0

    print("run,pre_bw_gbps,calib_sec,nearest_sec")
    for i in range(runs):
        bw = _bw()
        c = calib()
        df = qs["sjoin_nearest"](spark, sf_dir)
        t0 = time.time()
        bench._consume(df)
        dt = time.time() - t0
        print(f"{i},{bw:.2f},{c:.2f},{dt:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
