"""Pressure probe #2: monster-mix → plane-cover, the exact failing
transition, with plan-choice and worker instrumentation.

  python tools/pressure_probe2.py [sf_dir] [cpus] [mode]
mode: reuse (default) | noreuse (spark.python.worker.reuse=false)
      | malloc (MALLOC_MMAP_THRESHOLD_=131072 for daemon+workers)

Prints per run: chosen grid cell size (monkeypatched probe), wall
time, pairs/s, worker count + RSS. Distinguishes:
  M1 plan nondeterminism — cell sizes differ between slow/fast runs;
  M2 worker-heap state  — noreuse/malloc modes recover the fast time;
  M3 JVM/JIT warm-up    — same cells, same workers, converges with
                          repetition regardless of mode.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = sys.argv[2] if len(sys.argv) > 2 else "32"
MODE = sys.argv[3] if len(sys.argv) > 3 else "reuse"

if MODE == "malloc":
    os.environ["MALLOC_MMAP_THRESHOLD_"] = "131072"
    os.environ["MALLOC_TRIM_THRESHOLD_"] = "131072"


def workers():
    try:
        out = subprocess.run(["ps", "-eo", "rss,args"], capture_output=True,
                             text=True, timeout=10).stdout
    except Exception:
        return (0, 0)
    rss = [int(line.strip().split()[0]) // 1024
           for line in out.splitlines()
           if "pyspark.daemon" in line or "pyspark.worker" in line]
    return (len(rss), sum(rss))


def main():
    from pyspark.sql import SparkSession, functions as F

    b = (SparkSession.builder.master(f"local[{CPUS}]")
         .config("spark.sql.shuffle.partitions", CPUS)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "48g")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false"))
    if MODE == "noreuse":
        b = b.config("spark.python.worker.reuse", "false")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    print(f"mode={MODE}")

    import importlib
    sjmod = importlib.import_module("geopandas_spark.operators.sjoin")
    from geopandas_spark import st
    sjoin = sjmod.sjoin
    from tools.stress_scale import _gate_reset, _gate_scale

    # instrument the sizing decision
    orig = sjmod._pick_cell_size_sampled
    picks = []

    def spy(*a, **k):
        out = orig(*a, **k)
        picks.append(out)
        return out

    sjmod._pick_cell_size_sampled = spy

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    hot = (F.col("l_orderkey") % 10 < 8)
    sx0 = F.when(hot, (F.col("l_orderkey") % 500).cast("double")) \
        .otherwise((F.col("l_orderkey") % 10000).cast("double"))
    sy0 = F.when(hot, (F.col("l_partkey") * 17 % 500).cast("double")) \
        .otherwise((F.col("l_partkey") * 17 % 10000).cast("double"))
    ehot = (F.col("event_id") % 10 < 8)
    sex = F.when(ehot, (F.col("event_id") * 13 % 500).cast("double")) \
        .otherwise((F.col("event_id") * 13 % 10000).cast("double"))
    sey = F.when(ehot, (F.col("event_id") * 31 % 500).cast("double")) \
        .otherwise((F.col("event_id") * 31 % 10000).cast("double"))
    spts = ev.select(F.col("event_id").alias("eid"),
                     st.point(sex, sey).alias("geom"))
    strip = (F.col("l_orderkey") % 200 == 0)
    mboxes = li.select(F.col("l_orderkey").alias("lid"),
                       F.when(strip, st.makebox(F.lit(0.0), sy0,
                                                F.lit(10000.0), sy0 + 0.5))
                        .otherwise(st.makebox(sx0, sy0, sx0 + 12.0,
                                              sy0 + 12.0)).alias("geom"))
    plane = (F.col("l_orderkey") % 1000 == 0)
    pboxes = li.select(F.col("l_orderkey").alias("lid"),
                       F.when(plane, st.makebox(F.lit(-100.0),
                                                F.lit(-100.0),
                                                F.lit(10100.0),
                                                F.lit(10100.0)))
                        .otherwise(st.makebox(sx0, sy0, sx0 + 12.0,
                                              sy0 + 12.0)).alias("geom"))

    def bw():
        """Driver-side memory-bandwidth canary: FRESH 512 MB stream
        (first-touch faults + copy), best of nothing — we WANT the
        weather, not the cached best case. Returns GB/s."""
        import numpy as np
        t0 = time.time()
        a = np.ones(64_000_000)          # 512 MB, faulted by ones()
        a2 = a * 2.0                      # stream read+write
        s = float(a2[::1_000_000].sum())
        dt = time.time() - t0
        del a, a2, s
        return 1.5 / dt                   # ~1.5 GB moved

    def run(tag, l_, r_, n_runs):
        _gate_reset(spark)
        calib, sess = _gate_scale(spark)
        for j in range(n_runs):
            picks.clear()
            w0 = workers()
            b0 = bw()
            t0 = time.time()
            n = sjoin(l_, r_, predicate="intersects",
                      strategy="grid").count()
            dt = time.time() - t0
            b1 = bw()
            w1 = workers()
            print(f"{tag} run{j}: {n} pairs {dt:.2f}s "
                  f"({n / dt / 1e6:.2f}M/s) cells={picks} "
                  f"bw {b0:.2f}->{b1:.2f} GB/s "
                  f"workers {w0[0]}/{w0[1]}MB -> {w1[0]}/{w1[1]}MB "
                  f"(calib {calib} scale {sess:.2f})", flush=True)

    spts.count()
    run("monster-mix", spts, mboxes, 4)
    run("plane-cover", spts, pboxes, 4)
    spark.stop()


if __name__ == "__main__":
    main()
