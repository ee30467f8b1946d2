"""Root-cause probe for the in-session pressure mode (r12, VERDICT #1).

Symptom (r10-r11): a Python-heavy grid-join gate run RIGHT AFTER the
skew gate's ~25M-pair joins reads ~2x slower than the same gate
isolated; clearCache + System.gc() does not shed it and neither the
JVM-shuffle nor the small Arrow calibration job reads it.

This probe reproduces the sequence with OS-level instrumentation and
A/Bs the candidate mechanisms:

  python tools/pressure_probe.py [sf_dir] [cpus] [mode]

mode:
  reuse      (default) spark.python.worker.reuse=true  — production cfg
  noreuse    spark.python.worker.reuse=false           — fresh worker per task
  smallbatch arrow maxRecordsPerBatch=20000 (vs 100000)

Instrumented per step: wall time, sum/max RSS and count of pyspark
daemon+worker processes, /proc/meminfo Dirty/Writeback/MemAvailable/
Cached, and cumulative JVM GC time.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = sys.argv[2] if len(sys.argv) > 2 else "32"
MODE = sys.argv[3] if len(sys.argv) > 3 else "reuse"


def meminfo():
    out = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            out[k] = int(v.strip().split()[0])        # kB
    return {k: out.get(k, 0) // 1024 for k in
            ("Dirty", "Writeback", "MemAvailable", "Cached")}   # MB


def pyworker_stats():
    """(count, sum_rss_mb, max_rss_mb) over pyspark daemon/worker procs."""
    try:
        out = subprocess.run(
            ["ps", "-eo", "rss,args"], capture_output=True, text=True,
            timeout=10).stdout
    except Exception:
        return (0, 0, 0)
    rss = []
    me = str(os.getpid())
    for line in out.splitlines():
        if ("pyspark.daemon" in line or "pyspark.worker" in line) \
                and me not in line.split()[:1]:
            try:
                rss.append(int(line.strip().split()[0]) // 1024)
            except ValueError:
                pass
    return (len(rss), sum(rss), max(rss) if rss else 0)


def gc_time_ms(spark):
    try:
        beans = spark._jvm.java.lang.management.ManagementFactory \
            .getGarbageCollectorMXBeans()
        return sum(beans.get(i).getCollectionTime()
                   for i in range(beans.size()))
    except Exception:
        return -1


def snap(spark, tag):
    m = meminfo()
    c, s, mx = pyworker_stats()
    print(f"[{tag}] workers={c} rss_sum={s}MB rss_max={mx}MB "
          f"dirty={m['Dirty']}MB writeback={m['Writeback']}MB "
          f"avail={m['MemAvailable']}MB cached={m['Cached']}MB "
          f"jvm_gc={gc_time_ms(spark)}ms", flush=True)


def main():
    from pyspark.sql import SparkSession, functions as F

    b = (SparkSession.builder.master(f"local[{CPUS}]")
         .config("spark.sql.shuffle.partitions", CPUS)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "48g")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false"))
    batch = 20000 if MODE == "smallbatch" else 100000
    b = b.config("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
    if MODE == "noreuse":
        b = b.config("spark.python.worker.reuse", "false")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    print(f"mode={MODE} arrow_batch={batch}")

    from geopandas_spark import st
    from geopandas_spark.operators import sjoin
    from tools.stress_scale import _gate_reset, _gate_scale

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    hot = (F.col("l_orderkey") % 10 < 8)
    sx0 = F.when(hot, (F.col("l_orderkey") % 500).cast("double")) \
        .otherwise((F.col("l_orderkey") % 10000).cast("double"))
    sy0 = F.when(hot, (F.col("l_partkey") * 17 % 500).cast("double")) \
        .otherwise((F.col("l_partkey") * 17 % 10000).cast("double"))
    sboxes = li.select(F.col("l_orderkey").alias("lid"),
                       st.makebox(sx0, sy0, sx0 + 12.0,
                                  sy0 + 12.0).alias("geom"))
    ehot = (F.col("event_id") % 10 < 8)
    sex = F.when(ehot, (F.col("event_id") * 13 % 500).cast("double")) \
        .otherwise((F.col("event_id") * 13 % 10000).cast("double"))
    sey = F.when(ehot, (F.col("event_id") * 31 % 500).cast("double")) \
        .otherwise((F.col("event_id") * 31 % 10000).cast("double"))
    spts = ev.select(F.col("event_id").alias("eid"),
                     st.point(sex, sey).alias("geom"))
    plane = (F.col("l_orderkey") % 1000 == 0)
    pboxes = li.select(F.col("l_orderkey").alias("lid"),
                       F.when(plane, st.makebox(F.lit(-100.0),
                                                F.lit(-100.0),
                                                F.lit(10100.0),
                                                F.lit(10100.0)))
                        .otherwise(st.makebox(sx0, sy0, sx0 + 12.0,
                                              sy0 + 12.0)).alias("geom"))

    def plane_cover(tag):
        _gate_reset(spark)
        calib, sess = _gate_scale(spark)
        snap(spark, f"{tag}:before")
        ts = []
        for _ in range(2):
            t0 = time.time()
            n = sjoin(spts, pboxes, predicate="intersects",
                      strategy="grid").count()
            ts.append(time.time() - t0)
        snap(spark, f"{tag}:after")
        mps = n / min(ts) / 1e6
        print(f"{tag}: plane-cover {n} pairs, runs "
              f"{'/'.join(f'{t:.2f}' for t in ts)}s "
              f"best {mps:.2f}M pairs/s (calib {calib}, "
              f"scale {sess:.2f}x)", flush=True)
        return mps

    def skew(tag):
        _gate_reset(spark)
        snap(spark, f"{tag}:before")
        ts = []
        for _ in range(3):
            t0 = time.time()
            n = sjoin(spts, sboxes, predicate="intersects",
                      strategy="grid").count()
            ts.append(time.time() - t0)
        snap(spark, f"{tag}:after")
        print(f"{tag}: skew {n} pairs, runs "
              f"{'/'.join(f'{t:.2f}' for t in ts)}s "
              f"({n / min(ts) / 1e6:.2f}M pairs/s)", flush=True)

    # warm the session once (codegen + worker spin-up)
    spts.count()
    sboxes.count()

    iso = plane_cover("isolated-1")
    iso2 = plane_cover("isolated-2")
    skew("skew")
    after = plane_cover("after-skew-1")
    after2 = plane_cover("after-skew-2")
    print(f"SUMMARY mode={MODE}: isolated {iso:.2f}/{iso2:.2f} "
          f"after-skew {after:.2f}/{after2:.2f} M pairs/s "
          f"(degradation {min(iso, iso2) / max(after, 1e-9):.2f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
