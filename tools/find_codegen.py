"""Run every queries() entry one at a time and report which ones trigger
janino codegen failures (ERROR CodeGenerator -> interpreted fallback).

The JVM logs to fd 2; we dup fd 2 into a file and diff offsets per query.

Usage: python tools/find_codegen.py [sf_dir] [query ...]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO

LOG = "/tmp/codegen_probe.err"
fd = os.open(LOG, os.O_WRONLY | os.O_CREAT | os.O_TRUNC)
os.dup2(fd, 2)

from pyspark.sql import SparkSession  # noqa: E402
import __spark_entry__ as e  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .getOrCreate())
    qs = e.queries()
    names = only or list(qs)
    bad = []
    for name in names:
        os.fsync(fd)
        start = os.path.getsize(LOG)
        try:
            qs[name](spark, sf_dir).collect()
        except Exception as ex:
            print(f"[RUNERR] {name}: {ex}", flush=True)
            continue
        os.fsync(fd)
        with open(LOG, "rb") as f:
            f.seek(start)
            chunk = f.read().decode("utf-8", "replace")
        n = chunk.count("ERROR CodeGenerator")
        if n:
            bad.append(name)
            print(f"[CODEGEN] {name}: {n} failure(s)", flush=True)
    print("bad queries:", bad, flush=True)


if __name__ == "__main__":
    main()
