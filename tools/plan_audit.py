"""Physical-plan audit over the headline queries.

Prints, per query, the plan-shape facts that matter at 100 TB — shuffle
(Exchange) count, broadcast joins, Python/Arrow UDF evaluation nodes,
whole-stage-codegen spans, parquet PushedFilters — so plan regressions
show up as a diff, not a slowdown. Writes PLAN_AUDIT.md at the repo root.

Usage: python tools/plan_audit.py [sf_dir]
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# queries whose execution is driver-orchestrated (file sinks, streaming
# triggers, iterative loops) have no single inspectable plan
SKIP = {"rt_geoparquet", "rt_shapefile", "rt_gpkg", "rt_geojsonseq",
        "rt_feather", "rt_kml", "rt_gml", "rt_fgb", "read_pushdown",
        "list_layers", "stream_sjoin", "stream_window_union",
        "stream_stream_join", "sjoin_nearest_xr", "dedup_components",
        "multimodal_ops", "codec_roundtrip"}


def main():
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    rows = []
    for name, fn in e.queries().items():
        if name in SKIP:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:   # noqa: BLE001 - audit keeps going
            rows.append((name, f"ERROR {type(ex).__name__}: {ex}", None))
            continue
        pushed = len(re.findall(r"PushedFilters: \[[^\]]+\]", plan))
        facts = {
            "exchanges": plan.count("Exchange"),
            "broadcast": plan.count("BroadcastExchange"),
            "udf_evals": plan.count("ArrowEvalPython")
            + plan.count("BatchEvalPython"),
            "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
            "pushed_filters": pushed,
            "cartesian": plan.count("CartesianProduct"),
        }
        rows.append((name, None, facts))

    out = ["# PLAN_AUDIT", "",
           f"Physical-plan shape per oracle query at {SF_DIR} "
           "(tools/plan_audit.py).", "",
           "| query | exchanges | broadcast | udf evals | codegen spans "
           "| pushed filters | cartesian |",
           "|---|---|---|---|---|---|---|"]
    errors = []
    for name, err, facts in rows:
        if err:
            errors.append(f"- `{name}`: {err}")
            continue
        out.append(f"| {name} | {facts['exchanges']} | "
                   f"{facts['broadcast']} | {facts['udf_evals']} | "
                   f"{facts['codegen']} | {facts['pushed_filters']} | "
                   f"{facts['cartesian']} |")
    carts = [(n, f) for n, _e, f in rows if f and f["cartesian"]]
    out += ["",
            f"{len(rows) - len(errors)} plans audited; "
            f"{len(carts)} contain a CartesianProduct "
            f"({', '.join(n for n, _ in carts) if carts else 'none'} — "
            "cosine_topk is the documented exact-scoring baseline; the "
            "scale paths are the LSH/IVF bucket joins)."]
    if errors:
        out += ["", "Errors:"] + errors
    text = "\n".join(out) + "\n"
    with open(os.path.join(REPO, "PLAN_AUDIT.md"), "w") as f:
        f.write(text)
    print(text)
    spark.stop()


if __name__ == "__main__":
    main()
