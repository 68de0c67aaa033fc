#!/usr/bin/env python
"""Round-8 optimization measurement harness (bench.py is FROZEN; this file
carries the noop-sink isolation runs and plan captures the optimization
round works from -- guide section 1.4).

Usage:
  python bench_extra.py [--queries q_a,q_b] [--reps N] [--plans DIR]

Per query: one warm noop-sink run, then R timed runs; prints min/median and
optionally writes .explain("formatted") to <DIR>/<query>_<tag>.txt.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT_QUERIES = [
    "q_pricing_summary",
    "q_region_revenue",
    "q_reading_order_window",
    "q_asof_join",
    "q_theta_range_join",
    "q_threshold_filter",
    "q_dedup_exact",
    "q_minhash_lsh",
    "q_simhash",
    "q_doc_stats",
    "q_ann_topk",
    "q_pii_redact",
    "q_line_filter",
    "q_dup_ngrams",
    "q_chunk_dedup",
    "q_sketch_accuracy",
    "q_quality_gate",
    "q_lm_quality",
]


def make_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(8, CPUS)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .getOrCreate()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--plans", default=None, help="directory to write plan files")
    ap.add_argument("--tag", default="before", help="suffix for plan files")
    args = ap.parse_args()

    names = args.queries.split(",") if args.queries else DEFAULT_QUERIES

    from action_pdf_accessibility_paddle_docker_spark.plans.queries import REGISTRY

    spark = make_spark()
    out: dict[str, dict] = {}
    try:
        for name in names:
            fn, _sql = REGISTRY[name]
            spark.sparkContext.setJobDescription(f"warm:{name}")
            df = fn(spark, SF_DIR)
            if args.plans:
                os.makedirs(args.plans, exist_ok=True)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(plan)
            df.write.format("noop").mode("overwrite").save()  # warm
            ts = []
            for r in range(args.reps):
                spark.sparkContext.setJobDescription(f"timed:{name}:{r}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                ts.append(round(time.perf_counter() - t0, 3))
            out[name] = {
                "min": min(ts),
                "median": round(statistics.median(ts), 3),
                "runs": ts,
            }
            print(f"{name}: min={min(ts)} median={out[name]['median']} runs={ts}",
                  file=sys.stderr, flush=True)
    finally:
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
