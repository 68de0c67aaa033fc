#!/usr/bin/env python
"""Scale probe for semantic_dedup (round-5 verdict item 5: "the 4.68 s
point is KMeans-fit bound -- the scale claim is currently prose").

Times the operator at n and 10n synthetic embeddings (deterministic:
Gaussian base vectors + 5% planted near-dups), splitting the two cost
regimes:

  * fit        -- fit_quantizer (MLlib KMeans), the eager step;
  * pipeline   -- semantic_dedup with PREFITTED centers (assignment UDF,
                  within-cell cosine pairs, connected components).

Two cluster-count policies at 10n:

  * scaled k (n / 125 cells, bounded ~125-vector cells): per-cell pair
    work stays constant, so the pipeline should scale ~linearly -- the
    SemDeDup recipe's actual scale path (the paper grows k with n);
  * fixed k=16: cells grow 10x, the within-cell pair join grows ~100x --
    the quadratic hazard the docstring warns about, measured.

Usage: python scripts/semdedup_scale_probe.py [n_small]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_SMALL = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
DIM = 64


def make_embeddings(n: int, seed: int = 11):
    """~5% of rows are near-dups (tiny perturbations) of earlier rows."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, DIM))
    for i in range(0, n, 20):          # every 20th row duplicates a prior row
        if i == 0:
            continue
        j = int(rng.integers(0, i))
        base[i] = base[j] + 0.01 * rng.standard_normal(DIM)
    return [(i, base[i].tolist()) for i in range(n)]


def run(spark, n: int, k: int) -> dict:
    from pyspark.sql import functions as F

    from action_pdf_accessibility_paddle_docker_spark.operators.similarity import (
        fit_quantizer,
        semantic_dedup,
    )

    df = spark.createDataFrame(
        make_embeddings(n), "vec_id long, embedding array<double>"
    ).repartition(32).localCheckpoint()   # materialized input: probe the operator
    t0 = time.perf_counter()
    centers = fit_quantizer(df, n_centroids=k, seed=7)
    fit_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = semantic_dedup(df, threshold=0.9, centers=centers)
    # ONE action: the assignment join is lazy, so two separate counts
    # would execute it twice and inflate pipeline_sec
    agg = out.agg(
        F.count("*").alias("rows"),
        F.count(F.when(F.col("rep_id") != F.col("vec_id"), 1)).alias("coll"),
    ).head()
    n_rows, n_collapsed = agg["rows"], agg["coll"]
    pipe_s = time.perf_counter() - t0
    return {"n": n, "k": k, "fit_sec": round(fit_s, 2),
            "pipeline_sec": round(pipe_s, 2), "rows": n_rows,
            "collapsed": n_collapsed}


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("semdedup-scale-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        small = run(spark, N_SMALL, k=max(8, N_SMALL // 125))
        big_scaled = run(spark, N_SMALL * 10, k=max(8, N_SMALL * 10 // 125))
        big_fixed = run(spark, N_SMALL * 10, k=16)
        print(json.dumps({
            "small": small,
            "big_scaled_k": big_scaled,
            "big_fixed_k": big_fixed,
            "pipeline_ratio_scaled_k": round(
                big_scaled["pipeline_sec"] / small["pipeline_sec"], 2),
            "pipeline_ratio_fixed_k": round(
                big_fixed["pipeline_sec"] / small["pipeline_sec"], 2),
            "fit_ratio": round(big_scaled["fit_sec"] / small["fit_sec"], 2),
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
