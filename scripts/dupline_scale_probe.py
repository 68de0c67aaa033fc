"""Scale probe for corpus-wide duplicate-line removal: 20k -> 200k docs
(10x), each 5 lines with THREE hot boilerplate lines at ~95% incidence
(the skew case the operator is designed around) plus unique body lines.
Times duplicate_line_stats warm, min-of-2, both scales in one session.

Run from the repo root:  python scripts/dupline_scale_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corpus(spark, n: int):
    from pyspark.sql import functions as F

    boilers = [
        F.lit(f"hot boilerplate banner number {k} repeats across almost every page\n")
        for k in range(3)
    ]
    d = F.col("id")
    text = F.concat(
        *[
            F.when(d % 20 != k, b).otherwise(F.lit(""))
            for k, b in enumerate(boilers)
        ],
        F.lit("unique body line for document number "), d.cast("string"),
        F.lit(" with a calm steady tone.\nsecond unique line for document "),
        d.cast("string"), F.lit(" wraps it up cleanly."),
    )
    return (
        spark.range(n)
        .repartition(32)
        .select(d.alias("doc_id"), text.alias("text"))
        .localCheckpoint()  # time the operator, not the generator
    )


def run(df) -> float:
    from pyspark.sql import functions as F

    from action_pdf_accessibility_paddle_docker_spark.operators.dedup import (
        duplicate_line_stats,
    )

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        row = duplicate_line_stats(df).agg(
            F.sum("n_dup_removed").alias("removed"),
            F.count(F.lit(1)).alias("docs"),
        ).first()
        best = min(best, time.perf_counter() - t0)
    return best, row


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    small = corpus(spark, 20_000)
    big = corpus(spark, 200_000)
    # warm the python-free path once
    small.count(), big.count()
    t_small, r_small = run(small)
    t_big, r_big = run(big)
    print(
        f"20k docs: {t_small:.2f}s (removed {r_small['removed']}); "
        f"200k docs: {t_big:.2f}s (removed {r_big['removed']}); "
        f"ratio {t_big / t_small:.2f}x at 10x rows (linear would be >=10x)"
    )


if __name__ == "__main__":
    main()
