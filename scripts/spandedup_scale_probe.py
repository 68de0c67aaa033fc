"""Scale probe for exact duplicate-SPAN removal (ExactSubstr): 10k -> 100k
docs (10x), each ~60 tokens with a HOT 16-token span at ~95% incidence (the
hot-gram skew case the join is designed around: the shared span's grams all
collapse to one build-side row) plus doc-unique prose. Times
duplicate_span_stats at k=8 warm, min-of-2, both scales in one session.

Run from the repo root:  python scripts/spandedup_scale_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 8


def corpus(spark, n: int):
    from pyspark.sql import functions as F

    d = F.col("id")
    hot = (
        "the shared press release paragraph that nearly every mirror site "
        "republishes verbatim in full each week"  # 16 tokens
    )
    # ~5% of docs skip the hot span entirely; every doc gets ~44 unique
    # tokens whose grams never collide (doc id baked into each token)
    uniq = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(44)),
            lambda j: F.concat(
                F.lit("w"), d.cast("string"), F.lit("x"), j.cast("string")
            ),
        ),
    )
    text = F.when(d % 20 != 0, F.concat_ws(" ", F.lit(hot), uniq)).otherwise(uniq)
    return (
        spark.range(n)
        .repartition(32)
        .select(d.alias("doc_id"), text.alias("text"))
        .localCheckpoint()  # time the operator, not the generator
    )


def run(df):
    from pyspark.sql import functions as F

    from action_pdf_accessibility_paddle_docker_spark.operators.dedup import (
        duplicate_span_stats,
    )

    best = float("inf")
    row = None
    for _ in range(2):
        t0 = time.perf_counter()
        row = duplicate_span_stats(df, k=K).agg(
            F.sum("n_removed_tokens").alias("removed"),
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
    small = corpus(spark, 10_000)
    big = corpus(spark, 100_000)
    small.count(), big.count()
    t_small, r_small = run(small)
    t_big, r_big = run(big)
    # every hot-span holder except the corpus-first winner loses 16 tokens
    for name, r, n in (("10k", r_small, 10_000), ("100k", r_big, 100_000)):
        want = (n - n // 20 - 1) * 16
        assert r["removed"] == want, (name, r["removed"], want)
    print(
        f"10k docs: {t_small:.2f}s (removed {r_small['removed']}); "
        f"100k docs: {t_big:.2f}s (removed {r_big['removed']}); "
        f"ratio {t_big / t_small:.2f}x at 10x rows (linear would be >=10x)"
    )


if __name__ == "__main__":
    main()
