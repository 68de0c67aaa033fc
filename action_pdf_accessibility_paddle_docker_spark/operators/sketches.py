"""Approximate sketches next to their exact twins.

At 100 TB, exact `count(DISTINCT)` and exact percentiles are shuffle-heavy
(distinct forces a per-key dedup pass; exact percentile materializes the
sorted group). The sketch forms — HyperLogLog++ (`approx_count_distinct`)
and KLL-style quantiles (`percentile_approx`) — are single-pass,
fixed-memory, and mergeable, so they keep map-side combine and scale
linearly. This module computes sketch and exact twins side by side (as TWO
aggregation passes -- see sketch_accuracy's docstring for why mixing the
families into one is 14x slower) and reports the
sketch error against the exact value, which is how the harness pins them:
the oracle asserts the exact values plus `within tolerance = true` flags
(the sketch itself is engine-specific and can never hash-match across
engines; its accuracy contract can).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_accuracy(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    value_col: str,
    distinct_rel_tol: float = 0.05,
    quantile_rel_tol: float = 0.05,
) -> DataFrame:
    """Per group: exact distinct count and exact median alongside their
    sketch estimates, plus boolean tolerance verdicts. The exact aggregates
    are the cross-engine-checkable part, the booleans pin the sketch
    quality.

    Deliberately THREE aggregation passes joined on the (tiny) group key:
    countDistinct rewrites to an Expand (x2 rows), and mixing it with the
    sort/object-based percentile aggregates forces the whole plan into one
    SortAggregate over the expanded stream -- measured 14x slower than the
    clean passes at sf0.1 (5.8s vs ~1s). Worse (round 8): keeping
    approx_count_distinct in the SAME pass as countDistinct makes the
    Expand's partial aggregate key on (group, distinct_col), so one
    multi-KB HLL++ buffer is allocated PER DISTINCT VALUE rather than per
    group -- measured 1.32s vs 0.40s + 0.31s for the split passes at
    sf0.1, and at scale that per-key buffer blowup is an OOM, not a
    slowdown. Separated, each family keeps its fast path (the HLL pass
    holds one buffer per GROUP) and the joins are broadcasts over the
    group cardinality. The HLL estimate is unchanged: it ingests exactly
    the same per-group value set either way."""
    exact_p50 = F.expr(f"percentile({value_col}, 0.5)")
    approx_p50 = F.percentile_approx(value_col, 0.5, 10_000)
    # NULL-safe group key: the passes join on the group column, and a
    # null-rejecting equi-join would silently DROP the NULL group that all
    # aggregations produce (the q_training_mix sentinel lesson)
    k = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00<null>"))
    distinct_agg = df.groupBy(k.alias("_k"), F.col(group_col)).agg(
        F.countDistinct(distinct_col).alias("n_distinct_exact"),
    )
    approx_agg = df.groupBy(k.alias("_k")).agg(
        F.approx_count_distinct(distinct_col, 0.02).alias("n_distinct_approx"),
    )
    pct_agg = df.groupBy(k.alias("_k")).agg(
        exact_p50.alias("_p50_exact"),
        approx_p50.alias("_p50_approx"),
    )
    out = distinct_agg.join(F.broadcast(approx_agg), "_k").join(
        F.broadcast(pct_agg), "_k"
    )
    # tolerance verdicts are ZERO-GUARDED (ANSI mode raises on /0): an
    # exact value of 0 is within tolerance iff the sketch also reads 0,
    # and an all-NULL value column (NULL exact median) pins false rather
    # than a NULL boolean the oracle cannot replay
    d_err_ok = F.when(
        F.col("n_distinct_exact") == 0, F.col("n_distinct_approx") == 0
    ).otherwise(
        F.abs(F.col("n_distinct_approx") - F.col("n_distinct_exact"))
        / F.col("n_distinct_exact") <= distinct_rel_tol
    )
    q_err_ok = F.coalesce(
        F.when(
            F.col("_p50_exact") == 0, F.col("_p50_approx") == 0
        ).otherwise(
            F.abs(F.col("_p50_approx") - F.col("_p50_exact"))
            / F.abs(F.col("_p50_exact")) <= quantile_rel_tol
        ),
        F.lit(False),
    )
    return out.select(
        F.col(group_col),
        F.col("n_distinct_exact").cast("bigint"),
        d_err_ok.alias("distinct_within_tol"),
        F.round(F.col("_p50_exact"), 2).alias("p50_exact"),
        q_err_ok.alias("p50_within_tol"),
    )
