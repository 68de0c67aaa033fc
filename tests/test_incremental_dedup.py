"""Incremental dedup contract: processing shard-by-shard against the
accumulated fingerprint table reproduces one-shot exact dedup."""

from pyspark.sql import functions as F

from action_pdf_accessibility_paddle_docker_spark.operators.dedup import (
    exact_dedup,
    incremental_dedup,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_two_shards_equal_one_shot(spark):
    shard1 = _df(spark, [
        (0, "alpha beta"), (1, "gamma delta"), (2, "ALPHA   beta"),  # 2 dups 0
    ])
    shard2 = _df(spark, [
        (10, "gamma delta"),       # dup of shard1's doc 1 -> dropped
        (11, "epsilon zeta"),      # fresh
        (12, "epsilon  ZETA"),     # dup of 11 within shard -> dropped
        (13, "eta theta"),         # fresh
    ])
    empty_fps = spark.createDataFrame([], "fingerprint string")

    s1, fps1 = incremental_dedup(shard1, empty_fps)
    s2, fps2 = incremental_dedup(shard2, fps1)

    surv_ids = sorted(
        [r["doc_id"] for r in s1.collect()] + [r["doc_id"] for r in s2.collect()]
    )
    one_shot = exact_dedup(shard1.unionByName(shard2))
    canonical = sorted(r["canonical_id"] for r in one_shot.collect())
    assert surv_ids == canonical == [0, 1, 11, 13]

    # accumulated fingerprint table covers the whole corpus
    all_fps = {r["fingerprint"] for r in fps1.unionByName(fps2).collect()}
    assert all_fps == {r["fingerprint"] for r in one_shot.collect()}


def test_anti_join_streams_corpus_side(spark):
    """Plan gate: the arriving shard is the big relation -- the anti join
    must be a hash join (broadcast or shuffled), never a nested loop."""
    shard = _df(spark, [(1, "a b"), (2, "c d")])
    seen = _df(spark, [(0, "a b")]).select(
        F.md5(F.lower(F.col("text"))).alias("fingerprint")
    )
    survivors, _ = incremental_dedup(shard, seen)
    plan = survivors._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
