"""Physical-plan quality gates: pushdown, broadcast, codegen, no stray Python.

These pin the scale-critical plan shapes so a regression (e.g. a filter that
stops reaching the scan, a broadcast that degrades to shuffle) fails fast."""

from action_pdf_accessibility_paddle_docker_spark.plans import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    fn, _ = Q.REGISTRY[name]
    return fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushes_filter_to_scan(spark):
    plan = _plan(spark, "q_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # column pruning: only the referenced columns are read
    assert "l_comment" not in plan


def test_region_revenue_broadcasts_dims(spark):
    plan = _plan(spark, "q_region_revenue")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_theta_range_join_is_equi_join_not_bnlj(spark):
    plan = _plan(spark, "q_theta_range_join")
    # the bucketed rewrite must produce a hash join on the bucket key,
    # never a broadcast nested loop over the raw interval predicate
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan


def test_jvm_only_operators_have_no_python(spark):
    for name in ("q_doc_stats", "q_dedup_exact", "q_minhash_lsh", "q_simhash",
                 "q_ann_topk", "q_asof_join"):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "MapInPandas" not in plan, name


def test_semi_anti_join_shapes(spark):
    assert "LeftSemi" in _plan(spark, "q_semi_join")
    assert "LeftAnti" in _plan(spark, "q_anti_join")


def test_column_pruned_scan_for_doc_stats(spark):
    plan = _plan(spark, "q_doc_stats")
    assert "ReadSchema" in plan
    # only doc_id + text needed
    assert "n_chars" not in plan.split("ReadSchema")[1][:200]
