#!/usr/bin/env python
"""Regenerate EXPLAIN.md: formatted physical plans for the scale-critical
queries, so plan quality is reviewable without running Spark. The same
shapes are enforced programmatically in tests/test_plan_quality.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ANNOTATED = {
    "q_pricing_summary": "filter + column pruning reach the parquet scan "
    "(PushedFilters / ReadSchema); one partial+final aggregate",
    "q_region_revenue": "all three dimension joins are BroadcastHashJoin "
    "(no SortMergeJoin): the fact table streams",
    "q_theta_range_join": "interval theta-join rewritten to a bucket "
    "equi-join + residual: no BroadcastNestedLoopJoin",
    "q_asof_join": "as-of via union + window merge: one shuffle by key, "
    "no pairwise join",
    "q_minhash_lsh": "posting-list + chained explode pair expansion: "
    "candidates meet in (band, bucket) groups, never a cross product; "
    "round 8: the signature aggregate fuses onto the doc_id-keyed widen "
    "exchange (the exploded shingle stream is never shuffled) and the "
    "pair-dedup distinct fuses onto a range exchange so the output sort "
    "is partition-local (10 -> 6 Exchange)",
    "q_tfidf_top_terms": "vocab-sized docfreq broadcast back; "
    "WindowGroupLimit pushes the top-k below the full sort",
    "q_ann_topk": "query side broadcast (corpus streams); "
    "window top-k per query; round 8: squared norms are projected once "
    "per VECTOR on each side (_qn2/_cn2 attributes) so the per-pair "
    "expression is one dot fold, not three O(dim) folds",
    "q_pack_sequences": "one running-sum window per md5 shard; "
    "no cross-shard exchange",
    "q_line_filter": "C4 line cleaning as ONE codegen projection "
    "(split + array filter + array_join): no explode; round 8: the only "
    "exchange is the range-widen of the INPUT on the sort key, so the "
    "output sort is partition-local and the sampling pass re-executes "
    "only the scan, never the projection",
    "q_pii_redact": "regexp counts + 6-pass redaction (emails, IPv4, "
    "cards, SSNs, intl + dashed phones) in one projection over the scan; "
    "round 8: range-widened input, same single-exchange shape as "
    "q_line_filter",
    "q_simhash": "explode + per-bit vote aggregate (codegen'd; the "
    "row-wise fold form exists for streaming); round 8: the aggregate "
    "fuses onto the range-widen exchange and the output sort is local -- "
    "ONE exchange in the whole plan (was 6)",
    "q_chunk_dedup": "the ONLY hash-keyed op is a map-side-combined min "
    "aggregate; n_dup = n_chunks - n_canonical, all joins on doc_id -- "
    "no window (unsplittable) and no hash join-back; round 8: the "
    "exploded chunk-hash table is checkpointed (Scan ExistingRDD in this "
    "plan) so the doc_id-keyed widen can fuse the per-doc aggregate "
    "without double-executing the explode for its two consumers",
    "q_sketch_accuracy": "distinct-count family and percentile family "
    "aggregated in separate passes then broadcast-joined: mixing them "
    "forces one SortAggregate over Expand-doubled rows (14x slower); "
    "round 8: the HLL sketch moved to its own third pass -- inside the "
    "countDistinct Expand its partial buffer was allocated per DISTINCT "
    "VALUE, not per group (an OOM class at scale)",
    "q_incremental_dedup": "shard collapses to one row per fingerprint "
    "(map-side min-struct agg) BEFORE the LeftAnti join -- no hot "
    "fingerprint can dominate a join partition; with a bucketed "
    "fingerprint table (write_fingerprint_table) the corpus side is read "
    "with NO Exchange, and method='probe' streams it map-only. The round-7 span leg keeps the same posture: the shard's distinct gram set broadcasts and the corpus gram table streams map-only (zero exchanges of the state)",
    "q_doc_stats": "one regex-split pass: every signal (and the round-6 "
    "URL-normalization leg, riding via document_stats(extra=)) derives "
    "from a single projection over ONE scan; round 8: the only exchange "
    "is the range-widen of the input on doc_id (4 -> 2 Exchange) -- the "
    "output sort is partition-local and the range sample re-executes "
    "only the scan, not the projection",
    "q_quality_gate": "round 7: the final plan reads the CHECKPOINTED "
    "per-doc scored frame (Scan ExistingRDD -- the scoring subtree runs "
    "once even though the top-fraction cut references it twice; its shape "
    "-- one documents scan, Generate, vocab-bounded BroadcastHashJoin, "
    "map-side-combined sum -- is pinned pre-checkpoint by "
    "test_quality_gate_entry_composed_shape) and joins the 1-row "
    "percentile cutpoint back as a broadcast (BNLJ Cross on ONE row, the "
    "deliberate 1-row-cross-join pattern)",
    "q_training_mix": "composed funnel gate -> exact dedup -> per-source "
    "cap -> split: the cap's per-stratum count table (one row per source) "
    "joins back as a BroadcastHashJoin keep-rate -- NO Window anywhere, "
    "so a mega-domain cannot serialize a partition",
    "q_lm_quality": "unigram model joins back on term with NO broadcast "
    "hint (web-scale vocab is unbounded; tf re-shuffles on term for the "
    "join -- survivable, AQE can skew-split it, unlike a forced broadcast "
    "OOM; AQE still elects broadcast when the vocab is small); bucket "
    "cutpoints are two quantile doubles cross-joined back, not a global "
    "ntile sort; round 8: the BPE-count side is doc_id-keyed-widened "
    "(the regex was parallelism-starved in the scan splits) and "
    "co-partitions the final join",
}


def main() -> None:
    from pyspark.sql import SparkSession

    from action_pdf_accessibility_paddle_docker_spark.plans import queries as Q

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sf_dir = "/root/testdata/sf0.001"
    out = [
        "# EXPLAIN — physical plans of the scale-critical queries\n",
        "Generated by `python scripts/dump_plans.py` (sf0.001; plans are "
        "shape-stable across SF). The same properties are asserted in "
        "`tests/test_plan_quality.py`.\n",
    ]
    for name, note in ANNOTATED.items():
        if name in Q.EAGER_BUILDERS:
            # building these executes work (e.g. starts an availableNow
            # stream or materializes a fixture table) -- there is no
            # side-effect-free plan to dump, but keep the documented
            # rationale; the shape is asserted in tests instead
            out.append(
                f"## {name}\n\n{note}.\n\n(builder is eager -- no "
                "side-effect-free plan to dump; the plan shape is pinned "
                "by tests/test_incremental_dedup.py / "
                "tests/test_plan_quality.py)\n"
            )
            continue
        fn, _ = Q.REGISTRY[name]
        plan = (
            fn(spark, sf_dir)
            ._jdf.queryExecution()
            .explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        )
        # keep the operator tree, drop the verbose per-node details section
        # -- but surface the scan pushdown lines, which live in the details
        tree = plan.split("\n\n")[0]
        pushed = [
            ln.strip()
            for ln in plan.splitlines()
            if ("PushedFilters" in ln or "ReadSchema" in ln)
        ]
        extra = ("\n" + "\n".join(pushed)) if pushed else ""
        out.append(f"## {name}\n\n{note}.\n\n```\n{tree}{extra}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAIN.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote EXPLAIN.md")


if __name__ == "__main__":
    main()
