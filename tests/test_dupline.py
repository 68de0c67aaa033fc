"""Corpus-wide exact duplicate-line removal (RefinedWeb/MassiveText-style):
first occurrence survives, later occurrences removed, short lines immune."""

from pyspark.sql import functions as F

from action_pdf_accessibility_paddle_docker_spark.operators.dedup import (
    duplicate_line_stats,
    remove_duplicate_lines,
)

BOILER = "this cookie banner line repeats across every page of the site"
SHORT = "Introduction"  # < 30 chars: never a dedup key


def _corpus(spark):
    rows = [
        (0, f"{BOILER}\n{SHORT}\nunique first document body line here today."),
        (1, f"{BOILER}\nunique second document body line here instead."),
        (2, f"{SHORT}\n{BOILER}"),            # all eligible lines are dups
        (3, "unique second document body line here instead."),  # dup of 1's
        (4, None),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_remove_duplicate_lines_semantics(spark):
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_lines(_corpus(spark)).collect()
    }
    # doc 0 is the corpus-first occurrence of BOILER: keeps everything
    assert out[0] == f"{BOILER}\n{SHORT}\nunique first document body line here today."
    # doc 1 loses BOILER (doc 0 owns it) but keeps its unique line
    assert out[1] == "unique second document body line here instead."
    # doc 2 loses BOILER too; the short line survives (ineligible)
    assert out[2] == SHORT
    # doc 3's only line duplicates doc 1's surviving line -> all removed
    assert out[3] == ""
    # NULL text passes through; empty text stays empty (single short line)
    assert out[4] is None and out[5] == ""


def test_duplicate_line_stats_matches_removal(spark):
    stats = {r["doc_id"]: r for r in duplicate_line_stats(_corpus(spark)).collect()}
    assert (stats[0]["n_lines"], stats[0]["n_dup_removed"]) == (3, 0)
    assert (stats[1]["n_lines"], stats[1]["n_dup_removed"]) == (2, 1)
    assert (stats[2]["n_lines"], stats[2]["n_dup_removed"]) == (2, 1)
    assert (stats[3]["n_lines"], stats[3]["n_dup_removed"]) == (1, 1)
    assert 4 not in stats  # NULL text has no lines
    # the fp pins byte-exact reassembly
    rewritten = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_lines(_corpus(spark)).collect()
    }
    got = (
        spark.createDataFrame(
            [(k, v) for k, v in rewritten.items() if v is not None],
            "doc_id bigint, text string",
        )
        .select("doc_id", F.md5("text").alias("fp"))
        .collect()
    )
    for r in got:
        assert stats[r["doc_id"]]["rewritten_fp"] == r["fp"]


def test_min_chars_threshold_binds(spark):
    """With min_chars above every line length, nothing is ever removed."""
    df = _corpus(spark)
    out = remove_duplicate_lines(df, min_chars=10_000)
    orig = {r["doc_id"]: r["text"] for r in df.collect()}
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got == orig


def test_first_occurrence_is_corpus_order_not_arrival(spark):
    """Winner = min(doc_id, line_idx): deterministic under any partitioning."""
    rows = [(9, f"x\n{BOILER}"), (1, f"{BOILER}\ny")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r["text"] for r in remove_duplicate_lines(df).collect()}
    assert out[1] == f"{BOILER}\ny" and out[9] == "x"
    # re-shard: same survivors
    out2 = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_lines(df.repartition(7)).collect()
    }
    assert out2 == out


def test_plan_has_no_window_and_one_hash_aggregate_build(spark):
    """No row_number window anywhere (a hot boilerplate line would pin one
    partition); the verdict join's build side is the min-per-hash aggregate;
    the occurrence table feeds both consumers through a checkpoint (so the
    join's probe exchange is not a reused explode stage)."""
    plan = (
        remove_duplicate_lines(_corpus(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "partial_min" in plan


def test_upstream_chain_executes_once(spark):
    """remove_duplicate_lines references its input twice (line explode +
    rewrite join); the internal checkpoint must sever both references from
    the source -- the round-5 neardup-CLI lesson. Pin: the executed final
    plan contains ZERO parquet scans of the source (both sides read the
    one checkpointed materialization as ExistingRDD). (An Observation
    cannot pin this: metrics inside a checkpointed subplan's RDD
    materialization never reach the listener.)"""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = remove_duplicate_lines(docs)
    out.collect()
    final = (
        out._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Scan parquet" not in final
    assert "ExistingRDD" in final


def test_hot_boilerplate_line_drill(spark):
    """The skew case the operator is designed around: one boilerplate line
    in 95% of a 20k-doc corpus. The min aggregate collapses the hot hash
    map-side; exactly one occurrence survives corpus-wide."""
    df = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(
                F.col("id") % 20 != 0,
                F.lit(BOILER + "\n"),
            ).otherwise(F.lit("")),
            F.lit("unique body for document number "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    stats = duplicate_line_stats(df)
    agg = stats.agg(
        F.sum("n_dup_removed").alias("removed"),
        F.count(F.lit(1)).alias("docs"),
    ).first()
    # 19000 docs carry BOILER; the corpus-first (doc_id=1) keeps it
    assert agg["docs"] == 20_000 and agg["removed"] == 19_000 - 1


def test_paragraph_unit_dedup(spark):
    """separator='\\n\\n' (Dolma-style paragraph dedup): a duplicated
    paragraph is removed whole, single newlines INSIDE paragraphs survive,
    and lines that merely repeat across different paragraphs are untouched."""
    para = ("this syndicated paragraph spans two physical lines\n"
            "and repeats verbatim across many documents of the corpus")
    rows = [
        (0, f"{para}\n\nunique first closing paragraph with plenty of words"),
        (1, f"unique opening paragraph for document one here\n\n{para}"),
        (2, "short\n\nanother fully original paragraph of text right here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_lines(df, separator="\n\n").collect()
    }
    assert out[0] == f"{para}\n\nunique first closing paragraph with plenty of words"
    assert out[1] == "unique opening paragraph for document one here"
    assert out[2] == "short\n\nanother fully original paragraph of text right here"
    stats = {
        r["doc_id"]: r
        for r in duplicate_line_stats(df, separator="\n\n").collect()
    }
    assert (stats[1]["n_lines"], stats[1]["n_dup_removed"]) == (2, 1)
    # line-unit over the same corpus behaves differently: each PHYSICAL line
    # of the paragraph is its own dedup key
    line_out = {
        r["doc_id"]: r["text"] for r in remove_duplicate_lines(df).collect()
    }
    assert line_out[1] == "unique opening paragraph for document one here\n"


def test_separator_is_literal_not_regex(spark):
    """Any literal separator is safe: the split pattern is \\Q-quoted, so a
    regex metacharacter like '|' splits on the literal character instead of
    exploding the text per-char and corrupting the roundtrip."""
    rows = [
        (0, "a long enough shared unit that repeats across docs|unique zero piece here today"),
        (1, "a long enough shared unit that repeats across docs|unique one piece here instead"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_lines(df, separator="|").collect()
    }
    assert out[0] == rows[0][1]            # corpus-first keeps everything
    assert out[1] == "unique one piece here instead"
