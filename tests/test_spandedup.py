"""Corpus-wide exact duplicate-SPAN removal (Lee et al. 2021 ExactSubstr,
arXiv:2107.06499): every duplicated run of >= k tokens is removed except its
corpus-first occurrence; shorter repeats are immune; untouched docs pass
through byte-exact."""

from pyspark.sql import functions as F

from action_pdf_accessibility_paddle_docker_spark.operators.dedup import (
    duplicate_span_stats,
    remove_duplicate_spans,
)

K = 4

# an 6-token span shared verbatim by docs 0/1/2 at DIFFERENT offsets
SHARED = "alpha bravo charlie delta echo foxtrot"
# a 3-token repeat (< k): never removable
SHORT = "tiny repeated bit"


def _corpus(spark):
    rows = [
        (0, f"{SHARED} zero unique tail words here"),
        (1, f"one opening {SHARED} and its own ending"),
        (2, f"two very different opening words {SHARED}"),
        # doc 3 repeats the shared span WITHIN itself twice, back to back:
        # both copies lose to doc 0 -> one merged island removes them all
        (3, f"{SHARED} {SHARED} three tail"),
        (4, f"四 {SHORT} and {SHORT} again nothing long enough"),
        (5, None),
        (6, ""),
        (7, "seven short"),  # < k tokens: no grams at all
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_remove_duplicate_spans_semantics(spark):
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(_corpus(spark), k=K).collect()
    }
    # doc 0 is the corpus-first occurrence (min doc_id): byte-exact keep
    assert out[0] == f"{SHARED} zero unique tail words here"
    # docs 1/2 lose exactly the 6 shared tokens, wherever they sat
    assert out[1] == "one opening and its own ending"
    assert out[2] == "two very different opening words"
    # doc 3: both in-doc copies are non-winners; the 12 removed positions
    # merge into one island (adjacent grams), tail survives
    assert out[3] == "three tail"
    # < k repeats are immune; byte-exact passthrough (no span removed)
    assert out[4] == f"四 {SHORT} and {SHORT} again nothing long enough"
    assert out[5] is None and out[6] == "" and out[7] == "seven short"


def test_duplicate_span_stats_matches_removal(spark):
    corpus = _corpus(spark)
    stats = {r["doc_id"]: r for r in duplicate_span_stats(corpus, k=K).collect()}
    assert set(stats) == set(range(8))  # every doc reports, incl. NULL text
    assert (stats[0]["n_tokens"], stats[0]["n_removed_tokens"]) == (11, 0)
    assert (stats[1]["n_tokens"], stats[1]["n_removed_tokens"]) == (12, 6)
    assert (stats[2]["n_tokens"], stats[2]["n_removed_tokens"]) == (11, 6)
    assert (stats[3]["n_tokens"], stats[3]["n_dup_spans"],
            stats[3]["n_removed_tokens"]) == (14, 1, 12)
    assert stats[4]["n_removed_tokens"] == 0
    assert (stats[5]["n_tokens"], stats[7]["n_removed_tokens"]) == (0, 0)
    # fp contract: md5 of exactly what the consuming form emits -- NULL text
    # pins a NULL fp (distinct from empty text's md5('')), mirroring the
    # remover's NULL passthrough
    rewritten = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(corpus, k=K).collect()
    }
    got = (
        corpus.sparkSession.createDataFrame(
            [(d, t) for d, t in rewritten.items()],
            "doc_id bigint, text string",
        )
        .select("doc_id", F.md5("text").alias("fp"))
        .collect()
    )
    for r in got:
        assert stats[r["doc_id"]]["rewritten_fp"] == r["fp"]
    assert stats[5]["rewritten_fp"] is None
    import hashlib
    assert stats[6]["rewritten_fp"] == hashlib.md5(b"").hexdigest()


def test_span_winner_is_position_independent(spark):
    # the corpus-first occurrence is min(doc_id, pos): doc 5 holds the span
    # at pos 0 but doc 4 (later position, smaller id) wins
    rows = [
        (4, f"a much longer opening here {SHARED}"),
        (5, f"{SHARED} with trailing context words"),
    ]
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(
            spark.createDataFrame(rows, "doc_id bigint, text string"), k=K
        ).collect()
    }
    assert out[4] == f"a much longer opening here {SHARED}"
    assert out[5] == "with trailing context words"


def test_contamination_scores_union_across_benchmarks(spark):
    """Doc-level contamination aggregates hits across the WHOLE benchmark
    suite: a train doc overlapping two bench docs at ~25% each scores ~50%
    doc-level even though no single pair clears decontaminate's 30%."""
    from action_pdf_accessibility_paddle_docker_spark.operators.dedup import (
        contamination_scores,
        decontaminate,
    )

    # 9 tokens -> 8 distinct bigrams; bench0 holds bigrams of the first
    # half, bench1 of the second half
    train = spark.createDataFrame(
        [(0, "aa bb cc dd ee ff gg hh ii"), (1, "zz yy xx ww vv uu tt ss rr")],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "aa bb cc dd"), (101, "ff gg hh ii")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in contamination_scores(train, bench).collect()}
    # doc 0: 8 shingles; hits = {aa bb, bb cc, cc dd} + {ff gg, gg hh, hh ii}
    assert (got[0]["n_shingles"], got[0]["n_contaminated"]) == (8, 6)
    assert got[0]["contamination_frac"] == 0.75
    # doc 1: no overlap at all
    assert got[1]["n_contaminated"] == 0
    # the pairwise form at 0.5 sees NO pair (each bench covers only 3/8)
    assert decontaminate(train, bench, min_overlap_frac=0.5).count() == 0


def test_span_k_threshold_binds(spark):
    # the shared run is exactly 6 tokens: k=6 still removes it, k=7 cannot
    rows = [(0, f"{SHARED} zero tail"), (1, f"one {SHARED} tail")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    at6 = {r["doc_id"]: r["text"] for r in remove_duplicate_spans(df, k=6).collect()}
    at7 = {r["doc_id"]: r["text"] for r in remove_duplicate_spans(df, k=7).collect()}
    assert at6[1] == "one tail"
    assert at7[1] == f"one {SHARED} tail"
