"""C4-style line filter: per-line keep semantics, doc gate, reassembly."""

from pyspark.sql import functions as F

from action_pdf_accessibility_paddle_docker_spark.operators.linefilter import (
    apply_line_filter,
    line_filter_stats,
)


def _doc(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_line_keep_rules(spark):
    text = "\n".join(
        [
            "this line is long enough and terminal.",  # keep
            "no terminal punctuation here",  # drop: no terminal
            "too short.",  # drop: < 3 words
            "Please enable JavaScript to continue.",  # drop: boilerplate
            "ends with a question mark does it not?",  # keep
            'a quoted line with terminal quote."',  # keep
            "",  # drop: empty
        ]
    )
    row = line_filter_stats(_doc(spark, text)).collect()[0]
    assert row["n_lines"] == 7
    assert row["n_kept"] == 3
    assert row["keep_doc"] is True


def test_doc_banned_phrases(spark):
    good = "one good line right here today.\nanother good line right here.\na third good line is here."
    for poison in ("contains lorem ipsum somewhere.", "code { body }"):
        row = line_filter_stats(_doc(spark, good + "\n" + poison)).collect()[0]
        assert row["keep_doc"] is False, poison
    assert line_filter_stats(_doc(spark, good)).collect()[0]["keep_doc"] is True


def test_min_kept_lines_gate(spark):
    two = "good line number one is fine.\ngood line number two is fine."
    assert line_filter_stats(_doc(spark, two)).collect()[0]["keep_doc"] is False
    assert (
        line_filter_stats(_doc(spark, two), min_kept_lines=2).collect()[0]["keep_doc"]
        is True
    )


def test_apply_line_filter_rewrites_text_and_drops_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "keep this line as written here.\ndrop me\nsecond kept line is here.\nthird kept line is here."),
            (2, "only one good line survives here.\nnope\nnah"),
        ],
        "doc_id long, text string",
    )
    out = apply_line_filter(df).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["text"] == (
        "keep this line as written here.\n"
        "second kept line is here.\nthird kept line is here."
    )


def test_null_and_empty_text(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in line_filter_stats(df).collect()}
    assert rows[2]["n_kept"] == 0 and rows[2]["keep_doc"] is False
    # null text: split(null) is null -> stats null, keep_doc null (filtered by apply)
    assert apply_line_filter(df).count() == 0
