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


def test_cross_engine_line_filter_fuzz(spark):
    """Seeded fuzz across Spark and DuckDB for the full line-filter
    expression stack (split, right(), word count via filtered split,
    contains, array_join): adversarial lines -- empty, whitespace-only,
    unicode, quotes, boilerplate substrings at word boundaries."""
    import random

    import duckdb

    from action_pdf_accessibility_paddle_docker_spark.operators.linefilter import (
        line_filter_stats,
    )

    rng = random.Random(7)
    line_frags = [
        "a good long line that ends here.",
        "no terminal punct", "tiny.", "", "   ",
        'quoted line ending properly."',
        "mentions javascript mid sentence.",
        "JAVASCRIPT IN CAPS ends anyway.",
        "cookie policy note appears here.",
        "terms of use referenced in line.",
        "lorem ipsum poisons the doc fully.",
        "unicode café naïve line closes.",
        "brace {x} inside a line stays.",
        "question form line works does it?",
        "exclamation form line works now!",
        "one two.", "word .", ".", "?", "  leading spaces count fine.",
    ]
    texts = [
        "\n".join(rng.choice(line_frags) for _ in range(rng.randint(0, 8)))
        for _ in range(300)
    ]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    srows = {r["doc_id"]: r for r in line_filter_stats(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    drows = con.execute(
        """
        WITH k AS (
          SELECT doc_id, text,
            list_filter(str_split(text, chr(10)), l ->
              right(l, 1) IN ('.', '!', '?', '"')
              AND len(list_filter(str_split(l, ' '), w -> w <> '')) >= 3
              AND NOT (contains(lower(l), 'javascript')
                       OR contains(lower(l), 'cookie policy')
                       OR contains(lower(l), 'terms of use'))) AS kept
          FROM t
        )
        SELECT doc_id,
               len(str_split(text, chr(10))) AS n_lines,
               len(kept) AS n_kept,
               (len(kept) >= 3 AND NOT (contains(lower(text), 'lorem ipsum')
                                        OR contains(lower(text), '{'))) AS keep_doc,
               md5(coalesce(array_to_string(kept, chr(10)), '')) AS cleaned_fp
        FROM k ORDER BY doc_id
        """
    ).fetchall()
    for doc_id, n_lines, n_kept, keep_doc, fp in drows:
        s = srows[doc_id]
        got = (s["n_lines"], s["n_kept"], s["keep_doc"], s["cleaned_fp"])
        assert got == (n_lines, n_kept, keep_doc, fp), (doc_id, repr(texts[doc_id]), got, (n_lines, n_kept, keep_doc, fp))
