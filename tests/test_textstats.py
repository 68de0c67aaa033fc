"""Repetition quality signals (Gopher-style): exact fractions on hand-built
documents, plus degenerate shapes (single word, all-one-phrase)."""

import pytest

from action_pdf_accessibility_paddle_docker_spark.operators import textstats as T


@pytest.fixture(scope="module")
def rows(spark):
    docs = [
        (1, "the cat sat on the mat"),          # 6 words, 5 distinct, 5 bigrams all unique
        (2, "buy now buy now buy now"),         # 6 words, 2 distinct; 'buy now' x3 of 5
        (3, "word"),                            # single word: no bigrams
        (4, "a a a a"),                         # one word repeated: 'a a' x3 of 3
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = T.repetition_signals(df).collect()
    return {r.doc_id: r for r in out}


def test_distinct_word_frac(rows):
    assert rows[1].n_words == 6 and rows[1].distinct_word_frac == round(5 / 6, 6)
    assert rows[2].distinct_word_frac == round(2 / 6, 6)
    assert rows[4].distinct_word_frac == 0.25


def test_top_bigram_frac(rows):
    assert rows[1].n_bigrams == 5 and rows[1].top_bigram_frac == 0.2
    # "buy now buy now buy now": bigrams = [buy now, now buy, buy now, now buy, buy now]
    assert rows[2].n_bigrams == 5 and rows[2].top_bigram_frac == 0.6
    assert rows[4].n_bigrams == 3 and rows[4].top_bigram_frac == 1.0


def test_single_word_doc_has_zero_bigrams(rows):
    assert rows[3].n_words == 1
    assert rows[3].n_bigrams == 0
    assert rows[3].top_bigram_frac == 0.0
