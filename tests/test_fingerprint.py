"""Winnowing rolling-hash fingerprints: scalar == vectorized; edit
robustness; Spark operator plumbing."""

from hypothesis import given, settings
from hypothesis import strategies as st

from action_pdf_accessibility_paddle_docker_spark.functions.fingerprint import (
    fingerprints,
    fingerprints_np,
    kgram_hashes,
    winnow,
)

text_st = st.text(alphabet="abcdef ", max_size=120)


@settings(max_examples=200, deadline=None)
@given(text_st, st.integers(2, 10), st.integers(1, 8))
def test_scalar_equals_vectorized(text, k, w):
    assert fingerprints(text, k, w) == fingerprints_np(text, k, w)


def test_rolling_hash_matches_direct():
    s = "abcdefgh" * 3
    k = 5
    hs = kgram_hashes(s, k)
    # direct (non-rolling) recompute of an arbitrary k-gram
    B, M = 131, (1 << 61) - 1
    direct = 0
    for ch in s[7:7 + k]:
        direct = (direct * B + ord(ch)) % M
    assert hs[7] == direct


def test_winnow_rightmost_min_tie():
    # windows: [5,1]->(1,1); [1,1] tie -> rightmost (2,1); [1,5]->(2,1) dedup
    assert winnow([5, 1, 1, 5], w=2) == [(1, 1), (2, 1)]


def test_edit_robustness():
    t1 = "the quick brown fox jumps over the lazy dog " * 5
    t2 = t1.replace("lazy", "hazy", 1)
    f1, f2 = set(fingerprints(t1)), set(fingerprints(t2))
    assert len(f1 & f2) / len(f1 | f2) > 0.7


def test_short_and_empty():
    assert fingerprints("", 8, 5) == []
    assert fingerprints("abc", 8, 5) == []
    assert len(fingerprints("abcdefgh", 8, 5)) == 1


def test_spark_operator(spark):
    from action_pdf_accessibility_paddle_docker_spark.operators.textstats import (
        winnowing_fingerprints,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    out = {r["doc_id"]: r for r in winnowing_fingerprints(docs).collect()}
    rows = docs.collect()
    assert len(out) == len(rows)
    for r in rows:
        assert list(out[r["doc_id"]]["fingerprints"]) == fingerprints(r["text"])
