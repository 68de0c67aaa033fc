"""Synthetic transcripts generator: determinism, skew, and payload coverage."""

import itertools

from action_pdf_accessibility_paddle_docker_spark.config import classify_payload
from action_pdf_accessibility_paddle_docker_spark.sources.transcripts import (
    iter_rows,
    make_row,
    turns_for_conv,
)


def test_rows_deterministic():
    a = make_row(42, 3, 7)
    b = make_row(42, 3, 7)
    assert a == b
    assert make_row(43, 3, 7)["text"] != a["text"] or make_row(43, 3, 7) != a


def test_skew_max_50x_median():
    n = 200
    lens = [turns_for_conv(c, n, 8) for c in range(n)]
    lens_sorted = sorted(lens)
    median = lens_sorted[n // 2]
    assert max(lens) >= 50 * median


def test_payload_mix_and_ts_monotone():
    rows = list(itertools.islice(iter_rows(30, 6, 42), 0, 1000))
    kinds = {k: 0 for k in ("pdf", "html", "text")}
    for r in rows:
        kinds[classify_payload(r["text"])] += 1
    assert all(v > 50 for v in kinds.values())
    by_conv: dict = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append((r["turn_idx"], r["ts"]))
    for turns in by_conv.values():
        ts = [t for _, t in sorted(turns)]
        assert ts == sorted(ts)
