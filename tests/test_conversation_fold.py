"""Per-conversation fold (A7/A8 analog)."""

from action_pdf_accessibility_paddle_docker_spark.oracle.extract import extract_turn
from action_pdf_accessibility_paddle_docker_spark.plans.conversation import (
    fold_conversations,
)
from action_pdf_accessibility_paddle_docker_spark.plans.extraction import build_extraction
from action_pdf_accessibility_paddle_docker_spark.sources.transcripts import iter_rows


def test_fold_conversations(spark):
    rows = list(iter_rows(10, 4, seed=5))
    df = spark.createDataFrame(rows)
    extracted = build_extraction(df, order_output=False)
    folded = {r["conv_id"]: r for r in fold_conversations(extracted).collect()}

    by_conv: dict = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)

    assert set(folded) == set(by_conv)
    for conv_id, conv_rows in by_conv.items():
        got = folded[conv_id]
        assert got["n_turns"] == len(conv_rows)
        # turns ordered by turn_idx regardless of shuffle
        idxs = [t["turn_idx"] for t in got["turns"]]
        assert idxs == sorted(idxs)
        # conv_text equals oracle texts joined in order (empties dropped)
        exp_texts = [
            extract_turn(r["text"])["extracted_text"]
            for r in sorted(conv_rows, key=lambda r: r["turn_idx"])
        ]
        assert got["conv_text"] == "\n".join(t for t in exp_texts if t)
        assert got["first_ts"] == min(r["ts"] for r in conv_rows).replace(tzinfo=None)
