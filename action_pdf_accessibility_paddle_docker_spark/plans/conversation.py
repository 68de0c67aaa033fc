"""Per-conversation fold: the A7/A8 analog of the reference's per-document
template accumulation (/root/reference/src/template_json.py:23-98 collects
per-page element lists and wraps them per document).

Our per-doc unit is the conversation: fold extracted turns into one row per
conv with turn-ordered arrays. This is the one place the engine needs a
`groupBy(conv_id)` co-location shuffle -- it must NOT be salted (the fold
needs whole conversations together); AQE's skew handling covers a
mega-conversation group (values are per-turn structs, bounded per turn).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fold_conversations(extracted: DataFrame) -> DataFrame:
    """extracted (per-turn) -> one row per conversation:
    (conv_id, n_turns, first_ts, last_ts, turns array<struct> ordered by
    turn_idx, conv_text with turns joined by newline, mathml flattened)."""
    turn_struct = F.struct(
        F.col("turn_idx"), F.col("role"), F.col("payload_kind"),
        F.col("extracted_text"), F.col("n_regions"),
    )
    folded = extracted.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sort_array(F.collect_list(turn_struct)).alias("turns"),
        # collect_list order depends on task scheduling; sort by turn_idx
        # before flattening so the conv-level mathml array is deterministic
        # across runs/parallelism (same guarantee as the turns array).
        F.flatten(
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("turn_idx"), F.col("mathml")))),
                lambda s: s["mathml"],
            )
        ).alias("mathml"),
        F.sum("n_artifacts").alias("n_artifacts"),
    )
    return folded.withColumn(
        "conv_text",
        F.concat_ws(
            "\n", F.filter(F.transform("turns", lambda t: t["extracted_text"]),
                           lambda s: F.length(s) > 0)
        ),
    )
