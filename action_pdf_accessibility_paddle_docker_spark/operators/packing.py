"""Sequence packing for training-batch construction: concat-and-chunk.

Documents are (conceptually) concatenated in deterministic ``doc_id`` order
within a hash shard and chunked into fixed ``capacity``-token context
windows; each document is assigned the pack range it lands in. This is the
standard pretraining packing strategy (concat + chunk, e.g. GPT-style) and,
unlike first-fit bin packing, it is a pure window computation: a running
token sum + floor division -- fully expressible in Spark SQL and in the
DuckDB oracle, and embarrassingly parallel across shards.

Scale shape: one shuffle on (shard) for the running-sum window; shards are
md5-derived from doc_id (same recipe as ``textstats.stable_split``) so the
layout is reproducible across engines and re-shards. No UDFs, no collects.
A 100 TB corpus packs shard-parallel; shard count is the parallelism knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count


def concat_chunk_packs(
    df: DataFrame,
    capacity: int = 2048,
    n_shards: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document its (shard, start_pack, end_pack, pack_offset)
    under concat-and-chunk packing with ``capacity`` tokens per pack.

    A document occupying token positions [cum_before, cum_before + n) of its
    shard's concatenated stream starts in pack floor(cum_before/capacity) and
    ends in pack floor((cum_before + n - 1)/capacity); documents longer than
    the remaining window span packs (they are split at chunk boundaries,
    which is the semantic of this strategy -- no silent drops).

    Deterministic layout: the within-shard order is (id, n_tokens) -- the
    n_tokens tiebreak makes the MATERIAL layout total even when duplicate
    ids exist upstream (two equal-id rows with different lengths would
    otherwise swap between runs/engines and flip every later offset; two
    equal-id equal-length rows swap harmlessly)."""
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % n_shards
    ).alias("shard")
    base = df.select(F.col(id_col), shard, token_count(F.col(text_col)).alias("n_tokens"))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col, "n_tokens")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(cum_before / capacity).alias("start_pack"),
        F.floor((cum_before + F.col("n_tokens") - 1) / capacity).alias("end_pack"),
        (cum_before % capacity).alias("pack_offset"),
    )
