"""Streaming extraction: the same fused per-turn kernel over a file/Kafka
stream of transcript turns.

The reference is strictly batch (SURVEY.md section 2.8); this is the engine
extension for continuous ingestion at web scale. Because the kernel is
per-row, the streaming plan is stateless: readStream -> mapInPandas ->
writeStream with checkpointing gives exactly-once file sinks for free.
Event-time accounting (late-turn counts per conversation window) is the one
stateful add-on, built on watermarks + windowed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.extraction import OUTPUT_DDL, make_extraction_kernel

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def build_streaming_extraction(
    stream: DataFrame, thresholds: dict[int, float] | None = None
) -> DataFrame:
    """Stateless streaming extraction (same kernel as batch)."""
    kernel = make_extraction_kernel(thresholds)
    return stream.select("conv_id", "turn_idx", "role", "tool", "ts", "text").mapInPandas(
        kernel, schema=OUTPUT_DDL
    )


def conversation_activity(
    stream: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Stateful add-on: per-conversation windowed turn counts with a
    watermark bounding state for late turns."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "conv_id", "turns", "max_turn_idx",
        )
    )


def run_stream_to_parquet(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    thresholds: dict[int, float] | None = None,
    timeout_sec: float | None = None,
):
    """End-to-end streaming job: file source -> extraction -> parquet sink
    with checkpointing (restart-safe). Returns the terminated query."""
    stream = read_transcript_stream(spark, input_path)
    out = build_streaming_extraction(stream, thresholds)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
