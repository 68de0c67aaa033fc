"""Streaming extraction: the same fused per-turn kernel over a file/Kafka
stream of transcript turns.

The reference is strictly batch (SURVEY.md section 2.8); this is the engine
extension for continuous ingestion at web scale. Because the kernel is
per-row, the streaming plan is stateless: readStream -> mapInArrow ->
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
    return stream.select("conv_id", "turn_idx", "role", "tool", "ts", "text").mapInArrow(
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


SESSION_OUT_DDL = (
    "conv_id string, n_turns bigint, n_chars bigint, "
    "first_ts timestamp, last_ts timestamp"
)
SESSION_STATE_DDL = "n_turns bigint, n_chars bigint, first_ts timestamp, last_ts timestamp"


def conversation_sessions(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "10 seconds"
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): fold each
    conversation's turns into running (n_turns, n_chars, first_ts, last_ts)
    state and EMIT one finalized row when the conversation has been idle for
    ``gap`` of event time -- the streaming twin of the batch
    ``fold_conversations`` (A7/A8), with the idle-gap semantics of
    ``q_sessionize``.

    State is bounded by the watermark: a conversation's state lives exactly
    until the event-time clock passes last_ts + gap (EventTimeTimeout), so
    10^9 concurrent conversations hold one 4-field row each, evicted on
    idle -- no unbounded accumulation. Arrow batches stream per group; no
    per-row Python."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = _duration_ms(gap)

    def fold(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            n, c, f, l = state.get
            state.remove()
            yield pd.DataFrame(
                [{"conv_id": key[0], "n_turns": n, "n_chars": c,
                  "first_ts": f, "last_ts": l}]
            )
            return
        n, c, f, l = (state.get if state.exists else (0, 0, None, None))
        last_epoch_ms = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            c += int(pdf["text"].str.len().fillna(0).sum())
            hi_ts = pdf["ts"].max()
            lo = pdf["ts"].min().to_pydatetime()
            hi = hi_ts.to_pydatetime()
            f = lo if f is None else min(f, lo)
            l = hi if l is None else max(l, hi)
            # epoch directly from the pandas Timestamp (naive values are
            # session-tz wall time; .timestamp() on the datetime would
            # re-interpret them in the executor's SYSTEM timezone -- requires
            # spark.sql.session.timeZone=UTC, which this engine sets
            # everywhere; .value is tz-independent of the host)
            ms = int(hi_ts.value // 1_000_000)
            last_epoch_ms = ms if last_epoch_ms is None else max(last_epoch_ms, ms)
        state.update((n, c, f, l))
        # fire when event time passes last activity + gap (must stay above
        # the current watermark or Spark rejects the timestamp)
        if last_epoch_ms is None:  # no new data this batch; re-arm from state
            last_epoch_ms = int(pd.Timestamp(l).value // 1_000_000)
        fire_at = max(
            last_epoch_ms + gap_ms,
            state.getCurrentWatermarkMs() + 1,
        )
        state.setTimeoutTimestamp(fire_at)

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_OUT_DDL,
            stateStructType=SESSION_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_exact_dedup(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup: drop turns whose normalized-text fingerprint
    was already seen within the watermark horizon
    (``dropDuplicatesWithinWatermark``). The streaming twin of the batch
    ``dedup.exact_dedup``: same md5-of-normalized-text fingerprint recipe.

    State is one fingerprint per distinct text, evicted once the event-time
    watermark passes -- bounded by the dedup horizon, not the stream length,
    which is what makes this runnable forever at ingest scale. The first
    arrival wins (within a micro-batch, ties are broken arbitrarily but one
    row always survives)."""
    from ..operators.dedup import normalized

    return (
        stream.withColumn("fingerprint", F.md5(normalized(F.col("text"))))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def streaming_near_dedup(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming NEAR-duplicate drop: key the watermarked dedup on the
    row-wise simhash (`dedup.simhash_col`) instead of the exact content
    fingerprint. Reworded-but-same-bag-of-words turns (reordered tokens,
    whitespace/case variants) collapse to one survivor; genuinely different
    content passes.

    This is only possible because simhash is computed as a stateless column
    expression -- `dropDuplicatesWithinWatermark` cannot sit downstream of a
    stateful explode+groupBy simhash. State is one 2^bits-keyed row per
    distinct simhash inside the horizon, evicted by the event-time
    watermark, so it is bounded by the dedup window at any corpus size."""
    from ..operators.dedup import simhash_col

    return (
        stream.withColumn("simhash", simhash_col(F.col("text")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["simhash"])
    )


def streaming_near_dedup_against_corpus(
    stream: DataFrame,
    seen_buckets: DataFrame,
    text_col: str = "text",
    hash_family: str = "md5mix",
) -> DataFrame:
    """Drop arriving documents that share ANY MinHash LSH band bucket with
    the batch corpus's persisted bucket table -- the STREAMING half of the
    incremental near-dedup loop (``dedup.incremental_near_dedup`` is the
    batch/CDC half; both probe the same table with the same semantics).

    Entirely STATELESS: the band buckets are a row-wise column
    (``dedup.minhash_buckets_col``, value-pinned to the batch signatures),
    and "hit in any band" decomposes into one stream-static LEFT ANTI
    equi-join per band on that band's bucket value -- no stateful
    aggregate, no watermark requirement of its own, so it composes freely
    with the stateless curation stages and with
    ``streaming_near_dedup`` / ``streaming_exact_dedup`` (which handle
    WITHIN-stream duplicates; this operator only knows the corpus).
    Documents with no shingles have NULL buckets, match nothing, and pass
    -- same contract as the batch form, where they have no bucket rows.

    Scale: the static side re-resolves per micro-batch; write the bucket
    table ``partitionBy('band')`` and each of the per-band joins scans
    exactly its partition (partition-pruned). The stream side is
    micro-batch-sized; Spark broadcasts it when small. The appendix
    (persisting the survivors' buckets back) is deliberately NOT done
    here -- a stream updating the table it joins against would race its
    own micro-batches; run the batch ``incremental_near_dedup`` over the
    accumulated output to advance the table.

    The table's ``hash_family`` stamp (when present) must match, exactly
    as in the batch path: bucket values are md5 hex in every family, so a
    mismatch silently admits near-dups of corpus content."""
    from ..operators.dedup import (
        adopt_banding, check_bucket_family, minhash_buckets_col,
    )

    # adopt the static table's stamped banding (a tuned table stays
    # probe-able), then validate -- the stamp is read once at query
    # construction, not per micro-batch
    num_hashes, bands = adopt_banding(seen_buckets, None, None)
    check_bucket_family(
        seen_buckets, hash_family, banding=f"{num_hashes}x{bands}"
    )
    out = stream.withColumn(
        "_bb", minhash_buckets_col(
            F.col(text_col), num_hashes=num_hashes, bands=bands,
            hash_family=hash_family,
        )
    )
    for b in range(bands):
        out = out.withColumn(
            f"_bkt{b}", F.element_at(F.col("_bb"), b + 1)["bucket"]
        )
    out = out.drop("_bb")
    for b in range(bands):
        sb = seen_buckets.where(F.col("band") == b).select(
            F.col("bucket").alias(f"_bkt{b}")
        )
        out = out.join(sb, f"_bkt{b}", "left_anti")
    return out.drop(*[f"_bkt{b}" for b in range(bands)])


def _duration_ms(s: str) -> int:
    n, unit = s.split()
    mult = {"second": 1_000, "seconds": 1_000, "minute": 60_000,
            "minutes": 60_000, "hour": 3_600_000, "hours": 3_600_000}[unit]
    return int(n) * mult


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
