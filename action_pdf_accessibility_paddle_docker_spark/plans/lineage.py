"""Per-partition lineage + counters, and checkpoint-resumable runs.

north_rule: "every stage writes per-partition lineage + counters to enable
checkpoint-resumable restarts".

Design:

* The extraction kernel stamps every row with the executor partition id and
  per-row counters (n_regions, n_artifacts, n_pages, error). ``lineage_metrics``
  reduces those to one row per partition -- a cheap shuffle of tiny rows.
* ``run_resumable`` shards the job into ``n_buckets`` conv-hash buckets
  (``pmod(xxhash64(conv_id), n_buckets)``) -- a conversation never straddles
  buckets, so per-bucket (conv_id, turn_idx) ordering gives stable per-conv
  output. Buckets are processed in batches; each batch is written with
  dynamic partition overwrite (idempotent under retry), and a bucket's
  lineage record is committed (atomic tmp+rename) only AFTER its data write
  commits. A restart reads the lineage dir and anti-joins completed buckets:
  exactly-once per bucket despite crashes between batches.

At 100 TB / 1000 executors the bucket count is the resume granularity knob:
n_buckets ~ 4-16x executor count keeps batches wide enough to saturate the
cluster while bounding recomputation after a crash to one batch.
"""

from __future__ import annotations

import json
import os
import time
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .extraction import build_extraction


def lineage_metrics(extracted: DataFrame) -> DataFrame:
    """Reduce kernel-stamped rows to one lineage row per executor partition."""
    return extracted.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("turns"),
        F.sum("n_regions").alias("regions"),
        F.sum("n_artifacts").alias("artifacts"),
        F.sum("n_pages").alias("pages"),
        F.count(F.when(F.col("error").isNotNull(), 1)).alias("errors"),
        F.min("conv_id").alias("min_conv_id"),
        F.max("conv_id").alias("max_conv_id"),
    )


def bucket_expr(n_buckets: int):
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


def _lineage_dir(output_root: str) -> str:
    return os.path.join(output_root, "_lineage")


def completed_buckets(output_root: str) -> set[int]:
    d = _lineage_dir(output_root)
    if not os.path.isdir(d):
        return set()
    out: set[int] = set()
    for name in os.listdir(d):
        if name.startswith("bucket_") and name.endswith(".json"):
            out.add(int(name[len("bucket_"):-len(".json")]))
    return out


def _commit_lineage(output_root: str, bucket: int, record: dict) -> None:
    d = _lineage_dir(output_root)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".bucket_{bucket}.json.tmp")
    final = os.path.join(d, f"bucket_{bucket}.json")
    with open(tmp, "w") as f:
        json.dump(record, f)
    os.replace(tmp, final)  # atomic commit


def run_resumable(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    n_buckets: int = 64,
    bucket_batch: int = 8,
    thresholds: dict[int, float] | None = None,
    fail_after_batches: int | None = None,
) -> dict:
    """Checkpoint-resumable extraction run. Returns a summary dict.

    fail_after_batches: test hook -- raise after N batches to simulate a
    crash; a subsequent call resumes from the lineage records.
    """
    df = spark.read.parquet(input_path)
    done = completed_buckets(output_root)
    pending = [b for b in range(n_buckets) if b not in done]
    data_root = os.path.join(output_root, "data")

    batches = [pending[i:i + bucket_batch] for i in range(0, len(pending), bucket_batch)]
    n_done = 0
    summary = {"resumed_buckets": len(done), "ran_buckets": 0, "turns": 0, "errors": 0}

    for batch in batches:
        if fail_after_batches is not None and n_done >= fail_after_batches:
            raise RuntimeError(f"injected failure after {n_done} batches")
        obs = Observation(f"batch-{batch[0]}")
        part = df.withColumn("bucket", bucket_expr(n_buckets)).filter(
            F.col("bucket").isin([int(b) for b in batch])
        )
        out = build_extraction(
            part.drop("bucket"), thresholds=thresholds, order_output=False,
            observation=obs,
        ).withColumn("bucket", bucket_expr(n_buckets))
        # per-conv stable ordering inside each bucket file set
        out = out.repartition(len(batch), "bucket").sortWithinPartitions(
            "bucket", "conv_id", "turn_idx"
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(data_root)
        )
        got = obs.get
        stamp = time.time()
        for b in batch:
            _commit_lineage(
                output_root, b,
                {"bucket": b, "batch": batch, "counters": got, "committed_at": stamp},
            )
        summary["ran_buckets"] += len(batch)
        summary["turns"] += got.get("turns", 0)
        summary["errors"] += got.get("errors", 0)
        n_done += 1

    return summary
