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
  output. ALL pending buckets are written in ONE ``partitionBy("bucket")``
  pass by default (one scan of the input per resume cycle -- the per-batch
  re-filter of an earlier design scanned the full input once per batch).
  ``bucket_batch`` remains as an opt-in recomputation bound: each batch costs
  one additional input scan, the documented tradeoff.
* Per-bucket counters are DERIVED per bucket: after the data write commits,
  the just-written (partition-pruned, column-pruned) output is aggregated
  ``groupBy(bucket)`` and each bucket's lineage JSON carries its own
  counters, not batch-level copies.
* A bucket's lineage record is committed (atomic create+rename through the
  Hadoop FileSystem API, so HDFS/S3/cloud output roots work, not just the
  driver's local disk) only AFTER its data write commits. A restart lists the
  lineage dir and skips completed buckets: exactly-once per bucket despite
  crashes between batches.

At 100 TB / 1000 executors the bucket count is the resume granularity knob;
recomputation after a crash is bounded by one batch (default: the whole
pending set -- size batches only if crash-recomputation cost matters more
than scan count).

Documented residual (single-writer assumption): nothing FENCES two drivers
resuming the same output root concurrently -- a stalled-but-alive driver A
and a replacement driver B can interleave dynamic-overwrite commits on the
same bucket dirs, leaving data that does not match the committed lineage.
A robust fence needs storage-level conditional writes (HDFS lease /
S3 conditional PUT); a plain lock file cannot distinguish a crashed holder
from a stalled one without a heartbeat protocol. Run one resuming driver
per output root (the same rule every dynamic-overwrite pipeline has).
"""

from __future__ import annotations

import json
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


# ---------------------------------------------------------------------------
# Lineage records via the Hadoop FileSystem API (works for file://, hdfs://,
# s3a://, ... -- driver-local os.* would silently see an empty dir on a
# cluster with a remote output root).
# ---------------------------------------------------------------------------


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _lineage_dir(output_root: str) -> str:
    return output_root.rstrip("/") + "/_lineage"


#: a real lineage record is always bucket_<int>.json by construction
_BUCKET_FILE_RE = __import__("re").compile(r"^bucket_(\d+)\.json$")


def _active_spark() -> SparkSession:
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("no active SparkSession for lineage filesystem access")
    return spark


def completed_buckets(output_root: str, spark: SparkSession | None = None) -> set[int]:
    spark = spark or _active_spark()
    fs, d, _jvm = _fs_and_path(spark, _lineage_dir(output_root))
    if not fs.exists(d):
        return set()
    out: set[int] = set()
    for status in fs.listStatus(d):
        # strict match: debris like 'bucket_3 (1).json' (editor save-as,
        # object-store copy tools) must be IGNORED, not crash int() and
        # brick every subsequent resume
        m = _BUCKET_FILE_RE.match(status.getPath().getName())
        if m:
            out.add(int(m.group(1)))
    return out


def read_lineage(output_root: str, spark: SparkSession | None = None) -> dict[int, dict]:
    """All committed per-bucket lineage records."""
    spark = spark or _active_spark()
    fs, d, jvm = _fs_and_path(spark, _lineage_dir(output_root))
    out: dict[int, dict] = {}
    if not fs.exists(d):
        return out
    for status in fs.listStatus(d):
        name = status.getPath().getName()
        if _BUCKET_FILE_RE.match(name):
            stream = fs.open(status.getPath())
            try:
                data = bytes(
                    jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
                ).decode("utf-8")
            finally:
                stream.close()
            rec = json.loads(data)
            out[int(rec["bucket"])] = rec
    return out


def _commit_lineage(
    output_root: str, bucket: int, record: dict, spark: SparkSession | None = None
) -> None:
    spark = spark or _active_spark()
    d = _lineage_dir(output_root)
    fs, dpath, jvm = _fs_and_path(spark, d)
    fs.mkdirs(dpath)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{d}/.bucket_{bucket}.json.tmp")
    final = jvm.org.apache.hadoop.fs.Path(f"{d}/bucket_{bucket}.json")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(json.dumps(record).encode("utf-8")))
    finally:
        stream.close()
    if fs.exists(final):
        fs.delete(final, False)
    # Hadoop FileSystem.rename reports failure by RETURNING false, not by
    # raising; ignoring it would leave the bucket uncommitted while the run
    # proceeds -- unbounded re-extraction on every future resume
    if not fs.rename(tmp, final):
        raise IOError(f"lineage commit rename failed: {tmp} -> {final}")


def ensure_run_config(
    output_root: str, config: dict, spark: SparkSession | None = None
) -> None:
    """Pin the parameters that define what a bucket index MEANS across
    resume cycles. Lineage records carry only bucket indices, so resuming
    with a different ``--buckets``, stage set, or bucket-key kind would
    silently skip the WRONG buckets and leave stale partitions from the
    old keying in <output>/data (dynamic overwrite never clears dirs it
    does not write) -- duplicated or missing rows with no error.

    First run commits ``config`` atomically to
    ``<output>/_lineage/run_config.json``; every later run must present an
    EQUAL dict or this raises with both versions. Call before reading
    ``completed_buckets``.

    The comparison is JSON-CANONICAL: the stored config went through a JSON
    round trip (int dict keys become strings, tuples become lists), so the
    current invocation's dict is normalized the same way first -- otherwise
    an IDENTICAL rerun whose thresholds use int keys would spuriously
    mismatch (caught live driving extract_job --resumable)."""
    config = json.loads(json.dumps(config, sort_keys=True))
    spark = spark or _active_spark()
    d = _lineage_dir(output_root)
    fs, dpath, jvm = _fs_and_path(spark, d)
    final = jvm.org.apache.hadoop.fs.Path(f"{d}/run_config.json")
    if fs.exists(final):
        stream = fs.open(final)
        try:
            stored = json.loads(
                bytes(
                    jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
                ).decode("utf-8")
            )
        finally:
            stream.close()
        if stored != config:
            raise ValueError(
                "resume configuration mismatch: this output was started "
                f"with {stored!r} but the current invocation is "
                f"{config!r}; resume with the original parameters or use "
                "a fresh output path"
            )
        return
    # No pinned config but bucket records exist: a pre-pinning (or
    # sabotaged) output. Adopting the CURRENT invocation's config would
    # bless exactly the mis-keyed resume this guard exists to block (a
    # --buckets 8 resume of a --buckets 4 output would commit 8 as truth,
    # skip buckets 0-3 under the NEW keying, and leave the old pmod-4
    # partitions in place -- silent duplicates). Refuse; migration is the
    # user writing the ORIGINAL parameters to run_config.json by hand.
    pre_existing = completed_buckets(output_root, spark)
    if pre_existing:
        raise ValueError(
            f"output {output_root!r} carries {len(pre_existing)} committed "
            "bucket records but no run_config.json (written before "
            "run-config pinning, or the pin was deleted); resuming cannot "
            "verify the bucket keying. Either restart with a fresh output "
            "path, or -- if the original parameters are known -- write "
            f"them to {d}/run_config.json "
            f"(this invocation would have pinned {config!r})"
        )
    fs.mkdirs(dpath)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{d}/.run_config.json.tmp")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(json.dumps(config, sort_keys=True).encode("utf-8")))
    finally:
        stream.close()
    if not fs.rename(tmp, final):
        raise IOError(f"run-config commit rename failed: {tmp} -> {final}")


_COUNTER_COLS = ("turns", "regions", "artifacts", "pages", "errors")


def _delete_bucket_dirs(
    spark: SparkSession, data_root: str, buckets: list[int]
) -> None:
    """Remove the Hive partition dirs of PENDING buckets before their batch
    rewrite (see the call site). No-op for dirs that do not exist."""
    fs, root, jvm = _fs_and_path(spark, data_root)
    for b in buckets:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                data_root.rstrip("/") + f"/bucket={int(b)}"
            ),
            True,
        )


def _per_bucket_counters(
    spark: SparkSession, data_root: str, buckets: list[int], is_table: bool = False
) -> dict[int, dict]:
    """Aggregate the just-written output per bucket (partition-pruned read of
    tiny columns -- NOT a kernel re-execution). When every row of the batch
    was dropped upstream the data root may not exist at all (dynamic
    overwrite writes no dirs): that ONE case returns {} so the zero-row
    lineage records still commit and resume skips -- any OTHER read failure
    (transient storage error) propagates, because committing rows=0 over
    intact data would corrupt the lineage metadata permanently."""
    from pyspark.errors import AnalysisException

    try:
        src = (spark.read.table(data_root) if is_table
               else spark.read.parquet(data_root))
    except AnalysisException:
        return {}
    df = (
        src
        .where(F.col("bucket").isin([int(b) for b in buckets]))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum("n_regions").alias("regions"),
            F.sum("n_artifacts").alias("artifacts"),
            F.sum("n_pages").alias("pages"),
            F.count(F.when(F.col("error").isNotNull(), 1)).alias("errors"),
            F.min("conv_id").alias("min_conv_id"),
            F.max("conv_id").alias("max_conv_id"),
        )
    )
    out: dict[int, dict] = {}
    for r in df.collect():
        d = r.asDict()
        b = int(d.pop("bucket"))
        out[b] = {k: (int(v) if isinstance(v, int) else v) for k, v in d.items()}
    return out


def run_resumable(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    n_buckets: int = 64,
    bucket_batch: int | None = None,
    thresholds: dict[int, float] | None = None,
    fail_after_batches: int | None = None,
    iceberg_table: str | None = None,
    detector_kind: str = "stub",
    detector_kw: dict | None = None,
) -> dict:
    """Checkpoint-resumable extraction run. Returns a summary dict.

    bucket_batch=None (default) writes every pending bucket in one
    partitionBy("bucket") pass: exactly ONE scan of the input per resume
    cycle (summary["input_scans"] reports it). Setting bucket_batch bounds
    crash recomputation to a batch at the cost of one input scan per batch.

    iceberg_table: when set (and the Iceberg runtime is on the classpath),
    bucket data commits through ``overwritePartitions()`` -- one ATOMIC
    snapshot per batch with snapshot isolation (K1 parity, SURVEY section
    4.2) -- instead of parquet dynamic partition overwrite. Lineage JSON
    stays under output_root either way.

    fail_after_batches: test hook -- raise after N batches to simulate a
    crash; a subsequent call resumes from the lineage records.
    """
    df = spark.read.parquet(input_path)
    # a bucket index only means something under the parameters that
    # produced it -- refuse to resume under different ones (stale
    # partitions + wrongly-skipped buckets otherwise, silently)
    ensure_run_config(
        output_root,
        {
            "kind": "extraction",
            "n_buckets": int(n_buckets),
            "bucket_key": "conv_id",
            "iceberg_table": iceberg_table,
            # row-set-shaping parameters: committed buckets keep the values
            # they ran under, so a resume under different ones would yield
            # an inconsistent corpus with no error (review finding). The
            # input path is pinned for the same reason -- buckets 0..k of
            # input A plus k+1.. of input B is a silent cross-corpus mix
            # AND a data loss (input-B rows hashing into 0..k never write).
            "input": input_path,
            "thresholds": thresholds,
            "detector": "%s:%s" % (
                detector_kind,
                sorted((detector_kw or {}).items()),
            ),
        },
        spark,
    )
    done = completed_buckets(output_root, spark)
    pending = [b for b in range(n_buckets) if b not in done]
    data_root = output_root.rstrip("/") + "/data"

    step = bucket_batch or max(1, len(pending))
    batches = [pending[i:i + step] for i in range(0, len(pending), step)]
    n_done = 0
    summary = {
        "resumed_buckets": len(done), "ran_buckets": 0, "turns": 0,
        "errors": 0, "input_scans": 0,
    }

    for batch in batches:
        if fail_after_batches is not None and n_done >= fail_after_batches:
            raise RuntimeError(f"injected failure after {n_done} batches")
        obs = Observation(f"batch-{batch[0]}-{time.monotonic_ns()}")
        part = df.withColumn("bucket", bucket_expr(n_buckets))
        if len(batch) < n_buckets:
            part = part.filter(F.col("bucket").isin([int(b) for b in batch]))
        out = build_extraction(
            part.drop("bucket"), thresholds=thresholds, order_output=False,
            observation=obs, detector_kind=detector_kind, detector_kw=detector_kw,
        ).withColumn("bucket", bucket_expr(n_buckets))
        # Per-conv stable ordering inside each bucket file set. Hash
        # partition on (bucket, conv_id) -- NOT on bucket alone (one
        # partition per bucket would serialize a 1.5 TB bucket's sort at
        # 100 TB / 64 buckets) and NOT repartitionByRange (its boundary
        # sampling would re-execute the kernel). Every conversation still
        # lands whole in exactly one task, sorted by turn; the Hive-style
        # partitionBy("bucket") below splits files per bucket regardless of
        # task layout.
        n_write = max(len(batch), spark.sparkContext.defaultParallelism)
        out = out.repartition(n_write, "bucket", "conv_id").sortWithinPartitions(
            "bucket", "conv_id", "turn_idx"
        )
        if iceberg_table is not None:
            from .sinks import overwrite_buckets_iceberg

            overwrite_buckets_iceberg(out, iceberg_table, batch)
        else:
            # clear the batch's (pending, uncommitted) partition dirs first:
            # dynamic overwrite only replaces partitions it writes rows to,
            # so a crashed attempt's rows would survive a re-run that now
            # yields ZERO rows for that bucket (committed lineage over stale
            # data). Deleting pending dirs is safe -- their lineage never
            # committed, so resume recomputes them regardless.
            _delete_bucket_dirs(spark, data_root, batch)
            (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(data_root)
            )
        summary["input_scans"] += 1
        got = obs.get
        stamp = time.time()
        counters = _per_bucket_counters(
            spark, data_root if iceberg_table is None else iceberg_table, batch,
            is_table=iceberg_table is not None,
        )
        for b in batch:
            _commit_lineage(
                output_root, b,
                {
                    "bucket": b,
                    "counters": counters.get(
                        b, {k: 0 for k in _COUNTER_COLS} | {"min_conv_id": None, "max_conv_id": None}
                    ),
                    "batch_counters": got,
                    "committed_at": stamp,
                },
                spark,
            )
        summary["ran_buckets"] += len(batch)
        summary["turns"] += got.get("turns", 0)
        summary["errors"] += got.get("errors", 0)
        n_done += 1

    return summary
