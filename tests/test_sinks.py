"""K1 sink parity: parquet always; Iceberg code path gated on the runtime.

The sandbox ships no iceberg-spark-runtime jar, so the round-trip test is
skipif-guarded and runs wherever the runtime + a hadoop catalog are present
(CI with the jar on --packages); the honest-gate test (clear error without
the runtime) always runs.
"""

import pytest

from action_pdf_accessibility_paddle_docker_spark.plans.sinks import (
    iceberg_available,
    is_table_identifier,
    write_extracted,
)


def test_is_table_identifier():
    assert is_table_identifier("local.db.extracted")
    assert is_table_identifier("db.extracted")
    assert not is_table_identifier("/data/out")
    assert not is_table_identifier("s3a://bucket/path.parquet")


def test_parquet_sink_roundtrip(spark, tmp_path):
    df = spark.range(10).withColumnRenamed("id", "x")
    out = str(tmp_path / "t")
    write_extracted(df, out, format="parquet")
    assert spark.read.parquet(out).count() == 10


def test_iceberg_sink_without_runtime_raises_cleanly(spark, tmp_path):
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present; covered by the roundtrip test")
    df = spark.range(3)
    with pytest.raises(RuntimeError, match="Iceberg Spark runtime"):
        write_extracted(df, "local.db.t", format="iceberg")


def _iceberg_spark():
    """A session with a local hadoop catalog -- only constructible when the
    runtime jar is on the classpath."""
    import tempfile

    from pyspark.sql import SparkSession

    wh = tempfile.mkdtemp(prefix="iceberg-wh-")
    return (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-sink-test")
        .config("spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", wh)
        .getOrCreate()
    )


def test_iceberg_roundtrip_and_bucket_overwrite(spark):
    """Full K1 parity (runs only with the Iceberg runtime): createOrReplace,
    append, and the resumable runner's atomic overwritePartitions."""
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime not on the classpath in this sandbox")

    from pyspark.sql import functions as F

    from action_pdf_accessibility_paddle_docker_spark.plans.sinks import (
        overwrite_buckets_iceberg,
    )

    s = _iceberg_spark()
    df = s.range(20).withColumn("bucket", (F.col("id") % 4).cast("int"))
    tbl = "local.db.sink_test"
    write_extracted(df, tbl, format="iceberg")
    assert s.read.table(tbl).count() == 20

    write_extracted(df.where("id < 5"), tbl, format="iceberg", mode="append")
    assert s.read.table(tbl).count() == 25

    # atomic per-bucket replace: bucket 0 rows swapped, others untouched
    repl = s.range(100, 103).withColumn("bucket", F.lit(0).cast("int"))
    overwrite_buckets_iceberg(repl, tbl, [0])
    got = s.read.table(tbl)
    assert got.where("bucket = 0").count() == 3
    assert got.where("bucket != 0").count() > 0


def test_compact_parquet(spark, tmp_path):
    """Compaction merges many small files into few, preserves every row
    exactly, and leaves the directory readable (atomic swap)."""
    from action_pdf_accessibility_paddle_docker_spark.plans.sinks import compact_parquet

    out = str(tmp_path / "many")
    df = spark.range(0, 10000).withColumnRenamed("id", "v")
    df.repartition(40).write.parquet(out)
    before = sorted(r.v for r in spark.read.parquet(out).collect())

    res = compact_parquet(spark, out, target_file_mb=256)
    assert res["files_before"] >= 40
    assert res["files_after"] < res["files_before"]
    after = sorted(r.v for r in spark.read.parquet(out).collect())
    assert after == before
    # idempotent: second run is a no-op once already compact
    res2 = compact_parquet(spark, out, target_file_mb=256,
                           min_files=res["files_after"] + 1)
    assert res2["files_after"] == res2["files_before"]


def test_compact_parquet_recovers_from_crash_window(spark, tmp_path):
    """Crash BETWEEN the move-aside and promote renames leaves no dir at
    path; the next invocation's recovery preamble must restore it before
    doing anything else (previously the dataset stayed vanished)."""
    import os

    from action_pdf_accessibility_paddle_docker_spark.plans.sinks import compact_parquet

    out = str(tmp_path / "crashy")
    spark.range(0, 1000).withColumnRenamed("id", "v").repartition(8).write.parquet(out)
    before = sorted(r.v for r in spark.read.parquet(out).collect())
    # simulate the window: data moved aside, promote never happened
    os.rename(out, out + ".__compact_old")
    assert not os.path.exists(out)
    res = compact_parquet(spark, out, target_file_mb=256)
    assert sorted(r.v for r in spark.read.parquet(out).collect()) == before
    assert res["files_after"] <= res["files_before"]
    assert not os.path.exists(out + ".__compact_old")
    # leftover old BESIDE a live dir (crash after promote) is GC'd
    os.makedirs(out + ".__compact_old")
    compact_parquet(spark, out, target_file_mb=256)
    assert not os.path.exists(out + ".__compact_old")


def test_compact_parquet_partitioned_layout(spark, tmp_path):
    """Hive-partitioned roots (the resumable runner's data layout) compact
    PER PARTITION DIR instead of silently no-opping (files_before: 0)."""
    from pyspark.sql import functions as F

    from action_pdf_accessibility_paddle_docker_spark.plans.sinks import compact_parquet

    out = str(tmp_path / "parts")
    (spark.range(0, 4000)
     .select(F.col("id").alias("v"), (F.col("id") % 2).alias("bucket"))
     .repartition(20, "v")
     .write.partitionBy("bucket").parquet(out))
    before = sorted((r.bucket, r.v) for r in spark.read.parquet(out).collect())
    res = compact_parquet(spark, out, target_file_mb=256)
    assert res["files_before"] >= 20           # counted inside the subdirs
    assert res["files_after"] < res["files_before"]
    after = sorted((r.bucket, r.v) for r in spark.read.parquet(out).collect())
    assert after == before                     # bucket-from-dir-name intact


def test_compact_parquet_partitioned_crash_recovery(spark, tmp_path):
    """A crash between a PER-PARTITION move-aside and promote leaves
    'bucket=N.__compact_old' (no live 'bucket=N') plus possibly a stale
    sibling tmp dir inside the root. The rerun must rename the old dir
    back and delete the strays -- never treat them as partitions of their
    own (that compacted them in place, stranding rows under a bogus
    partition value; round-7 advice item)."""
    import os

    from pyspark.sql import functions as F

    from action_pdf_accessibility_paddle_docker_spark.plans.sinks import compact_parquet

    out = str(tmp_path / "parts")
    (spark.range(0, 4000)
     .select(F.col("id").alias("v"), (F.col("id") % 2).alias("bucket"))
     .repartition(10, "v")
     .write.partitionBy("bucket").parquet(out))
    before = sorted((r.bucket, r.v) for r in spark.read.parquet(out).collect())
    # simulate: partition bucket=1 crashed mid-swap (moved aside, never
    # promoted); a stale tmp sits beside the live bucket=0
    os.rename(os.path.join(out, "bucket=1"),
              os.path.join(out, "bucket=1.__compact_old"))
    os.makedirs(os.path.join(out, "bucket=0.__compact_tmp"))
    res = compact_parquet(spark, out, target_file_mb=256)
    after = sorted((r.bucket, r.v) for r in spark.read.parquet(out).collect())
    assert after == before                     # bucket=1 rows recovered
    assert res["files_after"] < res["files_before"]
    leftovers = [n for n in os.listdir(out) if ".__compact_" in n]
    assert leftovers == []
    # old-dir BESIDE a live partition (crash after promote) is GC'd, and
    # the live rows win
    os.makedirs(os.path.join(out, "bucket=0.__compact_old"))
    compact_parquet(spark, out, target_file_mb=256, min_files=99)
    assert not os.path.exists(os.path.join(out, "bucket=0.__compact_old"))
    assert sorted((r.bucket, r.v)
                  for r in spark.read.parquet(out).collect()) == before
