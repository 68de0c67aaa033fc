"""Table sinks (K1): parquet (always available) and Iceberg.

SURVEY.md maps K1 (the reference's ``doc.Save``, src/autotag.py:165-166) to
``df.writeTo(tbl).append()`` on an Iceberg table. At 100 TB the Iceberg path
is what makes the resumable runner's bucket overwrites ATOMIC table commits
(snapshot isolation) instead of directory-level dynamic partition overwrite:
a crash mid-commit leaves the previous snapshot readable, and concurrent
readers never observe a half-written bucket.

The sandbox ships no iceberg-spark-runtime jar (and has no network to fetch
one), so ``iceberg_available`` gates everything: the code path is real and
exercised by a skipif test that runs wherever the runtime + a configured
catalog exist (e.g. a local hadoop catalog:
``spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog``,
``spark.sql.catalog.local.type=hadoop``,
``spark.sql.catalog.local.warehouse=/path``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


_DATA_FILE_SUFFIXES = (".parquet", ".json", ".csv", ".orc", ".avro", ".txt")


def is_table_identifier(target: str) -> bool:
    """db.table / catalog.db.table (dotted, no slashes, not a data-file
    name) -> table identifier; otherwise a path. The file-suffix exclusion
    keeps a bare relative filename like 'out.snappy.parquet' a path."""
    return (
        "/" not in target
        and target.count(".") >= 1
        and not target.lower().endswith(_DATA_FILE_SUFFIXES)
    )


def write_extracted(
    df: DataFrame,
    target: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """One-shot sink. format='iceberg' requires a dotted table identifier
    resolvable in a configured catalog; parquet takes a path."""
    if format == "iceberg":
        if not is_table_identifier(target):
            raise ValueError(
                f"iceberg sink needs a dotted catalog table identifier "
                f"(e.g. local.db.extracted), got a path-like target {target!r}"
            )
        if not iceberg_available(df.sparkSession):
            raise RuntimeError(
                "iceberg sink requested but the Iceberg Spark runtime is not "
                "on the classpath (add iceberg-spark-runtime and a catalog "
                "config, or use format='parquet')"
            )
        writer = df.writeTo(target).using("iceberg")
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        elif mode == "append":
            # append requires the table to exist; create on first write
            if not df.sparkSession.catalog.tableExists(target):
                writer.create()
            else:
                df.writeTo(target).append()
        else:
            raise ValueError(f"unsupported iceberg mode {mode!r}")
        return
    if format == "parquet":
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)
        return
    raise ValueError(f"unknown sink format {format!r}")


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    min_files: int = 2,
) -> dict:
    """Compact a parquet directory to ~``target_file_mb`` files (the
    small-files problem: a resumable/streaming run leaves one file per
    bucket/micro-batch task; at 100 TB that is millions of files and the
    NameNode/manifest becomes the bottleneck).

    Atomic swap via the Hadoop FileSystem API (same transport as the lineage
    records, so it works on file:// and hdfs:// alike): write to
    ``<path>.__compact_tmp``, rename the old dir aside, promote the new one.
    The move-aside/promote pair has a crash WINDOW where neither dir sits at
    ``path`` -- so every invocation begins with a recovery preamble: a
    leftover ``.__compact_old`` with no live dir is renamed back before
    anything else runs (a rerun after any crash heals the dataset), and a
    leftover beside a live dir (crash after promote) is garbage-collected.

    Hive-partitioned layouts (``bucket=N/`` subdirs, the resumable runner's
    data root) are compacted PER PARTITION DIR -- each partition gets its
    own recoverable swap, and the partition-from-dir-name read semantics of
    the root are preserved.

    Returns {files_before, files_after, bytes}. No-op (files_before <
    min_files) returns with files_after == files_before."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)

    tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".__compact_tmp")
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".__compact_old")
    # recovery preamble (see docstring)
    if fs.exists(old):
        if not fs.exists(hpath):
            if not fs.rename(old, hpath):
                raise IOError(
                    f"compact: recovery rename failed; data is at {old}"
                )
        else:
            fs.delete(old, True)

    def _data_files(p):
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isFile() and not name.startswith(("_", ".")):
                out.append(st)
        return out

    # Hive-partitioned layout: recurse per partition dir. Swap-machinery
    # leftovers ('<p>.__compact_old' / '<p>.__compact_tmp' from a crashed
    # PER-PARTITION swap) must never be treated as partitions themselves --
    # their names contain '=', so the bare substring test used to match
    # them, compacting a stray dir in place and stranding its rows under a
    # bogus partition value (round-7 advice item). Recover them FIRST,
    # exactly as the root preamble does: an old-dir with no live sibling is
    # the data (rename it back); an old-dir beside a live sibling is a
    # crash-after-promote leftover (delete); a tmp dir is always
    # re-creatable garbage (delete).
    entries = list(fs.listStatus(hpath))
    for st in entries:
        name = st.getPath().getName()
        if not st.isDirectory() or ".__compact_" not in name:
            continue
        live_name = name.split(".__compact_")[0]
        live = jvm.org.apache.hadoop.fs.Path(hpath, live_name)
        if name.endswith(".__compact_old") and not fs.exists(live):
            if not fs.rename(st.getPath(), live):
                raise IOError(
                    f"compact: partition recovery rename failed; data is "
                    f"at {st.getPath()}"
                )
        else:
            fs.delete(st.getPath(), True)
    part_dirs = [
        st.getPath() for st in fs.listStatus(hpath)
        if st.isDirectory() and "=" in st.getPath().getName()
        and ".__compact_" not in st.getPath().getName()
    ]
    if part_dirs:
        agg = {"files_before": 0, "files_after": 0, "bytes": 0}
        for pd in part_dirs:
            # str(Path) keeps the scheme/authority (hdfs://...), which
            # toUri().getPath() would strip
            r = compact_parquet(spark, str(pd), target_file_mb, min_files)
            for k in agg:
                agg[k] += r[k]
        return agg

    before = _data_files(hpath)
    total_bytes = sum(st.getLen() for st in before)
    if len(before) < min_files:
        return {"files_before": len(before), "files_after": len(before),
                "bytes": total_bytes}

    n_out = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    fs.delete(tmp, True)
    # coalesce, not repartition: pure file merge, no shuffle
    spark.read.parquet(path).coalesce(int(n_out)).write.mode("overwrite").parquet(
        str(tmp)
    )
    after = len(_data_files(tmp))
    if not fs.rename(hpath, old):
        raise IOError(f"compact: cannot move {path} aside")
    if not fs.rename(tmp, hpath):
        if not fs.rename(old, hpath):  # roll back -- and verify it
            raise IOError(
                f"compact: promote AND rollback failed; data is at {old}"
            )
        raise IOError(f"compact: cannot promote compacted dir for {path}")
    fs.delete(old, True)
    return {"files_before": len(before), "files_after": after, "bytes": total_bytes}


def overwrite_buckets_iceberg(df: DataFrame, target: str, buckets: list[int]) -> None:
    """Idempotent per-bucket commit for the resumable runner: replace exactly
    the rows of the given buckets in ONE atomic Iceberg snapshot
    (overwritePartitions = dynamic overwrite with snapshot isolation --
    the Iceberg analog of parquet dynamic partition overwrite, but a retry
    after a crash can never leave a torn directory)."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(target):
        from pyspark.sql import functions as F

        df.writeTo(target).using("iceberg").partitionedBy(F.col("bucket")).create()
        return
    # overwritePartitions only replaces partitions PRESENT in df: a bucket
    # of the batch whose recomputation yields zero rows would keep a crashed
    # attempt's stale rows. Clear the batch's buckets explicitly first --
    # two commits, but the crash window between them is safe (the batch's
    # lineage has not committed, so a resume recomputes it either way).
    if buckets:
        in_list = ",".join(str(int(b)) for b in buckets)
        spark.sql(f"DELETE FROM {target} WHERE bucket IN ({in_list})")
    df.writeTo(target).overwritePartitions()
