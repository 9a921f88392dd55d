"""Storage layout operators — the 100 TB persistence story.

The reference delegates storage to Snowflake; a Spark-native engine
owns its layout. Two primitives matter at scale:

* **Partitioned writes** (`write_partitioned`): coarse pruning keys
  (date, tag_type, source) become directories, so predicate pushdown
  prunes whole files before any IO (partition pruning).
* **Bucketed tables** (`write_bucketed`): pre-shuffling by join key at
  write time. Two tables bucketed by the same key join with NO
  exchange — at 100 TB, removing the fact-fact shuffle is the single
  biggest win available (tests/test_storage.py asserts the plan has no
  Exchange on the bucketed join).

Bucket/partition sizing rule of thumb encoded in `suggest_buckets`:
target ~128-512 MB per bucket file, power-of-two bucket counts so
AQE coalescing stays aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite") -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (saveAsTable is required —
    plain parquet paths carry no bucket metadata)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def suggest_buckets(total_bytes: int, target_bucket_bytes: int = 256 * 1024 * 1024) -> int:
    """Power-of-two bucket count targeting ~256 MB per bucket."""
    n = max(1, total_bytes // target_bucket_bytes)
    p = 1
    while p < n:
        p *= 2
    return p


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Dynamic partition overwrite: only the partitions present in
    ``df`` are rewritten; untouched partitions survive. This is the
    partition-level MERGE/replace primitive (SURVEY §4 O11's
    validate-then-commit lands on it: recompute a day/type partition,
    swap it atomically-per-partition) without requiring a table
    format."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_path(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Small-file compaction — the maintenance pass every long-running
    ingest needs (streaming micro-batches and dynamic-partition
    appends strand thousands of tiny parquet files; at 100 TB the
    scan's task-per-file overhead and NameNode/listing pressure
    dominate before a single row is read). Rewrites ``path`` to
    ceil(total_bytes / target) files via ``coalesce`` — a NARROW
    repartitioning, no shuffle — then swaps directories. Returns the
    resulting file count; a no-op (returning the current count) when
    the layout is already at or under target. The directory swap is
    atomic only on a real filesystem; on an object store this commit
    step is what a table format (Delta/Iceberg rewrite-files action)
    provides — the dataflow half is identical."""
    import glob
    import math
    import os
    import shutil

    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    if not files:
        return 0
    total = sum(os.path.getsize(f) for f in files)
    n_target = max(1, math.ceil(total / target_file_bytes))
    if n_target >= len(files):
        return len(files)
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compacting__"
    df.coalesce(n_target).write.mode("overwrite").parquet(tmp)
    backup = path.rstrip("/") + ".__pre_compact__"
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    return n_target
