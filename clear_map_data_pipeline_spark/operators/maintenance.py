"""Dataset-maintenance operators for lakehouse hygiene at scale.

The small-files problem is the silent killer of 100 TB pipelines:
streaming sinks and over-parallel writers leave thousands of KB-sized
parquet files per partition, and every downstream scan pays task
scheduling + footer-read overhead per file.  ``compact_parquet_dataset``
rewrites a dataset to ~``target_file_bytes`` files; ``dataset_stats``
measures it (Hadoop FileSystem API — works for file://, hdfs://, s3a://
alike).

Compaction writes to a NEW path (write-audit-publish): the caller swaps
paths/views after validating, so readers never observe a half-written
dataset and a failed compaction loses nothing.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class DatasetStats:
    n_files: int
    total_bytes: int

    @property
    def avg_file_bytes(self) -> int:
        return self.total_bytes // self.n_files if self.n_files else 0


def dataset_stats(spark: SparkSession, path: str) -> DatasetStats:
    """File count + byte size of a dataset directory (recursive; data
    files only — _SUCCESS/_committed markers and hidden files skipped)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    n, total = 0, 0
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n += 1
        total += status.getLen()
    return DatasetStats(n, total)


def compact_parquet_dataset(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    order_by: list[str] | None = None,
) -> dict:
    """Rewrite ``in_path`` to ``out_path`` with ~``target_file_bytes``
    output files.

    - file count = ceil(input_bytes / target) — parquet re-encodes, so
      output sizes track input compression closely enough for a
      maintenance job;
    - ``order_by`` additionally range-partitions + sorts (clustering:
      better min/max pruning for readers filtering on those columns, at
      the cost of a range-exchange instead of round-robin);
    - rows are preserved exactly (asserted in tests); the write is to a
      fresh path — publish by swapping, never in place.
    """
    stats_in = dataset_stats(spark, in_path)
    n_out = max(1, math.ceil(stats_in.total_bytes / target_file_bytes))
    df = spark.read.parquet(in_path)
    if order_by:
        df = df.repartitionByRange(n_out, *order_by).sortWithinPartitions(
            *order_by
        )
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(out_path)
    stats_out = dataset_stats(spark, out_path)
    return {
        "files_before": stats_in.n_files,
        "files_after": stats_out.n_files,
        "bytes_before": stats_in.total_bytes,
        "bytes_after": stats_out.total_bytes,
        "target_files": n_out,
    }
