"""Shared streaming harness: source staging + the AvailableNow
memory-sink drain — extracted from the eight per-operator copies so the
drain discipline (symlink staging for single-file sources, fresh
checkpoint per call, state-store partition pinning, blocking drain)
lives in ONE place.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..session import normalize_parquet_confs


def stage_stream_source(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source streaming DataFrame over a parquet path.

    - the file streaming source requires a DIRECTORY; a single parquet
      file is staged behind a symlink dir (zero-copy);
    - the schema is probed with a batch read (streaming reads need an
      explicit schema);
    - ``max_files_per_trigger`` splits an AvailableNow drain into
      multiple microbatches — production streams arrive in many
      batches, and cross-batch state/watermark paths only exercise
      across batch boundaries."""
    normalize_parquet_confs(spark)
    if os.path.isfile(events_dir):
        staged = tempfile.mkdtemp(prefix="clearmap_stream_src_")
        os.symlink(
            os.path.abspath(events_dir),
            os.path.join(staged, os.path.basename(events_dir)),
        )
        events_dir = staged
    batch_schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(batch_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(events_dir)


def drain_to_memory(
    df: DataFrame,
    spark: SparkSession,
    query_name: str,
    output_mode: str = "append",
    ckpt_prefix: str = "clearmap_stream_ckpt_",
    pin_state_partitions: bool = False,
) -> DataFrame:
    """Drain a streaming DataFrame with AvailableNow into a memory-sink
    table and return it, blocking until the backlog is consumed.  A
    fresh checkpoint per call keeps repeated invocations independent.

    ``pin_state_partitions``: the state-store partition count is frozen
    into the checkpoint at first start; stateful operators pin it to
    the session's core count instead of the 200 default (safe because
    the checkpoint is fresh), restoring the caller's setting after."""
    checkpoint = tempfile.mkdtemp(prefix=ckpt_prefix)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    if pin_state_partitions:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            spark.sparkContext.defaultParallelism,
        )
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .option("checkpointLocation", os.path.join(checkpoint, "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if pin_state_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", before)
    return spark.table(query_name)
