"""Streaming ingest dedup — exactly-once semantics over an at-least-once
source, the front door of every training-data pipeline.

File sources re-deliver (retried uploads, replayed batches, overlapping
backfills); ``dropDuplicatesWithinWatermark`` keeps one row per key
while bounding the dedup state by event time: a key's fingerprint is
held only until the watermark passes it, so state size tracks the late
window, not the stream's history.  (Plain ``dropDuplicates`` on a
stream grows state forever — the thing this operator exists to avoid.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import normalize_parquet_confs, normalize_ts


def stage_backlog(events_file: str, copies: int = 1) -> str:
    """Stage a parquet file as a streaming source directory, optionally
    duplicated ``copies`` times (simulating at-least-once re-delivery)."""
    from .drain import _tracked_mkdtemp

    staged = _tracked_mkdtemp("clearmap_dedup_src_")
    for i in range(copies):
        os.symlink(
            os.path.abspath(events_file),
            os.path.join(staged, f"copy{i}_{os.path.basename(events_file)}"),
        )
    return staged


def deduped_ingest_stream(
    spark: SparkSession,
    events_dir: str,
    key: str = "event_id",
    watermark: str = "1 day",
    query_name: str = "deduped_ingest",
    max_files_per_trigger: int | None = None,
    store_provider: str | None = None,
) -> DataFrame:
    """Drain the (possibly duplicated) backlog with exactly-once
    semantics on ``key``; returns the deduplicated per-type totals."""
    normalize_parquet_confs(spark)
    if os.path.isfile(events_dir):
        events_dir = stage_backlog(events_dir, copies=1)
    batch_schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(batch_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        normalize_ts(reader.parquet(events_dir))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark([key])
    )
    totals = stream.groupBy(
        F.window("ts", "1 day").alias("w"), F.col("event_type")
    ).agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    out = totals.select(
        F.to_date(F.col("w.start")).alias("date"),
        "event_type",
        "n_events",
        "sum_value",
    )
    from .drain import backlog_state_width, drain_to_memory

    return drain_to_memory(
        out,
        spark,
        query_name,
        ckpt_prefix="clearmap_dedup_ckpt_",
        store_provider=store_provider,
        pin_state_partitions=backlog_state_width(spark, events_dir),
    )
