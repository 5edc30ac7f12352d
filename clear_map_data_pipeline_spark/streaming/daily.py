"""Structured Streaming extension of the daily batch job.

The reference re-runs its whole pipeline from scratch every day
(``il_analysis_git.py:219-222``); the streaming-native version ingests
only new files and maintains the daily aggregate incrementally:

    readStream(parquet dir) -> event-time watermark -> daily windowed
    aggregation -> sink (memory for tests; foreachBatch-MERGE at scale)

``Trigger.AvailableNow`` drains the backlog exactly once and stops —
the cron-job replacement that keeps checkpointed state between runs.
Late data beyond the watermark is dropped deterministically instead of
the reference's "recompute everything" answer.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import normalize_parquet_confs, normalize_ts


def daily_totals_stream(
    spark: SparkSession,
    events_dir: str,
    query_name: str = "daily_totals",
    watermark: str = "1 day",
) -> DataFrame:
    """Run the incremental daily-totals aggregation over the events
    parquet directory with AvailableNow, blocking until the backlog is
    drained; returns the materialized result.

    Output: one row per (date, event_type) with row counts and value
    sums — the streaming twin of the batch A14 daily totals.
    """
    normalize_parquet_confs(spark)
    # the file streaming source requires a DIRECTORY; stage a single
    # parquet file behind a symlink dir (zero-copy)
    if os.path.isfile(events_dir):
        staged = tempfile.mkdtemp(prefix="clearmap_stream_src_")
        os.symlink(
            os.path.abspath(events_dir),
            os.path.join(staged, os.path.basename(events_dir)),
        )
        events_dir = staged
    batch_schema = spark.read.parquet(events_dir).schema
    stream = (
        normalize_ts(spark.readStream.schema(batch_schema).parquet(events_dir))
        .withWatermark("ts", watermark)
    )
    agg = (
        stream.groupBy(
            F.window("ts", "1 day").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.to_date(F.col("w.start")).alias("date"),
            "event_type",
            "n_events",
            F.round("sum_value", 2).alias("sum_value"),
        )
    )
    checkpoint = tempfile.mkdtemp(prefix="clearmap_stream_ckpt_")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", os.path.join(checkpoint, "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
