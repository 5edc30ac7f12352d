"""State-width sizing for stateful drains (streaming/drain.py
backlog_state_width): the width rule itself, the conf restore
discipline of an int-width drain, and the first-deployment property
the rule exists for — the width in force at first start is what the
checkpoint freezes into the state layout."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from clear_map_data_pipeline_spark.streaming.drain import (
    _tracked_mkdtemp,
    backlog_state_width,
    drain_to_memory,
    stage_stream_source,
)


def _stage_events(spark, n_rows: int) -> str:
    d = _tracked_mkdtemp("clearmap_width_test_")
    spark.range(n_rows).select(
        F.col("id").alias("user_id"),
        (F.lit("2021-01-01 00:00:00").cast("timestamp")
         + F.make_interval(mins=F.col("id") % 600)).alias("ts"),
        F.lit("view").alias("event_type"),
        F.col("id").alias("event_id"),
    ).coalesce(1).write.mode("overwrite").parquet(d)
    return d


def _daily_totals(spark, events_dir: str):
    return (
        stage_stream_source(spark, events_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("day"), "n")
    )


def test_width_rule(spark):
    small = _stage_events(spark, 500)
    # fixture backlogs floor at 2; the rule never exceeds the session's
    # parallelism (a production-scale backlog would keep full width)
    assert backlog_state_width(spark, small) == 2
    assert 2 <= backlog_state_width(spark, small) <= (
        spark.sparkContext.defaultParallelism
    )


def test_drain_int_width_completes_and_restores_conf(spark):
    events = _stage_events(spark, 400)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    out = drain_to_memory(
        _daily_totals(spark, events), spark, "width_probe",
        output_mode="append",
        pin_state_partitions=backlog_state_width(spark, events),
    )
    assert out.count() >= 0  # drain completed under the pinned width
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_checkpoint_freezes_first_start_width(spark):
    """The deployment fact behind the sizing rule, pinned directly: the
    shuffle width in force when a stateful query FIRST starts is the
    state-partition count the checkpoint lays down (drain_to_memory
    removes its checkpoint on success, so this drives the same
    conf->checkpoint mechanism with a checkpoint the test keeps)."""
    events = _stage_events(spark, 400)
    width = backlog_state_width(spark, events)
    ckpt = _tracked_mkdtemp("clearmap_width_ckpt_")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", width)
        q = (
            _daily_totals(spark, events)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("width_freeze_probe")
            .option("checkpointLocation", os.path.join(ckpt, "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    try:
        state0 = os.path.join(ckpt, "cp", "state", "0")
        parts = [x for x in os.listdir(state0) if x.isdigit()]
        assert len(parts) == width, (
            f"checkpoint froze {len(parts)} state partitions, "
            f"expected {width}"
        )
    finally:
        # clean up even when the assertion fails (ADVICE r08) — the
        # tracked-tempdir atexit sweep is only a backstop
        shutil.rmtree(ckpt, ignore_errors=True)
