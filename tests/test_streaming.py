"""Streaming daily totals must equal the batch aggregation for all
windows the watermark closed (append-mode emits closed windows only)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_matches_batch(spark, sf_dir):
    from clear_map_data_pipeline_spark.session import Tables
    from clear_map_data_pipeline_spark.streaming.daily import daily_totals_stream

    streamed = daily_totals_stream(
        spark, f"{sf_dir}/events.parquet", query_name="t_stream_eq"
    )
    srows = {
        (r["date"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in streamed.collect()
    }
    assert len(srows) > 0, "no closed windows emitted"

    batch = (
        Tables(spark, sf_dir)
        .events.groupBy(F.to_date("ts").alias("date"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    brows = {
        (r["date"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()
    }
    # every emitted window must match the batch answer exactly
    for k, v in srows.items():
        assert brows[k] == v, (k, v, brows[k])
