"""Streaming query registration (rows-only check: Structured Streaming
state is not SQL-expressible for the DuckDB oracle; tests assert the
batch-equivalence separately in tests/test_streaming.py)."""

from __future__ import annotations

import tempfile

from ..registry import register
from ..streaming.daily import daily_totals_stream
from ..streaming.dedup import deduped_ingest_stream, stage_backlog
from ..streaming.export import export_daily_partitions
from ..streaming.sessions import user_sessions_stream


@register("st_daily_totals_incremental")
def st_daily_totals_incremental(spark, sf_dir):
    """Incremental daily totals: readStream(parquet) -> 1-day watermark
    -> daily windowed agg -> AvailableNow drain -> memory sink.  The
    streaming twin of A14; closed windows only (append mode)."""
    return daily_totals_stream(
        spark, f"{sf_dir}/events.parquet", query_name="st_daily_totals_q"
    )


@register("st_stream_dedup_exactly_once")
def st_stream_dedup_exactly_once(spark, sf_dir):
    """Exactly-once ingest over an at-least-once source: the backlog is
    staged DOUBLED (every file delivered twice) and
    dropDuplicatesWithinWatermark(event_id) collapses re-deliveries with
    event-time-bounded state; totals equal the single-copy batch
    answer (asserted in tests/test_streaming.py)."""
    doubled = stage_backlog(f"{sf_dir}/events.parquet", copies=2)
    return deduped_ingest_stream(spark, doubled, query_name="st_dedup_q")


@register("st_incremental_export")
def st_incremental_export(spark, sf_dir):
    """Streaming export: foreachBatch + dynamic partition overwrite
    writes per-day totals as a date-partitioned parquet dataset,
    rewriting only touched partitions (idempotent MERGE pattern for
    plain parquet).  Returns the dataset read back."""
    out = tempfile.mkdtemp(prefix="clearmap_export_out_") + "/daily"
    export_daily_partitions(
        spark, f"{sf_dir}/events.parquet", out, query_name="st_export_q"
    )
    return spark.read.parquet(out)


@register("st_user_sessions_stateful")
def st_user_sessions_stateful(spark, sf_dir):
    """Custom stateful sessionization (applyInPandasWithState): per-user
    GroupState carries the open session across microbatches; sessions
    emit when closed by a later event or by event-time timeout.  The
    streaming twin of j_sessionization (closed sessions only)."""
    return user_sessions_stream(
        spark, f"{sf_dir}/events.parquet", query_name="st_user_sessions_q"
    )
