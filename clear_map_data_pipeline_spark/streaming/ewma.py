"""Stateful streaming EWMA over per-user daily totals — the unbounded-
stream counterpart the batch ``operators/stats.py: ewma`` docstring
points at (a recursion has no fixed-frame window form in EITHER mode;
in streaming the natural home for the fold is per-key ``GroupState``).

Semantics (asserted against the batch operator in tests):
- events bucket into UTC days per user; a day's total accumulates as
  the exact integer sum of ``floor(value * 1e6)`` (order-independent —
  the same scaled-integer discipline the Lloyd trainer uses, so the
  total is identical no matter how events split across microbatches);
- a day CLOSES when the event-time watermark passes its end; closed
  days fold through ``y = (1 - alpha) * y + alpha * total`` in day
  order (seed: first closed day's total) and emit one row each;
- open days wait in state; events for a day that already closed and
  emitted are DROPPED (the standard watermark late-data contract);
- the emitted ``ewma`` is floor-scale truncated to 6 (engine-parity
  rendering); the state carries the untruncated accumulator so the
  recurrence itself never loses precision.

State per user: (last_emitted_day, fold accumulator, open-day arrays) —
bounded by the watermark horizon (#days a late event can still arrive
for), not the stream length; RocksDB-backed at scale like the
sessionizer.
"""

from __future__ import annotations

import math
import os
import tempfile
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..session import normalize_parquet_confs, normalize_ts

OUTPUT_SCHEMA = "user_id long, day long, day_total double, ewma double"
STATE_SCHEMA = (
    "last_day long, y double, has_y long, days array<long>, sums array<long>"
)

_DAY_S = 86400


def _fold_factory(alpha: float):
    a = float(alpha)

    def fold(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_day, y, has_y, days, sums = state.get
            open_days = dict(zip(days, sums))
        else:
            last_day, y, has_y, open_days = -1, 0.0, 0, {}
        if not state.hasTimedOut:
            # data invocation: merge this batch's events into open days.
            # The watermark visible HERE lags one batch (it advances
            # after a batch completes), so closures mostly happen in the
            # timeout invocations below — including the engine's no-data
            # batch after an AvailableNow drain exhausts the source.
            for pdf in batches:
                for d, v6 in zip(pdf["day"].values, pdf["v6"].values):
                    d = int(d)
                    if d <= last_day:
                        continue  # late event for an already-emitted day
                    open_days[d] = open_days.get(d, 0) + int(v6)
        wm_ms = state.getCurrentWatermarkMs()
        closed = sorted(
            d for d in open_days if (d + 1) * _DAY_S * 1000 <= wm_ms
        )
        rows = []
        for d in closed:
            total = open_days.pop(d) / 1e6
            y = total if not has_y else (1.0 - a) * y + a * total
            has_y = 1
            last_day = d
            rows.append(
                (user_id, d, total, math.floor(y * 1e6) / 1e6)
            )
        remaining = sorted(open_days)
        state.update(
            (
                last_day,
                float(y),
                int(has_y),
                remaining,
                [open_days[d] for d in remaining],
            )
        )
        if remaining:
            # wake this group when the watermark can close the earliest
            # open day (clamped above the current watermark, as the
            # sessionizer does)
            state.setTimeoutTimestamp(
                max((remaining[0] + 1) * _DAY_S * 1000, wm_ms + 1)
            )
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "day", "day_total", "ewma"]
            )

    return fold


def daily_ewma_stream(
    spark: SparkSession,
    events_dir: str,
    alpha: float = 0.3,
    query_name: str = "daily_ewma",
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain the events backlog with AvailableNow through the stateful
    daily-EWMA fold; returns the materialized table
    (user_id, day epoch-day, day_total, ewma)."""
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
    stream = (
        normalize_ts(reader.parquet(events_dir))
        .withWatermark("ts", watermark)
        .select(
            "user_id",
            (F.col("ts").cast("long") / _DAY_S).cast("long").alias("day"),
            F.floor(F.col("value") * F.lit(1e6)).cast("long").alias("v6"),
            "ts",
        )
    )
    folded = stream.groupBy("user_id").applyInPandasWithState(
        _fold_factory(alpha),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    checkpoint = tempfile.mkdtemp(prefix="clearmap_ewma_ckpt_")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", spark.sparkContext.defaultParallelism
    )
    try:
        q = (
            folded.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .option("checkpointLocation", os.path.join(checkpoint, "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    return spark.table(query_name)
