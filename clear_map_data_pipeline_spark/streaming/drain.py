"""Shared streaming harness: source staging + the AvailableNow
memory-sink drain — extracted from the eight per-operator copies so the
drain discipline (symlink staging for single-file sources, fresh
checkpoint per call, state-store partition pinning, blocking drain)
lives in ONE place.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..session import normalize_parquet_confs

#: Temp dirs (checkpoints, symlink staging) created by this module.
#: Checkpoints are removed eagerly after a successful drain; anything
#: still here (staging dirs that may back a live plan, failed drains)
#: is swept at interpreter exit so bench loops / test suites don't
#: accumulate directories.
_TMP_DIRS: set[str] = set()


def _sweep_tmp_dirs() -> None:
    while _TMP_DIRS:
        shutil.rmtree(_TMP_DIRS.pop(), ignore_errors=True)


atexit.register(_sweep_tmp_dirs)


def _tracked_mkdtemp(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    _TMP_DIRS.add(d)
    return d


#: The production state-store backend: keeps stateful-operator state
#: (session windows, dedup sets, EWMA accumulators) off-heap in RocksDB
#: instead of the default in-memory HDFS-backed map — at 100 TB the
#: state of a watermarked dedup or sessionizer outgrows executor heaps,
#: and RocksDB bounds memory at a disk-spill cost.  Bundled with Spark
#: since 3.2; every registered streaming query is swept under both
#: providers in tests/test_streaming.py.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


class state_store_provider:
    """Context manager pinning the state-store provider for queries
    STARTED inside it (the conf is read at query start and frozen into
    the checkpoint), restoring the previous session setting after."""

    def __init__(self, spark: SparkSession, provider: str | None):
        self.spark = spark
        self.provider = provider

    def __enter__(self):
        self.before = self.spark.conf.get(_PROVIDER_CONF, None)
        if self.provider:
            self.spark.conf.set(_PROVIDER_CONF, self.provider)
        return self

    def __exit__(self, *exc):
        if self.provider:
            if self.before is None:
                self.spark.conf.unset(_PROVIDER_CONF)
            else:
                self.spark.conf.set(_PROVIDER_CONF, self.before)
        return False


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
        staged = _tracked_mkdtemp("clearmap_stream_src_")
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


def backlog_state_width(spark: SparkSession, events_dir: str) -> int:
    """State-store partition count sized to the staged backlog: ~1M
    rows per state partition, floor 2, never above the session's
    parallelism.  The state width is a FIRST-DEPLOYMENT choice — Spark
    freezes ``spark.sql.shuffle.partitions`` into the checkpoint when a
    stateful query first starts — so sizing it to the volume the query
    will actually carry is exactly what a production deployment does;
    a 100 TB stream's backlog exceeds the threshold and keeps the full
    session width.  For a bounded fixture drain this removes the
    dominant fixed cost: every micro-batch (including the final
    watermark-advance batch) commits EVERY state partition of every
    stateful operator to the checkpoint, so a 32-wide state layout
    pays 32x the store-commit files of the 2 partitions the data
    needs.  The row count is a parquet-footer aggregate, not a scan."""
    n = spark.read.parquet(events_dir).count()
    return min(
        spark.sparkContext.defaultParallelism,
        max(2, -(-n // 1_000_000)),
    )


def drain_to_memory(
    df: DataFrame,
    spark: SparkSession,
    query_name: str,
    output_mode: str = "append",
    ckpt_prefix: str = "clearmap_stream_ckpt_",
    pin_state_partitions: bool | int = False,
    store_provider: str | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame with AvailableNow into a memory-sink
    table and return it, blocking until the backlog is consumed.  A
    fresh checkpoint per call keeps repeated invocations independent.

    ``pin_state_partitions``: the state-store partition count is frozen
    into the checkpoint at first start (safe to pin because the
    checkpoint is fresh; the caller's setting is restored after).
    ``True`` pins to the session's core count; an ``int`` pins to that
    exact width — pass ``backlog_state_width(...)`` to size state to
    the staged volume.

    ``store_provider``: state-store provider class for this drain
    (e.g. ``ROCKSDB_PROVIDER``); None keeps the session default."""
    checkpoint = _tracked_mkdtemp(ckpt_prefix)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    if pin_state_partitions:
        width = (
            spark.sparkContext.defaultParallelism
            if pin_state_partitions is True
            else int(pin_state_partitions)
        )
        spark.conf.set("spark.sql.shuffle.partitions", width)
    try:
        with state_store_provider(spark, store_provider):
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
    # the drain is complete and the memory sink holds the rows — the
    # checkpoint has no further reader; failed drains skip this and are
    # swept at exit instead, leaving the dir for post-mortem until then
    _TMP_DIRS.discard(checkpoint)
    shutil.rmtree(checkpoint, ignore_errors=True)
    return spark.table(query_name)
