"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``clear_map_data_pipeline_spark/`` — this module
only adapts the registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clear_map_data_pipeline_spark.registry import load_all  # noqa: E402
from clear_map_data_pipeline_spark.session import (  # noqa: E402
    ensure_package_on_workers,
)


def _shipped(builder: Callable[[SparkSession, str], DataFrame]):
    """Make the builder safe under the driver's own vanilla session: the
    Python workers need the package shipped (addPyFile) before any
    pandas-UDF query can deserialize its functions."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_package_on_workers(spark)
        return builder(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (censored-series rebase + delta + per-100k) on
    /root/testdata/sf0.001; driver checks rows>0."""
    q = load_all()["w1_rebase_censored"]
    return _shipped(q.builder)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (names are
    ``<survey-op-id>_<slug>``)."""
    return {name: _shipped(qd.builder) for name, qd in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twins; keys without SQL get the driver's
    rows-only check (non-SQL-expressible ops)."""
    return {
        name: qd.sql for name, qd in load_all().items() if qd.sql is not None
    }
