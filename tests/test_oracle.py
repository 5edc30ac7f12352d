"""Mirror of the driver's t2 correctness gate: run every registered query
through Spark AND its DuckDB oracle twin, compare row-count, column
names, and order-insensitive values.

Runs at sf0.001 by default (fast inner loop); the driver runs the same
comparison at sf0.01.  Floats are compared with tolerance here, but the
queries themselves are written to emit stable values (ints, dates,
strings, pre-rounded doubles) so the driver's exact hash also matches.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from clear_map_data_pipeline_spark.registry import load_all
from clear_map_data_pipeline_spark.session import Tables


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in Tables.NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _normalize(rows, cols):
    """Sort columns by name, then rows; stringify with float rounding."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.6f}"
        return str(v)

    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def _param_names():
    return sorted(load_all().keys())


@pytest.mark.parametrize("name", _param_names())
def test_query_matches_oracle(spark, sf_dir, name):
    qd = load_all()[name]
    sdf = qd.builder(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    assert len(spark_rows) >= 0  # builder must at least execute
    if qd.sql is None:
        assert len(spark_rows) > 0, f"{name}: rows-only check got 0 rows"
        return
    con = _duck(sf_dir)
    res = con.execute(qd.sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_norm = _normalize([tuple(r) for r in spark_rows], spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"
