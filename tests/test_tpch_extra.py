"""Oracle parity for the extra TPC-H shapes (queries/tpch_extra.py) —
same Spark-vs-DuckDB comparison as test_oracle.py, run from pytest
because the driver registry is capped at 50 entries."""

from __future__ import annotations

import pytest

from clear_map_data_pipeline_spark.queries.tpch_extra import EXTRA
from tests.test_oracle import _duck, _normalize


@pytest.mark.parametrize("name", sorted(EXTRA))
def test_tpch_extra_matches_oracle(spark, sf_dir, name):
    qd = EXTRA[name]
    sdf = qd.builder(spark, sf_dir)
    spark_rows = sdf.collect()
    con = _duck(sf_dir)
    res = con.execute(qd.sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert _normalize([tuple(r) for r in spark_rows], sdf.columns) == _normalize(
        duck_rows, duck_cols
    )


def test_q6_predicates_reach_the_scan(spark, sf_dir):
    from clear_map_data_pipeline_spark.plancheck import plan_summary
    from clear_map_data_pipeline_spark.queries.tpch_extra import (
        tpch_q6_forecast_revenue,
    )

    s = plan_summary(tpch_q6_forecast_revenue(spark, sf_dir))
    assert s["pushed_filters"] >= 1  # shipdate/discount/quantity at the scan
    assert s["exchanges"] <= 1  # single map-side-combined aggregate


def test_q5_broadcasts_every_dimension(spark, sf_dir):
    from clear_map_data_pipeline_spark.plancheck import plan_summary
    from clear_map_data_pipeline_spark.queries.tpch_extra import (
        tpch_q5_local_supplier_volume,
    )

    s = plan_summary(tpch_q5_local_supplier_volume(spark, sf_dir))
    # customer/supplier/nation/region always broadcast (at fixture scale
    # orders broadcasts too); at most ONE shuffle join (lineitem⋈orders)
    # and never a nested loop
    assert s["bcast_joins"] >= 4
    assert s["smj"] <= 1 and s["bnlj"] == 0


def test_q8_single_shuffle_join_among_eight_relations(spark, sf_dir):
    from clear_map_data_pipeline_spark.plancheck import plan_summary
    from clear_map_data_pipeline_spark.queries.tpch_extra import (
        tpch_q8_market_share,
    )

    s = plan_summary(tpch_q8_market_share(spark, sf_dir))
    # seven of the eight relations broadcast; lineitem⋈orders is the
    # only join allowed to shuffle, and nothing nested-loops
    assert s["bcast_joins"] >= 6
    assert s["smj"] <= 1 and s["bnlj"] == 0


def test_q10_topk_is_heap_not_sort(spark, sf_dir):
    import contextlib
    import io

    from clear_map_data_pipeline_spark.queries.tpch_extra import (
        tpch_q10_returned_items,
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        tpch_q10_returned_items(spark, sf_dir).explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()
