"""The r06 column synthesis (queries/tpch_synth.py) — engine-parity
and TPC-H-consistency properties the oracle sweep exercises only
end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from clear_map_data_pipeline_spark.queries import tpch_synth as synth
from clear_map_data_pipeline_spark.session import Tables


def test_partsupp_covers_every_lineitem_pair(spark, sf_dir):
    """TPC-H invariant the queries rely on: every lineitem's
    (partkey, suppkey) pair exists in partsupp — true by construction
    here, pinned so a future synthesis change can't break q9/q20/q21's
    inner joins silently."""
    t = Tables(spark, sf_dir)
    ps = synth.partsupp(t.lineitem)
    orphans = (
        t.lineitem.select("l_partkey", "l_suppkey")
        .join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
            "left_anti",
        )
        .count()
    )
    assert orphans == 0


def test_synth_matches_duckdb_ctes(spark, sf_dir):
    """The Spark builders and the SQL CTE strings are generated from
    one spec — prove they actually agree row-for-row on the fixture
    (partsupp + the lineitem extension columns + part containers)."""
    import duckdb

    con = duckdb.connect()
    for name in Tables.NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    t = Tables(spark, sf_dir)

    def norm(rows):
        return sorted(tuple(str(v) for v in r) for r in rows)

    ps_s = norm(
        synth.partsupp(t.lineitem)
        .select(
            "ps_partkey",
            "ps_suppkey",
            F.round("ps_supplycost", 2),
            "ps_availqty",
        )
        .collect()
    )
    ps_d = norm(
        con.execute(
            f"SELECT ps_partkey, ps_suppkey, round(ps_supplycost, 2), "
            f"ps_availqty FROM ({synth.PARTSUPP_SQL})"
        ).fetchall()
    )
    assert ps_s == ps_d

    li_s = norm(
        synth.lineitem_ext(t.lineitem)
        .select(
            "l_orderkey", "l_linenumber", "l_commitdate", "l_receiptdate",
            "l_shipmode", "l_shipinstruct",
        )
        .collect()
    )
    li_d = norm(
        con.execute(
            f"SELECT l_orderkey, l_linenumber, l_commitdate, "
            f"l_receiptdate, l_shipmode, l_shipinstruct "
            f"FROM ({synth.LINEITEM_EXT_SQL})"
        ).fetchall()
    )
    assert li_s == li_d

    pe_s = norm(
        synth.part_ext(t.part).select("p_partkey", "p_container").collect()
    )
    pe_d = norm(
        con.execute(
            f"SELECT p_partkey, p_container FROM ({synth.PART_EXT_SQL})"
        ).fetchall()
    )
    assert pe_s == pe_d
