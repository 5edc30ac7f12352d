"""Deterministic synthesis of the TPC-H columns the fixtures lack —
the seam that unlocks q2/q4/q9/q11/q12/q16/q19/q20/q21 (r06).

The read-only fixtures carry no partsupp table and no l_shipmode /
l_commitdate / l_receiptdate / l_shipinstruct / p_container columns
(tpch_extra.py's r03 "out of scope by data" note).  Reusing the
``synth_moh_dirty`` pattern (plans/clearmap.py): derive the missing
data deterministically from existing keys with pure modular
arithmetic, expressed ONCE as Python constants + expression templates
that both the Spark builders and the DuckDB oracle CTEs are generated
from — so the two engines cannot drift.

Design rules (the verify-skill engine-parity list):
- only BIGINT arithmetic feeds the modulus, then an exact cast — no
  float path whose rounding could differ;
- ``partsupp`` is the DISTINCT (l_partkey, l_suppkey) pairs of
  lineitem, NOT a modulo over a supplier-count scalar: the pairs are
  TPC-H-consistent (every lineitem's pair exists in partsupp, which is
  exactly what q9/q20/q21 join on), need no collected N, and stay
  valid at every scale factor by construction;
- dates are DATE + integer-days on both engines (identical calendar
  math), anchored on the real l_shipdate so windows stay meaningful.

At 100 TB: the partsupp derivation is one exact-dedup shuffle of a
(long, long) pair — the cheapest distinct there is; every other
synthesized column is a per-row expression inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: canonical TPC-H domains, alphabetical so index math is stable
SHIP_MODES = ["AIR", "AIR REG", "FOB", "MAIL", "RAIL", "SHIP", "TRUCK"]
SHIP_INSTRUCTS = ["COLLECT COD", "DELIVER IN PERSON", "NONE", "TAKE BACK RETURN"]
CONTAINERS = [
    "JUMBO BOX", "JUMBO CASE", "LG BOX", "LG CASE",
    "MED BAG", "MED BOX", "SM BOX", "SM CASE",
]


def _sql_list(vals: list[str]) -> str:
    return "[" + ", ".join(f"'{v}'" for v in vals) + "]"


def _pick(vals: list[str], idx: F.Column) -> F.Column:
    return F.element_at(
        F.array(*[F.lit(v) for v in vals]), (idx + 1).cast("int")
    )


def lineitem_ext(li: DataFrame) -> DataFrame:
    """lineitem + (l_commitdate, l_receiptdate, l_shipmode,
    l_shipinstruct), all derived from (l_orderkey, l_linenumber) and
    the real l_shipdate.  commit is ship -30..+30 days and receipt is
    ship +0..+30 days, so 'commit < receipt' (q4/q12/q21's late
    predicate) splits the data roughly in half."""
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber")
    ship = F.col("l_shipdate").cast("date")
    return (
        li.withColumn(
            "l_commitdate",
            F.date_add(ship, ((ok * 3 + ln * 5) % 61 - 30).cast("int")),
        )
        .withColumn(
            "l_receiptdate",
            F.date_add(ship, ((ok * 7 + ln * 11) % 31).cast("int")),
        )
        .withColumn("l_shipmode", _pick(SHIP_MODES, (ok + ln) % 7))
        .withColumn("l_shipinstruct", _pick(SHIP_INSTRUCTS, (ok * 2 + ln) % 4))
    )


LINEITEM_EXT_SQL = f"""
  SELECT l.*,
         CAST(l_shipdate AS DATE)
           + CAST((l_orderkey * 3 + l_linenumber * 5) % 61 - 30 AS INT)
           AS l_commitdate,
         CAST(l_shipdate AS DATE)
           + CAST((l_orderkey * 7 + l_linenumber * 11) % 31 AS INT)
           AS l_receiptdate,
         {_sql_list(SHIP_MODES)}[
           CAST((l_orderkey + l_linenumber) % 7 + 1 AS INT)] AS l_shipmode,
         {_sql_list(SHIP_INSTRUCTS)}[
           CAST((l_orderkey * 2 + l_linenumber) % 4 + 1 AS INT)]
           AS l_shipinstruct
  FROM lineitem l
"""


def partsupp(li: DataFrame) -> DataFrame:
    """The partsupp table: DISTINCT (l_partkey, l_suppkey) pairs with
    cost/availqty derived from the pair.  ps_supplycost is an exact
    two-decimal value built from BIGINT arithmetic (1.00 .. 90.99)."""
    pairs = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    pk, sk = F.col("ps_partkey"), F.col("ps_suppkey")
    return pairs.withColumns(
        {
            "ps_supplycost": ((pk * 31 + sk * 17) % 9000 + 100).cast("double")
            / 100.0,
            "ps_availqty": (pk * 13 + sk * 7) % 9999 + 1,
        }
    )


PARTSUPP_SQL = """
  SELECT ps_partkey, ps_suppkey,
         CAST((ps_partkey * 31 + ps_suppkey * 17) % 9000 + 100 AS DOUBLE)
           / 100.0 AS ps_supplycost,
         (ps_partkey * 13 + ps_suppkey * 7) % 9999 + 1 AS ps_availqty
  FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem)
"""


def part_ext(part: DataFrame) -> DataFrame:
    """part + p_container (8 canonical containers keyed on p_partkey)."""
    return part.withColumn(
        "p_container", _pick(CONTAINERS, F.col("p_partkey") % 8)
    )


PART_EXT_SQL = f"""
  SELECT p.*,
         {_sql_list(CONTAINERS)}[CAST(p_partkey % 8 + 1 AS INT)]
           AS p_container
  FROM part p
"""
