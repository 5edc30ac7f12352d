"""CDC merge/upsert semantics on hand-built frames: latest version
wins, delete removes, insert adds, conflict resolves to delete, and
the plan uses one exchange.  Value parity vs DuckDB runs in
test_oracle.py via the registered j_merge_upsert query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clear_map_data_pipeline_spark.operators.merge import merge_upsert


def _frames(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], ["k", "val"]
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 1, "U"),      # update
            (3, "c", 1, "D"),       # delete
            (5, "e", 1, "I"),       # insert
            (4, "d-upd", 1, "U"),   # same-version update+delete conflict
            (4, "d", 1, "D"),       #   -> delete wins ('D' < 'U')
            (1, "a1", 1, "U"),      # two versions for one key
            (1, "a2", 2, "U"),      #   -> version 2 wins
        ],
        ["k", "val", "version", "op"],
    )
    return base, changes


def test_merge_semantics(spark):
    base, changes = _frames(spark)
    got = {
        r["k"]: r["val"] for r in merge_upsert(base, changes, "k").collect()
    }
    assert got == {1: "a2", 2: "b2", 5: "e"}


def test_merge_idempotent_on_empty_changes(spark):
    base, changes = _frames(spark)
    empty = changes.filter(F.lit(False))
    got = merge_upsert(base, empty, "k").orderBy("k").collect()
    assert [(r["k"], r["val"]) for r in got] == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d")
    ]


def test_merge_single_exchange(spark):
    base, changes = _frames(spark)
    df = merge_upsert(base, changes, "k")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_merge_upsert_keep_version_reassociates(spark):
    """keep_version: the output carries each key's winning version, and
    feeding the output back as the base preserves cross-batch
    highest-version-wins (the streaming sink contract)."""
    from clear_map_data_pipeline_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, val string")
    c1 = spark.createDataFrame(
        [(1, "a3", 3, "U"), (2, "b2", 2, "U")],
        "k long, val string, version long, op string",
    )
    t1 = merge_upsert(base, c1, "k", keep_version=True)
    assert {(r["k"], r["val"], r["version"]) for r in t1.collect()} == {
        (1, "a3", 3), (2, "b2", 2)
    }
    # late lower-version change must lose against the persisted version
    c2 = spark.createDataFrame(
        [(1, "a1_late", 1, "U"), (2, "b4", 4, "U")],
        "k long, val string, version long, op string",
    )
    t2 = merge_upsert(t1, c2, "k", keep_version=True)
    assert {(r["k"], r["val"], r["version"]) for r in t2.collect()} == {
        (1, "a3", 3), (2, "b4", 4)
    }
