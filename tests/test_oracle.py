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


#: DuckDB output types that fetch as non-native Python representations
#: (int128 -> object/float, Decimal -> decimal.Decimal).  The driver's
#: order-insensitive hash is representation-sensitive, so any of these in
#: an oracle result flips hash_match even when every value is equal —
#: exactly how w1_rebase_censored shipped green locally and red in r02.
_FORBIDDEN_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

_DUCK_FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "FLOAT": "float", "REAL": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
}

_SPARK_FAMILY = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "date": "date",
}


def _type_family(type_str: str, table: dict) -> str:
    t = type_str.strip()
    up = t.upper() if table is _DUCK_FAMILY else t.lower()
    if up in table:
        return table[up]
    low = t.lower()
    if low.startswith("timestamp"):
        return "timestamp"
    if low.startswith(("array", "list")) or low.endswith("[]"):
        return "list"
    if low.startswith(("struct", "map", "row")):
        return "struct"
    return f"other:{low}"


def _assert_oracle_types(name, sdf, rel):
    """Fail on oracle output types the driver's hash cannot reconcile.

    Two layers: (1) forbid DuckDB types whose Python representation
    diverges from Spark's (HUGEINT/DECIMAL); (2) diff type *families*
    per column name against the Spark schema, so an oracle emitting
    DOUBLE where Spark emits BIGINT (or vice versa) fails locally
    instead of in the driver's CORRECTNESS gate."""
    duck_types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    for col, dt in duck_types.items():
        assert not any(bad in dt.upper() for bad in _FORBIDDEN_DUCK_TYPES), (
            f"{name}.{col}: oracle emits {dt}; CAST it in the oracle SQL "
            "(DuckDB widens sum(BIGINT) to HUGEINT, which hash-mismatches)"
        )
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    for col in spark_types:
        if col not in duck_types:
            continue  # column-name mismatch reported separately
        sfam = _type_family(spark_types[col], _SPARK_FAMILY)
        dfam = _type_family(duck_types[col], _DUCK_FAMILY)
        assert sfam == dfam, (
            f"{name}.{col}: type-family drift spark={spark_types[col]} "
            f"({sfam}) vs oracle={duck_types[col]} ({dfam}) — align the "
            "casts on both sides or the driver hash will flip"
        )


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
    _assert_oracle_types(name, sdf, con.sql(qd.sql))
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


def test_suite_canon_separator_injective(spark):
    """r07 verdict nit: the suite payload join must be injective.  A
    string value containing '|' (or the escape char itself) must NOT
    collide with a different column split, and both engines must
    render the escaped payload identically."""
    import duckdb as _dd

    from pyspark.sql import functions as F

    from clear_map_data_pipeline_spark.queries.suites import (
        _duck_canon,
        _spark_canon,
    )

    rows = [("a|b", "c"), ("a", "b|c"), ("x\\", "|y"), ("x", "\\|y"),
            (None, "\\N"), ("\\N", None)]
    sdf = spark.createDataFrame(rows, ["u", "v"])
    spark_payloads = sorted(
        r[0]
        for r in sdf.select(
            F.concat_ws(
                "|", _spark_canon("u", "s"), _spark_canon("v", "s")
            )
        ).collect()
    )
    # injective: all six distinct (u, v) pairs -> six distinct payloads
    # (incl. SQL NULL vs the literal string backslash-N: the NULL
    # sentinel is unreachable by any escaped rendering)
    assert len(set(spark_payloads)) == 6
    # DuckDB standard string literals are backslash-verbatim
    def lit(x):
        return "NULL" if x is None else f"'{x}'"

    vals = ", ".join(f"({lit(u)}, {lit(v)})" for u, v in rows)
    duck_payloads = sorted(
        r[0]
        for r in _dd.connect().execute(
            "SELECT concat_ws('|', "
            f"{_duck_canon('u', 's')}, {_duck_canon('v', 's')}) "
            f"FROM (SELECT * FROM (VALUES {vals}) AS t(u, v))"
        ).fetchall()
    )
    assert spark_payloads == duck_payloads
