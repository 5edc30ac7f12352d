"""Property tests for the 4-case city/area reconciliation (SURVEY §2.6
J3, §7.2 step 4): hypothesis-generated city universes are run through
the Spark operators AND a direct pure-Python transcription of the
reference's case logic (il_analysis_git.py:84-115); results must agree
exactly — case labels, fact-row multisets, and collapsed dim rows.
"""

from __future__ import annotations

import statistics

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# one city's shape: (data area multiset, shape area set, ranks per shape row)
city_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=3), min_size=0, max_size=6),
    st.lists(st.integers(min_value=0, max_value=3), min_size=0, max_size=3, unique=True),
    st.lists(st.one_of(st.none(), st.integers(1, 10)), min_size=0, max_size=3),
)
universe_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=9), city_strategy, min_size=1, max_size=6
)


def py_case(data_areas, shape_areas):
    """The reference's case picker, transcribed literally."""
    n_area0 = sum(1 for a in data_areas if a == 0)
    n_other = sum(1 for a in data_areas if a != 0)
    if n_area0 == 0:
        return 1
    if n_other > 0:
        return 2
    if len(set(shape_areas)) > 1:
        return 3
    return 4


def build_frames(spark, universe):
    data_rows, shape_rows = [], []
    for city, (dareas, sareas, ranks) in universe.items():
        for i, a in enumerate(dareas):
            data_rows.append((city, a, city * 10000 + a, float(i)))
        for j, a in enumerate(sareas):
            rank = ranks[j] if j < len(ranks) else None
            shape_rows.append(
                (city, a, city * 10000 + a, f"name_{city}_{a}",
                 float(10 + a), float(rank) if rank is not None else None)
            )
    data = spark.createDataFrame(
        data_rows or [(0, 0, 0, 0.0)],
        "city long, area long, id long, cases double",
    )
    if not data_rows:
        data = data.filter("city > 0")
    shape = spark.createDataFrame(
        shape_rows or [(0, 0, 0, "x", 0.0, None)],
        "city long, area long, id long, name string, pop double, rank double",
    )
    if not shape_rows:
        shape = shape.filter("city > 0")
    return data, shape


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(universe=universe_strategy)
def test_reconcile_matches_reference_semantics(spark, universe):
    from clear_map_data_pipeline_spark.operators.reconcile import (
        city_case_flags,
        reconcile_data,
        reconcile_shape,
    )

    data, shape = build_frames(spark, universe)
    flags = city_case_flags(data, shape)

    # 1. case labels (cities appearing in data)
    got_cases = {r["city"]: r["case"] for r in flags.collect()}
    want_cases = {
        c: py_case(d, s) for c, (d, s, _) in universe.items() if d
    }
    assert got_cases == want_cases

    # 2. fact table: case-2 area-0 rows deleted; case-3/4 rows collapsed
    #    to area=1, id=city*10000+1; everything else untouched
    got_data = sorted(
        (r["city"], r["area"], r["id"], r["cases"])
        for r in reconcile_data(data, flags).collect()
    )
    want_data = []
    for city, (dareas, sareas, _) in universe.items():
        case = py_case(dareas, sareas)
        for i, a in enumerate(dareas):
            if case == 2 and a == 0:
                continue
            if case in (3, 4):
                want_data.append((city, 1, city * 10000 + 1, float(i)))
            else:
                want_data.append((city, a, city * 10000 + a, float(i)))
    assert got_data == sorted(want_data)

    # 3. dim table: case-3 cities collapse to ONE row with summed pop and
    #    median rank (NULL iff all ranks NULL); other cities untouched
    def shape_key(t):
        return (t[0], t[1], t[2], t[3], t[4] is not None, t[4] or 0.0)

    got_shape = sorted(
        (
            (r["city"], r["area"], r["id"], r["pop"], r["rank"])
            for r in reconcile_shape(shape, flags).collect()
        ),
        key=shape_key,
    )
    want_shape = []
    for city, (dareas, sareas, ranks) in universe.items():
        case = py_case(dareas, sareas) if dareas else 1
        rows = []
        for j, a in enumerate(sareas):
            rank = ranks[j] if j < len(ranks) else None
            rows.append((city, a, city * 10000 + a, 10.0 + a,
                         float(rank) if rank is not None else None))
        if case == 3 and rows:
            pops = sum(r[3] for r in rows)
            rks = [r[4] for r in rows if r[4] is not None]
            med = float(statistics.median(rks)) if rks else None
            want_shape.append((city, 1, city * 10000 + 1, pops, med))
        else:
            want_shape.extend(rows)
    assert got_shape == sorted(want_shape, key=shape_key)
