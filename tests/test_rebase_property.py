"""Property test for the flagship censored-rebase operator
(operators/rebase.py, ref il_analysis_git.py:22-30): hypothesis-built
per-id series run through the Spark window rewrite AND a literal
pure-Python transcription of the reference's O(n²) loop; outputs must
agree exactly — including the replicate_reference_bug=True mode that
reproduces the reference's cross-measure fold at :123-124."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clear_map_data_pipeline_spark.operators.rebase import rebase_censored

# one group's series: rows of (cases, new_case, vaccine, new_vaccine);
# cumulative columns often start censored-to-zero, so bias small values
row_strategy = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=1),
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=1),
)
series_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=5),
    st.lists(row_strategy, min_size=1, max_size=8),
    min_size=1,
    max_size=4,
)


def py_rebase(series, bug=False):
    """The reference loop, transcribed: per group in order, wherever the
    running sum of the cumulative measure is still 0, add the running
    count of the daily flags (ref :22-30); the fold-back at :123-124
    adds BOTH patches into `cases` when bug=True."""
    out = {}
    for gid, rows in series.items():
        c_run = v_run = cf_run = vf_run = 0
        fixed = []
        for cases, new_case, vaccine, new_vaccine in rows:
            c_run += cases
            v_run += vaccine
            cf_run += new_case
            vf_run += new_vaccine
            c_patch = cf_run if c_run == 0 else 0
            v_patch = vf_run if v_run == 0 else 0
            if bug:
                fixed.append((cases + c_patch + v_patch, vaccine))
            else:
                fixed.append((cases + c_patch, vaccine + v_patch))
        out[gid] = fixed
    return out


def run_spark(spark, series, bug):
    rows = [
        (gid, i, c, nc, v, nv)
        for gid, seq in series.items()
        for i, (c, nc, v, nv) in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows,
        "id long, date long, cases long, new_case long, "
        "vaccine long, new_vaccine long",
    )
    got = rebase_censored(
        df,
        {"cases": "new_case", "vaccine": "new_vaccine"},
        replicate_reference_bug=bug,
    ).collect()
    out = {}
    for r in sorted(got, key=lambda r: (r["id"], r["date"])):
        out.setdefault(r["id"], []).append((r["cases"], r["vaccine"]))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(series=series_strategy)
def test_rebase_matches_reference_loop(spark, series):
    assert run_spark(spark, series, bug=False) == py_rebase(series, bug=False)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(series=series_strategy)
def test_rebase_bug_mode_reproduces_reference_fold(spark, series):
    assert run_spark(spark, series, bug=True) == py_rebase(series, bug=True)
