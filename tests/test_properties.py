"""Property-based tests (hypothesis): relational operators checked
against brute-force Python oracles on generated inputs — the failure
modes example-based tests miss (adjacent intervals, exact ties,
degenerate single-row keys)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WIN = 100  # interval length for the union property


def _brute_union(starts: list[int], win: int) -> int:
    """Length of the union of [s, s+win) intervals."""
    covered: set[int] = set()
    for s in starts:
        covered.update(range(s, s + win))
    return len(covered)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cases=st.lists(
        st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_interval_union_matches_brute_force(spark, cases):
    from airflow_baseball_spark.operators.intervals import interval_union

    rows = []
    for key, starts in enumerate(cases):
        for i, s in enumerate(starts):
            rows.append((key, s, s + WIN, i))
    df = spark.createDataFrame(rows, "k long, s long, e long, tb long")
    got = {
        r.k: r.covered
        for r in interval_union(
            df, key="k", start="s", end="e", order_tiebreak="tb"
        ).collect()
    }
    for key, starts in enumerate(cases):
        assert got[key] == _brute_union(starts, WIN), (key, starts)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40
    )
)
def test_topk_with_ties_rank_semantics(spark, vals):
    """RANK-based top-k: every value tied with the k-th survives."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    k = 5
    df = spark.createDataFrame([(v, i) for i, v in enumerate(vals)], "v long, i long")
    w = Window.orderBy(F.col("v").desc())
    got = sorted(
        r.v
        for r in df.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= k)
        .collect()
    )
    s = sorted(vals, reverse=True)
    cutoff = s[min(k, len(s)) - 1]
    expected = sorted(v for v in vals if v >= cutoff)
    assert got == expected, (vals, got, expected)
