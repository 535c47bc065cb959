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


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    days=st.lists(
        st.integers(min_value=0, max_value=60), min_size=1, max_size=30
    )
)
def test_streak_islands_match_brute_force(spark, days):
    """day − row_number islands == brute-force consecutive-run scan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    uniq = sorted(set(days))
    df = spark.createDataFrame([(0, d) for d in uniq], "u long, d long")
    w = Window.partitionBy("u").orderBy("d")
    grp = df.withColumn("g", F.col("d") - F.row_number().over(w))
    got = sorted(
        r.n
        for r in grp.groupBy("u", "g").agg(F.count("*").alias("n")).collect()
    )
    # brute force: split the sorted days into consecutive runs
    runs, cur = [], 1
    for a, b in zip(uniq, uniq[1:]):
        if b == a + 1:
            cur += 1
        else:
            runs.append(cur)
            cur = 1
    runs.append(cur)
    assert got == sorted(runs), (uniq, got, runs)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),  # value
            st.integers(min_value=1, max_value=9),  # weight
        ),
        min_size=1,
        max_size=25,
    )
)
def test_weighted_median_2cum_rule(spark, pairs):
    """smallest value with 2·cumweight ≥ total == brute-force scan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(v, wt, i) for i, (v, wt) in enumerate(pairs)], "v long, wt long, i long"
    )
    w = Window.orderBy("v", "i").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy()
    got = (
        df.select(
            "v",
            F.sum("wt").over(w).alias("cum"),
            F.sum("wt").over(wa).alias("tot"),
        )
        .filter(2 * F.col("cum") >= F.col("tot"))
        .agg(F.min("v"))
        .collect()[0][0]
    )
    total = sum(wt for _, wt in pairs)
    acc = 0
    expected = None
    for v, wt in sorted(pairs, key=lambda p: (p[0],)):
        acc += wt
        if 2 * acc >= total:
            expected = v
            break
    assert got == expected, (pairs, got, expected)
