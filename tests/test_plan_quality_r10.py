"""Plan-quality pins for the r10 first-run-cost rewrites
(PERF_NOTES.md r10): the embedding kernels replaced giant unrolled
expression trees with higher-order folds and per-side projected
norms. These tests pin the SHAPE so a future edit cannot silently
reintroduce the expensive form — the values are pinned separately by
the oracle ledgers (the rewrites are IEEE-identical by construction).
"""

from __future__ import annotations

import re

from tests.oracle_harness import plan_str

from airflow_baseball_spark import registry

SF = "/root/testdata/sf0.001"


def test_pca_power_source_has_no_unrolled_dot():
    """The 64-term dot must be ONE aggregate/zip_with HOF, not a
    127-node chained add of element_at pairs: the unrolled form costs
    ~1 s of janino compile per power iteration, paid on every first
    run (= every bench reading). The returned DataFrame's plan is
    just the final localCheckpoint scan (the matvec executes eagerly
    inside the iteration loop), so this pin reads the SOURCE: the HOF
    calls must be present and no reduce/element_at unrolling of the
    dot may return."""
    import inspect

    from airflow_baseball_spark import queries_text

    src = inspect.getsource(queries_text.q_pca_power)
    assert "F.aggregate(" in src and "F.zip_with(" in src, src[:500]
    assert "reduce(" not in src, (
        "unrolled per-ordinal dot is back in q_pca_power"
    )


def test_ann_recall_norms_projected_before_cross_join(spark):
    """ann_recall_eval's brute-force side must compute each vector's
    norm ONCE per row before the probes x corpus cross join (r9
    rule): norms inside the join cost 3x the flops AND re-unrolled
    trees. The BroadcastNestedLoopJoin's own projection must
    therefore contain no sqrt — only the dot and the division by the
    pre-projected norm columns."""
    df = registry.queries()["ann_recall_eval"](spark, SF)
    plan = plan_str(df)
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    secs = re.split(r"\n(?=\(\d+\) )", plan)
    # (a) the projection that DEFINES qcos must divide by the two
    # pre-projected norm columns (qn * en) and contain no sqrt at all
    # (r10 ADVICE #1: the old pin's `SQRT absent OR zip_with absent`
    # passed a post-join sqrt(aggregate(transform(...))) recompute)
    defs = [s for s in secs if re.search(r"AS qcos#\d+", s)]
    assert defs, plan[:2000]
    for p in defs:
        assert "SQRT" not in p.upper(), (
            "per-pair norm recomputation is back:\n" + p
        )
        assert re.search(r"qn#\d+ \* en#\d+", p), (
            "qcos no longer divides by the pre-projected norms:\n" + p
        )
    # (b) sqrt may appear ONLY in the per-side projections that
    # define the norm columns themselves — any other section carrying
    # a sqrt means norm work migrated downstream of the join
    for s in secs:
        if "SQRT" in s.upper():
            assert re.search(r"AS (qn|en)#\d+", s), (
                "sqrt outside the per-side norm projections:\n" + s
            )


def test_hugeint_overflow_headroom_is_wide(spark):
    """Every rewritten (CAST AS BIGINT) oracle executed at the
    driver's correctness SF with >=3 orders of magnitude of headroom
    (r9 ADVICE #3; full per-column report in OVERFLOW_r10.txt — the
    worst observed is page_hinkley at 1.4e-04 of 2^63). Here: pin the
    mechanism on the worst-case name so a magnitude regression fails
    in pytest, not at the driver."""
    import duckdb
    from pathlib import Path

    sf = "/root/testdata/sf0.01"
    if not Path(sf).is_dir():
        import pytest

        pytest.skip("testdata sf0.01 not present")
    con = duckdb.connect()
    for t in registry._TESTDATA_DDL:
        p = Path(sf) / f"{t}.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    sql = registry.oracle_sql()["page_hinkley"]
    rows = con.execute(
        f"SELECT MAX(ABS(ph_micro)), MAX(ABS(drift_micro)) FROM ({sql})"
    ).fetchone()
    for v in rows:
        assert v < 2**53, f"page_hinkley magnitude {v} nearing 2^63"
