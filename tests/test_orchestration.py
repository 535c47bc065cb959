"""Orchestration tests: chain topology validity, in-process run_chain
over domain fixtures, Airflow gating."""

from __future__ import annotations

import pytest

from airflow_baseball_spark.pipelines import orchestration as orch

from test_domain_golden import _hitters  # reuse domain fixtures


def test_chain_validates():
    orch.validate_chain()


def test_chain_matches_reference_topology():
    names = [s.name for s in orch.STAGES]
    # G2 order: park factor before hitter metrics before park-adjusted
    assert names.index("park_factor") < names.index("hitter_woba")
    assert names.index("hitter_rates") < names.index("park_adjusted")
    assert names.index("park_adjusted") < names.index("hitter_records")
    # G1 roots carry crons; G3 stage carries the event-time trigger
    assert {s.name for s in orch.STAGES if s.cron} == {
        "land_game_records",
        "land_five_innings",
    }
    assert next(s for s in orch.STAGES if s.name == "schedule_lineup").event_time


def test_run_chain_produces_derived_tables(spark):
    games = spark.createDataFrame(
        [("A", 5, 3), ("A", 2, 2), ("B", 1, 0), ("C", 4, 6)],
        "stadium string, home_score int, away_score int",
    )
    pitchers = spark.createDataFrame(
        [(1, "5 2/3", 10, 3, 1, "3.50"), (2, "0", 0, 0, 0, "-")],
        "pitcher_id int, ip string, so int, bb int, hr int, era string",
    )
    out = orch.run_chain(
        spark,
        {"game_records": games, "hitters": _hitters(spark), "pitchers": pitchers},
    )
    assert out["park_factor"].count() == 3
    assert set(out["hitter_metrics"].columns) >= {"hitter_id", "wOBA", "wRC"}
    assert out["pitcher_metrics"].count() == 2


def test_airflow_factory_gated():
    try:
        import airflow  # noqa: F401

        pytest.skip("airflow present; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        orch.build_airflow_dag()


def test_airflow_dag_graph_matches_stages():
    """When Airflow IS importable, the generated DAG must reproduce the
    reference chain topology exactly: one task per stage, edge set ==
    STAGES' `after` edges (dags/000_scrape_games_result.py:147-153)."""
    pytest.importorskip("airflow")
    dag = orch.build_airflow_dag()
    assert {t.task_id for t in dag.tasks} == {s.name for s in orch.STAGES}
    want_edges = {(up, s.name) for s in orch.STAGES for up in s.after}
    got_edges = {
        (t.task_id, down) for t in dag.tasks for down in t.downstream_task_ids
    }
    assert got_edges == want_edges
