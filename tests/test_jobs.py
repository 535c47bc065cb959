"""Stage-runner CLI tests (`airflow_baseball_spark.jobs`) — the
executable each build_airflow_dag task invokes. Drives the reference
chain 001→011/012/013→021→041 end-to-end over a parquet data dir,
checking write semantics per table (overwrite / upsert / append)."""

from __future__ import annotations

import tempfile

import pytest

from airflow_baseball_spark.jobs import run_stage
from test_domain_golden import _hitters  # reuse domain fixtures


@pytest.fixture()
def data_dir(spark):
    d = tempfile.mkdtemp(prefix="jobs_")
    spark.createDataFrame(
        [("A", 5, 3), ("A", 2, 2), ("B", 1, 0), ("C", 4, 6)],
        "stadium string, home_score int, away_score int",
    ).write.parquet(f"{d}/game_records.parquet")
    _hitters(spark).write.parquet(f"{d}/hitters.parquet")
    spark.createDataFrame(
        [(1, "5 2/3", 10, 3, 1, "3.50"), (2, "0", 0, 0, 0, "-")],
        "pitcher_id int, ip string, so int, bb int, hr int, era string",
    ).write.parquet(f"{d}/pitchers.parquet")
    return d


def test_compute_chain_runs_over_parquet_dir(spark, data_dir):
    assert run_stage(spark, "park_factor", data_dir) == ["park_factor"]
    assert spark.read.parquet(f"{data_dir}/park_factor").count() == 3

    # 011/012/013 fuse into one idempotent merge: re-running a link is
    # a no-op (the reference's ON DUPLICATE KEY contract)
    assert run_stage(spark, "hitter_woba", data_dir) == ["hitter_metrics"]
    first = spark.read.parquet(f"{data_dir}/hitter_metrics").collect()
    assert run_stage(spark, "hitter_wrc", data_dir) == ["hitter_metrics"]
    again = spark.read.parquet(f"{data_dir}/hitter_metrics").collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, again))
    assert {"hitter_id", "wOBA", "wRC"} <= set(
        spark.read.parquet(f"{data_dir}/hitter_metrics").columns
    )

    assert run_stage(spark, "pitcher_metrics", data_dir) == ["pitcher_metrics"]
    assert spark.read.parquet(f"{data_dir}/pitcher_metrics").count() == 2


def test_land_stage_validates_presence(spark, data_dir):
    assert run_stage(spark, "land_game_records", data_dir) == []
    with pytest.raises(FileNotFoundError, match="today_games"):
        run_stage(spark, "land_today_games", data_dir)


def test_unknown_stage_fails_loudly(spark, data_dir):
    with pytest.raises(ValueError, match="unknown stage"):
        run_stage(spark, "nope", data_dir)


def test_game_day_stages_run_end_to_end(spark, data_dir):
    """park_adjusted and hitter_records consume earlier stages' outputs
    plus the landed lineup/split tables — the full 041→050 path."""
    import datetime

    spark.createDataFrame(
        [
            (datetime.date(2025, 5, 21), "kim", "T1", 3, "T2", "A"),
            (datetime.date(2025, 5, 21), "choi", "T2", 5, "T1", "B"),
        ],
        "game_date date, player string, team string, position int,"
        " opponent string, stadium string",
    ).write.parquet(f"{data_dir}/today_lineup.parquet")
    spark.createDataFrame(
        [(1, "T2", 0.31)], "hitter_id int, opponent_team string, avg double"
    ).write.parquet(f"{data_dir}/hitter_opponents.parquet")
    spark.createDataFrame(
        [(1, "A", 0.28)], "hitter_id int, stadium string, avg double"
    ).write.parquet(f"{data_dir}/hitter_stadiums.parquet")
    spark.createDataFrame(
        [(1, datetime.date(2025, 5, 20), 2), (1, datetime.date(2025, 5, 19), 1)],
        "hitter_id int, game_date date, hits int",
    ).write.parquet(f"{data_dir}/hitter_games.parquet")

    run_stage(spark, "park_factor", data_dir)
    run_stage(spark, "hitter_woba", data_dir)
    assert run_stage(spark, "park_adjusted", data_dir) == ["park_adjusted_metrics"]
    assert {"hitter_id", "wRC_plus", "OPS_plus"} <= set(
        spark.read.parquet(f"{data_dir}/park_adjusted_metrics").columns
    )

    written = run_stage(spark, "hitter_records", data_dir)
    assert written == ["hitter_records", "recent_games/hitter"]
    rec = spark.read.parquet(f"{data_dir}/hitter_records")
    # kim (T1, position 3) and choi (T2, position 5) both in masters
    assert rec.count() == 2
    # append semantics: a second run doubles the rows (reference A9)
    run_stage(spark, "hitter_records", data_dir)
    assert spark.read.parquet(f"{data_dir}/hitter_records").count() == 4
